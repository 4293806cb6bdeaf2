package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // same data-proportional partitioning as Bench ([[Tuning]]); every
      // gated output is partitioning-independent by contract (the driver
      // also runs this gate at CPUS=3 to prove exactly that)
      .config("spark.sql.shuffle.partitions",
        Tuning.shufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harmless if events.ts is TIMESTAMP_MICROS (current testdata); makes
      // an INT64-nanos ts (earlier testdata vintage) read as BIGINT instead
      // of erroring — Tables.tsMicros adapts to whichever type arrives
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated filter for fast local iteration on one query
    // (the driver never sets this — it always runs the full gate).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def keep(name: String) = only.forall(_.contains(name))
    // Round-7 lesson: a failed query must fail LOUDLY. Swallowing the
    // exception here left 20 CORRECTNESS keys silently absent and the round
    // shipped broken. Now every failure (a) prints a headline line, (b) is
    // recorded in errors.json so the driver sees an explicit err record
    // rather than a missing key, and (c) flips the exit code nonzero.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name FAILED: ${errors(name)}")
      }
      // release the query's intra-query cache pins: the gate runs 123
      // queries in one session, and un-released pins tax every later
      // query's plan canonicalization (cache hygiene, verdict r11 item 3)
      graft.functions.TransientCache.release(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[verify] FAILED queries: ${errors.size} " +
        errors.keys.mkString("(", ", ", ")"))
      sys.exit(1)
    }
  }
}
