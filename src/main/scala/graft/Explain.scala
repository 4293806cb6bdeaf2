package graft
import org.apache.spark.sql.SparkSession

/** Perf-loop tool: isolated timing + formatted plan for one query.
  * Usage: runMain graft.Explain <queryName> [sfDir] [reps] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val showPlan = args.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Tuning.shufflePartitions(sfDir, cpus.toInt))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (name == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    if (name == "all") {
      // untimed global warmup: JIT/codegen take ~30-60 s of work to settle,
      // so without this the first few queries (alphabetically) absorb the
      // whole warmup and read 10-20× slow
      SparkEntry.queries.foreach { case (n, fn) =>
        try fn(spark, sfDir).collect()
        catch { case e: Throwable =>
          // loud, not fatal: warmup failures repeat in the timed pass below,
          // which throws — but never let a broken query pass silently here
          System.err.println(s"[explain] warmup $n FAILED: ${e.getMessage}")
        }
      }
    }
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).collect().length
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[time] $q rep$i: $dt%.2f s ($n rows)")
        dt
      }
      // steady state = min over reps (rep1 carries one-time codegen cost)
      println(f"[steady] $q ${times.min}%.2f s")
    }
    spark.stop()
  }
}
