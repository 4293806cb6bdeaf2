package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Optimization-round evidence tool: write `.explain("formatted")` output for
  * every declared query (or a comma-separated subset) to
  * `plans/<tag>/<query>_<suffix>.txt` — the plan-shape evidence the
  * optimization judge checks claims against (guide §1: capture the plan for
  * every declared query; note Exchange count, join strategy, PushedFilters,
  * ReadSchema, WholeStageCodegen spans).
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> [queries|all] [sfDir]
  * e.g.   runMain graft.PlanDump r16 before all
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "r16"
    val suffix = if (args.length > 1) args(1) else "before"
    val which = if (args.length > 2) args(2) else "all"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
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
      if (which == "all") SparkEntry.queries.keys.toSeq.sorted
      else which.split(",").toSeq
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    names.foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${q}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        println(s"[plan] $q ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
