package graft
import org.apache.spark.sql.SparkSession

/** Iteration helper: time a comma-separated subset of [[SparkEntry.queries]]
  * (args(0)) on args(1) (default sf0.1) with the same warmup + timing
  * methodology as [[Bench]] — for shaving one query without paying the full
  * 103-query suite.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        Tuning.shufflePartitions(sfDir, 32))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    // release transient pins after every run (ADVICE r13): same discipline
    // as Bench — no stale warm pins across reps, no canonicalization tax
    def releasePins(): Unit = graft.functions.TransientCache.release(spark)
    qs.foreach { case (_, fn) =>
      fn(spark, sfDir).collect(); releasePins() } // warmup
    qs.foreach { case (name, fn) =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        releasePins()
        dt
      }
      println(f"$name%-24s best=${reps.min}%.3f reps=${reps.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
