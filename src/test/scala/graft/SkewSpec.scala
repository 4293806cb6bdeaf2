package graft

import org.apache.spark.sql.functions._
import graft.functions.DedupOps
import graft.operators.{OrderEvents, Skew, WireOrderFold}

/** Salted aggregation must be bit-identical to the direct aggregation
  * (decimal exactness makes re-aggregation safe), with two shuffles instead
  * of one hot one. The rehearsal case below runs real operators on a
  * generated skewed layout (the in-test twin of `tools/skew_testdata.py`'s
  * two shapes); the TIMING claim lives in `tools/skew_bench_sf1.json`
  * (graft.SkewBench), where skew/uniform ratios are ~1× — specs assert
  * correctness properties only, timings on this VM are steal-noise.
  */
class SkewSpec extends SparkSpec {

  test("skewed layout: hot pool + hot near-dup family — fold is partition-count-independent, family resolves to one component") {
    val dir = "/tmp/graft-skew-tiny"
    // wipe any previous run (Spark leaves *.parquet DIRECTORIES where the
    // copy below writes plain files), then copy the uniform sf0.001 dir
    // and inject the two skew shapes
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    val src = java.nio.file.Paths.get(sfTiny)
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.copy(p,
        java.nio.file.Paths.get(dir, p.getFileName.toString),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // shape 1 — hot pool: ~90% of events remapped to 'click'
    spark.read.parquet(s"$sfTiny/events.parquet")
      .withColumn("event_type",
        when(col("user_id") % 10 =!= 0, lit("click")).otherwise(col("event_type")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // shape 2 — hot near-dup family: every 25th doc becomes a near-copy of
    // one long base text (shared body, tiny per-doc suffix)
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val base = docs.orderBy(length(col("text")).desc, col("doc_id"))
      .select("text").head().getString(0)
    docs.withColumn("text",
        when(col("doc_id") % 25 === 0,
          concat(lit(base), lit(" v"), col("doc_id"))).otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DedupOps.invalidateDerived(dir)

    // the layout really is skewed
    val hot = spark.read.parquet(s"$dir/events.parquet")
      .agg(avg(when(col("event_type") === "click", 1.0).otherwise(0.0))).head().getDouble(0)
    assert(hot > 0.8, s"hot pool carries only $hot of events")
    val famIds = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 25 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(famIds.size >= 15)

    // the wire fold's result must not depend on how the hot pool lands
    // across shuffle partitions (any order-dependent fold would)
    def fold(): Set[Seq[Any]] =
      WireOrderFold.wireOrdersCurrent(spark, dir).collect().map(_.toSeq).toSet
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val atDefault = fold()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(fold() == atDefault,
        "wire fold result changed with shuffle partition count on the hot-pool layout")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)

    // the hot family must resolve to ONE component containing every member
    // (the band join sees the giant bucket, the component engine the star)
    val comp = DedupOps.dedupClustersFresh(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val famComps = famIds.map(comp.getOrElse(_, -1L))
    assert(famComps.size == 1 && famComps.head == famIds.min,
      s"hot near-dup family fragmented into components $famComps")
  }

  test("salted sum == direct sum, exactly") {
    val ev = OrderEvents(spark, sfTiny) // pool is a 5-value hot key by design
    val direct = ev.groupBy("pool").agg(sum(col("val")).as("total"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Skew.saltedSum(ev, "pool", "val", "total",
        saltCol = "event_id", salts = 16)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
    assert(salted.size == 5)
  }

  test("salt is deterministic and spreads a single key") {
    val ev = OrderEvents(spark, sfTiny).filter(col("pool") === "click")
    val spread = ev.select(Skew.salt(col("event_id"), 16).as("s"))
      .distinct().count()
    assert(spread > 8, s"salt only hit $spread of 16 buckets")
    val a = ev.select(Skew.salt(col("event_id"), 16).as("s")).collect().map(_.getInt(0)).toSeq
    val b = ev.select(Skew.salt(col("event_id"), 16).as("s")).collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }
}
