package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.streaming.BmIngest

/** The streaming BM25 postings sink ([[graft.streaming.BmIngest]]):
  * arriving documents are tokenized into per-micro-batch postings
  * generations, and the fan-in probe over base ∪ generations must be
  * row-identical to the ONE-PASS full-corpus gate query `bm25TopK` — no
  * matter how the stream was chunked into batches, across restarts
  * (periodic AvailableNow runs), and under at-least-once replay (where the
  * summed corpus stats would be the first thing a non-idempotent sink
  * corrupts: a double-counted batch shifts n and d and every score moves).
  */
class BmIngestSpec extends SparkSpec {

  private val prefix = "bmingest"
  private val ckpt = "/tmp/graft-bmingest-ckpt"
  private val inbox = "/tmp/graft-bmingest-inbox"
  private val isBase = col("doc_id") % 10 =!= 7
  private val isDelta = col("doc_id") % 10 === 7

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  private def rmrf(p: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete(); ()
    }
    val f = new java.io.File(p)
    if (f.exists()) rec(f)
  }

  test("drained postings sink + base == one-pass full-corpus bm25, across batches, restarts, and replay") {
    Seq(ckpt, inbox).foreach(rmrf)
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(prefix)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    TextAnalysis.writePostingsGeneration(spark, sfTiny, isBase,
      s"${prefix}_base", buckets = 8)

    // the arriving documents: three disjoint id-range files so
    // maxFilesPerTrigger=1 yields three real micro-batches
    val delta = spark.read.parquet(s"$sfTiny/documents.parquet")
      .filter(isDelta).select("doc_id", "text")
    val ids = delta.select("doc_id").collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    delta.filter(col("doc_id") <= cuts(0))
      .coalesce(1).write.parquet(s"$inbox/w1")
    delta.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1))
      .coalesce(1).write.parquet(s"$inbox/w2")

    def ingestAvailable(): Unit = {
      val stream = spark.readStream
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(inbox)
      BmIngest.start(stream, prefix, ckpt).awaitTermination()
    }

    // wave 1: two files → two generations in one AvailableNow run
    ingestAvailable()
    val gens1 = BmIngest.listGenerations(spark, prefix)
    assert(gens1.size == 2, s"expected 2 generations after wave 1, got $gens1")

    // wave 2 (a RESTART: same checkpoint, new file): batchIds continue,
    // the index catches up — the periodic-ingest operating mode
    delta.filter(col("doc_id") > cuts(1)).coalesce(1).write.parquet(s"$inbox/w3")
    ingestAvailable()
    val gens2 = BmIngest.listGenerations(spark, prefix)
    assert(gens2.size == 3, s"expected 3 generations after wave 2, got $gens2")

    // the yardstick: the ONE-PASS gate query over the full corpus — base ∪
    // streamed generations must reproduce it exactly (scores included:
    // stats sum to the same (n, d), tokenization is deterministic)
    val expected = canon(TextAnalysis.bm25TopK(spark, sfTiny))
    val streamed = canon(
      TextAnalysis.bm25TopKIncremental(spark, s"${prefix}_base" +: gens2))
    assert(streamed == expected,
      "base ∪ streamed generations diverged from the one-pass corpus query")

    // at-least-once replay: re-deliver batch 0's data into its OWN
    // generation table (what foreachBatch does on retry) — postings must
    // not duplicate and the summed stats must not move
    BmIngest.writeGeneration(
      spark.read.parquet(s"$inbox/w1").select("doc_id", "text"),
      BmIngest.genTable(prefix, 0))
    val replayed = canon(
      TextAnalysis.bm25TopKIncremental(spark,
        s"${prefix}_base" +: BmIngest.listGenerations(spark, prefix)))
    assert(replayed == expected, "replayed batch changed the probe — not idempotent")
    val indexedDocs = (s"${prefix}_base" +: gens2)
      .map(t => spark.table(t).select("doc_id").distinct())
      .reduce(_ union _)
    assert(indexedDocs.distinct().count() == indexedDocs.count(),
      "a doc_id landed in more than one generation")
    val statsN = (s"${prefix}_base" +: gens2)
      .map(t => spark.table(s"${t}_stats"))
      .reduce(_ unionByName _).agg(sum("n")).head().getLong(0)
    assert(statsN == spark.read.parquet(s"$sfTiny/documents.parquet").count(),
      "summed generation stats do not cover the corpus exactly once")
  }

  test("a torn (postings without _stats) generation is invisible to probes") {
    import spark.implicits._
    Seq((1L, 2L, "torn", 1L)).toDF("doc_id", "dl", "term", "tf")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(BmIngest.genTable(prefix, 99))
    assert(!BmIngest.listGenerations(spark, prefix)
      .exists(_.endsWith("_g99")),
      "a generation without its _stats twin must not be listed")
  }
}
