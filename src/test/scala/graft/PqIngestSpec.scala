package graft

import org.apache.spark.sql.functions._

import graft.functions.SimilarityOps
import graft.streaming.PqIngest

/** The streaming PQ index sink ([[graft.streaming.PqIngest]]): arriving
  * vectors are encoded under the base layout's frozen codebook, one
  * generation per micro-batch, and a fan-in probe over base ∪ generations
  * must be bit-identical to the frozen-codebook batch form over the same
  * vectors — no matter how the stream was chunked into batches, across
  * restarts (periodic AvailableNow runs), and under at-least-once replay.
  */
class PqIngestSpec extends SparkSpec {

  private val base = "/tmp/graft-pqingest-base"
  private val genRoot = "/tmp/graft-pqingest-gens"
  private val ckpt = "/tmp/graft-pqingest-ckpt"
  private val inbox = "/tmp/graft-pqingest-inbox"
  private val isBase = col("vec_id") % 10 =!= 7
  private val isDelta = col("vec_id") % 10 === 7

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(r =>
      (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

  private def rmrf(p: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete(); ()
    }
    val f = new java.io.File(p)
    if (f.exists()) rec(f)
  }

  test("drained generation sink == frozen-codebook batch encode, across batches, restarts, and replay") {
    Seq(genRoot, ckpt, inbox).foreach(rmrf)
    SimilarityOps.writePqBase(spark, sfTiny, isBase, base)

    // the arriving vectors: three disjoint id-range files so
    // maxFilesPerTrigger=1 yields three real micro-batches
    val delta = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .filter(isDelta).select("vec_id", "embedding")
    val ids = delta.select("vec_id").collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    delta.filter(col("vec_id") <= cuts(0))
      .coalesce(1).write.parquet(s"$inbox/w1")
    delta.filter(col("vec_id") > cuts(0) && col("vec_id") <= cuts(1))
      .coalesce(1).write.parquet(s"$inbox/w2")

    def ingestAvailable(): Unit = {
      val stream = spark.readStream
        .schema(delta.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(inbox)
      PqIngest.start(stream, base, genRoot, ckpt).awaitTermination()
    }

    // wave 1: two files → two generations in one AvailableNow run
    ingestAvailable()
    val gens1 = PqIngest.listGenerations(spark, genRoot)
    assert(gens1.size == 2, s"expected 2 generations after wave 1, got $gens1")

    // wave 2 (a RESTART: same checkpoint, new file): batchIds continue,
    // the index catches up — the periodic-ingest operating mode
    delta.filter(col("vec_id") > cuts(1)).coalesce(1).write.parquet(s"$inbox/w3")
    ingestAvailable()
    val gens2 = PqIngest.listGenerations(spark, genRoot)
    assert(gens2.size == 3, s"expected 3 generations after wave 2, got $gens2")

    // the yardstick: all delta vectors encoded in ONE batch generation
    // under the same frozen codebook
    val oneShot = s"/tmp/graft-pqingest-oneshot"
    SimilarityOps.writePqGeneration(spark, sfTiny, isDelta, base, oneShot)
    val expected = canon(SimilarityOps.pqTopKFromGenerations(spark, base, Seq(oneShot)))
    val streamed = canon(SimilarityOps.pqTopKFromGenerations(spark, base, gens2))
    assert(streamed == expected,
      "streamed generations probe diverged from the one-shot batch encode")

    // at-least-once replay: re-deliver batch 0's data into its OWN
    // generation path (what foreachBatch does on retry) — rows must not
    // duplicate and the probe must not move
    PqIngest.writeGeneration(
      spark.read.parquet(s"$inbox/w1").select("vec_id", "embedding"),
      base, PqIngest.genPath(genRoot, 0))
    val replayed = canon(SimilarityOps.pqTopKFromGenerations(spark, base,
      PqIngest.listGenerations(spark, genRoot)))
    assert(replayed == expected, "replayed batch changed the probe — not idempotent")
    val all = spark.read.parquet(s"$sfTiny/embeddings.parquet").count()
    val indexed = spark.read.parquet(base).select("vec_id")
      .union(gens2.map(g => spark.read.parquet(g).select("vec_id"))
        .reduce(_ union _))
    assert(indexed.distinct().count() == indexed.count(),
      "a vec_id landed in more than one generation")
    assert(indexed.count() == all, "base ∪ generations does not cover the corpus")
  }

  test("a torn (no _SUCCESS) generation is invisible to probes") {
    val torn = new java.io.File(s"$genRoot/g=99")
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$genRoot/g=99/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(!PqIngest.listGenerations(spark, genRoot).exists(_.endsWith("g=99")),
      "a generation without _SUCCESS markers must not be listed")
  }
}
