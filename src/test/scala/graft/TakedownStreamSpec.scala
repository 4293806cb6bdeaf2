package graft

import org.apache.spark.sql.functions._

import graft.functions.DedupOps
import graft.streaming.TakedownIngest

/** The streaming takedown sink ([[graft.streaming.TakedownIngest]]):
  * deletion requests arriving as micro-batches of ids become tombstone
  * generations, and the admission probe under the streamed tombstone set
  * must equal the probe under the same ids delivered as one batch — no
  * matter how the stream was chunked, across restarts, under at-least-once
  * replay, and with re-deletion of already-deleted ids. Compaction then
  * folds the streamed tombstones into the layout and the generations can
  * be retired.
  */
class TakedownStreamSpec extends SparkSpec {

  private val prefix = "tdingest"
  private val ckpt = "/tmp/graft-tdingest-ckpt"
  private val inbox = "/tmp/graft-tdingest-inbox"

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

  test("streamed takedowns == one-batch tombstone probe, across restarts, replay, and re-deletion; compaction retires the stream") {
    Seq(ckpt, inbox).foreach(rmrf)
    spark.catalog.listTables().collect()
      .filter(t => t.name.startsWith(prefix) || t.name.startsWith("td_mh"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    DedupOps.writeMinhashIndex(spark, sfTiny, "td_mh")

    // the takedown notice: ids derived from the stored sidecar (a real
    // notice is a list of ids, not a corpus predicate)
    val fixture = spark.table("td_mh_counts")
      .filter(col("doc_id") % 37 === 3).select("doc_id")
    val ids = fixture.collect().map(_.getLong(0)).sorted
    assert(ids.length >= 3, s"fixture too small: ${ids.length}")
    val (w1, rest) = ids.splitAt(ids.length / 3)
    val (w2, w3) = rest.splitAt(rest.length / 2)

    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    w1.toSeq.toDF("doc_id").coalesce(1).write.parquet(s"$inbox/w1")
    w2.toSeq.toDF("doc_id").coalesce(1).write.parquet(s"$inbox/w2")

    def ingestAvailable(): Unit = {
      val stream = spark.readStream
        .schema(fixture.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(inbox)
      TakedownIngest.start(stream, prefix, ckpt).awaitTermination()
    }

    // wave 1: two files → two tombstone generations in one AvailableNow run
    ingestAvailable()
    assert(TakedownIngest.listGenerations(spark, prefix).size == 2)

    // wave 2 (a RESTART: same checkpoint, new file): batchIds continue.
    // w3 also RE-DELETES two already-deleted ids from w1 — must be a no-op
    (w3 ++ w1.take(2)).toSeq.toDF("doc_id")
      .coalesce(1).write.parquet(s"$inbox/w3")
    ingestAvailable()
    val gens = TakedownIngest.listGenerations(spark, prefix)
    assert(gens.size == 3, s"expected 3 generations, got $gens")

    val streamed = TakedownIngest.tombstones(spark, prefix).get
    assert(streamed.collect().map(_.getLong(0)).sorted.toSeq == ids.toSeq,
      "streamed tombstone set diverged from the delivered notices")

    // the yardstick: the probe under the same ids delivered as ONE batch
    val expected = canon(DedupOps.shardDedupFromGenerations(
      spark, sfTiny, Seq("td_mh"), tombs = Some(fixture)))
    assert(canon(DedupOps.shardDedupFromGenerations(
      spark, sfTiny, Seq("td_mh"), tombs = Some(streamed))) == expected,
      "probe under streamed tombstones diverged from the one-batch probe")

    // at-least-once replay: re-deliver batch 0 into its own generation —
    // the tombstone set must not change
    TakedownIngest.writeGeneration(
      spark.read.parquet(s"$inbox/w1"), TakedownIngest.genTable(prefix, 0))
    val replayed = TakedownIngest.tombstones(spark, prefix).get
    assert(replayed.collect().map(_.getLong(0)).sorted.toSeq == ids.toSeq,
      "replayed takedown batch changed the tombstone set")

    // compaction folds the streamed tombstones into the layout; the plain
    // probe then serves the deleted state and the generations can go
    DedupOps.compactMinhashIndex(spark, Seq("td_mh"), "td_mh_compacted",
      tombs = Some(replayed))
    gens.foreach { t =>
      spark.sql(s"DROP TABLE $t"); spark.sql(s"DROP TABLE ${t}_meta")
    }
    assert(TakedownIngest.tombstones(spark, prefix).isEmpty,
      "retired generations still produce tombstones")
    assert(canon(DedupOps.shardDedupFromGenerations(
      spark, sfTiny, Seq("td_mh_compacted"))) == expected,
      "plain probe over the compacted layout lost the streamed deletions")
  }

  test("a torn (ids without _meta) tombstone generation is invisible") {
    import spark.implicits._
    Seq(1L, 2L).toDF("doc_id")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(TakedownIngest.genTable(prefix, 99))
    assert(!TakedownIngest.listGenerations(spark, prefix)
      .exists(_.endsWith("_t99")),
      "a generation without its _meta twin must not be listed")
  }

  test("keyCol routes vector takedowns (vec_id) through the same sink") {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_vec_t0")
    spark.sql(s"DROP TABLE IF EXISTS ${prefix}_vec_t0_meta")
    TakedownIngest.writeGeneration(
      Seq(7L, 7L, 11L).toDF("vec_id"),
      TakedownIngest.genTable(s"${prefix}_vec", 0), keyCol = "vec_id")
    val t = TakedownIngest.tombstones(spark, s"${prefix}_vec", "vec_id").get
    assert(t.columns.toSeq == Seq("vec_id"))
    assert(t.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 11L))
  }
}
