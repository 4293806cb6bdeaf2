package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DedupOps
import graft.streaming.MixedIngest

/** Interleaved add+takedown maintenance ([[graft.streaming.MixedIngest]],
  * verdict r11 item 2): ONE feed carrying both candidate edges and
  * takedown requests, in any interleaving, must leave the maintained
  * assignment bit-identical to the batch closure over
  * (all added edges with both endpoints never deleted) — i.e.
  * `componentsOver((base ∪ adds) ∖ deletes)`. Covers the compositions the
  * split pipelines ([[graft.streaming.ClusterIngest]] /
  * [[graft.streaming.TakedownIngest]]) never exercised together:
  * add-then-delete and delete-then-add of the SAME doc across batches, a
  * single micro-batch that both adds a doc and takes down its duplicate
  * neighbor, component splits mid-stream, and tombstone-wins re-admission.
  */
class MixedIngestSpec extends SparkSpec {

  private val prefix = "mxingest"
  private val ckpt = "/tmp/graft-mxingest-ckpt"
  private val inbox = "/tmp/graft-mxingest-inbox"

  private def rmrf(p: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rec)
      f.delete(); ()
    }
    val f = new java.io.File(p)
    if (f.exists()) rec(f)
  }

  private def dropPrefixTables(): Unit =
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(prefix)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))

  private def reset(): Unit = {
    Seq(ckpt, inbox).foreach(rmrf)
    dropPrefixTables()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
  }

  /** One feed frame from adds + dels (del rows carry null id2). */
  private def feedDf(adds: Seq[(Long, Long)], dels: Seq[Long]): DataFrame = {
    import spark.implicits._
    val a = adds.toDF("id1", "id2").withColumn("op", lit("add"))
    val d = dels.toDF("id1").withColumn("id2", lit(null).cast("long"))
      .withColumn("op", lit("del"))
    a.unionByName(d).select("op", "id1", "id2")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Boolean)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sorted

  /** The oracle: closure over every add-edge whose endpoints were never
    * deleted, regardless of delivery order.
    */
  private def expect(adds: Seq[(Long, Long)], dels: Seq[Long]): Seq[(Long, Long, Long, Boolean)] = {
    import spark.implicits._
    val live = adds.filter { case (a, b) => !dels.contains(a) && !dels.contains(b) }
    if (live.isEmpty) Seq.empty
    else rows(DedupOps.componentsOver(live.toDF("id1", "id2")))
  }

  private def ingestAvailable(): Unit = {
    val schema = feedDf(Seq((0L, 1L)), Seq(2L)).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inbox)
    MixedIngest.start(stream, prefix, ckpt).awaitTermination()
  }

  // a seeded random graph; deletions chosen to hit real components
  private val rnd = new scala.util.Random(11)
  private val allAdds: Seq[(Long, Long)] =
    Seq.fill(70)((rnd.nextInt(36).toLong, rnd.nextInt(36).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }

  test("interleaved adds+deletes across batches converge to the batch closure") {
    reset()
    val adds = allAdds
    // three waves: adds / mixed (adds + deletes of earlier docs) / deletes
    val (w1, rest) = adds.splitAt(30)
    val (w2, w3) = rest.splitAt(25)
    val dels2 = Seq(w1.head._1, w1(3)._2)     // delete docs added in wave 1
    val dels3 = Seq(w2.head._2, w1(5)._1, 35L) // incl. one never-added id
    feedDf(w1, Seq.empty).coalesce(1).write.parquet(s"$inbox/w1")
    feedDf(w2, dels2).coalesce(1).write.parquet(s"$inbox/w2")
    feedDf(w3, dels3).coalesce(1).write.parquet(s"$inbox/w3")
    ingestAvailable()
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(adds, dels2 ++ dels3),
      "drained mixed view != batch closure over (adds) \\ (deletes)")
    // the maintained edge table matches the oracle's live edge set too
    val (_, edges, tombs) = MixedIngest.currentState(spark, prefix).get
    val liveSet = adds.filter { case (a, b) =>
      !(dels2 ++ dels3).contains(a) && !(dels2 ++ dels3).contains(b) }.toSet
    assert(edges.collect().map(r => (r.getLong(1), r.getLong(0))).toSet ==
      liveSet.map { case (a, b) => (b, a) },
      "maintained edge set != live edges") // (id2, id1) col order after anti-joins
    assert(tombs.collect().map(_.getLong(0)).toSet == (dels2 ++ dels3).toSet,
      "accumulated tombstones drifted")
  }

  test("same-batch add + takedown of the duplicate neighbor composes to the closure") {
    reset()
    // base: component {1,2} and component {5,6,7} (chain)
    feedDf(Seq((1L, 2L), (5L, 6L), (6L, 7L)), Seq.empty)
      .coalesce(1).write.parquet(s"$inbox/w1")
    // THE nasty batch: adds doc 9 as a duplicate of 2, adds 5–7 closing the
    // chain, AND deletes 2 (9's only neighbor) and 6 (splitting the chain —
    // but 5–7 keeps it together) in the SAME micro-batch
    feedDf(Seq((2L, 9L), (5L, 7L)), Seq(2L, 6L))
      .coalesce(1).write.parquet(s"$inbox/w2")
    ingestAvailable()
    val adds = Seq((1L, 2L), (5L, 6L), (6L, 7L), (2L, 9L), (5L, 7L))
    val dels = Seq(2L, 6L)
    val got = rows(MixedIngest.current(spark, prefix).get)
    assert(got == expect(adds, dels),
      s"same-batch add+takedown diverged from the closure: $got")
    // spelled out: 9 lost its only neighbor at birth → absent; 1 lost its
    // only edge → absent; {5,7} survive as one component via the new edge
    assert(got.map(_._1) == Seq(5L, 7L), s"wrong survivors: $got")
  }

  test("delete-then-re-add stays suppressed (tombstone wins) and split components recompute") {
    reset()
    // w1: two components {1,2,3} and {10,11}
    feedDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq.empty)
      .coalesce(1).write.parquet(s"$inbox/w1")
    // w2: delete 2 — SPLITS {1,2,3}: 1 and 3 had only 2 as neighbor
    feedDf(Seq.empty, Seq(2L)).coalesce(1).write.parquet(s"$inbox/w2")
    // w3: re-add an edge to the deleted doc (suppressed) and a fresh edge
    feedDf(Seq((2L, 10L), (11L, 12L)), Seq.empty)
      .coalesce(1).write.parquet(s"$inbox/w3")
    ingestAvailable()
    val got = rows(MixedIngest.current(spark, prefix).get)
    assert(got == expect(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (2L, 10L), (11L, 12L)), Seq(2L)),
      s"tombstone-wins / split recompute diverged: $got")
    assert(!got.exists(_._1 == 2L), "deleted doc re-entered the view")
    assert(got.map(_._1).toSet == Set(10L, 11L, 12L), s"wrong members: $got")
  }

  test("batch-boundary independence: one-batch vs many-batch delivery, same view") {
    reset()
    val dels = Seq(allAdds(2)._1, allAdds(9)._2)
    // single batch carrying EVERYTHING, deletes interleaved with adds
    feedDf(allAdds, dels).coalesce(1).write.parquet(s"$inbox/all")
    ingestAvailable()
    val oneShot = rows(MixedIngest.current(spark, prefix).get)
    assert(oneShot == expect(allAdds, dels),
      "single-batch mixed delivery != closure")
    // and a maximally split delivery converges to the same rows
    reset()
    allAdds.grouped(10).zipWithIndex.foreach { case (g, i) =>
      feedDf(g, if (i == 2) dels else Seq.empty)
        .coalesce(1).write.parquet(s"$inbox/g$i")
    }
    ingestAvailable()
    assert(rows(MixedIngest.current(spark, prefix).get) == oneShot,
      "split delivery diverged from single-batch delivery")
  }

  test("replay idempotence, torn version invisibility, and the stamp guard") {
    reset()
    val (w1, w2) = allAdds.splitAt(40)
    val dels = Seq(w1.head._1)
    feedDf(w1, Seq.empty).coalesce(1).write.parquet(s"$inbox/w1")
    feedDf(w2, dels).coalesce(1).write.parquet(s"$inbox/w2")
    ingestAvailable()
    val expectAll = expect(allAdds, dels)
    assert(rows(MixedIngest.current(spark, prefix).get) == expectAll)
    val vers = MixedIngest.committedVersions(spark, prefix)
    assert(vers.size == 2, s"GC should keep 2 versions, found $vers")
    val (newestId, newestTable) = vers.last
    // REPLAY of the newest committed batch — same checkpoint identity
    MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestId,
      ckpt = Some(ckpt))
    assert(rows(spark.table(newestTable)) == expectAll,
      "replayed mixed batch corrupted the assignment")
    // TORN version: missing meta ⇒ invisible; replay completes it
    spark.sql(s"DROP TABLE IF EXISTS ${newestTable}_meta")
    assert(MixedIngest.committedVersions(spark, prefix).size == 1,
      "torn version still counted as committed")
    MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestId,
      ckpt = Some(ckpt))
    assert(rows(MixedIngest.current(spark, prefix).get) == expectAll,
      "replay after torn write did not converge")
    // stamp guard: a delivery from a different checkpoint is refused even
    // when the batch ordering allows it
    val e = intercept[IllegalArgumentException] {
      MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestId + 1,
        ckpt = Some("/tmp/some-other-checkpoint"))
    }
    assert(e.getMessage.contains("fresh checkpoint over an existing view"),
      s"wrong failure: ${e.getMessage}")
  }
}
