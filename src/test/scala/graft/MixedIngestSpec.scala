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
    val (_, newestUpto, _) = vers.last
    // REPLAY of the newest committed batch — same checkpoint identity;
    // rebuilds from the pre-batch state into a FRESH version (committed
    // versions are never overwritten in place), and GC folds the
    // superseded same-batch version
    MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestUpto,
      ckpt = Some(ckpt))
    assert(rows(MixedIngest.current(spark, prefix).get) == expectAll,
      "replayed mixed batch corrupted the assignment")
    val replayed = MixedIngest.committedVersions(spark, prefix)
    assert(replayed.size == 2 && replayed.map(_._2) == vers.map(_._2) &&
      replayed.last._1 > vers.last._1,
      s"replay should supersede the same-batch version: $vers -> $replayed")
    // TORN version: an injected crash between the state-table writes and
    // the _meta commit marker must leave the torn version invisible and a
    // replay of the same batch must converge (the foreachBatch recovery
    // contract — the exact window verdict r12 stretch item 8 names)
    MixedIngest.crashAfter = Some("tombs")
    try intercept[IllegalStateException] {
      MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestUpto,
        ckpt = Some(ckpt))
    } finally MixedIngest.crashAfter = None
    assert(MixedIngest.committedVersions(spark, prefix) == replayed,
      "torn version (crash before the _meta marker) counted as committed")
    assert(rows(MixedIngest.current(spark, prefix).get) == expectAll,
      "torn write corrupted the served view")
    MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestUpto,
      ckpt = Some(ckpt))
    assert(rows(MixedIngest.current(spark, prefix).get) == expectAll,
      "replay after torn write did not converge")
    // stamp guard: a delivery from a different checkpoint is refused even
    // when the batch ordering allows it
    val e = intercept[IllegalArgumentException] {
      MixedIngest.mergeBatch(feedDf(w2, dels), prefix, newestUpto + 1,
        ckpt = Some("/tmp/some-other-checkpoint"))
    }
    assert(e.getMessage.contains("fresh checkpoint over an existing view"),
      s"wrong failure: ${e.getMessage}")
  }

  test("mid-stream crash inside the commit window recovers by replay") {
    reset()
    feedDf(Seq((1L, 2L), (3L, 4L)), Seq.empty)
      .coalesce(1).write.parquet(s"$inbox/w1")
    ingestAvailable()
    val afterW1 = rows(MixedIngest.current(spark, prefix).get)
    assert(afterW1 == expect(Seq((1L, 2L), (3L, 4L)), Seq.empty))
    // the second drain dies between the edge-table write and the _meta
    // commit — the version is torn, the checkpoint never commits batch 1
    feedDf(Seq((2L, 5L)), Seq(3L)).coalesce(1).write.parquet(s"$inbox/w2")
    MixedIngest.crashAfter = Some("edges")
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ingestAvailable()
    } finally MixedIngest.crashAfter = None
    assert(rows(MixedIngest.current(spark, prefix).get) == afterW1,
      "torn mid-stream version leaked into the served view")
    // restart from the SAME checkpoint: batch 1 replays against the
    // pre-crash state and the view converges
    ingestAvailable()
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((1L, 2L), (3L, 4L), (2L, 5L)), Seq(3L)),
      "post-crash restart did not converge to the closure")
  }

  test("compact folds duplicate edges, drops tombstones, and re-opens re-entry") {
    reset()
    // batch 0: chain {1,2,3} and pair {10,11}; batch 1 re-adds (10,11)
    // (a duplicate edge across batches), adds (1,3), deletes 2
    MixedIngest.mergeBatch(
      feedDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq.empty), prefix, 0L)
    MixedIngest.mergeBatch(
      feedDf(Seq((10L, 11L), (1L, 3L)), Seq(2L)), prefix, 1L)
    val adds = Seq((1L, 2L), (2L, 3L), (10L, 11L), (1L, 3L))
    val expectPre = expect(adds, Seq(2L))
    assert(rows(MixedIngest.current(spark, prefix).get) == expectPre)
    val (_, edgesPre, tombsPre) = MixedIngest.currentState(spark, prefix).get
    assert(edgesPre.count() > edgesPre.distinct().count(),
      "fixture must carry a cross-batch duplicate edge for the fold to bite")
    assert(tombsPre.count() == 1L)
    MixedIngest.compact(spark, prefix)
    // the view is bit-identical, the edge list is folded, tombstones gone
    assert(rows(MixedIngest.current(spark, prefix).get) == expectPre,
      "compaction changed the served assignment")
    val (_, edgesPost, tombsPost) = MixedIngest.currentState(spark, prefix).get
    assert(edgesPost.count() == edgesPost.distinct().count() &&
      edgesPost.count() == 2L, "compaction did not fold duplicate edges")
    assert(tombsPost.count() == 0L, "compaction did not drop the tombstones")
    // the semantics boundary: with the tombstone gone, the previously-
    // deleted doc CAN re-enter via a later add
    MixedIngest.mergeBatch(feedDf(Seq((2L, 10L)), Seq.empty), prefix, 2L)
    val got = rows(MixedIngest.current(spark, prefix).get)
    assert(got.exists(_._1 == 2L),
      s"compacted tombstone still suppresses re-entry: $got")
    assert(got == expect(Seq((1L, 3L), (10L, 11L), (2L, 10L)), Seq.empty),
      s"post-compaction re-entry diverged from the reset closure: $got")
  }

  test("compact between drains: the stream keeps converging") {
    reset()
    val (w1, w2) = allAdds.splitAt(35)
    val dels1 = Seq(w1(1)._1)
    feedDf(w1, dels1).coalesce(1).write.parquet(s"$inbox/w1")
    ingestAvailable()
    MixedIngest.compact(spark, prefix)
    // post-compaction the dels1 tombstone is gone: w2 edges touching that
    // id are admitted (re-entry), and only dels2 suppresses
    val dels2 = Seq(w2.head._2)
    feedDf(w2, dels2).coalesce(1).write.parquet(s"$inbox/w2")
    ingestAvailable()
    val w1live = w1.filter { case (a, b) =>
      !dels1.contains(a) && !dels1.contains(b) }
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(w1live ++ w2, dels2),
      "drain → compact → drain diverged from the reset closure")
  }

  test("auto-compaction bounds tombstone state mid-stream and re-opens re-entry") {
    reset()
    val schema = feedDf(Seq((0L, 1L)), Seq(2L)).schema
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(inbox)
      MixedIngest.start(stream, prefix, ckpt,
        autoCompactTombs = Some(0L)).awaitTermination()
    }
    // w1: chain {1,2,3}; w2: delete 2 (splits — 1 and 3 drop with it);
    // w3: an edge to the deleted doc. With threshold 0, the sink compacts
    // right after w2 (its accumulated set {2} exceeds 0), so by w3 the
    // tombstone is GONE and 2 re-enters — the opposite of the default
    // tombstone-wins run in the delete-then-re-add test above.
    feedDf(Seq((1L, 2L), (2L, 3L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w1")
    feedDf(Seq.empty, Seq(2L)).coalesce(1).write.parquet(s"$inbox/w2")
    feedDf(Seq((2L, 10L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w3")
    drain()
    val got = rows(MixedIngest.current(spark, prefix).get)
    assert(got == expect(Seq((2L, 10L)), Seq.empty),
      s"auto-compacted stream diverged from the compaction-reset closure: $got")
    val (_, _, tombs) = MixedIngest.currentState(spark, prefix).get
    assert(tombs.count() == 0L,
      "auto-compaction left tombstones in the newest version")
  }

  test("per-batch versions persist deltas, not snapshots") {
    reset()
    // two disjoint components in separate batches: the second version's
    // assignment table must carry ONLY the second batch's rows — the
    // untouched first component stays durable in the base version
    // (verdict r13 item 1: the old layout re-wrote the full state here)
    MixedIngest.mergeBatch(feedDf(Seq((1L, 2L)), Seq.empty), prefix, 0L)
    MixedIngest.mergeBatch(feedDf(Seq((10L, 11L)), Seq.empty), prefix, 1L)
    val vers = MixedIngest.committedVersions(spark, prefix)
    assert(spark.table(vers.last._3).collect().map(_.getLong(0)).toSet ==
      Set(10L, 11L),
      "second version re-persisted untouched rows — snapshot, not delta")
    // a delete-carrying batch persists recomputed rows + erasure markers,
    // still never the untouched component
    MixedIngest.mergeBatch(feedDf(Seq.empty, Seq(10L)), prefix, 2L)
    val vers2 = MixedIngest.committedVersions(spark, prefix)
    val d2 = spark.table(vers2.last._3).collect()
    assert(d2.map(_.getLong(0)).toSet == Set(10L, 11L) &&
      d2.forall(_.isNullAt(1)),
      "delete batch should persist only the affected component's erasures")
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((1L, 2L), (10L, 11L)), Seq(10L)),
      "delta-resolved view diverged from the closure")
  }

  /** A stub attached query for the quiescence guard — only `isActive` and
    * `name` are consulted by the guard. */
  private final class StubQuery extends org.apache.spark.sql.streaming.StreamingQuery {
    @volatile var active = true
    override def name: String = "stub"
    override def id: java.util.UUID = java.util.UUID.randomUUID()
    override def runId: java.util.UUID = java.util.UUID.randomUUID()
    override def sparkSession: org.apache.spark.sql.SparkSession = spark
    override def isActive: Boolean = active
    override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
    override def status: org.apache.spark.sql.streaming.StreamingQueryStatus =
      throw new UnsupportedOperationException("stub")
    override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      Array.empty
    override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
      throw new UnsupportedOperationException("stub")
    override def awaitTermination(): Unit = ()
    override def awaitTermination(timeoutMs: Long): Boolean = true
    override def processAllAvailable(): Unit = ()
    override def stop(): Unit = { active = false }
    override def explain(): Unit = ()
    override def explain(extended: Boolean): Unit = ()
  }

  test("manual compact refuses while a stream is attached and active, and a replay racing a manual compact refuses loudly") {
    reset()
    MixedIngest.mergeBatch(feedDf(Seq((1L, 2L), (2L, 3L)), Seq.empty), prefix, 0L)
    MixedIngest.mergeBatch(feedDf(Seq((5L, 6L)), Seq(1L)), prefix, 1L)
    // an attached ACTIVE stream blocks manual compaction (verdict r13
    // item 3: a replay delivered concurrently would silently discard the
    // fold — so the fold must not start)
    val stub = new StubQuery
    MixedIngest.attach(prefix, stub)
    val e = intercept[IllegalStateException](MixedIngest.compact(spark, prefix))
    assert(e.getMessage.contains("attached") && e.getMessage.contains("active"),
      s"wrong refusal: ${e.getMessage}")
    // once the stream stops, the same call proceeds
    stub.stop()
    val preCompact = rows(MixedIngest.current(spark, prefix).get)
    MixedIngest.compact(spark, prefix)
    assert(rows(MixedIngest.current(spark, prefix).get) == preCompact,
      "compaction changed the served view")
    // the OTHER side of the race: the stream crashed before its
    // checkpoint committed batch 1, the operator compacted mid-recovery,
    // and the restart now re-delivers batch 1 — merging would rebuild
    // from the pre-compaction base and silently discard the manual fold,
    // so it must refuse loudly instead
    val e2 = intercept[IllegalStateException] {
      MixedIngest.mergeBatch(feedDf(Seq((5L, 6L)), Seq(1L)), prefix, 1L)
    }
    assert(e2.getMessage.contains("manual compaction"),
      s"wrong refusal: ${e2.getMessage}")
    // genuinely new batches continue over the compacted base
    MixedIngest.mergeBatch(feedDf(Seq((7L, 8L)), Seq.empty), prefix, 2L)
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((2L, 3L), (5L, 6L), (7L, 8L)), Seq.empty),
      "post-compaction delivery diverged")
  }

  test("keep-tombs compaction folds the chain WITHOUT moving the re-admission boundary") {
    reset()
    // chain {1,2,3}, then delete 2 (splits — 1 and 3 drop with it)
    MixedIngest.mergeBatch(feedDf(Seq((1L, 2L), (2L, 3L)), Seq.empty), prefix, 0L)
    MixedIngest.mergeBatch(feedDf(Seq.empty, Seq(2L)), prefix, 1L)
    val expectPre = expect(Seq((1L, 2L), (2L, 3L)), Seq(2L))
    assert(rows(MixedIngest.current(spark, prefix).get) == expectPre)
    MixedIngest.compact(spark, prefix, keepTombs = true)
    // view bit-identical, chain folded to a single base — but the
    // tombstone CARRIED FORWARD (the r14 fold reset it, which is why
    // chain bounding couldn't default on)
    assert(rows(MixedIngest.current(spark, prefix).get) == expectPre,
      "keep-tombs compaction changed the served assignment")
    val vers = MixedIngest.committedFull(spark, prefix)
    assert(graft.streaming.VersionChain.chain(vers, vers.last).size == 1,
      s"keep-tombs compaction did not fold the chain: $vers")
    val (_, _, tombs) = MixedIngest.currentState(spark, prefix).get
    assert(tombs.collect().map(_.getLong(0)).toSet == Set(2L),
      "keep-tombs compaction dropped the tombstones")
    // the boundary test: an edge to the deleted doc arriving AFTER the
    // fold is STILL suppressed — exactly as if no fold had run
    MixedIngest.mergeBatch(feedDf(Seq((2L, 10L)), Seq.empty), prefix, 2L)
    assert(rows(MixedIngest.current(spark, prefix).get) == expectPre,
      "keep-tombs fold moved the re-admission boundary")
    // only a tombstone-DROPPING fold re-opens re-entry
    MixedIngest.compact(spark, prefix)
    MixedIngest.mergeBatch(feedDf(Seq((2L, 11L)), Seq.empty), prefix, 3L)
    assert(rows(MixedIngest.current(spark, prefix).get)
      .exists(_._1 == 2L), "post-reset re-entry should admit the doc again")
  }

  test("an un-optioned stream bounds its version chain by default, boundary intact") {
    reset()
    sys.props("graft.mixed.autoCompactChainDefault") = "2"
    try {
      // four single-file micro-batches with NO options set: the default
      // chain bound (2 here via the test prop; 32 in production) triggers
      // keep-tombs folds mid-stream, so the chain stays short while the
      // takedown keeps suppressing edges that arrive after the folds
      // (verdict r14 item 1 done-criteria b: bounded chain, no options)
      feedDf(Seq((1L, 2L), (2L, 3L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w1")
      feedDf(Seq.empty, Seq(2L)).coalesce(1).write.parquet(s"$inbox/w2")
      feedDf(Seq((2L, 9L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w3")
      feedDf(Seq((5L, 6L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w4")
      ingestAvailable()
      val adds = Seq((1L, 2L), (2L, 3L), (2L, 9L), (5L, 6L))
      assert(rows(MixedIngest.current(spark, prefix).get) ==
        expect(adds, Seq(2L)),
        "default chain bounding diverged from the closure (boundary moved?)")
      val (_, _, tombs) = MixedIngest.currentState(spark, prefix).get
      assert(tombs.collect().map(_.getLong(0)).toSet == Set(2L),
        "default chain bounding dropped tombstones")
      val vers = MixedIngest.committedFull(spark, prefix)
      assert(graft.streaming.VersionChain.chain(vers, vers.last).size <= 2,
        s"un-optioned stream accumulated an unbounded chain: $vers")
    } finally sys.props.remove("graft.mixed.autoCompactChainDefault")
  }

  test("legacy pre-delta-layout versions keep serving; takedowns over them refuse loudly") {
    reset()
    import spark.implicits._
    // hand-write the PRE-r14 layout: a full-snapshot assignment `_v0` with
    // an n-only meta — no parent/kind/upto columns, no _e/_d state tables
    // (ADVICE r14 medium: the state-table existence filter silently
    // dropped these committed versions, so a resumed stream rebuilt the
    // maintained view from an empty base)
    val legacyAssign = DedupOps.componentsOver(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2"))
    legacyAssign.write.format("parquet").saveAsTable(s"${prefix}_v0")
    legacyAssign.agg(count(lit(1)).as("n"))
      .write.format("parquet").saveAsTable(s"${prefix}_v0_meta")
    MixedIngest.invalidateCursor(spark, prefix)
    // the committed listing must SEE the legacy version (as a base)…
    assert(MixedIngest.committedVersions(spark, prefix).map(_._1) == Seq(0L),
      "legacy full-snapshot version was filtered out of the committed list")
    // …and the served view must be the legacy assignment, not empty
    assert(rows(MixedIngest.current(spark, prefix).get) == rows(legacyAssign),
      "legacy view lost after upgrade — the silent-loss ADVICE r14 bug")
    // the OTHER silent-loss door: a fresh checkpoint delivering batchId ==
    // the legacy upto would rebuild from an empty base (no committed
    // version strictly below it) and GC would fold the legacy snapshot
    // away; with no stamp to validate the replay claim against, the merge
    // must refuse — and must NOT leave a stamp behind that would poison a
    // later legitimate resume
    val eFresh = intercept[IllegalStateException] {
      MixedIngest.mergeBatch(feedDf(Seq((7L, 8L)), Seq.empty), prefix, 0L,
        ckpt = Some("/tmp/some-fresh-ckpt"))
    }
    assert(eFresh.getMessage.contains("no checkpoint stamp"),
      s"wrong refusal: ${eFresh.getMessage}")
    assert(!spark.catalog.tableExists(s"${prefix}_ckptstamp"),
      "refused fresh-checkpoint delivery left a stamp behind")
    assert(rows(MixedIngest.current(spark, prefix).get) == rows(legacyAssign),
      "refused delivery damaged the legacy view")
    // adds merge onto the legacy base exactly like any other chain
    MixedIngest.mergeBatch(feedDf(Seq((3L, 4L)), Seq.empty), prefix, 1L)
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 4L)), Seq.empty),
      "merge over a legacy base diverged")
    // a takedown needs the chain's full edge history, which the legacy
    // layout never persisted — refuse loudly, never recompute silently
    val e = intercept[IllegalStateException] {
      MixedIngest.mergeBatch(feedDf(Seq.empty, Seq(2L)), prefix, 2L)
    }
    assert(e.getMessage.contains("pre-delta-layout"),
      s"wrong refusal: ${e.getMessage}")
    // the taint survives a fold: compaction folds the legacy base away,
    // but the folded edge set still misses the pre-upgrade edges
    MixedIngest.compact(spark, prefix)
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 4L)), Seq.empty),
      "compaction over a legacy chain changed the view")
    val e2 = intercept[IllegalStateException] {
      MixedIngest.mergeBatch(feedDf(Seq.empty, Seq(2L)), prefix, 2L)
    }
    assert(e2.getMessage.contains("pre-delta-layout"),
      s"taint must survive the fold: ${e2.getMessage}")
    // adds still flow after the fold
    MixedIngest.mergeBatch(feedDf(Seq((11L, 12L)), Seq.empty), prefix, 2L)
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 4L), (11L, 12L)),
        Seq.empty))
  }

  test("compact sweeps orphan tables a torn GC stranded") {
    reset()
    import spark.implicits._
    MixedIngest.mergeBatch(feedDf(Seq((1L, 2L)), Seq.empty), prefix, 0L)
    MixedIngest.mergeBatch(feedDf(Seq((3L, 4L)), Seq.empty), prefix, 1L)
    // strand (a) data tables with no meta — the crash window between GC's
    // meta drop and its data-table drops (verdict r14 minor), and (b) a
    // new-layout meta whose state tables are gone — the opposite tear.
    // Strand numbers sit BELOW the committed tip, as every real torn-GC
    // strand does (GC only ever drops versions outside the keep set, and
    // the tip is always kept)
    Seq((97L, 98L)).toDF("id1", "id2").write.format("parquet")
      .saveAsTable(s"${prefix}_e3")
    Seq(99L).toDF("doc_id").write.format("parquet")
      .saveAsTable(s"${prefix}_d3")
    Seq((96L, 0L, -1L, "delta")).toDF("n", "upto", "parent", "kind")
      .write.format("parquet").saveAsTable(s"${prefix}_v4_meta")
    // and (d) an ABOVE-TIP strand with the exact shape of another driver's
    // in-flight commit (state tables written, _meta not yet landed): the
    // sweep must never touch it (ADVICE r15 — cross-driver concurrency on
    // a prefix is unsupported, but the sweep must not convert it into
    // silent data deletion when that driver's _meta then lands)
    Seq((77L, 78L)).toDF("id1", "id2").write.format("parquet")
      .saveAsTable(s"${prefix}_e97")
    Seq(79L).toDF("doc_id").write.format("parquet")
      .saveAsTable(s"${prefix}_d97")
    DedupOps.componentsOver(Seq((77L, 78L)).toDF("id1", "id2"))
      .write.format("parquet").saveAsTable(s"${prefix}_v97")
    // and (c) a COMMITTED version written out-of-API while the catalog
    // cursor is populated and stale — the sweep must derive its committed
    // set from a fresh listing, never the cursor, or this version's
    // tables would be DROPPED (a deletion decision over a read cache)
    val v5assign = DedupOps.componentsOver(
      Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2"))
    v5assign.write.format("parquet").saveAsTable(s"${prefix}_v5")
    Seq.empty[(Long, Long)].toDF("id1", "id2").write.format("parquet")
      .saveAsTable(s"${prefix}_e5")
    Seq.empty[Long].toDF("doc_id").write.format("parquet")
      .saveAsTable(s"${prefix}_d5")
    Seq((4L, 5L, -1L, "base", false)).toDF("n", "upto", "parent", "kind", "taint")
      .write.format("parquet").saveAsTable(s"${prefix}_v5_meta")
    val committed = MixedIngest.committedVersions(spark, prefix).map(_._3)
    MixedIngest.compact(spark, prefix)
    Seq(s"${prefix}_e3", s"${prefix}_d3", s"${prefix}_v4_meta").foreach(t =>
      assert(!spark.catalog.tableExists(t), s"orphan $t not swept"))
    Seq(s"${prefix}_v5", s"${prefix}_v5_meta", s"${prefix}_e5",
        s"${prefix}_d5").foreach(t =>
      assert(spark.catalog.tableExists(t),
        s"sweep dropped committed out-of-API version table $t (stale cursor)"))
    Seq(s"${prefix}_v97", s"${prefix}_e97", s"${prefix}_d97").foreach(t =>
      assert(spark.catalog.tableExists(t),
        s"sweep dropped above-tip in-flight-shaped table $t"))
    // the served view and its committed tables survive the sweep
    assert(rows(MixedIngest.current(spark, prefix).get) ==
      expect(Seq((1L, 2L), (3L, 4L)), Seq.empty),
      "orphan sweep damaged the served view")
    assert(committed.nonEmpty)
  }

  test("autoCompactChain = Some(0) disables chain folding (full history retained)") {
    reset()
    sys.props("graft.mixed.autoCompactChainDefault") = "1"
    try {
      val schema = feedDf(Seq((0L, 1L)), Seq(2L)).schema
      feedDf(Seq((1L, 2L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w1")
      feedDf(Seq((3L, 4L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w2")
      feedDf(Seq((5L, 6L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w3")
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(inbox)
      MixedIngest.start(stream, prefix, ckpt, autoCompactChain = Some(0))
        .awaitTermination()
      val vers = MixedIngest.committedFull(spark, prefix)
      assert(graft.streaming.VersionChain.chain(vers, vers.last).size == 3,
        s"Some(0) should disable chain folding, got $vers")
      assert(vers.forall(v => v.kind == "base" || v.kind == "delta"),
        s"unasked fold ran under Some(0): $vers")
      assert(rows(MixedIngest.current(spark, prefix).get) ==
        expect(Seq((1L, 2L), (3L, 4L), (5L, 6L)), Seq.empty))
    } finally sys.props.remove("graft.mixed.autoCompactChainDefault")
  }

  test("adopt asserts identity for a wedged stampless-legacy boundary replay") {
    reset()
    import spark.implicits._
    // a stampless legacy view whose original checkpoint crashed between
    // the first batch's commit and its offset commit: the checkpoint
    // re-delivers batchId == upto forever (ADVICE r15 low 2 — the old
    // refusal advised "resume from the original checkpoint", which is
    // exactly what is failing)
    val legacyAssign = DedupOps.componentsOver(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2"))
    legacyAssign.write.format("parquet").saveAsTable(s"${prefix}_v0")
    legacyAssign.agg(count(lit(1)).as("n"))
      .write.format("parquet").saveAsTable(s"${prefix}_v0_meta")
    MixedIngest.invalidateCursor(spark, prefix)
    val replay = feedDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq.empty)
    val e = intercept[IllegalStateException] {
      MixedIngest.mergeBatch(replay, prefix, 0L, ckpt = Some(s"$ckpt/orig"))
    }
    // the boundary case names the exits that actually work
    assert(e.getMessage.contains("adopt") &&
      e.getMessage.contains("cannot help here"),
      s"boundary refusal should name adopt, got: ${e.getMessage}")
    // the operator asserts identity; the replay then proceeds and
    // converges to the batch closure (the exact content the original
    // delivery committed)
    MixedIngest.adopt(spark, prefix, s"$ckpt/orig")
    MixedIngest.mergeBatch(replay, prefix, 0L, ckpt = Some(s"$ckpt/orig"))
    assert(rows(MixedIngest.current(spark, prefix).get) == rows(legacyAssign),
      "adopted boundary replay diverged from the legacy content")
    // a DIFFERENT checkpoint still cannot take the view over
    val e2 = intercept[Exception] {
      MixedIngest.mergeBatch(replay, prefix, 0L, ckpt = Some("/tmp/other"))
    }
    assert(e2.getMessage.contains("was built from checkpoint"),
      s"stamp guard lost after adopt: ${e2.getMessage}")
    // and adopt itself never re-points a stamped view
    val e3 = intercept[IllegalArgumentException] {
      MixedIngest.adopt(spark, prefix, "/tmp/other")
    }
    assert(e3.getMessage.contains("never re-points"),
      s"adopt re-pointed a stamped view: ${e3.getMessage}")
  }

  test("adopt refuses a prefix with no committed versions (typo guard)") {
    reset()
    // a stamp created for a nonexistent view (mistyped prefix, wrong
    // session) would silently poison a later legitimate build on that
    // name — its first delivery would hit the stamp guard and wedge
    val e = intercept[IllegalArgumentException] {
      MixedIngest.adopt(spark, s"${prefix}_typo", s"$ckpt/orig")
    }
    assert(e.getMessage.contains("no committed versions"),
      s"adopt should refuse an empty prefix, got: ${e.getMessage}")
    assert(!spark.catalog.tableExists(s"${prefix}_typo_ckptstamp"),
      "refused adopt must not leave a stamp behind")
  }

  test("registries are keyed by (applicationId, prefix), shared by sibling sessions") {
    reset()
    // the key discipline matches VersionChain's cursor exactly (verdict
    // r15 item 3): a restarted SparkContext (new applicationId) can never
    // alias a dead context's registry entries for a same-named prefix...
    val appId = spark.sparkContext.applicationId
    assert(MixedIngest.registryKey(spark, "MiXeD") == s"$appId#mixed")
    // ...while sessions SHARING a context share the key on purpose — they
    // share the external catalog, so a guard/listener must bleed across
    // them (same warehouse, same maintained view)
    val sibling = spark.newSession()
    assert(MixedIngest.registryKey(sibling, "mixed") ==
      MixedIngest.registryKey(spark, "mixed"))
    val fired = new java.util.concurrent.atomic.AtomicLong
    MixedIngest.onCommit(spark, prefix)((_, _) => { fired.incrementAndGet(); () })
    try {
      assert(MixedIngest.hasOnCommit(sibling, prefix),
        "sibling session cannot see the shared-context listener")
      // a commit run through the SIBLING session invokes the listener
      // registered through the original one
      val siblingFeed = {
        import sibling.implicits._
        Seq(("add", 1L, 2L)).toDF("op", "id1", "id2")
      }
      MixedIngest.mergeBatch(siblingFeed, prefix, 0L)
      assert(fired.get() == 1L,
        "commit through a sibling session missed the shared listener")
    } finally MixedIngest.clearOnCommit(spark, prefix)
  }

  test("a re-attached query survives a stale termination reap (value-conditional removal)") {
    reset()
    val schema = feedDf(Seq((0L, 1L)), Seq.empty).schema
    // q1: drained AvailableNow stream — terminated
    feedDf(Seq((1L, 2L)), Seq.empty).coalesce(1).write.parquet(s"$inbox/w1")
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(inbox)
    val q1 = MixedIngest.start(stream, prefix, ckpt)
    q1.awaitTermination()
    // q2: a live query re-attached under the same prefix (the serving
    // window ADVICE r15 medium describes: stale terminated query read by
    // the reaper, fresh active query put, then the removal runs)
    val q2 = spark.readStream.format("rate").option("rowsPerSecond", "1")
      .load().writeStream.format("noop")
      .option("checkpointLocation", s"$ckpt-rate").start()
    try {
      MixedIngest.attach(prefix, q2)
      // a stale termination event for q1 must NOT evict q2 — removal is
      // conditional on the entry still holding the terminated query
      MixedIngest.reap(q1.runId)
      assert(MixedIngest.attachedQuery(spark, prefix).contains(q2),
        "stale termination reap evicted the freshly re-attached query")
      // with q2 attached and active, manual compaction refuses (guard
      // intact through the reap)
      intercept[IllegalStateException] {
        MixedIngest.compact(spark, prefix)
      }
    } finally {
      q2.stop()
      MixedIngest.reap(q2.runId)
    }
  }

  test("the shuffle anti-join path (tombstones past the broadcast limit) matches") {
    reset()
    sys.props("graft.mixed.tombBroadcastLimit") = "1"
    try {
      // two deletes push the accumulated set past the limit=1 → the
      // per-batch anti-joins take the non-broadcast path; the closure
      // must not notice
      val dels = Seq(allAdds(2)._1, allAdds(9)._2)
      MixedIngest.mergeBatch(feedDf(allAdds.take(30), dels), prefix, 0L)
      MixedIngest.mergeBatch(feedDf(allAdds.drop(30), Seq.empty), prefix, 1L)
      assert(rows(MixedIngest.current(spark, prefix).get) ==
        expect(allAdds, dels),
        "shuffle-anti-join tombstone path diverged from the closure")
    } finally sys.props.remove("graft.mixed.tombBroadcastLimit")
  }
}
