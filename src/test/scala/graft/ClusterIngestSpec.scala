package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DedupOps
import graft.streaming.ClusterIngest

/** The streaming cluster-maintenance sink
  * ([[graft.streaming.ClusterIngest]]): candidate pairs arriving in
  * micro-batches are folded into a versioned assignment table via the
  * delta-sized label-graph merge, and the maintained view must be
  * bit-identical to the one-shot batch fixpoint over ALL edges — no
  * matter how the stream was chunked, across restarts, under replay of a
  * committed batch, and after a crash that tears a version mid-write.
  */
class ClusterIngestSpec extends SparkSpec {

  private val prefix = "clingest"
  private val ckpt = "/tmp/graft-clingest-ckpt"
  private val inbox = "/tmp/graft-clingest-inbox"

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

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("id1", "id2")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Boolean)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sorted

  // a seeded random graph with enough cross-batch merges to exercise the
  // label-graph path: later batches bridge components formed by earlier ones
  private val rnd = new scala.util.Random(7)
  private val allEdges: Seq[(Long, Long)] =
    Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
  private val thirds = allEdges.grouped((allEdges.size + 2) / 3).toSeq

  private def ingestAvailable(): Unit = {
    val schema = edgesDf(Seq((0L, 1L))).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inbox)
    ClusterIngest.start(stream, prefix, ckpt).awaitTermination()
  }

  test("drained sink == one-shot batch fixpoint, across batches, restarts, replay, and a torn version") {
    Seq(ckpt, inbox).foreach(rmrf)
    dropPrefixTables()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))

    // wave 1: two files → two micro-batches in one AvailableNow run
    edgesDf(thirds(0)).coalesce(1).write.parquet(s"$inbox/w1")
    edgesDf(thirds(1)).coalesce(1).write.parquet(s"$inbox/w2")
    ingestAvailable()
    val after2 = ClusterIngest.current(spark, prefix)
    assert(after2.isDefined, "no committed assignment after wave 1")
    assert(rows(after2.get) ==
      rows(DedupOps.componentsOver(edgesDf(thirds(0) ++ thirds(1)))),
      "wave-1 assignment != batch fixpoint over the first two batches")

    // wave 2 (a RESTART: same checkpoint, new file): batchIds continue
    edgesDf(thirds(2)).coalesce(1).write.parquet(s"$inbox/w3")
    ingestAvailable()
    val expectAll = rows(DedupOps.componentsOver(edgesDf(allEdges)))
    assert(rows(ClusterIngest.current(spark, prefix).get) == expectAll,
      "drained assignment != batch fixpoint over all edges")

    // GC under the delta layout: every version is a link in the serving
    // chain (base + one delta per batch) — nothing is droppable until a
    // replay supersedes a link or compaction folds the chain
    val vers = ClusterIngest.committedVersions(spark, prefix)
    assert(vers.size == 3, s"expected base + two delta versions, found $vers")
    val (newestV, newestUpto, _) = vers.last

    // REPLAY of the committed newest batch (at-least-once re-delivery):
    // must rebuild the same state from its predecessor into a FRESH
    // version (committed versions are never overwritten in place), after
    // which GC folds the superseded same-batch link out of the chain. A
    // replay carries the SAME checkpoint identity as the original
    // delivery — the stamp guard covers direct calls too (ADVICE r11).
    ClusterIngest.mergeBatch(edgesDf(thirds(2)), prefix, newestUpto,
      ckpt = Some(ckpt))
    assert(rows(ClusterIngest.current(spark, prefix).get) == expectAll,
      "replayed batch corrupted the maintained assignment")
    val replayed = ClusterIngest.committedVersions(spark, prefix)
    assert(replayed.size == 3 && replayed.last._1 > newestV &&
      replayed.last._2 == newestUpto && !replayed.exists(_._1 == newestV),
      s"replay should supersede the same-batch link: $vers -> $replayed")

    // TORN version: crash after the data write, before the meta commit —
    // the torn version must be invisible (this also exercises the catalog
    // cursor's staleness probe: the meta drop happens OUTSIDE the sink
    // API, and the cursor must notice rather than serve the stale list),
    // and replay must complete it
    spark.sql(s"DROP TABLE IF EXISTS ${replayed.last._3}_meta")
    assert(ClusterIngest.committedVersions(spark, prefix).size == 2,
      "torn version still counted as committed")
    ClusterIngest.mergeBatch(edgesDf(thirds(2)), prefix, newestUpto,
      ckpt = Some(ckpt))
    assert(rows(ClusterIngest.current(spark, prefix).get) == expectAll,
      "replay after torn write did not converge")

    // COMPACTION folds the chain to a single base version without
    // changing the served view; the next delivery chains onto the new
    // base and GC can finally drop the whole pre-compaction chain (only
    // the replay-base discipline kept it alive until now)
    ClusterIngest.compact(spark, prefix)
    assert(rows(ClusterIngest.current(spark, prefix).get) == expectAll,
      "compaction changed the served assignment")
    ClusterIngest.mergeBatch(edgesDf(Seq((100L, 101L))), prefix,
      newestUpto + 1, ckpt = Some(ckpt))
    assert(rows(ClusterIngest.current(spark, prefix).get) ==
      rows(DedupOps.componentsOver(edgesDf(allEdges :+ (100L, 101L)))),
      "post-compaction delivery diverged")
    val postCompact = ClusterIngest.committedVersions(spark, prefix)
    assert(postCompact.size == 2,
      s"pre-compaction chain should be GC'd once unreachable: $postCompact")
  }

  test("checkpoint/prefix mismatch fails loudly instead of serving stale state") {
    Seq(ckpt, inbox).foreach(rmrf)
    dropPrefixTables()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    edgesDf(thirds(0)).coalesce(1).write.parquet(s"$inbox/w1")
    edgesDf(thirds(1)).coalesce(1).write.parquet(s"$inbox/w2")
    ingestAvailable() // commits versions 0 and 1
    // a FRESH checkpoint over the same prefix restarts batch ids at 0 —
    // before the guard, mergeBatch(0) merged against no base while gc kept
    // the stale higher-numbered versions: current() silently served old
    // state. Now it must refuse (ADVICE r10).
    val maxUpto = ClusterIngest.committedVersions(spark, prefix).last._2
    assert(maxUpto >= 1, "test setup: expected two committed batches")
    val e = intercept[IllegalArgumentException] {
      ClusterIngest.mergeBatch(edgesDf(thirds(2)), prefix, 0L)
    }
    assert(e.getMessage.contains("below the newest incorporated batch"),
      s"wrong failure: ${e.getMessage}")
    // the DIRECT path is stamped too (ADVICE r11): an ordering-legal direct
    // delivery against a stream-built prefix is a different identity and
    // must be refused — previously it bypassed the stamp entirely
    val eDirect = intercept[IllegalArgumentException] {
      ClusterIngest.mergeBatch(edgesDf(thirds(2)), prefix, maxUpto + 1)
    }
    assert(eDirect.getMessage.contains("fresh checkpoint over an existing view"),
      s"wrong failure: ${eDirect.getMessage}")
    // the ordering guard alone cannot catch batch 0 arriving at a
    // single-version prefix (0 >= 0 passes) — stream-attached deliveries
    // stamp the prefix with their checkpoint location and must refuse a
    // delivery from any other checkpoint, even one the ordering allows
    val e2 = intercept[IllegalArgumentException] {
      ClusterIngest.mergeBatch(edgesDf(thirds(2)), prefix, maxUpto + 1,
        ckpt = Some("/tmp/some-other-checkpoint"))
    }
    assert(e2.getMessage.contains("fresh checkpoint over an existing view"),
      s"wrong failure: ${e2.getMessage}")
    // the ORIGINAL checkpoint keeps working after the refused delivery
    ClusterIngest.mergeBatch(edgesDf(thirds(2)), prefix, maxUpto + 1,
      ckpt = Some(ckpt))
    assert(ClusterIngest.committedVersions(spark, prefix).last._2 == maxUpto + 1,
      "legitimate delivery after a refused mismatch did not commit")
  }

  test("batch-boundary independence: a different split converges to the same assignment") {
    Seq(ckpt, inbox).foreach(rmrf)
    dropPrefixTables()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inbox))
    // one edge per file for the first six edges, the rest in one file —
    // a maximally different chunking from the thirds split above
    allEdges.take(6).zipWithIndex.foreach { case (e, i) =>
      edgesDf(Seq(e)).coalesce(1).write.parquet(s"$inbox/e$i")
    }
    edgesDf(allEdges.drop(6)).coalesce(1).write.parquet(s"$inbox/rest")
    ingestAvailable()
    assert(rows(ClusterIngest.current(spark, prefix).get) ==
      rows(DedupOps.componentsOver(edgesDf(allEdges))),
      "split-independent convergence violated")
  }
}
