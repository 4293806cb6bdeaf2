package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DedupOps

/** Differential proof of [[DedupOps.componentsDelta]]: merging a delta edge
  * set into a converged assignment must be bit-identical to re-running the
  * full fixpoint over base ∪ delta — on random graphs with random
  * base/delta splits, and on the adversarial fixtures (component merges,
  * new-node bridges, singleton upgrades, representative takeover,
  * redundant intra-component edges, empty base, empty delta). Plus the
  * plan-shape guarantee the operator exists for: the merge-back never
  * sort-merge-joins or cartesians the base assignment.
  */
class ComponentsDeltaSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("id1", "id2")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Boolean)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sorted

  private def check(base: Seq[(Long, Long)], delta: Seq[(Long, Long)],
                    label: String): Unit = {
    val baseAssign = DedupOps.componentsOver(edgesDf(base)).localCheckpoint()
    val expect = DedupOps.componentsOver(edgesDf(base ++ delta))
    val got = DedupOps.componentsDelta(baseAssign, edgesDf(delta))
    assert(rows(got) == rows(expect), s"$label: delta merge != full fixpoint")
  }

  test("fixtures: every merge topology matches the full fixpoint") {
    // two base components merged by one delta edge
    check(Seq((1L, 2L), (3L, 4L)), Seq((2L, 3L)), "two-component merge")
    // three components bridged transitively through a NEW node 10
    check(Seq((1L, 2L), (3L, 4L), (5L, 6L)), Seq((10L, 2L), (10L, 4L), (10L, 6L)),
      "new-node bridge")
    // singleton upgrade: both endpoints unseen by the base
    check(Seq((1L, 2L)), Seq((7L, 8L)), "unseen pair")
    // representative takeover: new node 0 < every base id becomes the label
    check(Seq((5L, 6L), (7L, 8L)), Seq((0L, 6L), (0L, 8L)), "takeover by min id")
    // redundant delta edge inside one base component: nothing may change
    check(Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L)), "intra-component edge")
    // base-to-base delta edge (legal input class)
    check(Seq((1L, 2L), (4L, 5L)), Seq((2L, 5L)), "base-to-base delta")
    // empty delta: assignment passes through untouched
    check(Seq((1L, 2L), (3L, 4L)), Seq(), "empty delta")
    // empty base: delta-only graph
    check(Seq(), Seq((1L, 2L), (2L, 3L)), "empty base")
    // self-edge on an UNSEEN node: its only delta edge collapses at the
    // l1 =!= l2 filter, so it never enters the label graph — the merge
    // must still emit it as its own singleton, exactly as the full
    // fixpoint does (ADVICE r10)
    check(Seq((1L, 2L)), Seq((9L, 9L)), "unseen self-edge singleton")
    // self-edge on a base member: nothing may change
    check(Seq((1L, 2L)), Seq((2L, 2L)), "base self-edge no-op")
    // unseen self-edge next to a real merge in the same delta
    check(Seq((1L, 2L), (4L, 5L)), Seq((9L, 9L), (2L, 4L)),
      "self-edge singleton + merge")
  }

  test("random graphs: delta merge == full fixpoint on 20 seeded splits") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val n = 12 + rnd.nextInt(20)
      // self-edges (a == b) stay IN: the full fixpoint emits such a node as
      // a singleton, and the merge must match even when the self-edge is
      // the node's only appearance (ADVICE r10's untested input class)
      val all = Seq.fill(6 + rnd.nextInt(25))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val (base, delta) = all.partition(_ => rnd.nextBoolean())
      check(base, delta, s"trial $trial (n=$n, e=${all.size})")
    }
  }

  private def deleteCheck(base: Seq[(Long, Long)], dead: Seq[Long],
                          label: String): Unit = {
    import spark.implicits._
    val baseAssign = DedupOps.componentsOver(edgesDf(base)).localCheckpoint()
    val deadSet = dead.toSet
    val surviving = base.filter { case (a, b) => !deadSet(a) && !deadSet(b) }
    val expect = DedupOps.componentsOver(edgesDf(surviving))
    val got = DedupOps.componentsDeleteDelta(
      baseAssign, dead.toDF("doc_id"),
      members => {
        // stand-in for the stored band index: the FULL edge list pruned to
        // the affected surviving members (both endpoints)
        val m = members.select(col("doc_id").as("mid"))
        edgesDf(base)
          .join(m, col("id1") === col("mid"), "left_semi")
          .join(m.withColumnRenamed("mid", "mid2"),
            col("id2") === col("mid2"), "left_semi")
      })
    assert(rows(got) == rows(expect), s"$label: delete delta != full closure over survivors")
  }

  test("deletion fixtures: splits, relabels, and dropouts match the survivor closure") {
    // bridge deletion SPLITS one component into two
    deleteCheck(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(2L), "bridge split")
    // min-member deletion relabels the survivors
    deleteCheck(Seq((1L, 2L), (2L, 3L)), Seq(1L), "min-label takeover")
    // whole component deleted: vanishes without touching its neighbor
    deleteCheck(Seq((1L, 2L), (5L, 6L)), Seq(1L, 2L), "full-component removal")
    // survivor whose only edges led to deleted docs drops out entirely
    deleteCheck(Seq((1L, 2L), (3L, 4L)), Seq(2L), "edge-less survivor dropout")
    // tombstone of a doc with no edges at all: nothing changes
    deleteCheck(Seq((1L, 2L)), Seq(9L), "no-op tombstone")
    // empty tombstone set: byte-identical passthrough
    deleteCheck(Seq((1L, 2L), (3L, 4L)), Seq(), "empty tombstones")
  }

  test("random graphs: delete delta == survivor closure on 15 seeded trials") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 15) {
      val n = 12 + rnd.nextInt(20)
      val base = Seq.fill(8 + rnd.nextInt(25))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val dead = (0L until n.toLong).filter(_ => rnd.nextInt(5) == 0)
      deleteCheck(base, dead, s"delete trial $trial (n=$n, dead=${dead.size})")
    }
  }

  test("gated query: dedup_clusters_deleted == full closure over survivors at sf0.001") {
    val got = rows(DedupOps.dedupClustersDeleted(spark, sfTiny))
    val expect = rows(DedupOps.componentsOver(
      DedupOps.minhashLsh(spark, sfTiny)
        .filter(!(col("id1") % 37 === 3) && !(col("id2") % 37 === 3))
        .select(col("id1"), col("id2"))))
    assert(got == expect, "deleted view != survivor closure on testdata")
  }

  test("gated query: semantic_clusters_deleted == survivor closure at sf0.001") {
    import graft.functions.SimilarityOps
    val got = rows(SimilarityOps.semanticClustersDeleted(spark, sfTiny))
    val expect = rows(SimilarityOps.semDedupPairs(spark, sfTiny)
      .filter(!(col("id1") % 37 === 3) && !(col("id2") % 37 === 3))
      .select(col("id1"), col("id2"))
      .transform(DedupOps.componentsOver)
      .withColumnRenamed("doc_id", "vec_id"))
    assert(got == expect, "semantic deleted view != survivor closure on testdata")
  }

  test("merge-back plan: no sort-merge join, no cartesian against the base") {
    val baseAssign = DedupOps.componentsOver(
      edgesDf(Seq((1L, 2L), (3L, 4L), (5L, 6L)))).localCheckpoint()
    val out = DedupOps.componentsDelta(baseAssign, edgesDf(Seq((2L, 3L), (10L, 6L))))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"base assignment shuffled:\n$plan")
    assert(!plan.contains("Cartesian"), s"cartesian in merge-back:\n$plan")
  }

  test("gated query: dedup_clusters_delta == dedup_clusters_fresh at sf0.001") {
    val got = rows(DedupOps.dedupClustersDelta(spark, sfTiny))
    val expect = rows(DedupOps.dedupClustersFresh(spark, sfTiny))
    assert(got == expect, "delta-maintained view != full recompute on testdata")
  }

  test("gated query: semantic_clusters_delta == semantic_clusters_fresh at sf0.001") {
    import graft.functions.SimilarityOps
    val got = rows(SimilarityOps.semanticClustersDelta(spark, sfTiny))
    val expect = rows(SimilarityOps.semanticClustersFresh(spark, sfTiny))
    assert(got == expect, "semantic delta view != full recompute on testdata")
  }
}
