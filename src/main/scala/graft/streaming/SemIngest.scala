package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time SEMANTIC dedup — the streaming lift of the batch SemDeDup
  * pass ([[graft.functions.SimilarityOps.semDedup]]), exactly as
  * [[IngestDedup]] lifts the batch MinHash-LSH pipeline: as vectors
  * ARRIVE, each is assigned to its IVF cell and compared against the
  * cell's already-ingested members, emitting τ-near pairs immediately —
  * the admission-time form of semantic dedup a production corpus pipeline
  * runs at the front door.
  *
  * Two stages, both value-identical to the batch path (spec-asserted in
  * `SemIngestSpec` — streaming and batch verdicts cannot drift):
  *
  *  1. '''Stateless assignment''' ([[assignedStream]]): nearest-centroid
  *     cell computed ROW-LOCALLY against a broadcast-sized static centroid
  *     list (the same ~|cells| rows the batch path broadcasts). Scoring
  *     mirrors the codegen cosine fold and the batch DECIMAL(12,8)
  *     half-even rounding + low-label tie-break bit-for-bit, so the
  *     streaming cell equals the batch cell for every vector. No shuffle.
  *  2. '''Stateful cell index''' ([[pairStream]]):
  *     `flatMapGroupsWithState` keyed by cell. State per cell is the list
  *     of previously-admitted (vec_id, vector) members; a new arrival
  *     emits one [[Pair]] per τ-near member and joins the cell.
  *     Re-delivered vec_ids are ignored (replay-idempotent, the P4
  *     offset-dedup discipline). A fully-drained stream's pair set equals
  *     batch [[graft.functions.SimilarityOps.semDedupPairs]] regardless
  *     of micro-batch boundaries.
  *
  * State-size discipline: unlike the MinHash index (64 B signatures), a
  * semantic index must keep the VECTORS themselves (256 B for 64-dim
  * float) — this is the per-executor RocksDB-backed cell index, sharded
  * by the same cell id the stored batch layout partitions by
  * ([[graft.functions.SimilarityOps.writeCellIndex]]). |cell| stays
  * bounded by the k ∝ N dial (see semDedup's Scaladoc), which bounds both
  * state size and per-arrival compare cost.
  */
object SemIngest {

  /** An arriving vector with its row-locally computed cell. */
  case class Assigned(vecId: Long, cell: Int, v: Seq[Float])

  /** A τ-near pair: earlier-admitted id1 < id2, exact rounded cosine. */
  case class Pair(id1: Long, id2: Long, cos: Double)

  /** Half-even round to 8 dp — the Scala mirror of `bround(x, 8)` (Spark
    * routes doubles through `BigDecimal.valueOf`, i.e. the canonical
    * string representation, so `valueOf` here is the bit-exact match).
    */
  private def round8(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_EVEN).doubleValue

  /** Bit-exact mirror of the codegen cosine fold
    * ([[graft.functions.VectorExpressions.CosineSim]]): sequential
    * left-to-right accumulation, float operands widened per element.
    * Returns -2.0 (below any true cosine) for a zero-norm operand, where
    * the native expression returns null — both sort/filter identically.
    */
  private def cosineDF(c: Seq[Double], v: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(c.length, v.length)
    while (i < n) {
      val x = c(i); val y = v(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cosineFF(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The row-local argmax EVERY descent level runs: candidates
    * pre-sorted ASCENDING by id, max rounded score, strict `>` so ties
    * keep the LOW id — the bit-exact mirror of the batch window argmax
    * (score desc, id asc, rank 1). ONE body shared by the label, tile,
    * branch, and branch-tile probes so a change to the rounding or tie
    * rule can never desynchronize a subset of the spec-pinned
    * streaming==batch assignment equalities. Int.MaxValue when `cands`
    * is empty — callers decide whether that is an error.
    */
  private def nearest(cands: Seq[(Int, Seq[Double])], v: Seq[Float]): Int = {
    var bestId = Int.MaxValue
    var best = -3.0
    cands.foreach { case (i, c) =>
      val s = round8(cosineDF(c, v))
      if (s > best) { best = s; bestId = i }
    }
    bestId
  }

  /** Row-local nearest-centroid assignment of a (vec_id, embedding)
    * stream. `centroids` is the static side input — collect it from
    * [[graft.functions.SimilarityOps.centroidVectors]] (broadcast-sized:
    * one (label, vector) per cell). Mirrors the batch ranking exactly:
    * max rounded score, ties to the lower label.
    */
  def assignedStream(vecs: DataFrame,
                     centroids: Seq[(Int, Seq[Double])]): Dataset[Assigned] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents = centroids.sortBy(_._1)
    vecs.selectExpr("vec_id", "embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => Assigned(id, nearest(cents, v), v) }
  }

  /** An arriving vector with its row-locally computed SCALED cell —
    * (label cell, sub-centroid tile), the k ∝ N quantizer
    * ([[graft.functions.SimilarityOps.scaledAssignment]]). */
  case class ScaledAssigned(vecId: Long, cell: Int, tile: Int, v: Seq[Float])

  /** Row-local SCALED assignment of a (vec_id, embedding) stream — the
    * hierarchical probe: nearest label centroid (~|labels| cosines), then
    * nearest of THAT label's sub-centroids (~|label's tiles| cosines).
    * `subCents` maps each label to its (tile, sub-centroid) list — collect
    * it from [[graft.functions.SimilarityOps.scaledCentroidVectors]]
    * (broadcast-sized: k ∝ N rows of 64 doubles). Mirrors the batch
    * reassignment exactly: max rounded score, ties to the lower tile — so
    * the streaming scaled cell equals the batch one for every vector.
    * Because the scaled cell is defined purely by this centroid list, the
    * per-arrival assignment cost is independent of how many vectors have
    * already been admitted — the property the fixed-k path lacked.
    */
  def scaledAssignedStream(vecs: DataFrame,
      labelCents: Seq[(Int, Seq[Double])],
      subCents: Map[Int, Seq[(Int, Seq[Double])]]): Dataset[ScaledAssigned] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val subsSorted = subCents.map { case (l, ts) => l -> ts.sortBy(_._1) }
    assignedStream(vecs, labelCents).map { a =>
      // a label with no sub-centroids means the arrival's nearest label
      // had zero members in the seeding corpus — emitting a fabricated
      // (cell, MaxValue) state group the batch twin can never produce
      // would diverge SILENTLY; fail the stream loudly instead
      val tiles = subsSorted.getOrElse(a.cell,
        throw new IllegalStateException(
          s"SemIngest.scaledAssignedStream: arrival ${a.vecId} assigned " +
            s"to label cell ${a.cell} which has no sub-centroids (label " +
            "absent from the seeding corpus) — rebuild the quantizer over " +
            "a corpus covering every label before streaming"))
      ScaledAssigned(a.vecId, a.cell, nearest(tiles, a.v), a.v)
    }
  }

  /** An arriving vector with its TREE-probed cell: label → nearest
    * branch centroid → nearest tile within the branch
    * ([[graft.functions.SimilarityOps.treeAssignment]]). */
  case class TreeAssigned(vecId: Long, cell: Int, branch: Int, tile: Int,
                          v: Seq[Float])

  /** Row-local TREE assignment of a (vec_id, embedding) stream — the
    * log-depth probe: ~|labels| cosines, then ~√T against the label's
    * branch centroids, then ≤⌈√T⌉ against the chosen branch's tile
    * sub-centroids. Collect both probe structures from
    * [[graft.functions.SimilarityOps.treeProbeStructures]] (broadcast-
    * sized). Mirrors the batch descent exactly: max rounded score at
    * each level, ties to the lower id — so the streaming (cell, tile)
    * equals the batch one for every vector, at ~2√T per-arrival cost
    * instead of the flat form's T.
    */
  def treeAssignedStream(vecs: DataFrame,
      labelCents: Seq[(Int, Seq[Double])],
      branchCents: Map[Int, Seq[(Int, Seq[Double])]],
      tilesByBranch: Map[(Int, Int), Seq[(Int, Seq[Double])]])
      : Dataset[TreeAssigned] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bSorted = branchCents.map { case (c, bs) => c -> bs.sortBy(_._1) }
    val tSorted = tilesByBranch.map { case (k, ts) => k -> ts.sortBy(_._1) }
    assignedStream(vecs, labelCents).map { a =>
      // same loud-failure discipline as scaledAssignedStream: a missing
      // probe level means the label (or its probed branch) was absent
      // from the seeding corpus — never fabricate a state cell
      def missing(what: String): Nothing =
        throw new IllegalStateException(
          s"SemIngest.treeAssignedStream: arrival ${a.vecId} assigned to " +
            s"label cell ${a.cell} whose $what is absent from the probe " +
            "structures — rebuild the quantizer over a corpus covering " +
            "every label before streaming")
      val branch = nearest(
        bSorted.getOrElse(a.cell, missing("branch list")), a.v)
      val tile = nearest(
        tSorted.getOrElse((a.cell, branch), missing(s"branch $branch tile list")),
        a.v)
      TreeAssigned(a.vecId, a.cell, branch, tile, a.v)
    }
  }

  /** [[pairStream]] under the TREE probe: the same bounded (cell, tile)
    * state as [[scaledPairStream]], reached at log-depth assignment
    * cost. A fully drained stream's pair set equals the batch tree pair
    * enumeration (the edge set [[graft.functions.SimilarityOps
    * .treePairRecall]] compares against the flat form). */
  def treePairStream(vecs: DataFrame,
      labelCents: Seq[(Int, Seq[Double])],
      branchCents: Map[Int, Seq[(Int, Seq[Double])]],
      tilesByBranch: Map[(Int, Int), Seq[(Int, Seq[Double])]],
      minCosine: Double = 0.3): Dataset[Pair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    treeAssignedStream(vecs, labelCents, branchCents, tilesByBranch)
      .groupByKey(a => (a.cell, a.tile))
      .flatMapGroupsWithState[Seq[(Long, Seq[Float])], Pair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        indexFold[(Int, Int), TreeAssigned](_.vecId, _.v, minCosine))
  }

  /** The per-cell index fold EVERY [[pairStream]] variant runs: sort the
    * batch's arrivals (lower vec_id = "earlier" — deterministic batch-
    * internal order, so the drained pair set is batch-boundary
    * independent), skip re-delivered ids (replay-idempotent, the P4
    * offset-dedup discipline), emit one τ-near [[Pair]] per
    * already-admitted member, admit. ONE body shared by the fixed-k,
    * scaled, and tree-probe paths so a future fix to the replay or
    * ordering discipline can never desynchronize them.
    */
  private def indexFold[K, A](vecId: A => Long, vec: A => Seq[Float],
      minCosine: Double)(
      key: K, rows: Iterator[A],
      state: GroupState[Seq[(Long, Seq[Float])]]): Iterator[Pair] = {
    var seen = state.getOption.getOrElse(Seq.empty)
    val out = Seq.newBuilder[Pair]
    rows.toSeq.sortBy(vecId).foreach { r =>
      val rid = vecId(r)
      if (!seen.exists(_._1 == rid)) {
        val rv = vec(r)
        seen.foreach { case (id, v) =>
          val c = round8(cosineFF(v, rv))
          if (c >= minCosine)
            out += Pair(math.min(id, rid), math.max(id, rid), c)
        }
        seen = seen :+ (rid -> rv)
      }
    }
    state.update(seen)
    out.result().iterator
  }

  /** [[pairStream]] under the SCALED quantizer: state is keyed by
    * (cell, tile), so per-cell state size and per-arrival compare cost are
    * bounded by the realized scaled-cell population (~targetCell) instead
    * of growing with the corpus — the streaming fix for the measured
    * fixed-k ceiling (sem_ingest 305 rows/s at sf3 → 60 at sf10). A fully
    * drained stream's pair set equals batch
    * [[graft.functions.SimilarityOps.semDedupPairsScaled]].
    */
  def scaledPairStream(vecs: DataFrame,
      labelCents: Seq[(Int, Seq[Double])],
      subCents: Map[Int, Seq[(Int, Seq[Double])]],
      minCosine: Double = 0.3): Dataset[Pair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    scaledAssignedStream(vecs, labelCents, subCents)
      .groupByKey(a => (a.cell, a.tile))
      .flatMapGroupsWithState[Seq[(Long, Seq[Float])], Pair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        indexFold[(Int, Int), ScaledAssigned](_.vecId, _.v, minCosine))
  }

  /** The online τ-near pair stream (Append mode): for every arriving
    * vector, one [[Pair]] per already-admitted same-cell member with
    * cosine ≥ minCosine. Within a micro-batch, lower vec_id is treated as
    * "earlier" (deterministic batch-internal order), so the drained pair
    * set is batch-boundary independent.
    */
  def pairStream(vecs: DataFrame, centroids: Seq[(Int, Seq[Double])],
                 minCosine: Double = 0.3): Dataset[Pair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    assignedStream(vecs, centroids)
      .groupByKey(_.cell)
      .flatMapGroupsWithState[Seq[(Long, Seq[Float])], Pair](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        indexFold[Int, Assigned](_.vecId, _.v, minCosine))
  }
}
