package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextAnalysis.{mdhash, tokens, P}

/** CLUSTER maintenance of [[DedupOps]] — connected components over the
  * candidate graph and its incremental forms: the min-label fixpoint
  * ([[DedupOps.componentsOver]]), the add-side label-graph merge
  * ([[DedupOps.componentsDelta]]), the takedown-side component-local
  * recompute ([[DedupOps.componentsDeleteDelta]]), and the memoized
  * view caches. Split out of the monolithic DedupOps by lifecycle
  * (verdict r11 item 7); behavior is byte-identical — every member
  * still lives on the [[DedupOps]] object via mixin.
  */
private[graft] trait DedupClusterMaintenance { self: DedupShingleCore =>

  /** Duplicate clusters: connected components over the MinHash-LSH candidate
    * graph — the "keep one representative per near-dup cluster" step of a
    * corpus-dedup pipeline. Iterative min-label propagation: each round every
    * node takes the minimum label among itself and its neighbors; converges
    * in O(component diameter) rounds (LSH candidate clusters are tight, so
    * a handful). Each round is one join + one aggregate on the EDGE set —
    * the corpus itself is never touched after candidate generation.
    *
    * At 100 TB: the same loop with the edge set partitioned by src (the
    * classic large-star/small-star variant halves rounds); the driver-side
    * convergence check reads a single count per round, not data.
    * Output: one row per clustered doc — cluster id = min doc_id in the
    * component, keep = (doc == representative).
    */
  // cluster assignment is a derived VIEW (like orders_current): memoize the
  // converged fixpoint per (session, dir) — recomputing an iterative
  // algorithm on every read would be wrong at any scale. BOUNDED: at most
  // 4 views stay live (insertion-ordered eviction); an evicted view's
  // checkpoint blocks are released by Spark's ContextCleaner once the
  // DataFrame is unreferenced. BENCH reports this view-read cost under
  // `dedup_clusters` and the un-memoized fixpoint under
  // `dedup_clusters_fresh` — two different numbers on purpose.
  private val clusterCache =
    new BoundedMemo[(SparkSession, String), (DataFrame, DataFrame)](4, _ => ())

  /** The memoized cluster view WITH its edge set: (candidate edges,
    * converged assignment). The edge list is what an incremental cluster
    * maintainer persists alongside the assignment anyway — it is
    * duplicate-bounded (pairs, not corpus), and it is the exact input the
    * takedown path ([[dedupClustersDeleted]]) needs: deletion only REMOVES
    * edges, so the survivor closure's edges are precisely this set minus
    * tombstone-incident rows — no re-shingling, no band probe.
    */
  private[graft] def memoizedClusterState(spark: SparkSession,
                                          dir: String): (DataFrame, DataFrame) =
    clusterCache.getOrBuild((spark, dir)) {
      val edges = minhashLsh(spark, dir)
        .select(col("id1"), col("id2")).localCheckpoint()
      (edges, componentsOver(edges))
    }

  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    memoizedClusterState(spark, dir)._2

  /** Drop every memoized cluster view (e.g. after the underlying corpus
    * changes); checkpoint blocks are reclaimed once unreferenced.
    */
  def invalidateClusterCache(): Unit = {
    clusterCache.invalidate()
    deltaBaseCache.invalidate()
  }

  /** The un-memoized iterative fixpoint — what a first materialization of
    * the cluster view actually costs. Benched as `dedup_clusters_fresh` so
    * the iterative algorithm's number is visible next to the view-read
    * number (`dedup_clusters`); gated by the same transitive-closure oracle.
    */
  def dedupClustersFresh(spark: SparkSession, dir: String): DataFrame =
    componentsOver(minhashLsh(spark, dir).select(col("id1"), col("id2")))

  /** Connected components by min-label propagation + path halving over an
    * undirected (id1, id2) edge list — the shared engine of
    * [[dedupClustersFresh]] (MinHash-LSH edges) and
    * [[graft.functions.SimilarityOps.semanticClusters]] (embedding τ-near
    * edges). Output: (doc_id, cluster_id = min member, cluster_size, keep).
    */
  private[graft] def componentsOver(edges0: DataFrame): DataFrame = {
    // Truncate the INPUT lineage before the loop: a merely-persisted frame
    // still carries its full logical plan into every round's query —
    // analysis, cached-plan canonicalization, and constraint propagation
    // walk the whole upstream tree (cosine joins, broadcast lookups) every
    // round even though execution reads cached blocks. Measured on
    // semantic_clusters_delta at sf0.1: 2.0 s/round with the delta-merge
    // plan hanging under sym vs 0.4 s/round from a leaf. sym itself is
    // then persisted (columnar InMemoryRelation: per-round scans + size
    // stats) over the 3-node leaf plan. At cluster scale use checkpoint()
    // on reliable storage.
    val renamed = edges0.toDF("id1", "id2")
    // skip re-materializing when the caller already handed us a checkpoint
    // leaf (the memoized cluster views checkpoint their edge list for
    // reuse) — a second localCheckpoint would store a full extra copy of
    // the pair list for the life of the memo; a Project over a leaf is
    // just as cheap to re-analyze per round as the leaf itself
    // the skip must only accept PURE RENAMES over a leaf: a Project
    // carrying computed (worse: nondeterministic) expressions would be
    // re-evaluated every fixpoint round if left untruncated — rounds could
    // then disagree about the edge set (ADVICE r11)
    val alreadyLeaf = renamed.queryExecution.analyzed.collect { case n => n }
      .forall {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.forall {
            case _: org.apache.spark.sql.catalyst.expressions.AttributeReference => true
            case a: org.apache.spark.sql.catalyst.expressions.Alias =>
              a.child.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]
            case _ => false
          }
        case _: org.apache.spark.sql.execution.LogicalRDD => true
        case _ => false
      }
    val edges = if (alreadyLeaf) renamed else renamed.localCheckpoint()
    val sym = edges.union(edges.select(col("id2"), col("id1")))
      .toDF("src", "dst").persist()
    var labels = sym.select(col("src").as("v")).distinct()
      .withColumn("label", col("v")).localCheckpoint()
    var converged = false
    var rounds = 0
    // Each round: (a) min label over self + neighbors, (b) pointer-jump
    // label(v) ← label(label(v)) — path halving, O(log diameter) rounds
    // (LSH candidate clusters are tight: measured diameter ≤ 2 at sf0.1,
    // so ~3 rounds incl. the convergence confirm). Two disciplines for
    // iterative DataFrame loops, both load-bearing:
    //  - localCheckpoint truncates lineage each round — the (b) self-join
    //    otherwise DOUBLES the logical plan per round and planning/plan-
    //    stringification grows 2^rounds (measured: hang at round ~20);
    //    at cluster scale use checkpoint() on reliable storage.
    //  - ONE action per round: the lazy checkpoint is materialized by the
    //    convergence count itself; eager checkpoints + separate counts ran
    //    3 actions/round and the fixed per-action cost (planning, codegen
    //    compile, scheduling) dominated this tiny-data loop 3×.
    while (!converged && rounds < 25) {
      val rt0 = System.nanoTime()
      val nbrMin = sym.join(labels, col("dst") === col("v"))
        .groupBy(col("src")).agg(min(col("label")).as("nl"))
      // carry the pre-round label through as `old` instead of joining it
      // back after the jump — the old shape paid one extra shuffle join
      // per round just to compute the convergence count (guide §2.4:
      // remove shuffles outright; same `changed` semantics). First applied
      // r16, reverted wholesale with the unrelated lsh-pin experiment in
      // the r16 snapshot commit, re-applied r17 with A/B evidence
      // (OPTIMIZATION_r17.md).
      val prop = labels.as("l")
        .join(nbrMin, col("v") === col("src"), "left")
        .select(col("v"), col("l.label").as("old"),
          least(col("l.label"), coalesce(col("nl"), col("l.label"))).as("label"))
      val cmp = prop.as("a")
        .join(prop.select(col("v").as("lv"), col("label").as("ll")),
          col("a.label") === col("lv"), "left")
        .select(col("v"), coalesce(col("ll"), col("a.label")).as("label"),
          col("old"))
        .localCheckpoint(false)
      val changed = cmp.filter(col("label") =!= col("old")).count()
      labels = cmp.select("v", "label")
      converged = changed == 0
      rounds += 1
      if (sys.props.contains("graft.profile"))
        println(f"[profile]   co round $rounds%2d changed=$changed%-6d ${(System.nanoTime() - rt0) / 1e9}%.3f s")
    }
    sym.unpersist()
    val w = Window.partitionBy("cluster_id")
    labels
      .select(col("v").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
  }

  /** Incremental connected-components maintenance: merge a DELTA edge set
    * into an existing converged assignment WITHOUT re-running the fixpoint
    * over the corpus graph. The observation: a converged min-label
    * assignment is a graph contraction — every base component collapses to
    * its label (= min member id), and new edges relabeled through the
    * assignment form a LABEL GRAPH whose components are exactly the
    * post-merge components. So the iterative work runs over a graph whose
    * node count is (affected components + unseen endpoints), not the
    * corpus, and the merge-back is two broadcast hash joins against the
    * base assignment — no corpus shuffle, no corpus fixpoint.
    *
    * Steps, each bounded by the delta (E = delta edges, A = affected rows):
    *  1. endpoint lookup: base assignment filtered to delta endpoints via a
    *     broadcast semi-join (scan-and-filter; at 100 TB the assignment is
    *     a doc_id-bucketed table and this is a bucket-pruned point lookup);
    *  2. relabel: map each delta edge to (label(id1), label(id2)); edges
    *     whose endpoints land in the same component are discarded — they
    *     cannot change anything;
    *  3. the label-graph fixpoint: [[componentsOver]] on the relabeled
    *     edges — O(E)-sized input, converges in O(log diameter of the
    *     MERGE graph) rounds;
    *  4. merge-back: members of affected components take their component's
    *     new label via one broadcast inner join; unaffected rows pass
    *     through via the mirroring broadcast anti-join with their stored
    *     size/keep untouched; endpoints unseen by the base (new docs, or
    *     previously edge-less docs) emit directly from the label graph.
    *     Sizes/keep are re-windowed over the affected subset only.
    *
    * Result is bit-identical to `componentsOver(baseEdges ∪ deltaEdges)`
    * (`ComponentsDeltaSpec` proves it differentially on random graphs and
    * adversarial fixtures; the gated query `dedup_clusters_delta` shares
    * `dedup_clusters`' full-closure DuckDB oracle). `baseAssign` must be a
    * converged assignment with (doc_id, cluster_id, cluster_size, keep) —
    * i.e. [[componentsOver]] output; `deltaEdges` is any (id1, id2) pair
    * frame (base-to-base pairs are legal and simply collapse in step 2).
    */
  private[graft] def componentsDelta(baseAssign: DataFrame,
                                     deltaEdges0: DataFrame): DataFrame = {
    val (untouched, recomputed) = componentsDeltaParts(baseAssign, deltaEdges0)
    untouched.union(recomputed)
  }

  /** [[componentsDelta]] split into its two construction halves:
    * (untouched base rows, recomputed rows). The union IS componentsDelta;
    * the split exists so a delta-layout maintainer
    * ([[graft.streaming.MixedIngest]], verdict r13 item 1) can persist
    * ONLY the recomputed half per micro-batch — the untouched half is by
    * definition already durable in older versions.
    */
  private[graft] def componentsDeltaParts(baseAssign: DataFrame,
      deltaEdges0: DataFrame): (DataFrame, DataFrame) = {
    // delta-sized by contract, and consumed three times (endpoint set,
    // relabel join, and the fixpoint's symmetrized union) — pin it so the
    // upstream candidate pipeline (shard shingling + band joins) runs
    // once, not per consumer
    val deltaEdges = deltaEdges0.toDF("id1", "id2").cache()
    val asg = baseAssign.select(col("doc_id").as("av"), col("cluster_id").as("al"))
    val eps = deltaEdges
      .select(explode(array(col("id1"), col("id2"))).as("id")).distinct()
    // assignment rows for delta endpoints only: broadcast the (tiny)
    // endpoint set as the build side — the base is scanned, never shuffled
    val asgHit = asg.join(broadcast(eps), col("av") === col("id"), "left_semi")
    val look = eps.join(broadcast(asgHit), col("id") === col("av"), "left")
      .select(col("id"), coalesce(col("al"), col("id")).as("lab"),
        col("al").isNotNull.as("known"))
      .cache()
    // ONE broadcast plan for both endpoint relabels: identical broadcast
    // subplans are deduped by ReuseExchange within the materializing query,
    // so the lookup ships once, not once per endpoint side
    val lk = look.select(col("id"), col("lab"))
    val labelEdges = deltaEdges
      .join(broadcast(lk), col("id1") === col("id"))
      .select(col("id2"), col("lab").as("l1"))
      .join(broadcast(lk), col("id2") === col("id"))
      .select(col("l1"), col("lab").as("l2"))
      .filter(col("l1") =!= col("l2"))
      .select(col("l1").as("id1"), col("l2").as("id2"))
    // the delta-sized fixpoint: label-graph nodes are component labels and
    // unseen endpoint ids; its assignment IS the old-label → new-label map.
    // componentsOver is eager (actions inside), so the cached temporaries
    // above are fully consumed by the time it returns — except `look`,
    // which the unseen-endpoint rows below still need once. Materialize
    // those rows eagerly (delta-sized localCheckpoint, reclaimed by the
    // ContextCleaner when the returned frame is dropped) and unpersist
    // both temps before returning: without this, every call — one per
    // micro-batch under ClusterIngest — left two cached relations pinned
    // in the CacheManager for the life of the session (ADVICE r10).
    val mapping = componentsOver(labelEdges)
      .select(col("doc_id").as("old_label"), col("cluster_id").as("new_label"))
      .localCheckpoint()
    val affected = baseAssign
      .join(broadcast(mapping), col("cluster_id") === col("old_label"))
      .select(col("doc_id"), col("new_label").as("cluster_id"))
    val untouched = baseAssign
      .join(broadcast(mapping), col("cluster_id") === col("old_label"), "left_anti")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("keep"))
    // LEFT join + coalesce: an unseen endpoint whose delta edges all
    // collapsed in the l1 =!= l2 filter (e.g. a self-edge, or a pair
    // landing in one component) never enters the label graph, so mapping
    // has no row for it — componentsOver(base ∪ delta) would still emit it
    // as its own singleton, and so must the merge (ADVICE r10).
    val direct = look.filter(!col("known"))
      .join(broadcast(mapping), col("lab") === col("old_label"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("new_label"), col("lab")).as("cluster_id"))
      .localCheckpoint()
    deltaEdges.unpersist()
    look.unpersist()
    val w = Window.partitionBy("cluster_id")
    val recomputed = affected.union(direct)
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
    (untouched, recomputed)
  }

  /** Takedown-aware cluster maintenance — the DELETE side of
    * [[componentsDelta]], and structurally harder: adding edges only ever
    * MERGES components (a label-graph contraction suffices), but removing
    * a node can SPLIT its component, which no min-label merge can express.
    * The delta-sized move is component-LOCAL recompute: components with no
    * deleted member pass through byte-identical (deletion only removes
    * edges, and all edges live inside components, so untouched components
    * cannot change); for each affected component, the fixpoint re-runs on
    * the edges among its SURVIVING members only — obtained from the
    * caller's `edgesAmong` (stored band index pruned to those members, or
    * the cell-join for embeddings), never by re-scanning the corpus. A
    * surviving member whose every edge led to deleted docs drops out,
    * exactly as the full closure over survivors drops it. Cost:
    * Σ|affected components| + their bucket-pruned edge regeneration —
    * independent of corpus size when takedowns are sparse.
    */
  private[graft] def componentsDeleteDelta(baseAssign: DataFrame,
      tombs0: DataFrame,
      edgesAmong: DataFrame => DataFrame): DataFrame = {
    val (untouched, recomputed, _, _) =
      componentsDeleteDeltaParts(baseAssign, tombs0, edgesAmong)
    untouched.union(recomputed)
  }

  /** [[componentsDeleteDelta]] split for delta-layout maintainers (verdict
    * r13 item 1): (untouched rows, recomputed survivor rows, members of
    * affected components, affected cluster ids). A per-batch delta is then
    * `recomputed ∪ removal markers for (affectedMembers ∖ recomputed)` —
    * the markers cover tombstoned members AND survivors whose every edge
    * led to deleted docs (they leave the view with no replacement row, so
    * newest-wins resolution needs an explicit erase). `affectedLabels` is
    * delta-sized and localCheckpoint-materialized, safe to broadcast.
    */
  private[graft] def componentsDeleteDeltaParts(baseAssign: DataFrame,
      tombs0: DataFrame,
      edgesAmong: DataFrame => DataFrame):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val tombs = tombs0.toDF("doc_id").localCheckpoint()
    val affLabels = baseAssign.join(broadcast(tombs), "doc_id")
      .select(col("cluster_id")).distinct().localCheckpoint()
    val untouched = baseAssign
      .join(broadcast(affLabels), Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("keep"))
    // members stays LAZY: the batch wrappers ([[componentsDeleteDelta]],
    // the gated `*_deleted`/`*_mixed` queries) never read it, so a
    // checkpoint here would charge them a materialization for nothing
    // (measured +0.5 s on `dedup_clusters_mixed` when a first draft
    // pinned it); the one consumer that reads it
    // ([[graft.streaming.MixedIngest]]'s removal markers) uses it exactly
    // once, so re-executing the semi-join there is cheaper than pinning
    val members = baseAssign
      .join(broadcast(affLabels), Seq("cluster_id"), "left_semi")
      .select(col("doc_id"))
    val survivors = members
      .join(broadcast(tombs), Seq("doc_id"), "left_anti")
      .select(col("doc_id")).localCheckpoint()
    (untouched, componentsOver(edgesAmong(survivors)), members, affLabels)
  }

  /** Gated-query form of takedown-aware cluster maintenance: the corpus
    * cluster view with docs doc_id % 37 = 3 taken down (the standing
    * `*_deleted` fixture, found by filtering the memoized ASSIGNMENT — a
    * tombstone outside every component cannot change the view, so the
    * corpus is never scanned to locate takedowns). Affected components
    * recompute from the PERSISTED candidate-edge set the memoized view
    * keeps alongside its assignment ([[memoizedClusterState]]): per-doc
    * shingles, signatures, and band keys are all unchanged by deleting
    * OTHER docs, so the survivor corpus's edge set is exactly the stored
    * edges minus tombstone-incident rows — the recompute does zero
    * re-shingling and zero band probes, just two broadcast semi-joins on
    * a duplicate-bounded pair list. Untouched components pass through
    * byte-identical. (The first draft probed the stored
    * [[writeMinhashIndex]] layout instead — wrong, because that index
    * covers the admission CORPUS (`doc_id % 10 != 7`) while this view
    * spans all docs: shard-doc tombstones went undetected and shard-doc
    * edges vanished from recomputes.) Oracle:
    * [[graft.oracle.TextSql.dedupClustersDeletedSql]] — the transitive
    * closure over a corpus that never contained the deleted docs.
    */
  def dedupClustersDeleted(spark: SparkSession, dir: String): DataFrame = {
    val (edges, baseAssign) = memoizedClusterState(spark, dir)
    val tombs = baseAssign
      .select(col("doc_id")).filter(col("doc_id") % 37 === 3)
    componentsDeleteDelta(baseAssign, tombs, members => {
      val m = broadcast(members.select(col("doc_id").as("mid")))
      edges
        .join(m, col("id1") === col("mid"), "left_semi")
        .join(m, col("id2") === col("mid"), "left_semi")
    })
  }

  // Memoized base state for the delta-maintained cluster view: the corpus
  // (doc_id % 10 != 7) band index stand-in + its converged assignment, per
  // (session, dir) — same bounded-LRU discipline as `clusterCache`. The
  // assignment is localCheckpoint-materialized so steady-state delta reads
  // pay only shard-side work (shard shingling + the delta merge).
  // eviction releases the cached band frame (ADVICE r10); the checkpointed
  // assignment's blocks are reclaimed by the ContextCleaner once the
  // reference drops
  private val deltaBaseCache =
    new BoundedMemo[(SparkSession, String),
                    (DataFrame, DataFrame, DataFrame, DataFrame)](
      4, _._1.unpersist())

  /** Memoized delta-maintenance base state: (corpus band keys, converged
    * base assignment, base candidate edges). The edge list is checkpointed
    * alongside the assignment because the MIXED maintenance read
    * ([[dedupClustersMixed]]) recomputes takedown-affected components from
    * (base ∪ delta) edges — exactly what an incremental maintainer
    * persists anyway (the [[componentsDeleteDelta]] contract).
    */
  private def deltaBase(spark: SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val isShard = col("doc_id") % 10 === 7
    deltaBaseCache.getOrBuild((spark, dir)) {
      // materialize the arriving shard's documents ONCE at base-build time:
      // in production the delta batch lands as its own files, so a
      // steady-state delta read must never scan the CORPUS file to find
      // them — the r13 ScanLedger audit showed the old per-read
      // `documents.filter(isShard)` charging every warm delta/mixed read a
      // full corpus filesSize (a doc_id predicate cannot prune a
      // single-file fixture corpus) and decoding 10× the text it needed
      val shardDocs = Tables.documents(spark, dir).filter(isShard)
        .select(col("doc_id"), col("text")).localCheckpoint()
      val sigBase = signaturesFrom(
        explodedShingles(spark, dir, !isShard, distinctShingles = false)
          .withColumn("h", mdhash(col("s")))).cache()
      val bb = bandKeys(sigBase).cache()
      // checkpoint the edge list FIRST so the fixpoint's leaf check reuses
      // it instead of storing a second copy
      val baseEdges = bb.as("x").join(bb.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
        .localCheckpoint()
      // the assignment checkpoint keeps steady-state delta reads from
      // re-running the corpus-wide cluster_size window per read (the
      // discipline the header comment promises — ADVICE r12 caught the
      // semantic twin of this memo dropping it)
      val v = (bb, componentsOver(baseEdges).localCheckpoint(), baseEdges,
        shardDocs)
      // componentsOver is eager, so bb's cache is populated by now and
      // the signature frame has served its 4-band fan-out — release it
      // rather than pinning a corpus-sized relation for the session
      sigBase.unpersist()
      v
    }
  }

  /** Shard-side candidate edges against the memoized corpus bands: the
    * cross probe (shard bands vs corpus band index) plus the shard's own
    * band self-join — shared by [[dedupClustersDelta]] and
    * [[dedupClustersMixed]]. Returns (edges, pin): the shard SIGNATURES
    * are pinned because the two joins are separate plan branches (without
    * the pin the shard shingle+minhash pipeline executed once per branch,
    * measured 2× at sf0.1); the caller releases the pin once the edges
    * have been consumed eagerly.
    */
  private def shardDeltaEdges(shardDocs: DataFrame,
      bandsBase: DataFrame): (DataFrame, DataFrame) = {
    val sigShard = signaturesFrom(
      explodedShinglesOf(shardDocs, distinctShingles = false)
        .withColumn("h", mdhash(col("s")))).cache()
    val bandsShard = bandKeys(sigShard)
    val cross = bandsShard.as("x").join(bandsBase.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("id1"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("id2"))
    val within = bandsShard.as("x").join(bandsShard.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
    (cross.union(within).distinct(), sigShard)
  }

  /** The incremental form of [[dedupClustersFresh]]: cluster assignment
    * maintained by [[componentsDelta]] as the shard (`doc_id % 10 = 7` —
    * the [[shardDedup]] convention) arrives against an already-converged
    * corpus view. Gated as `dedup_clusters_delta` against the SAME
    * transitive-closure oracle as `dedup_clusters` — the delta-maintained
    * assignment must be bit-identical to the full recompute.
    *
    * Delta candidate generation mirrors the admission gate: shard bands
    * probe the corpus band index (equi-join on (band, bkey) — the stored
    * [[writeMinhashIndex]] layout at scale, a memoized frame here) plus the
    * shard's own band self-join; the corpus is never re-shingled or
    * re-banded on a steady-state read. BENCH reads this next to
    * `dedup_clusters_fresh`: the full fixpoint vs the delta merge, same
    * converged output.
    *
    * Where the win appears (IndexBench `cluster_*` rows, measured r11): a
    * steady-state read pays a CONSTANT ~10-action orchestration floor
    * (endpoint lookup, label fixpoint init + O(log d) rounds, two
    * delta-sized checkpoints, merge-back) of ~3 s in local mode — at
    * sf0.1 that floor is on par with the WHOLE corpus fixpoint, so the
    * delta read is a wash there; the fresh side grows with the corpus
    * (shingling + banding + fixpoint over every edge) while the delta
    * side grows only with the shard, so the crossover lands at sf1 and
    * widens with scale, which is the regime incremental maintenance
    * exists for.
    */
  def dedupClustersDelta(spark: SparkSession, dir: String): DataFrame = {
    val (bandsBase, baseAssign, _, shardDocs) = deltaBase(spark, dir)
    val (delta, pin) = shardDeltaEdges(shardDocs, bandsBase)
    // componentsDelta consumes the candidate union eagerly, so the shard
    // pin can be released as soon as it returns
    val out = componentsDelta(baseAssign, delta)
    pin.unpersist()
    out
  }

  /** MIXED maintenance in one pass (verdict r11 item 2, batch form —
    * [[graft.streaming.MixedIngest]] is the streaming form): the shard
    * (`doc_id % 10 = 7`) ARRIVES and the takedown set (`doc_id % 37 = 3`,
    * the standing `*_deleted` fixture) is APPLIED against the same
    * maintained view, composing [[componentsDelta]] (merge the shard's
    * candidate edges into the converged base) with
    * [[componentsDeleteDelta]] (component-local recompute over the
    * persisted base ∪ delta edge set pruned to survivors). Nothing
    * corpus-sized re-runs: the base is the memoized [[deltaBase]] state,
    * the delta is shard-sized, and the delete recompute reads the
    * persisted pair list via broadcast semi-joins.
    *
    * Gated as `dedup_clusters_mixed` against
    * [[graft.oracle.TextSql.dedupClustersDeletedSql]] — the from-scratch
    * DuckDB transitive closure over a corpus that contains the shard and
    * never contained the deleted docs. The composed incremental path must
    * be bit-identical to that closure.
    */
  def dedupClustersMixed(spark: SparkSession, dir: String): DataFrame = {
    val (bandsBase, baseAssign, baseEdges, shardDocs) = deltaBase(spark, dir)
    val (delta, pin) = shardDeltaEdges(shardDocs, bandsBase)
    val merged = componentsDelta(baseAssign, delta)
    val tombs = merged.select(col("doc_id")).filter(col("doc_id") % 37 === 3)
    // the maintained edge set after the merge: base edges ∪ shard edges —
    // the exact pair list MixedIngest persists per version
    val edges1 = baseEdges.unionByName(delta)
    val out = componentsDeleteDelta(merged, tombs, members => {
      val m = broadcast(members.select(col("doc_id").as("mid")))
      edges1
        .join(m, col("id1") === col("mid"), "left_semi")
        .join(m, col("id2") === col("mid"), "left_semi")
    })
    // componentsDeleteDelta runs its affected-component fixpoint eagerly,
    // so the shard pin has been fully consumed by now
    pin.unpersist()
    out
  }
}
