package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.DedupOps

/** Streaming CLUSTER maintenance — the assignment side of the index-sink
  * family: [[IngestDedup]] / [[SemIngest]] emit near-duplicate PAIRS as
  * documents arrive; this sink folds those pairs into a maintained
  * connected-components assignment table, so the corpus' dedup/semantic
  * cluster view is always current without ever re-running the fixpoint
  * over the corpus graph. Each micro-batch's edges are merged via
  * [[graft.functions.DedupOps.componentsDelta]] — the delta-sized
  * label-graph merge — against the previous batch's converged assignment:
  * per-batch cost is O(batch edges + affected components), independent of
  * corpus size, which is the only admissible shape for a view that must
  * stay fresh at 100 TB ingest rates.
  *
  * Versioned-table discipline (the [[OrderBookStream]] snapshot lesson,
  * applied once more): `foreachBatch` is at-least-once, so batch B writes
  * its OWN version table `<prefix>_v<B>` with overwrite, and — the crash
  * lesson — merges against the newest COMMITTED version STRICTLY BELOW B,
  * never its own (possibly torn, possibly already-committed) output. A
  * replayed batch therefore recomputes exactly the same version from
  * exactly the same base: idempotent by construction. The `_meta` twin
  * (row count), written last, marks a version committed; a crash between
  * the version write and the meta write leaves an invisible torn table
  * that the replay simply overwrites. GC keeps the two newest committed
  * versions — the only replayable batch after a checkpoint commit is the
  * newest, and it needs exactly its predecessor.
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

  /** Attach the assignment-maintenance sink to a stream of candidate
    * pairs (columns `id1`, `id2` — e.g. [[IngestDedup]]'s emitted pairs,
    * or [[SemIngest]]'s τ-near pairs).
    */
  def start(pairs: DataFrame, prefix: String, checkpoint: String,
            name: String = "cluster_ingest"): StreamingQuery =
    pairs.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, prefix, batchId, ckpt = Some(checkpoint))
      }
      .start()

  /** One micro-batch → one assignment version (exposed for the spec to
    * re-deliver a batch and prove replay idempotence). Reads the newest
    * committed version BELOW `batchId` as the merge base — a replay of a
    * committed batch rebuilds the same version from the same base instead
    * of corrupting itself by reading its own output.
    */
  def mergeBatch(batch: DataFrame, prefix: String, batchId: Long,
                 ckpt: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    // Checkpoint/prefix mismatch guard (ADVICE r10): reusing a prefix with
    // a FRESH checkpoint restarts batch ids at 0 — mergeBatch(0) would
    // silently merge against no base (latestBefore(0) = None) while gc
    // keeps the higher-numbered stale versions, so current() would keep
    // serving the OLD state with no error. The only legal deliveries are a
    // replay of the newest committed batch (batchId == max, rebuilt from
    // its predecessor) or a new batch (batchId > max) — anything below is
    // a torn pairing of prefix and checkpoint and must fail loudly.
    committedVersions(spark, prefix).lastOption.foreach { case (maxV, _) =>
      require(batchId >= maxV,
        s"ClusterIngest.mergeBatch: batch $batchId for prefix '$prefix' is " +
          s"below the newest committed version $maxV — the checkpoint does " +
          "not belong to this prefix (fresh checkpoint over an existing " +
          "view?); refusing to corrupt the maintained assignment")
    }
    // The batchId ordering alone cannot catch one torn pairing: a prefix
    // whose only committed version is v0 receives batch 0 from a FRESH
    // checkpoint (0 >= 0 passes, yet the delivery is new data that would
    // silently replace the maintained v0). Every delivery therefore also
    // carries an IDENTITY — the checkpoint location for stream-attached
    // deliveries, the synthetic "direct:<prefix>" for direct calls
    // (ADVICE r11: the direct path previously bypassed the stamp entirely)
    // — stamped onto the prefix at first commit; any later delivery with a
    // different identity is refused.
    val stampTable =
      s"${prefix.toLowerCase(java.util.Locale.ROOT)}_ckptstamp"
    val declared =
      ckpt.getOrElse(s"direct:${prefix.toLowerCase(java.util.Locale.ROOT)}")
    def requireStamp(stamped: String): Unit =
      require(stamped == declared,
        s"ClusterIngest.mergeBatch: prefix '$prefix' was built from " +
          s"checkpoint '$stamped' but this delivery comes from '$declared' " +
          "— a fresh checkpoint over an existing view would silently " +
          "replace the maintained assignment; use a new prefix or delete " +
          "the old view explicitly")
    // stamp BEFORE the first version commit, with create-if-absent
    // semantics (ADVICE r12 reversed r11's stamp-after ordering: a crash
    // between the v0 commit and a trailing stamp write leaves a committed
    // version with NO stamp, and a later batch 0 from a FRESH checkpoint
    // then passes both guards and silently overwrites the maintained v0 —
    // the exact torn pairing the stamp exists to refuse). Stamp-first has
    // no such window: a stale stamp from a failed first batch is harmless
    // (the same identity retries; a DIFFERENT identity is refused, which
    // is the documented "delete the old view explicitly" semantics). Two
    // concurrent first deliveries race on the metastore's atomic CREATE
    // TABLE — the loser re-reads the winner's stamp and must match it or
    // fail loudly before writing anything.
    if (spark.catalog.tableExists(stampTable))
      requireStamp(spark.table(stampTable).head().getString(0))
    else {
      import spark.implicits._
      try Seq(declared).toDF("checkpoint").write
        .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .format("parquet").saveAsTable(stampTable)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        requireStamp(spark.table(stampTable).head().getString(0))
      }
    }
    val edges = batch.select(col("id1"), col("id2")).distinct()
    val merged = latestBefore(spark, prefix, batchId) match {
      case Some(base) => DedupOps.componentsDelta(base, edges)
      case None       => DedupOps.componentsOver(edges)
    }
    val table = verTable(prefix, batchId)
    merged.write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.table(table).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
    gc(spark, prefix)
  }

  /** saveAsTable lower-cases identifiers — mirror that here so the
    * catalog scan in [[committedVersions]] sees exactly what was written.
    */
  def verTable(prefix: String, batchId: Long): String =
    s"${prefix.toLowerCase(java.util.Locale.ROOT)}_v$batchId"

  /** Committed assignment versions under `prefix`, oldest first — a
    * version counts only when its `_meta` twin exists (torn versions are
    * invisible until replay completes them).
    */
  def committedVersions(spark: SparkSession, prefix: String): Seq[(Long, String)] = {
    val re = (java.util.regex.Pattern.quote(
      prefix.toLowerCase(java.util.Locale.ROOT)) + "_v(\\d+)").r
    spark.catalog.listTables().collect().toSeq
      .flatMap(t => re.unapplySeq(t.name).flatMap(_.headOption)
        .map(n => (n.toLong, t.name)))
      .sortBy(_._1)
      .filter { case (_, t) => spark.catalog.tableExists(s"${t}_meta") }
  }

  /** The newest committed version strictly below `batchId` — the merge
    * base a (re)delivery of `batchId` builds on.
    */
  private def latestBefore(spark: SparkSession, prefix: String,
                           batchId: Long): Option[DataFrame] =
    committedVersions(spark, prefix).filter(_._1 < batchId).lastOption
      .map { case (_, t) => spark.table(t) }

  /** The maintained assignment: the newest committed version, or None
    * before the first batch commits — (doc_id, cluster_id, cluster_size,
    * keep), the exact [[graft.functions.DedupOps.componentsOver]] shape.
    */
  def current(spark: SparkSession, prefix: String): Option[DataFrame] =
    committedVersions(spark, prefix).lastOption
      .map { case (_, t) => spark.table(t) }

  /** Drop committed versions older than the newest two. The newest is the
    * live view; its predecessor is the base a replay of the newest batch
    * would need; anything older is unreachable by any replay the
    * checkpoint can still issue.
    */
  private def gc(spark: SparkSession, prefix: String): Unit =
    committedVersions(spark, prefix).dropRight(2).foreach { case (_, t) =>
      spark.sql(s"DROP TABLE IF EXISTS ${t}_meta")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
}
