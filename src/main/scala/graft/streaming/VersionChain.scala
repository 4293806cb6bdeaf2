package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Version-CHAIN bookkeeping for the maintained-view sinks
  * ([[MixedIngest]], and [[ClusterIngest]] through it): the metadata layer
  * of the delta-layout rework (verdict r13 item 1 — the per-batch O(state)
  * snapshot rewrite was the one pattern that did not survive 100×, so
  * versions now store per-batch DELTAS chained to a base, the generation
  * pattern the repo already uses for PQ/BM25/MinHash layouts).
  *
  * A committed version is (v, upto, parent, kind):
  *  - `v`      — monotone counter, decoupled from batch ids so compactions
  *               can commit versions of their own;
  *  - `upto`   — the highest batch id the version incorporates (replay
  *               targeting);
  *  - `parent` — the version this one's deltas chain to (-1 for a base);
  *  - `kind`   — `base` (first version: its deltas ARE the full state),
  *               `delta` (per-batch increment), `compact` / `compact_auto`
  *               (a fold of its parent's whole chain into a fresh base;
  *               the two spellings record WHO compacted — see
  *               [[MixedIngest.compact]]'s replay-race handling).
  *
  * Resolution walks parent links from the tip to the nearest base-like
  * version ("the chain") and folds the deltas read-side — the LSM trade:
  * O(batch) durable writes per micro-batch, a bounded union at read time,
  * and a compaction that folds the chain back to one base off the hot
  * path.
  *
  * The CATALOG CURSOR (verdict r13 item 4): `committedVersions` used to
  * run `spark.catalog.listTables().collect()` per micro-batch per sink —
  * O(all tables in the warehouse) driver work that becomes a per-batch
  * stall once a long-running deployment accumulates hundreds of
  * prefix × version tables. The cursor caches the committed list per
  * (application, prefix) and is maintained by the exact three writers that
  * can change it (commit appends, gc removes, compact appends-then-gc), so
  * steady state costs ONE catalog point lookup per read (the newest
  * version's `_meta` existence — the cheap staleness probe that catches a
  * spec or operator dropping the prefix's tables out from under the
  * cursor) instead of a full enumeration. A miss or a failed probe falls
  * back to one full relist. Crash-torn commits never touch the cursor
  * (the meta marker is written last and recorded only on success), so the
  * cursor can never claim a version the catalog scan would reject.
  */
private[graft] object VersionChain {

  /** One committed version. `base` versions carry full state in their
    * delta tables; `delta` versions carry one batch's increment.
    *
    * `legacy` marks a PRE-delta-layout version (a full-snapshot `_v` with
    * no `_e`/`_d` state tables — what the standalone adds-only
    * ClusterIngest wrote before round 14): readers must skip its absent
    * state tables instead of failing. `taint` marks a version whose edge
    * history is INCOMPLETE (it is, or folds, a legacy version): the
    * takedown recompute needs the full live edge set, so [[MixedIngest]]
    * refuses deletes over a tainted chain loudly rather than recomputing
    * from a partial graph.
    */
  final case class Ver(v: Long, upto: Long, parent: Long, kind: String,
                       table: String, legacy: Boolean = false,
                       taint: Boolean = false) {
    def isBase: Boolean = kind != "delta"
  }

  private val cursor =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[Ver]]()

  private def key(spark: SparkSession, p: String): String =
    s"${spark.sparkContext.applicationId}#$p"

  /** Committed versions under `prefix`, oldest first. `stateTables` names
    * the per-version data tables that must all exist for the version to
    * count (the `_meta` marker is checked implicitly — it is what makes a
    * version committed). Served from the cursor when the staleness probe
    * passes; one full `listTables` enumeration otherwise.
    */
  def committed(spark: SparkSession, p: String,
                stateTables: Long => Seq[String]): Vector[Ver] = {
    val k = key(spark, p)
    val hit = cursor.get(k)
    if (hit != null && (hit.isEmpty ||
        spark.catalog.tableExists(s"${hit.last.table}_meta"))) hit
    else {
      val fresh = list(spark, p, stateTables)
      cursor.put(k, fresh)
      fresh
    }
  }

  /** Record a freshly committed version (replacing any same-`v` entry — a
    * replayed in-place overwrite re-commits the same number). No-op when
    * the prefix has never been listed: the next read lists from scratch
    * and finds the version anyway.
    */
  def record(spark: SparkSession, p: String, ver: Ver): Unit =
    cursor.computeIfPresent(key(spark, p), (_, vs) =>
      (vs.filterNot(_.v == ver.v) :+ ver).sortBy(_.v))

  /** Remove GC'd versions from the cursor. */
  def remove(spark: SparkSession, p: String, vs: Set[Long]): Unit =
    cursor.computeIfPresent(key(spark, p), (_, cur) =>
      cur.filterNot(x => vs.contains(x.v)))

  /** Drop the cached listing — for callers that mutate the prefix's tables
    * outside the sink API (specs, bench harness cleanup). Reads recover
    * without this via the staleness probe when the NEWEST version's meta
    * was dropped; an explicit invalidate covers surgical mid-chain drops
    * the probe cannot see.
    */
  def invalidate(spark: SparkSession, p: String): Unit =
    cursor.remove(key(spark, p))

  private def list(spark: SparkSession, p: String,
                   stateTables: Long => Seq[String]): Vector[Ver] = {
    val re = (java.util.regex.Pattern.quote(p) + "_v(\\d+)").r
    spark.catalog.listTables().collect().toVector
      .flatMap(t => re.unapplySeq(t.name).flatMap(_.headOption)
        .map(n => (n.toLong, t.name)))
      .sortBy(_._1)
      .filter { case (_, t) => spark.catalog.tableExists(s"${t}_meta") }
      .flatMap { case (n, t) =>
        val meta = spark.table(s"${t}_meta")
        val cols = meta.columns.toSet
        // layout migration: pre-r14 metas carry no parent/kind — each old
        // version was a FULL snapshot, which is exactly a base; pre-counter
        // metas (no `upto` either) carried the batch id AS the version.
        // Legacy versions never HAD `_e`/`_d` state tables, so the
        // state-table existence check applies only to new-layout metas
        // (ADVICE r14: enforcing it unconditionally silently filtered out
        // every committed version of an upgraded adds-only view — a resumed
        // stream then rebuilt the maintained state from an empty base).
        val legacy = !cols.contains("kind")
        if (!legacy && !stateTables(n).forall(spark.catalog.tableExists)) None
        else {
          val row = meta.head()
          val upto = if (cols.contains("upto")) row.getAs[Long]("upto") else n
          val parent =
            if (cols.contains("parent")) row.getAs[Long]("parent") else -1L
          val kind = if (legacy) "base" else row.getAs[String]("kind")
          val taint = legacy ||
            (cols.contains("taint") && row.getAs[Boolean]("taint"))
          Some(Ver(n, upto, parent, kind, t, legacy = legacy, taint = taint))
        }
      }
  }

  /** The chain serving `tip`: versions from the nearest base-like version
    * up to `tip`, oldest first. A broken parent link (ancestor GC'd out
    * from under a delta — impossible under [[keepSet]] discipline, loud if
    * it ever happens) fails rather than resolving a partial state.
    */
  def chain(vers: Seq[Ver], tip: Ver): Vector[Ver] = {
    val byV = vers.map(v => v.v -> v).toMap
    @annotation.tailrec
    def walk(cur: Ver, acc: List[Ver]): List[Ver] =
      if (cur.isBase) cur :: acc
      else byV.get(cur.parent) match {
        case Some(p) => walk(p, cur :: acc)
        case None => throw new IllegalStateException(
          s"version chain broken: v${cur.v} (table ${cur.table}) chains to " +
            s"missing parent v${cur.parent} — state tables were dropped " +
            "outside the sink API")
      }
    walk(tip, Nil).toVector
  }

  /** The versions GC must keep: the full chain of the newest version of
    * each of the two newest distinct `upto` marks — the newest serves
    * reads, and the newest version of the PREVIOUS batch mark (chain
    * included) is exactly what a replay of the newest batch rebuilds from.
    * Superseded same-`upto` versions and unreachable ancestors drop.
    */
  def keepSet(vers: Seq[Ver]): Set[Long] = {
    val keepUptos = vers.map(_.upto).distinct.sorted.takeRight(2)
    keepUptos.flatMap { u =>
      val tip = vers.filter(_.upto == u).maxBy(_.v)
      chain(vers, tip).map(_.v)
    }.toSet
  }

  /** Fold a chain's assignment deltas to the current view: newest row per
    * doc wins, removal markers (null cluster_id) erase. Single-version
    * chains read their table straight — the steady state after compaction.
    *
    * The fold is one hash aggregation on doc_id (`max_by` over the version
    * stamp — an ObjectHashAggregate, the struct-typed-buffer demotion
    * WireOrderFold.scala documents; acceptable on a read-side fold whose
    * input is state + deltas, not the corpus). At 100 TB the same fold
    * over doc_id-bucketed version tables is shuffle-free.
    */
  def resolveAssign(spark: SparkSession, ch: Seq[Ver]): DataFrame =
    if (ch.size == 1) spark.table(ch.head.table)
    else ch.map(v => spark.table(v.table).withColumn("_ver", lit(v.v)))
      .reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(col("cluster_id"), col("cluster_size"), col("keep")),
        col("_ver")).as("s"))
      .select(col("doc_id"), col("s.cluster_id").as("cluster_id"),
        col("s.cluster_size").as("cluster_size"), col("s.keep").as("keep"))
      .filter(col("cluster_id").isNotNull)
}
