package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.DedupOps

/** INTERLEAVED add+takedown cluster maintenance — one stream carrying both
  * new candidate pairs and takedown requests against the SAME maintained
  * cluster view (verdict r11 item 2: [[ClusterIngest]] handles adds,
  * [[TakedownIngest]] handles deletes, but a real feed interleaves them,
  * and add-then-delete composition over one micro-batch is exactly where a
  * maintained view can diverge from the batch closure). Reference
  * analogue: same-block Created+Cancelled ordering in the event feed
  * (`/root/reference/src/services/hive-listener.ts:178-206`), which the
  * order-book fold must compose in log order.
  *
  * Feed schema: (`op`, `id1`, `id2`) — `op = "add"` carries a candidate
  * edge in (id1, id2); `op = "del"` carries the takedown id in id1 (id2
  * ignored). Per micro-batch, in this order:
  *
  *  1. tombstones accumulate: `tombs_B = tombs_base ∪ batch deletes`
  *     (TOMBSTONE WINS over re-admission, the [[TakedownIngest]] reading
  *     of a deletion notice: an edge arriving AFTER its endpoint's
  *     takedown stays suppressed until an explicit compaction drops the
  *     tombstone);
  *  2. arriving edges are filtered against the accumulated tombstones
  *     (both endpoints must be live) and merged into the assignment via
  *     [[graft.functions.DedupOps.componentsDelta]] — delta-sized
  *     label-graph work, never a corpus fixpoint;
  *  3. batch deletes are applied via
  *     [[graft.functions.DedupOps.componentsDeleteDelta]] — component-
  *     local recompute over the PERSISTED edge set pruned to survivors,
  *     never a re-derivation of candidates.
  *
  * The maintained state is three tables per version: the assignment
  * (`_v<B>`), the live edge set (`_e<B>` — edges among live docs only;
  * duplicate edges across batches are tolerated, they cannot change a
  * closure and are folded out at compaction rather than paying a
  * corpus-sized distinct per batch), and the accumulated tombstones
  * (`_d<B>`). Versioned-table discipline is [[ClusterIngest]]'s: batch B
  * merges against the newest committed version STRICTLY below B, writes
  * its own versions with overwrite (idempotent replay), marks the version
  * committed with a `_meta` twin written LAST, and GC keeps the newest
  * two. The checkpoint-stamp guard also mirrors [[ClusterIngest]]: every
  * delivery carries an identity (checkpoint location, or the synthetic
  * direct identity), stamped create-if-absent after the first commit.
  *
  * Equivalence guarantee (`MixedIngestSpec`): after draining ANY
  * interleaving, [[current]] is bit-identical to
  * `componentsOver(all added edges with both endpoints never deleted)` —
  * the batch closure over (base ∪ adds) ∖ deletes.
  */
object MixedIngest {

  /** Attach the mixed maintenance sink to a stream of (op, id1, id2). */
  def start(feed: DataFrame, prefix: String, checkpoint: String,
            name: String = "mixed_ingest"): StreamingQuery =
    feed.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, prefix, batchId, ckpt = Some(checkpoint))
      }
      .start()

  /** One micro-batch of interleaved adds/deletes → one (assignment, edges,
    * tombstones) version. Exposed for the spec to replay deliveries.
    */
  def mergeBatch(batch: DataFrame, prefix: String, batchId: Long,
                 ckpt: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    committedVersions(spark, prefix).lastOption.foreach { case (maxV, _) =>
      require(batchId >= maxV,
        s"MixedIngest.mergeBatch: batch $batchId for prefix '$prefix' is " +
          s"below the newest committed version $maxV — the checkpoint does " +
          "not belong to this prefix (fresh checkpoint over an existing " +
          "view?); refusing to corrupt the maintained assignment")
    }
    val stampTable = s"${p}_ckptstamp"
    val declared = ckpt.getOrElse(s"direct:$p")
    def requireStamp(stamped: String): Unit =
      require(stamped == declared,
        s"MixedIngest.mergeBatch: prefix '$prefix' was built from " +
          s"checkpoint '$stamped' but this delivery comes from '$declared' " +
          "— a fresh checkpoint over an existing view would silently " +
          "replace the maintained assignment; use a new prefix or delete " +
          "the old view explicitly")
    if (spark.catalog.tableExists(stampTable))
      requireStamp(spark.table(stampTable).head().getString(0))

    // the batch is micro-batch-sized by contract and read several times
    // below (split, tombstone union, edge filter) — truncate its lineage
    // once; blocks are reclaimed when the frame goes out of scope
    val b = batch.select(col("op"), col("id1"), col("id2")).localCheckpoint()
    val adds = b.filter(col("op") === "add")
      .select(col("id1"), col("id2")).na.drop().distinct()
    val dels = b.filter(col("op") === "del")
      .select(col("id1").as("doc_id")).na.drop().distinct()

    val base = latestBefore(spark, prefix, batchId)
    // 1. accumulated tombstones — delta-sized union, materialized eagerly
    // because adds-filtering, the delete recompute, and the version write
    // all read it
    val tombsAll = base.map { case (_, _, t) => t.unionByName(dels).distinct() }
      .getOrElse(dels).localCheckpoint()
    // 2. live arriving edges: both endpoints must be outside the
    // accumulated tombstone set — an edge to a previously- (or
    // concurrently-) deleted doc never enters the view (tombstone wins).
    // Two broadcast anti-joins against the tombstone ids: the arriving
    // edges stream, nothing corpus-sized shuffles.
    val liveAdds = adds
      .join(broadcast(tombsAll.select(col("doc_id").as("id1"))),
        Seq("id1"), "left_anti")
      .join(broadcast(tombsAll.select(col("doc_id").as("id2"))),
        Seq("id2"), "left_anti")
      .select(col("id1"), col("id2"))
    // 3. merge the adds (delta-sized label-graph fixpoint); first batch
    // over an empty prefix runs the plain fixpoint over its own edges
    val merged = base match {
      case Some((assign, _, _)) => DedupOps.componentsDelta(assign, liveAdds)
      case None                 => DedupOps.componentsOver(liveAdds)
    }
    // the live edge set this version persists: base edges (already free of
    // older tombstones) plus this batch's live adds, minus edges incident
    // to THIS batch's deletes — one broadcast anti-join per endpoint,
    // linear in the edge table (at scale: a doc-bucketed pruned rewrite)
    val edgesUnion = base.map { case (_, e, _) => e.unionByName(liveAdds) }
      .getOrElse(liveAdds)
    val edgesLive = edgesUnion
      .join(broadcast(dels.select(col("doc_id").as("id1"))), Seq("id1"), "left_anti")
      .join(broadcast(dels.select(col("doc_id").as("id2"))), Seq("id2"), "left_anti")
      .select(col("id1"), col("id2"))
    // 4. apply this batch's deletes: component-local recompute over the
    // persisted (already pruned) edge set — affected components rebuild
    // from edges among their surviving members, untouched components pass
    // through byte-identical
    val finalAssign = DedupOps.componentsDeleteDelta(merged, dels, members => {
      val m = broadcast(members.select(col("doc_id").as("mid")))
      edgesLive
        .join(m, col("id1") === col("mid"), "left_semi")
        .join(m, col("id2") === col("mid"), "left_semi")
    })

    val vTable = s"${p}_v$batchId"
    finalAssign.write.mode("overwrite").format("parquet").saveAsTable(vTable)
    edgesLive.write.mode("overwrite").format("parquet").saveAsTable(s"${p}_e$batchId")
    tombsAll.write.mode("overwrite").format("parquet").saveAsTable(s"${p}_d$batchId")
    // commit marker LAST — a crash leaves all three torn tables invisible
    spark.table(vTable).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${vTable}_meta")
    if (!spark.catalog.tableExists(stampTable)) {
      import spark.implicits._
      try Seq(declared).toDF("checkpoint").write
        .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .format("parquet").saveAsTable(stampTable)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        requireStamp(spark.table(stampTable).head().getString(0))
      }
    }
    gc(spark, prefix)
  }

  /** Committed versions under `prefix`, oldest first — a version counts
    * only when its `_meta` twin exists AND all three state tables landed.
    */
  def committedVersions(spark: SparkSession, prefix: String): Seq[(Long, String)] = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    val re = (java.util.regex.Pattern.quote(p) + "_v(\\d+)").r
    spark.catalog.listTables().collect().toSeq
      .flatMap(t => re.unapplySeq(t.name).flatMap(_.headOption)
        .map(n => (n.toLong, t.name)))
      .sortBy(_._1)
      .filter { case (n, t) =>
        spark.catalog.tableExists(s"${t}_meta") &&
          spark.catalog.tableExists(s"${p}_e$n") &&
          spark.catalog.tableExists(s"${p}_d$n")
      }
  }

  /** The newest committed (assignment, edges, tombstones) strictly below
    * `batchId` — the state a (re)delivery of `batchId` builds on.
    */
  private def latestBefore(spark: SparkSession, prefix: String,
      batchId: Long): Option[(DataFrame, DataFrame, DataFrame)] = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    committedVersions(spark, prefix).filter(_._1 < batchId).lastOption
      .map { case (n, t) =>
        (spark.table(t), spark.table(s"${p}_e$n"), spark.table(s"${p}_d$n"))
      }
  }

  /** The maintained assignment — (doc_id, cluster_id, cluster_size, keep),
    * the exact [[graft.functions.DedupOps.componentsOver]] shape.
    */
  def current(spark: SparkSession, prefix: String): Option[DataFrame] =
    committedVersions(spark, prefix).lastOption
      .map { case (_, t) => spark.table(t) }

  /** The maintained live edge set and accumulated tombstones of the newest
    * committed version (exposed for specs and compaction).
    */
  def currentState(spark: SparkSession,
      prefix: String): Option[(DataFrame, DataFrame, DataFrame)] = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    committedVersions(spark, prefix).lastOption.map { case (n, t) =>
      (spark.table(t), spark.table(s"${p}_e$n"), spark.table(s"${p}_d$n"))
    }
  }

  private def gc(spark: SparkSession, prefix: String): Unit = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT)
    committedVersions(spark, prefix).dropRight(2).foreach { case (n, t) =>
      Seq(s"${t}_meta", t, s"${p}_e$n", s"${p}_d$n")
        .foreach(x => spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
  }
}
