package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.OrderFold
import graft.operators.OrderFold.{Ev, St}

/** Structured-Streaming lift of the order-book engine (SURVEY §7.2 M6,
  * §2.7 ST1-ST8).
  *
  * The reference's hand-built micro-batch machinery maps 1:1 onto Structured
  * Streaming primitives:
  *  - block-number offsets + high-water-mark commit
  *    (`src/services/block-event-manager.ts:63-92`) ≙ source offsets +
  *    checkpointing (exactly-once progress, strictly stronger than the
  *    reference's non-atomic read-modify-write, ST6);
  *  - the per-event Redis fold (`src/models/order-book.ts:80-194`) ≙
  *    `flatMapGroupsWithState` over (pool, trader) keyed state, running the
  *    SAME [[OrderFold.foldFrom]] the batch engine uses;
  *  - the busy-flag serialization (`block-event-manager.ts:65,70,90`) ≙
  *    one-micro-batch-at-a-time per query — native;
  *  - the WS change push (`src/api/server.ts:43-51`, ST8) ≙ a `foreachBatch`
  *    sink that surfaces each batch's updated keys to a callback.
  *
  * State-size discipline (ST5): the reference keeps soft-deleted orders
  * forever; we replicate that by default (NoTimeout) — at 100 TB scale the
  * knob is `GroupStateTimeout.ProcessingTimeTimeout` + the RocksDB state
  * store provider, both configuration.
  */
object OrderBookStream {

  /** Keyed incremental fold: each micro-batch's events for a key are sorted
    * by eventId and folded on top of the existing state. Emits the key's new
    * state each time it changes (OutputMode.Update semantics).
    */
  def foldStream(events: Dataset[Ev]): Dataset[St] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(e => (e.pool, e.trader))
      .flatMapGroupsWithState[St, St](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, evs, state: GroupState[St]) =>
          val sorted = evs.toSeq.sortBy(_.eventId)
          val next = OrderFold.foldFrom(state.getOption, sorted)
          next.foreach(state.update)
          next.iterator
      }
  }

  /** Normalize a raw streaming `events` frame (same schema as the batch
    * table) into the typed order-event stream — identical derivation to
    * [[graft.operators.OrderEvents.derive]], reused verbatim.
    */
  def toEventStream(raw: DataFrame): Dataset[Ev] =
    OrderFold.toEvents(graft.operators.OrderEvents.derive(raw))

  /** ST8 change-feed: run the fold and push each micro-batch's updated
    * states to `onUpdate` (batchId, updated rows). The reference broadcasts
    * a full recomputed book per changed pool; here the callback receives the
    * changed keys and the serving layer re-reads its view — same semantics
    * without the reference's unawaited-Promise bug (SURVEY §2.8 note).
    */
  def changeFeed(raw: DataFrame, checkpointDir: String)
                (onUpdate: (Long, Seq[St]) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    foldStream(toEventStream(raw)).writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[St], batchId: Long) =>
        // Bounded by construction: Update-mode fMGWS emits at most ONE state
        // row per (pool, trader) key per micro-batch, so this collect is
        // ≤ |keys touched this batch| — steady-state that's the event rate,
        // worst-case (full replay) it's |all keys|. The replay case is what
        // snapshotSink is for (distributed MERGE, nothing to the driver);
        // the change FEED is push semantics — its consumers are WS fanout
        // loops that are themselves driver-sized (server.ts:43-51).
        onUpdate(batchId, batch.collect().toSeq)
      }
      .start()

  /** ST3 extension (the reference has no windows at all — SURVEY §2.7): a
    * watermarked event-time tumbling-window aggregate over the trade stream,
    * e.g. per-pool per-minute traded volume. `withWatermark` bounds state:
    * windows older than the watermark finalize and evict — the knob the
    * reference's unbounded Redis state lacks entirely (ST5). Volume stays
    * DECIMAL for exactness under any partial-agg schedule.
    */
  def windowedVolume(raw: DataFrame, watermarkDelay: String = "10 minutes",
                     windowLength: String = "1 minute"): DataFrame = {
    val trades = graft.operators.OrderEvents.derive(raw)
      .filter(col("action") === 9)
      // block_time is epoch-micros (long) → timestamp for event-time ops
      .withColumn("event_time", timestamp_micros(col("block_time")))
    trades
      .withWatermark("event_time", watermarkDelay)
      .groupBy(col("pool"), window(col("event_time"), windowLength))
      .agg(sum(col("val")).as("traded_volume"), count(lit(1)).as("n_trades"))
      .select(col("pool"), col("window.start").as("window_start"),
        col("traded_volume"), col("n_trades"))
  }

  /** S9 durable sink: per-batch MERGE of updated states into a pool-hash-
    * BUCKETED parquet snapshot. Layout:
    *
    * {{{  snapshotPath/b<bucket>/v<batchId>/part-*.parquet
    *      snapshotPath/_manifest.json   // {"<bucket>": <currentVersion>} }}}
    *
    * Each micro-batch emits at most one state row per key, so the merge per
    * TOUCHED bucket is a keyed anti-join + union; untouched buckets are not
    * read, not rewritten, and keep their manifest version — merge I/O is
    * proportional to changed pools, not total state (the file-pruning
    * behaviour of a Delta/Iceberg `MERGE INTO ... ON pool`, which is what
    * this becomes on a cluster). Commit protocol: new `v<batchId>` dirs are
    * written first, then the manifest is swapped via temp-file +
    * ATOMIC_MOVE — a crash mid-batch leaves the old manifest pointing at
    * complete old versions (no window where live data is deleted, unlike a
    * stage-then-overwrite). Replaying a batch rewrites the same `v<batchId>`
    * dirs and re-commits an identical manifest: idempotent (ST6). Superseded
    * version dirs are GC'd after the commit point.
    */
  def snapshotSink(raw: DataFrame, checkpointDir: String, snapshotPath: String,
                   nBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    foldStream(toEventStream(raw)).writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[St], batchId: Long) =>
        mergeSnapshotBatch(batch, batchId, snapshotPath, nBuckets)
      }
      .start()

  /** The per-batch MERGE body of [[snapshotSink]], extracted so the crash
    * protocol is directly testable: `failpoint` (test-only; no-op in
    * production) runs at the WIDEST crash window — after every new version
    * dir is fully written, before the manifest commit. The protocol's
    * claim, pinned by `SnapshotCrashSpec`: a crash anywhere before the
    * ATOMIC_MOVE leaves readers on the previous manifest (complete old
    * versions — the new dirs are orphans, not corruption), and replaying
    * the batch rewrites the same `v<batchId>` dirs and commits an
    * identical manifest (idempotent, ST6).
    */
  private[graft] def mergeSnapshotBatch(batch: Dataset[St], batchId: Long,
      snapshotPath: String, nBuckets: Int,
      failpoint: () => Unit = () => ()): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val withBucket = batch
      .withColumn("bucket", pmod(hash(col("pool")), lit(nBuckets)))
      .persist()
    // driver sees only the touched BUCKET IDS (≤ nBuckets ints), never data
    val touched = withBucket.select("bucket").distinct().as[Int].collect()
    val manifest = readManifest(snapshotPath)
    touched.foreach { bucket =>
      val slice = withBucket.filter(col("bucket") === bucket)
        .drop("bucket").as[St]
      manifest.get(bucket) match {
        // REPLAY of an already-committed bucket (foreachBatch is
        // at-least-once: a crash after the manifest commit but before the
        // CHECKPOINT commit re-delivers the batch with the manifest
        // already at v<batchId>): the committed dir already holds this
        // batch's post-merge result, and merging "on top of itself" would
        // read b<bucket>/v<batchId> while overwriting the same path —
        // Spark deletes the target mid-scan (FAILED_READ_FILE, data
        // loss). Skip: genuine idempotence, found by SnapshotCrashSpec.
        case Some(v) if v == batchId => ()
        case prior =>
          val merged = prior match {
            case Some(v) =>
              val existing = spark.read.parquet(s"$snapshotPath/b$bucket/v$v").as[St]
              existing.join(slice.select(col("pool"), col("trader")),
                  Seq("pool", "trader"), "left_anti").as[St]
                .union(slice)
            case None => slice
          }
          merged.write.mode("overwrite").parquet(s"$snapshotPath/b$bucket/v$batchId")
      }
    }
    withBucket.unpersist()
    failpoint()
    // commit point: all new version dirs are complete
    writeManifest(snapshotPath, manifest ++ touched.map(_ -> batchId))
    // GC superseded versions of the buckets this batch rewrote
    touched.foreach { bucket =>
      val dir = new java.io.File(s"$snapshotPath/b$bucket")
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("v") && f.getName != s"v$batchId")
        .foreach(deleteRecursively)
    }
  }

  /** Manifest-aware snapshot reader: the union of every bucket's current
    * version. The manifest is the single commit point, so this never
    * observes a half-written batch.
    */
  def readSnapshot(spark: SparkSession, snapshotPath: String): Dataset[St] = {
    import spark.implicits._
    val manifest = readManifest(snapshotPath)
    if (manifest.isEmpty) spark.emptyDataset[St]
    else spark.read.parquet(manifest.toSeq.map {
      case (b, v) => s"$snapshotPath/b$b/v$v"
    }: _*).as[St]
  }

  private def manifestFile(root: String) = java.nio.file.Paths.get(root, "_manifest.json")

  private def readManifest(root: String): Map[Int, Long] = {
    val p = manifestFile(root)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else "\"(\\d+)\"\\s*:\\s*(\\d+)".r
      .findAllMatchIn(java.nio.file.Files.readString(p))
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
  }

  private def writeManifest(root: String, m: Map[Int, Long]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val body = m.toSeq.sorted.map { case (b, v) => s"\"$b\": $v" }
      .mkString("{", ", ", "}")
    val tmp = java.nio.file.Paths.get(root, s"_manifest.json.tmp")
    java.nio.file.Files.writeString(tmp, body)
    java.nio.file.Files.move(tmp, manifestFile(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
