package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming TAKEDOWN maintenance — the delete side of the index-sink
  * quartet ([[IngestDedup]] / [[SemIngest]] / [[PqIngest]] / [[BmIngest]]
  * keep the stored layouts growing as documents arrive; this sink keeps
  * them SHRINKING as takedown requests arrive). A takedown request is an
  * id (doc_id / vec_id), not a predicate over the corpus — matching how a
  * real right-to-be-forgotten notice lands. Each micro-batch of requests
  * becomes its own TOMBSTONE GENERATION (a tiny id table, cost linear in
  * the batch — no index is touched); probes anti-join the distinct union
  * of generations out of the stored layouts via the probes' existing
  * `tombs` parameter, and compaction (`compactMinhashIndex` /
  * `compactPostings` / `compactPqIndex`, all with `tombs`) folds the
  * accumulated tombstones into a rewritten layout off the hot path, after
  * which the generations can be dropped.
  *
  * Exactly-once discipline, same shape as [[BmIngest]]: `foreachBatch` is
  * at-least-once, so the generation table name is keyed by batchId and
  * written with overwrite — a replayed batch rewrites the same generation
  * with the same distinct ids, and the probe-side distinct union makes
  * re-deletion of an already-deleted id (within a batch, across batches,
  * or across replays) a natural no-op. The `_meta` twin (row count) is
  * written last: its presence marks a complete generation, so a crashed
  * mid-write generation is invisible to [[tombstones]] until replay
  * completes it.
  *
  * Semantics choice (documented, not accidental): the tombstone is by id,
  * so a doc re-ingested AFTER its takedown stays suppressed until the
  * tombstone is dropped at compaction — takedown wins over re-admission,
  * the conservative reading of a deletion notice.
  */
object TakedownIngest {

  /** Attach the tombstone sink to a stream of takedown requests. The
    * stream must carry `keyCol` (default `doc_id`); other columns —
    * request time, reason — are passed through to the generation table
    * for audit but ignored by probes.
    */
  def start(requests: DataFrame, genPrefix: String, checkpoint: String,
            keyCol: String = "doc_id",
            name: String = "takedown_ingest"): StreamingQuery =
    requests.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeGeneration(batch, genTable(genPrefix, batchId), keyCol)
      }
      .start()

  /** One micro-batch → one tombstone generation (the unit a replay
    * rewrites idempotently; exposed for the spec to re-deliver a batch).
    */
  def writeGeneration(batch: DataFrame, table: String,
                      keyCol: String = "doc_id"): Unit = {
    val ids = batch.select(col(keyCol)).distinct()
    ids.write.mode("overwrite").format("parquet").saveAsTable(table)
    // completeness marker, written last — [[tombstones]] ignores the
    // generation until this twin exists
    ids.sparkSession.table(table).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
  }

  /** saveAsTable lower-cases identifiers — key the name in lower case so
    * [[listGenerations]]'s catalog match sees exactly what was written. */
  def genTable(genPrefix: String, batchId: Long): String =
    s"${genPrefix.toLowerCase(java.util.Locale.ROOT)}_t$batchId"

  /** The committed tombstone generations under `genPrefix`, oldest first —
    * a generation counts only when its `_meta` twin exists.
    *
    * Catalog-enumeration note (see [[BmIngest.listGenerations]]): the
    * per-batch path is [[writeGeneration]] only (names keyed by batchId —
    * no listing); this enumeration runs once per probe/compaction, not
    * per micro-batch, so the r13-item-4 version cursor applies to the
    * [[MixedIngest]] engine and deliberately not here.
    */
  def listGenerations(spark: SparkSession, genPrefix: String): Seq[String] = {
    val re = (java.util.regex.Pattern.quote(
      genPrefix.toLowerCase(java.util.Locale.ROOT)) + "_t(\\d+)").r
    spark.catalog.listTables().collect().toSeq
      .flatMap(t => re.unapplySeq(t.name).flatMap(_.headOption)
        .map(n => (n.toLong, t.name)))
      .sortBy(_._1)
      .collect { case (_, t) if spark.catalog.tableExists(s"${t}_meta") => t }
  }

  /** The live tombstone set: distinct union of every committed generation,
    * ready for the probes' `tombs` parameter and the compactors' `tombs`
    * argument. None when no takedown has ever committed — callers skip the
    * anti-join entirely rather than paying it against an empty broadcast.
    */
  def tombstones(spark: SparkSession, genPrefix: String,
                 keyCol: String = "doc_id"): Option[DataFrame] = {
    val gens = listGenerations(spark, genPrefix)
    if (gens.isEmpty) None
    else Some(gens.map(t => spark.table(t).select(col(keyCol)))
      .reduce(_ unionByName _).distinct())
  }
}
