package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.SimilarityOps

/** Ingest-time PQ INDEX MAINTENANCE — the streaming lift of the PQ
  * generation lifecycle ([[graft.functions.SimilarityOps
  * .writePqGeneration]]), completing the index-sink trio: [[IngestDedup]]
  * keeps the MinHash admission index current as documents arrive,
  * [[SemIngest]] the semantic cell index, and this sink the ANN serving
  * index. As new vectors arrive, each micro-batch is encoded under the
  * BASE layout's FROZEN codebook and appended as its own generation
  * directory — the corpus is never re-encoded, per-batch cost is linear
  * in the batch, and a probe fans in base ∪ generations
  * ([[graft.functions.SimilarityOps.pqTopKFromGenerations]]) at any
  * moment for an always-current index. [[graft.functions.SimilarityOps
  * .compactPqIndex]] folds the accumulated generations back into one
  * layout off the hot path.
  *
  * Exactly-once discipline: `foreachBatch` is at-least-once, so the
  * generation directory is KEYED BY batchId and written with overwrite —
  * a replayed batch rewrites the same generation with the same rows
  * (encode is deterministic under a frozen codebook), which is the
  * idempotent-replay shape `PqIngestSpec` pins; vec_ids therefore land in
  * exactly one generation no matter how often a batch is re-delivered.
  * Unlike the snapshot sink's committed-bucket hazard
  * (`SnapshotCrashSpec`), a generation write never reads the path it
  * overwrites, so replay is safe without a commit log.
  */
object PqIngest {

  /** Attach the generation sink to a stream of (vec_id, embedding) rows.
    * Each micro-batch becomes `genRoot/g=<batchId>` (+ `_cells` sibling).
    */
  def start(vectors: DataFrame, basePath: String, genRoot: String,
            checkpoint: String, name: String = "pq_ingest"): StreamingQuery =
    vectors.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeGeneration(batch, basePath, genPath(genRoot, batchId))
      }
      .start()

  /** One micro-batch → one generation layout (also the unit a replay
    * rewrites idempotently; exposed for the spec to re-deliver a batch).
    */
  def writeGeneration(batch: DataFrame, basePath: String,
                      genPath: String): Unit =
    SimilarityOps.writePqGenerationOf(batch.sparkSession, batch, basePath,
      genPath)

  def genPath(genRoot: String, batchId: Long): String =
    s"$genRoot/g=$batchId"

  /** The committed generations under `genRoot`, oldest first — a layout
    * counts only when BOTH its parquet dirs carry `_SUCCESS` (a crashed
    * mid-write generation is invisible to probes and simply rewritten on
    * replay, the same completeness discipline as the memoized index
    * builds). Feed to [[graft.functions.SimilarityOps
    * .pqTopKFromGenerations]] / [[graft.functions.SimilarityOps
    * .compactPqIndex]].
    */
  def listGenerations(spark: SparkSession, genRoot: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(genRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else
      fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("g=")
          && !st.getPath.getName.endsWith("_cells"))
        .sortBy(_.getPath.getName.stripPrefix("g=").toLong)
        .map(_.getPath.toUri.getPath)
        .filter(p => Seq(p, s"${p}_cells").forall(q =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$q/_SUCCESS"))))
  }
}
