package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.{DedupOps, TextAnalysis}

/** Ingest-time near-duplicate detection — the streaming lift of the batch
  * MinHash-LSH pipeline ([[graft.functions.DedupOps.minhashLsh]]): as
  * documents ARRIVE, compare each one against everything already ingested
  * and emit candidate near-dup pairs immediately, instead of re-running a
  * corpus-wide batch dedup after the fact. This is the shape a production
  * corpus pipeline runs at the front door (an online MinHash index keyed by
  * LSH band buckets).
  *
  * Two stages, both derived from the SAME constants as the batch path
  * ([[DedupOps.perms]], [[DedupOps.shingles]], [[TextAnalysis.mdhash]]) so
  * streaming and batch verdicts cannot drift (equivalence spec-asserted):
  *
  *  1. '''Stateless signature''' ([[signature]]): the 8-perm MinHash
  *     signature computed ROW-LOCALLY with higher-order functions —
  *     `array_min` over a `transform` of the shingle array — where the batch
  *     path explodes and hash-aggregates. No shuffle, stays inside codegen;
  *     each document collapses to 64 bytes before anything stateful sees it.
  *  2. '''Stateful band index''' ([[candidateStream]]):
  *     `flatMapGroupsWithState` keyed by (band, bucket-key). State per
  *     bucket is the signature list of previously-ingested member docs; a
  *     new arrival emits one candidate pair per existing member (with the
  *     signature-estimated Jaccard, k/8 — exact in doubles) and joins the
  *     bucket. Re-delivered doc_ids are ignored (the P4 offset-dedup
  *     discipline), so replays are idempotent.
  *
  * State-size discipline: state holds SIGNATURES (64 B/doc × 4 bands), never
  * text — at 100 TB that is the per-executor RocksDB-backed index every
  * online dedup service keeps, partitioned by band key exactly as this
  * stream's shuffle already distributes it. Hot buckets are the LSH-design
  * concern (more bands / wider band keys), not a plan concern.
  */
object IngestDedup {

  /** A previously-ingested bucket member: doc id + 8-value signature. */
  case class DocSig(docId: Long, sig: Seq[Long])

  /** One (band, bucket) membership row for an arriving document. */
  case class Banded(band: Int, bkey: String, docId: Long, sig: Seq[Long])

  /** A near-dup candidate: earlier-ingested id1, arriving id2, est. Jaccard. */
  case class Cand(id1: Long, id2: Long, estJaccard: Double)

  /** Row-local 8-perm MinHash signature of a text column (same values as
    * [[DedupOps.minhashSignatures]]' explode+aggregate, proven in
    * `IngestDedupSpec`). Empty array iff the doc has < 3 tokens — such docs
    * have no signature rows on the batch path either.
    *
    * Callers must pass materialized attribute columns through the stages
    * below (the [[DedupOps.shingles]] multi-reference trap): use
    * [[bandedStream]], which stages shingles → hashes → signature across
    * separate projections.
    */
  private def sigFromHashes(hs: Column): Column =
    array(DedupOps.perms.map { case (a, b) =>
      array_min(transform(hs, h => (lit(a) * h + lit(b)) % TextAnalysis.P))
    }: _*)

  /** (band, bkey, doc_id, sig) stream: 4 membership rows per document with
    * ≥ 3 tokens. Signature and band keys identical to the batch path.
    */
  def bandedStream(docs: DataFrame): Dataset[Banded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        DedupOps.shingles(TextAnalysis.tokens(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        transform(col("sh"), s => TextAnalysis.mdhash(s) % TextAnalysis.P)
          .as("hs"))
      .select(col("doc_id"), sigFromHashes(col("hs")).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            concat_ws(":", element_at(col("sig"), 2 * b + 1),
              element_at(col("sig"), 2 * b + 2)).as("bkey"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("doc_id").as("docId"), col("sig"))
      .as[Banded]
  }

  /** The online dedup verdict stream (Append mode): for every arriving doc,
    * one [[Cand]] row per already-ingested doc sharing any LSH band bucket.
    * The distinct (id1, id2) set over a fully-drained stream equals the
    * batch [[DedupOps.minhashLsh]] candidate set on the same corpus, with
    * identical `est_jaccard` (spec-asserted). Within a micro-batch, lower
    * doc_id is treated as "earlier" (deterministic batch-internal order).
    */
  def candidateStream(docs: DataFrame): Dataset[Cand] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandedStream(docs)
      .groupByKey(b => (b.band, b.bkey))
      .flatMapGroupsWithState[Seq[DocSig], Cand](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[Cand]
          rows.toSeq.sortBy(_.docId).foreach { r =>
            if (!seen.exists(_.docId == r.docId)) { // replay-idempotent (P4)
              seen.foreach { s =>
                val m = s.sig.zip(r.sig).count { case (x, y) => x == y }
                out += Cand(math.min(s.docId, r.docId),
                  math.max(s.docId, r.docId), m / 8.0)
              }
              seen = seen :+ DocSig(r.docId, r.sig)
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }
}
