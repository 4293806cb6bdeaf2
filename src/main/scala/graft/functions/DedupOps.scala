package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextAnalysis.{mdhash, tokens, P}

/** Deduplication operators for the LLM-data-pipeline surface (driver
  * contract): exact, n-gram Jaccard, MinHash+LSH banding, and SimHash.
  *
  * Scale design:
  *  - exact dedup is a hash-groupBy on a 16-byte digest, not the document
  *    body — the shuffle moves digests, never text;
  *  - MinHash compresses each document to an 8-value signature *before* any
  *    pairwise work; the LSH band self-join only materializes same-bucket
  *    candidate pairs, so cost is Σ bucket² rather than n² — the standard
  *    shingle→minhash→band→bucket-join pipeline, expressed as two hash aggs
  *    + one equi-join, all shuffling on band keys;
  *  - SimHash reduces each doc to a 32-bit fingerprint; near-dup candidates
  *    come from Hamming distance on the fingerprints, not the text.
  *
  * All hashing uses the cross-engine `mdhash` (see [[TextAnalysis]]) so each
  * pipeline is oracle-checkable in DuckDB. At 100 TB the only change is
  * swapping the final pairwise verify to run per-bucket (already the shape
  * here) and bucketing the output by doc_id.
  */
object DedupOps {

  /** Word 3-gram shingles of a token array column (distinct per doc).
    * Guarded: Spark's `sequence(0, n)` walks BACKWARDS for n < 0, so short
    * docs must short-circuit to an empty array.
    *
    * PERF: pass a *materialized attribute* (a column produced by a previous
    * projection), never `tokens(col("text"))` inline — this expression
    * references its input 5×, and expensive children referenced from
    * multiple sites are re-evaluated per reference (measured: inline
    * composition re-ran the regex tokenizer ~3× per shingle, 25s vs 2s at
    * sf0.1). [[shingleDocs]] does the split correctly.
    */
  def shingles(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(
        sequence(lit(0), size(t) - 3),
        i => concat_ws(" ",
          element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** Exact dedup via content digest (hash-groupBy): canonical keeper = min
    * doc_id per digest; emits one row per group with the copy count.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keep_doc_id"),
        max(col("doc_id")).as("max_doc_id"))

  /** Exploded (doc_id, shingle) rows — the scale-path shingle pipeline.
    *
    * Deliberately NOT explode(shingle-array): Spark's
    * InferFiltersFromGenerate + predicate pushdown substitute a generator's
    * child expression into an inferred `size(..)>0` filter, re-evaluating
    * the whole array build (and its regex tokenizer) several times per doc —
    * measured 16s vs 2s at sf0.1. Exploding cheap *positions* and building
    * each shingle per-row from the materialized token attribute leaves
    * nothing expensive for the optimizer to duplicate, and never
    * materializes a per-doc shingle array at all.
    */
  def explodedShingles(spark: SparkSession, dir: String,
                       docFilter: Column = lit(true),
                       distinctShingles: Boolean = true): DataFrame = {
    val base = Tables.documents(spark, dir).filter(docFilter)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 3)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("t"), col("i") + 1),
        element_at(col("t"), col("i") + 2),
        element_at(col("t"), col("i") + 3)).as("s"))
    if (distinctShingles) base.distinct() else base
  }

  /** Shared Jaccard tail: per-pair intersection counts + per-doc shingle
    * counts → |A∩B| / |A∪B|, thresholded in exact DECIMAL, DOUBLE at the
    * serving edge (emitted decimals hash differently across engines).
    */
  private def jaccardFromInter(inter: DataFrame, counts: DataFrame,
                               minJaccard: Double): DataFrame =
    inter
      .join(counts.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(counts.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("jaccard",
        bround(col("n_inter").cast("double") / (col("n1") + col("n2") - col("n_inter")), 6)
          .cast("decimal(10,6)"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("n_inter"), col("n1"), col("n2"),
        col("jaccard").cast("double").as("jaccard"))

  /** Exact n-gram Jaccard over all pairs in a bounded id range: explode
    * distinct shingles, self-join on shingle (the intersection), derive the
    * union from per-doc counts. The id bound keeps the demonstration
    * quadratic-free — this form is the yardstick; the SCALE path is
    * [[ngramJaccardLsh]], which runs the identical exact verify on LSH
    * candidates only, with no id bound.
    */
  def ngramJaccard(spark: SparkSession, dir: String,
                   maxDocId: Long = 200, minJaccard: Double = 0.02): DataFrame = {
    val ex = TransientCache(explodedShingles(spark, dir, col("doc_id") < maxDocId))
    val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_inter"))
    jaccardFromInter(inter, counts, minJaccard)
  }

  /** The 100 TB n-gram verify: exact Jaccard computed ONLY on
    * [[minhashLsh]] candidate pairs — banding generates candidates, the
    * exact verify confirms them, and nothing quadratic ever materializes
    * (no doc-id bound; `PlanSpec` forbids cartesian/nested-loop here).
    * Shuffle shape: candidates join the exploded shingles on id1, then on
    * (id2, shingle) — cost is Σ over candidates |shingles|, not n².
    */
  def ngramJaccardLsh(spark: SparkSession, dir: String,
                      minJaccard: Double = 0.02): DataFrame = {
    val (inter, counts) = lshCandidateIntersection(spark, dir)
    jaccardFromInter(inter, counts, minJaccard)
  }

  /** Shared candidate-verify front half of [[ngramJaccardLsh]] and
    * [[minhashContainment]]: LSH candidate pairs, per-doc distinct shingle
    * counts, and the per-pair exact intersection size — so the two scorers
    * cannot drift in candidate generation or intersection semantics.
    */
  private def lshCandidateIntersection(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val cand = minhashLsh(spark, dir).select(col("id1"), col("id2"))
    val ex = explodedShingles(spark, dir)
    val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(ex.as("a"), col("id1") === col("a.doc_id"))
      .join(ex.as("b"), col("id2") === col("b.doc_id") && col("a.s") === col("b.s"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("n_inter"))
    (inter, counts)
  }

  /** The full MinHash-LSH near-dup pipeline over an ARBITRARY distinct
    * (doc_id, s) shingle frame: 8-perm signatures → 4×2 banding self-join
    * for candidates → exact shingle-Jaccard verify on candidates only —
    * the [[ngramJaccardLsh]] discipline with the shingle definition
    * abstracted out, so non-text modalities can reuse it wholesale
    * ([[graft.functions.MultimodalOps.mediaDedup]] feeds BYTE-window
    * shingles of media blobs through here). Cost: Σ bucket² candidates,
    * never n²; shuffles move 64 B signatures and candidate-bounded
    * shingle rows, never full payloads.
    */
  private[graft] def lshJaccardOver(ex: DataFrame, minJaccard: Double): DataFrame = {
    val sig = TransientCache(signaturesFrom(ex.withColumn("h", mdhash(col("s")))))
    val bands = bandKeys(sig)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(ex.as("a"), col("id1") === col("a.doc_id"))
      .join(ex.as("b"), col("id2") === col("b.doc_id") && col("a.s") === col("b.s"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("n_inter"))
    jaccardFromInter(inter, counts, minJaccard)
  }

  /** Asymmetric shingle CONTAINMENT on the LSH candidates (Broder 1997:
    * C(A,B) = |A∩B| / |A|) — the partial-duplication detector Jaccard
    * structurally misses: a short document quoted verbatim inside a long
    * one has Jaccard ≈ |A|/|B| (tiny) but containment ≈ 1. Same candidate
    * front-end and exact-verify discipline as [[ngramJaccardLsh]] (shuffles
    * bounded by candidates, never all-pairs); both directions and their max
    * are emitted so a consumer can pick quote-detection (max) or
    * subset-detection (directional). NOTE the candidates still come from
    * the Jaccard-tuned 4×2 banding — at scale a containment-tuned index
    * bands the SHORTER side's shingles only (sketch of Broder's modified
    * scheme); the verify stage here is front-end-agnostic.
    */
  def minhashContainment(spark: SparkSession, dir: String,
                         minContainment: Double = 0.1): DataFrame = {
    val (inter, counts) = lshCandidateIntersection(spark, dir)
    inter
      .join(counts.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(counts.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("c1",
        bround(col("n_inter").cast("double") / col("n1"), 6).cast("decimal(10,6)"))
      .withColumn("c2",
        bround(col("n_inter").cast("double") / col("n2"), 6).cast("decimal(10,6)"))
      .withColumn("cmax", greatest(col("c1"), col("c2")))
      .filter(col("cmax") >= minContainment)
      .select(col("id1"), col("id2"), col("n_inter"), col("n1"), col("n2"),
        col("c1").cast("double").as("containment_1"),
        col("c2").cast("double").as("containment_2"),
        col("cmax").cast("double").as("containment"))
  }

  /** MinHash permutation constants (a·x + b mod P, P = 2^31−1): fixed public
    * pseudo-random values; signature length 8, banded 4×2.
    */
  val perms: Seq[(Long, Long)] = Seq( // public: oracle SQL generates from these
    (1686629713L, 411L), (1583082576L, 92L), (722129567L, 51001L),
    (1546453463L, 8191L), (910672911L, 77L), (1033668507L, 131071L),
    (650686437L, 524287L), (1217100571L, 3301L))

  private def minhashCol(k: Int): Column = {
    val (a, b) = perms(k)
    min((lit(a) * (col("h") % P) + b) % P).as(s"m$k")
  }

  /** The 4×2 LSH banding of an 8-value signature frame — one (doc_id,
    * band, bkey) row per band. The single definition used by every banding
    * consumer ([[minhashLsh]], [[shardDedup]], [[writeMinhashIndex]],
    * [[shardDedupFromIndex]]) so the live and stored band keys cannot
    * drift.
    */
  private[graft] def bandKeys(sig: DataFrame): DataFrame =
    (0 until 4).map { b =>
      sig.select(col("doc_id"), lit(b).as("band"),
        concat_ws(":", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("bkey"))
    }.reduce(_ union _)

  /** MinHash signatures (8 perms) per document. One explode + one hash agg;
    * the signature is 64 bytes per doc regardless of document size.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signaturesFrom(explodedShingles(spark, dir, distinctShingles = false)
      .withColumn("h", mdhash(col("s"))))

  /** Signature build over an already-exploded-and-hashed (doc_id, s, h)
    * frame — the single definition of the 8-perm scheme; [[shardDedup]]
    * shares it so the shard gate and the LSH views cannot drift.
    */
  private[graft] def signaturesFrom(exHashed: DataFrame): DataFrame = {
    // distinct unnecessary: MIN over a multiset equals MIN over its set
    exHashed
      .groupBy("doc_id")
      .agg(minhashCol(0), minhashCol(1), minhashCol(2), minhashCol(3),
           minhashCol(4), minhashCol(5), minhashCol(6), minhashCol(7))
  }

  /** MinHash + LSH near-dup candidates: band the 8-value signature into 4
    * bands of 2, self-join per band bucket, dedup pairs, and attach the
    * signature-estimated similarity (matching minhash fraction). The band
    * join is the scale path: only same-bucket pairs ever materialize.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = TransientCache(minhashSignatures(spark, dir))
    val bands = bandKeys(sig)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    val est = cand
      .join(sig.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sig.as("s2"), col("id2") === col("s2.doc_id"))
    val matches = (0 until 8).map(k =>
      when(col(s"s1.m$k") === col(s"s2.m$k"), 1).otherwise(0)).reduce(_ + _)
    // k/8 is exactly representable at scale 6 (no rounding tie possible);
    // emit DOUBLE — decimal outputs hash differently across engines
    est.select(col("id1"), col("id2"),
      (matches.cast("double") / 8).cast("decimal(10,6)").cast("double")
        .as("est_jaccard"))
  }

  /** Incremental shard-vs-corpus dedup — the production admission gate for
    * continuously-ingested training data: an incoming SHARD (here docs with
    * `doc_id % 10 = 7`) is deduplicated against the already-accepted
    * CORPUS (all other docs) WITHOUT ever re-deduplicating the corpus
    * against itself. The batch analog of the stateful streaming index in
    * [[graft.streaming.IngestDedup]], sharing its asymmetric semantics.
    *
    * Pipeline: the production 4×2 MinHash banding on both sides, shard
    * bands probe corpus bands via one equi-join on (band, bucket-key) —
    * never a cross join — then the exact n-gram Jaccard verify runs on
    * candidate pairs only (the [[ngramJaccardLsh]] discipline). Per shard
    * doc: candidate count, verified-duplicate count (exact Jaccard ≥ τ in
    * DECIMAL), the best-matching corpus doc (rank-1 by Jaccard desc,
    * corpus id asc — deterministic), and the admit verdict.
    *
    * At 100 TB: corpus signatures/bands are a PRECOMPUTED index table
    * maintained by ingest (64 bytes/doc — here derived inline from the same
    * scan for the gate); the shard probes it with one shuffle on the band
    * key. The exact verify PRUNES the shingle index to candidate doc ids
    * via a broadcast semi-join BEFORE joining — corpus shingles are read
    * once at scan speed but NEVER shuffled; every exchange in the verify is
    * bounded by the candidate docs' shingles. Corpus text never moves.
    * Admission cost = one banding-index probe + one broadcast-pruned scan
    * of the shingle index + candidate-bounded shuffles; with the index
    * bucketed by doc_id the scan partition-prunes too, making the per-shard
    * marginal cost O(shard + candidates).
    */
  def shardDedup(spark: SparkSession, dir: String,
                 minJaccard: Double = 0.5): DataFrame = {
    val isShard = col("doc_id") % 10 === 7
    // One shared exploded-shingle DEFINITION feeds both the signature build
    // and the exact-verify index (deliberately NOT cached: materializing the
    // full corpus shingle set costs more than the second tokenizer pass it
    // saves — measured at sf0.1; the verify-side read is broadcast-pruned to
    // candidates before anything heavy happens). At 100 TB both derivations
    // are PRECOMPUTED index tables maintained by ingest — neither tokenizer
    // pass exists at query time.
    val ex = explodedShingles(spark, dir, distinctShingles = false)
      .withColumn("h", mdhash(col("s")))
    val sig = TransientCache(signaturesFrom(ex))
    val bands = bandKeys(sig)
    // cached: the candidate-pair set is bounded by the banding probe and is
    // read four times below (intersection, score join-back, both sides of
    // the candidate-id prune)
    val cand = TransientCache(bands.filter(isShard).as("x")
      .join(bands.filter(!isShard).as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("shard_id"), col("y.doc_id").as("corpus_id"))
      .distinct())
    // candidate doc ids (both sides) — bounded by the banding probe,
    // usually tiny relative to the corpus; broadcast so the semi-join
    // prunes the shingle scan WITHOUT shuffling it. This is what keeps the
    // verify candidates-bounded: only pruned shingles ever enter an
    // exchange. GUARDED: a forced broadcast hint bypasses
    // autoBroadcastJoinThreshold, so an unbounded candIds would hit the
    // 8 GB broadcast limit / driver OOM on adversarial inputs. Band-bucket
    // blowup inflates candidate PAIRS (~ Σ bucket²), but candIds is a set
    // of doc IDS — bounded by |documents| — so the cheap primary guard is
    // the parquet row count (footer metadata, no data scan). Only past 8M
    // docs does the real |candIds| count run (an agg over the cached cand,
    // not a recompute); past 8M ids (~128 MB) degrade to a shuffled
    // left-semi, which is slower but finishes. NOTE the hint is
    // load-bearing vs letting AQE decide: AQE converts the SortMergeJoin
    // to broadcast only AFTER the static plan placed a shuffle under the
    // corpus-shingle side — the 100 TB scale-killer this prune exists to
    // avoid — whereas the hint keeps any exchange off that side entirely.
    val candIds = cand.select(col("shard_id").as("doc_id"))
      .union(cand.select(col("corpus_id").as("doc_id")))
      .distinct()
    val broadcastSafe = Tables.rowCount(spark, dir, "documents") <= 8000000L ||
      candIds.count() <= 8000000L
    val prunedIds = if (broadcastSafe) broadcast(candIds) else candIds
    // cached: the pruned DISTINCT shingle set is candidate-bounded (small)
    // and read three times below (counts + both sides of the intersection
    // join) — uncached, each read re-ran the corpus tokenizer (the r7 local
    // regression). Prune BEFORE distinct so the dedup shuffle is
    // candidate-bounded too.
    val exCand = TransientCache(ex.select(col("doc_id"), col("s"))
      .join(prunedIds, Seq("doc_id"), "left_semi")
      .distinct())
    val counts = exCand.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(exCand.as("a"), col("shard_id") === col("a.doc_id"))
      .join(exCand.as("b"), col("corpus_id") === col("b.doc_id") && col("a.s") === col("b.s"))
      .groupBy("shard_id", "corpus_id")
      .agg(count(lit(1)).as("n_inter"))
    admissionVerdicts(
      Tables.documents(spark, dir).filter(isShard), cand, inter, counts,
      minJaccard)
  }

  /** Shared admission tail of [[shardDedup]] and [[shardDedupFromIndex]]:
    * score candidate pairs (LEFT join back to `cand` — a banding false
    * positive CAN share zero shingles via a min-hash collision without set
    * overlap; it must still count as a candidate, at Jaccard 0), roll up
    * per shard doc, pick the deterministic rank-1 best duplicate, and emit
    * one verdict row per shard doc. `counts` must cover every doc id
    * appearing in `cand` (both sides).
    */
  private def admissionVerdicts(docsShard: DataFrame, cand: DataFrame,
                                inter: DataFrame, counts: DataFrame,
                                minJaccard: Double): DataFrame = {
    val scored = cand
      .join(inter, Seq("shard_id", "corpus_id"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.withColumnRenamed("doc_id", "shard_id")
        .withColumnRenamed("n_sh", "n1"), "shard_id")
      .join(counts.withColumnRenamed("doc_id", "corpus_id")
        .withColumnRenamed("n_sh", "n2"), "corpus_id")
      .withColumn("j",
        bround(col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")), 6).cast("decimal(10,6)"))
    val roll = scored.groupBy("shard_id").agg(
      count(lit(1)).as("n_cand"),
      sum(when(col("j") >= minJaccard, 1L).otherwise(0L)).as("n_dup"))
    val best = scored.filter(col("j") >= minJaccard)
      .withColumn("rn", row_number().over(
        Window.partitionBy("shard_id")
          .orderBy(col("j").desc, col("corpus_id"))))
      .filter(col("rn") === 1)
      .select(col("shard_id"), col("corpus_id").as("best_dup_id"),
        col("j").cast("double").as("best_jaccard"))
    docsShard
      .select(col("doc_id"))
      .join(roll.withColumnRenamed("shard_id", "doc_id"), Seq("doc_id"), "left")
      .join(best.withColumnRenamed("shard_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        col("best_dup_id"), col("best_jaccard"),
        (coalesce(col("n_dup"), lit(0L)) === 0).as("admit"))
  }

  /** Materialize the corpus-side MinHash admission index in the at-scale
    * layout [[shardDedup]]'s Scaladoc promises — the same stored-index
    * discipline as the BM25 postings ([[TextAnalysis.writePostingsIndex]])
    * and PQ code ([[SimilarityOps.writePqIndex]]) layouts. Three tables,
    * all maintained by ingest at 100 TB (each admitted shard appends its
    * own rows — cost linear in the shard, the corpus is never re-scanned):
    *
    *  - `<table>_bands`: the 4×2 banding keys (doc_id, band, bkey),
    *    bucketed AND sorted by (band, bkey) — an oversized shard probe
    *    sort-merges against it with the exchange on the SHARD side only;
    *  - `<table>_shingles`: the distinct (doc_id, shingle) exact-verify
    *    index, bucketed by doc_id;
    *  - `<table>_counts`: per-doc distinct-shingle counts (derived from
    *    the STORED shingle table, so count and index cannot disagree).
    *
    * The corpus tokenizer pass happens HERE, once, at index-build time —
    * at probe time corpus text does not exist in the plan at all.
    */
  def writeMinhashIndex(spark: SparkSession, dir: String,
                        table: String = "minhash_index",
                        buckets: Int = 16): Unit =
    writeMinhashGeneration(spark, dir, col("doc_id") % 10 =!= 7, table,
      buckets)

  /** Session-memoized stored-index handle for [[shardDedupFromIndex]]:
    * returns the index table prefix, building it only when missing or
    * stale. Two hazards the naive `dir.hashCode` + `tableExists` memo had
    * (ADVICE r8), both closed here:
    *
    *  - ALIASING: the table name is derived from an MD5 of the CANONICAL
    *    dir path (hashCode collisions or `a/../b` spellings of the same dir
    *    must never alias two corpora onto one index), and the build is
    *    skipped only when ALL FOUR tables (bands/shingles/counts/meta)
    *    exist — a build interrupted mid-way fails the completeness check
    *    instead of failing at probe time;
    *  - STALENESS: a one-row `_meta` table records the corpus fingerprint
    *    (row count + max doc_id + per-file length/mtime signature, read
    *    FRESH from the files, bypassing the [[graft.sources.Tables]] plan
    *    memo) at build time; a mismatch at probe time means the documents
    *    were regenerated in place — including a regeneration that keeps
    *    count and max id but rewrites content (ADVICE r9) — so every
    *    derived cache for the dir is invalidated and the index rebuilt;
    *  - CONCURRENCY: the check-and-build is serialized per index key
    *    ([[indexLocks]]) so two in-process callers can't interleave
    *    DROP/CTAS on the same tables.
    */
  /** One lock per index key: two concurrent callers for the same dir (e.g.
    * two Serve requests) must not interleave clearIndexLayout/DROP/CTAS on
    * the same tables — the in-process twin of the cross-process race the
    * per-PID warehouse closes (ADVICE r9). `computeIfAbsent` hands both
    * callers the SAME monitor, so exactly one builder runs per key and the
    * loser re-checks freshness against the finished build.
    */
  private[graft] val indexLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def memoizedMinhashIndex(spark: SparkSession, dir: String): String = {
    val canon = new java.io.File(dir).getCanonicalPath
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val table = s"minhash_idx_$key"
    indexLocks.computeIfAbsent(table, _ => new Object).synchronized {
      val fp = corpusFingerprint(spark, dir)
      val complete = Seq("_bands", "_shingles", "_counts", "_meta")
        .forall(sfx => spark.catalog.tableExists(s"$table$sfx"))
      val fresh = complete && {
        val m = spark.table(s"${table}_meta").head()
        m.length == 3 && (m.getLong(0), m.getLong(1), m.getLong(2)) == fp
      }
      if (!fresh) {
        invalidateDerived(dir) // plan/count memos + cluster views are stale too
        writeMinhashIndex(spark, dir, table)
        import spark.implicits._
        Seq(fp).toDF("n_rows", "max_doc_id", "file_sig")
          .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
      }
    }
    table
  }

  /** (row count, max doc_id, file signature) of the dir's documents table,
    * read fresh from the parquet files — deliberately NOT via
    * [[graft.sources.Tables]], whose memoized file listing is exactly what
    * goes stale when data is regenerated in place. The first two come from
    * footer metadata + one long-column scan; the third folds every data
    * file's (path, length, mtime) so an IN-PLACE regeneration that happens
    * to preserve both row count and max doc_id (same scale factor with a
    * new seed, edited text bodies — ADVICE r9) still flips the
    * fingerprint: rewriting a parquet file changes its mtime and almost
    * always its compressed length. Pure file-listing cost — no data read.
    * (Residual blind spot: a rewrite producing byte-identical length
    * within the same millisecond — indistinguishable without hashing the
    * bytes, which would make every probe corpus-sized.)
    */
  private def corpusFingerprint(spark: SparkSession, dir: String): (Long, Long, Long) =
    fileFingerprint(spark, s"$dir/documents.parquet", "doc_id")

  /** The generic form of [[corpusFingerprint]], shared with the postings
    * ([[TextAnalysis.memoizedPostingsIndex]]) and PQ/cell
    * ([[SimilarityOps.memoizedPqIndex]]) memos, which fingerprint their own
    * source tables with their own id columns.
    */
  private[graft] def fileFingerprint(spark: SparkSession, path: String,
                                     idCol: String): (Long, Long, Long) = {
    val r = spark.read.parquet(path)
      .agg(count(lit(1)).as("n"),
        coalesce(max(col(idCol)), lit(-1L)).as("mx")).head()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    // summed per-file terms: independent of listing order. Each term is ONE
    // mixed 64-bit hash over (full path, length, mtime) — separate linear
    // terms summed per field let offsetting changes across files cancel,
    // and a basename-only path term aliased identically-named part files
    // across partition subdirectories (ADVICE r10). FNV-1a over the joined
    // string is cancellation-resistant while staying listing-cost-only.
    var sig = 0L
    while (it.hasNext) {
      val st = it.next()
      if (!st.getPath.getName.startsWith("_")) {
        val s = st.getPath.toString + "|" + st.getLen + "|" + st.getModificationTime
        var h = 0xcbf29ce484222325L // FNV-1a 64-bit
        var i = 0
        while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
        sig += h
      }
    }
    (r.getLong(0), r.getLong(1), sig)
  }

  /** Invalidate every session cache derived from the dir's data files:
    * the [[graft.sources.Tables]] plan/count memos plus BOTH memoized
    * cluster views ([[invalidateClusterCache]] here and its semantic twin
    * in [[graft.functions.SimilarityOps]] — previously only the dedup one
    * had an invalidation hook, ADVICE r8). Call after regenerating data
    * under a live session.
    */
  def invalidateDerived(dir: String): Unit = {
    Tables.invalidate(dir)
    invalidateClusterCache()
    SimilarityOps.invalidateSemClusterCache()
    SimilarityOps.invalidateSemDeltaCache()
    // the PERSISTED rankedAssignment DataFrames would otherwise keep
    // serving pre-regeneration embedding data (cached blocks don't re-read
    // files) — the same stale-view hazard the sem-cluster clear closed in
    // r8, one layer down
    SimilarityOps.invalidateIvfCache()
  }

  /** Index ONE document subset (the `docFilter` predicate) into its own
    * generation of the three-table layout — the ingest-lifecycle move:
    * after a shard passes the admission gate, its ADMITTED docs are indexed
    * as a delta generation (cost linear in the shard; the corpus is never
    * re-scanned) and the next shard probes base ∪ deltas via
    * [[shardDedupFromGenerations]]. Docs are append-only (each doc_id lives
    * in exactly one generation) — the same discipline as the BM25
    * generations in [[TextAnalysis.writePostingsGeneration]]; a replayed
    * doc id is the self-rejection case the spec pins, not an update.
    */
  /** An index writer owns its layout: clear both the catalog entries AND
    * any stale managed locations (an interrupted build leaves the directory
    * behind without a catalog row, which CTAS then refuses to overwrite).
    */
  private def clearIndexLayout(spark: SparkSession, table: String): Unit =
    Seq(s"${table}_bands", s"${table}_shingles", s"${table}_counts",
        s"${table}_meta")
      .foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), t)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }

  def writeMinhashGeneration(spark: SparkSession, dir: String,
                             docFilter: Column,
                             table: String,
                             buckets: Int = 16): Unit = {
    clearIndexLayout(spark, table)
    val ex = explodedShingles(spark, dir, docFilter, distinctShingles = false)
      .withColumn("h", mdhash(col("s")))
    bandKeys(signaturesFrom(ex))
      .write.mode("overwrite")
      .bucketBy(buckets, "band", "bkey").sortBy("band", "bkey")
      .format("parquet").saveAsTable(s"${table}_bands")
    ex.select(col("doc_id"), col("s")).distinct()
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${table}_shingles")
    spark.table(s"${table}_shingles")
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_counts")
  }

  /** [[shardDedup]] probing the STORED corpus index
    * ([[writeMinhashIndex]]) instead of deriving it inline — the form that
    * actually runs at 100 TB, spec-asserted row-identical to the live gate.
    * The only `documents` scans left in the plan are the SHARD's (its
    * shingles + the final verdict join); every corpus-derived input comes
    * from the index tables:
    *
    *  - band probe: broadcast(shard bands) ⋈ stored bands — zero exchange
    *    on the index side (a shard too large to broadcast degrades to a
    *    sort-merge where the (band, bkey) bucketing keeps the exchange off
    *    the index side — the layout's second job);
    *  - exact verify: stored shingles broadcast-semi-pruned to candidate
    *    corpus ids ([[shardDedup]]'s candidate-bounded discipline), stored
    *    counts pruned the same way — no probe-time exchange is ever
    *    corpus-sized.
    */
  def shardDedupFromIndex(spark: SparkSession, dir: String,
                          table: String = "minhash_index",
                          minJaccard: Double = 0.5): DataFrame =
    shardDedupFromGenerations(spark, dir, Seq(table), minJaccard)

  /** Gated-query form of the admission probe under TOMBSTONES: corpus
    * docs doc_id % 37 = 3 are taken down (derived from the stored counts
    * table — the corpus is not scanned), so they can no longer block a
    * shard doc's admission. Oracle:
    * [[graft.oracle.TextSql.shardDedupDeletedSql]] — the same admission
    * arithmetic over a corpus that never contained the deleted docs.
    */
  def shardDedupDeleted(spark: SparkSession, dir: String): DataFrame = {
    val table = memoizedMinhashIndex(spark, dir)
    val tombs = spark.table(s"${table}_counts")
      .select(col("doc_id")).filter(col("doc_id") % 37 === 3)
    shardDedupFromGenerations(spark, dir, Seq(table), tombs = Some(tombs))
  }

  /** The admission probe over base ∪ delta generations
    * ([[writeMinhashGeneration]]): each generation's three tables union
    * BELOW the probe joins, so every generation scan keeps its own
    * bucketing/pruning and the probe cost stays candidates-bounded
    * regardless of generation count; [[compactMinhashIndex]] folds deltas
    * back into one base when fan-in grows. Counts are max-collapsed per
    * doc_id: a REPLAYED shard doc (present in a generation) contributes a
    * (doc_id, n_sh) row from both the live shard side and the stored side —
    * when they agree the max collapses them to one, so the self-pair scores
    * Jaccard 1.0 and the doc self-rejects (the idempotent-replay semantics
    * the spec pins); if tokenizer drift ever makes the two counts DISagree,
    * one row per doc_id still survives, shifting a score (loud in the
    * oracle) instead of duplicating scored pairs.
    */
  def shardDedupFromGenerations(spark: SparkSession, dir: String,
                                tables: Seq[String],
                                minJaccard: Double = 0.5,
                                tombs: Option[DataFrame] = None): DataFrame = {
    require(tables.nonEmpty, "at least one index generation required")
    def gen(suffix: String): DataFrame =
      tables.map(t => spark.table(s"$t$suffix")).reduce(_ unionByName _)
    val isShard = col("doc_id") % 10 === 7
    val ex = explodedShingles(spark, dir, isShard, distinctShingles = false)
      .withColumn("h", mdhash(col("s")))
    val shardBands = bandKeys(signaturesFrom(ex))
    // shard-bounded by the admission premise (a shard is one ingest batch,
    // not a corpus); guarded like shardDedup's candIds broadcast — past the
    // bound the hint is dropped and the bucketed layout carries the join
    val shardSmall = Tables.rowCount(spark, dir, "documents") <= 8000000L
    val probe = if (shardSmall) broadcast(shardBands) else shardBands
    val candAll = probe.as("x")
      .join(gen("_bands").as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("shard_id"), col("y.doc_id").as("corpus_id"))
      .distinct()
    // DELETION without a rebuild (takedown): tombstoned corpus docs stop
    // producing admission candidates via one broadcast anti-join here —
    // everything downstream (shingle verify, counts, verdicts) is
    // candidate-bounded, so the deleted docs vanish from the whole probe
    // and the result equals an index never containing them. The shard
    // side is the INCOMING batch and is never tombstoned. Folding the
    // tombstones into the layout happens off the hot path via
    // [[compactMinhashIndex]]'s `tombs` parameter.
    val cand = TransientCache(tombs.fold(candAll)(t => candAll.join(
        broadcast(t.select(col("doc_id").as("corpus_id"))),
        Seq("corpus_id"), "left_anti")))
    val corpusIds = cand.select(col("corpus_id").as("doc_id")).distinct()
    // guarded by the INDEX, not the probe dir: the stored index is
    // decoupled from the dir's documents table, so shard size says nothing
    // about how many corpus ids a hot band key pulls in. The sound cheap
    // bound is |corpusIds| ≤ |indexed docs| = Σ row counts of the stored
    // _counts tables — a parquet-footer-metadata count, NO extra plan
    // work (the first guard draft ran corpusIds.count() unconditionally,
    // which forced the whole band-probe join as an extra job per probe
    // and made the indexed probe 2× SLOWER than the live gate). Only a
    // genuinely big index pays the exact candidate count before giving up
    // the broadcast.
    val indexedDocs = tables.map(t => spark.table(s"${t}_counts").count()).sum
    val prunedCorpusIds =
      if (indexedDocs <= 8000000L || corpusIds.count() <= 8000000L)
        broadcast(corpusIds)
      else corpusIds
    val exCorpus = gen("_shingles")
      .join(prunedCorpusIds, Seq("doc_id"), "left_semi")
    val exShard = ex.select(col("doc_id"), col("s")).distinct()
    // aggregated, NOT distinct-unioned: a replayed shard doc contributes a
    // (doc_id, n_sh) row from both the live side and the stored side — when
    // they agree the max collapses them exactly like distinct did, and if
    // tokenizer drift ever makes them DISagree, one row per doc_id still
    // survives, so the inner count joins in admissionVerdicts can never
    // silently multiply scored rows (a drifted count shifts a score — loud
    // in the oracle — rather than duplicating pairs).
    val counts = exShard.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .union(gen("_counts")
        .join(prunedCorpusIds, Seq("doc_id"), "left_semi"))
      .groupBy("doc_id").agg(max(col("n_sh")).as("n_sh"))
    val inter = cand
      .join(exShard.as("a"), col("shard_id") === col("a.doc_id"))
      .join(exCorpus.as("b"),
        col("corpus_id") === col("b.doc_id") && col("a.s") === col("b.s"))
      .groupBy("shard_id", "corpus_id")
      .agg(count(lit(1)).as("n_inter"))
    admissionVerdicts(
      Tables.documents(spark, dir).filter(isShard), cand, inter, counts,
      minJaccard)
  }

  /** Compaction: merge index generations back into one bucketed base
    * (same discipline as [[TextAnalysis.compactPostings]]) — one bucketed
    * rewrite of each table's union, after which probes pay
    * single-generation fan-in again. Spec-asserted: a probe over the
    * compacted base is row-identical to the multi-generation probe.
    */
  def compactMinhashIndex(spark: SparkSession, tables: Seq[String],
                          outTable: String, buckets: Int = 16,
                          tombs: Option[DataFrame] = None): Unit = {
    clearIndexLayout(spark, outTable)
    // tombstones are APPLIED at compaction (rows dropped from all three
    // tables), so the plain probe serves the deleted state afterwards
    def merge(suffix: String) = {
      val u = tables.map(t => spark.table(s"$t$suffix")).reduce(_ unionByName _)
      tombs.fold(u)(t => u.join(broadcast(t.select(col("doc_id"))),
        Seq("doc_id"), "left_anti"))
    }
    merge("_bands").write.mode("overwrite")
      .bucketBy(buckets, "band", "bkey").sortBy("band", "bkey")
      .format("parquet").saveAsTable(s"${outTable}_bands")
    merge("_shingles").write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(s"${outTable}_shingles")
    merge("_counts").write.mode("overwrite")
      .format("parquet").saveAsTable(s"${outTable}_counts")
  }

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
      val prop = labels.as("l")
        .join(nbrMin, col("v") === col("src"), "left")
        .select(col("v"),
          least(col("l.label"), coalesce(col("nl"), col("l.label"))).as("label"))
      val jumped = prop.as("a")
        .join(prop.select(col("v").as("lv"), col("label").as("ll")),
          col("a.label") === col("lv"), "left")
        .select(col("v"), coalesce(col("ll"), col("a.label")).as("label"))
      val cmp = jumped
        .join(labels.select(col("v").as("ov"), col("label").as("old")),
          col("v") === col("ov"))
        .select(col("v"), col("label"), col("old"))
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
    untouched.union(recomputed)
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
    val tombs = tombs0.toDF("doc_id").localCheckpoint()
    val affLabels = baseAssign.join(broadcast(tombs), "doc_id")
      .select(col("cluster_id")).distinct().localCheckpoint()
    val untouched = baseAssign
      .join(broadcast(affLabels), Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"), col("keep"))
    val survivors = baseAssign
      .join(broadcast(affLabels), Seq("cluster_id"), "left_semi")
      .join(broadcast(tombs), Seq("doc_id"), "left_anti")
      .select(col("doc_id")).localCheckpoint()
    untouched.union(componentsOver(edgesAmong(survivors)))
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
    new BoundedMemo[(SparkSession, String), (DataFrame, DataFrame)](
      4, _._1.unpersist())

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
    val isShard = col("doc_id") % 10 === 7
    val (bandsBase, baseAssign) = deltaBaseCache.getOrBuild((spark, dir)) {
      val sigBase = signaturesFrom(
        explodedShingles(spark, dir, !isShard, distinctShingles = false)
          .withColumn("h", mdhash(col("s")))).cache()
      val bb = bandKeys(sigBase).cache()
      val baseCand = bb.as("x").join(bb.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .distinct()
      val v = (bb, componentsOver(baseCand).localCheckpoint())
      // componentsOver is eager, so bb's cache is populated by now and
      // the signature frame has served its 4-band fan-out — release it
      // rather than pinning a corpus-sized relation for the session
      sigBase.unpersist()
      v
    }
    // pin the shard SIGNATURES, not just the bands: the probe (cross) and
    // the shard self-join (within) are separate plan branches, so without
    // the cache the shard shingle+minhash pipeline — the expensive part of
    // a steady-state read — executed once per branch (measured 2× at
    // sf0.1). componentsDelta consumes the candidate union eagerly, so the
    // pin can be released as soon as it returns.
    val sigShard = signaturesFrom(
      explodedShingles(spark, dir, isShard, distinctShingles = false)
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
    val out = componentsDelta(baseAssign, cross.union(within).distinct())
    sigShard.unpersist()
    out
  }

  /** SimHash: 32-bit locality-sensitive fingerprint per document — for each
    * bit position, sum ±1 contributions of every token hash, take the sign.
    * Expressed as explode(tokens × 32 bit-positions) + hash agg: integer
    * arithmetic end-to-end, exact in both engines.
    */
  def simhash(spark: SparkSession, dir: String, maxDocId: Long = Long.MaxValue): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < maxDocId)
    // two-step select: explode an attribute, not the regex expression — the
    // optimizer's inferred generate-filters would re-run an inline tokenizer
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .withColumn("h", mdhash(col("tok")))
    val bits = toks.select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("contrib",
        when(expr("shiftright(h, b) & 1") === 1, 1).otherwise(-1))
    bits.groupBy("doc_id", "b")
      .agg(sum(col("contrib")).as("bitsum"))
      .groupBy("doc_id")
      .agg(sum(when(col("bitsum") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(0L)).as("simhash32"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming via
    * bit_count(xor). The fingerprint comparison never touches the text.
    *
    * Scale shape (pigeonhole banding, the standard simhash index): split the
    * 32-bit fingerprint into (maxHamming+1) disjoint bit segments. Two
    * fingerprints within Hamming ≤ maxHamming differ in ≤ maxHamming
    * segments, so they AGREE exactly on ≥ 1 segment — candidate generation
    * is therefore an EQUI-join on (segment_index, segment_value) with
    * perfect recall, never an all-pairs nested loop. Cost is Σ bucket², like
    * MinHash banding; the Hamming verify runs only on candidates. The
    * round-1 version was a bounded cartesian join (`doc_id < maxDocId` was
    * load-bearing); the bound is now just a demo default, not a crutch —
    * `PlanSpec` asserts no CartesianProduct/BroadcastNestedLoopJoin here.
    */
  def simhashPairs(spark: SparkSession, dir: String,
                   maxDocId: Long = 300, maxHamming: Int = 6): DataFrame = {
    val nSeg = maxHamming + 1
    // segment boundaries: spread 32 bits as evenly as possible (e.g. 7 segs
    // → widths 5,5,5,5,4,4,4); seg k covers bits [lo(k), lo(k+1))
    val bounds = (0 to nSeg).map(k => k * 32 / nSeg)
    val fp = simhash(spark, dir, maxDocId)
    val segs = fp.select(col("doc_id"), col("simhash32"),
      explode(array((0 until nSeg).map { k =>
        val lo = bounds(k); val width = bounds(k + 1) - lo
        struct(lit(k).as("seg"),
          (shiftright(col("simhash32"), lo) % (1L << width)).as("segval"))
      }: _*)).as("s"))
      .select(col("doc_id"), col("simhash32"),
        col("s.seg").as("seg"), col("s.segval").as("segval"))
    segs.as("a").join(segs.as("b"),
        col("a.seg") === col("b.seg") && col("a.segval") === col("b.segval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.simhash32").bitwiseXOR(col("b.simhash32"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may collide in several segments
  }

  /** Cross-document substring duplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", at token-n-gram
    * granularity): per document, how many of its token L-gram positions
    * carry an L-gram that also occurs in at least one OTHER document — the
    * memorization-risk signal that motivates substring-level dedup, distinct
    * from the per-PAIR similarity family (Jaccard/MinHash/SimHash measure
    * how alike two docs are; this measures how much of each doc is
    * boilerplate shared with ANYWHERE in the corpus).
    *
    * Scale shape mirrors [[graft.functions.TextAnalysis.repSignals]]'s
    * one-repartition trick on the hash side: repartition the gram stream by
    * h once, then the (h, doc_id) count AND the per-h doc-frequency window
    * are both partition-local; the only other exchange carries per-doc
    * partial sums. Only 60-bit hashes shuffle, never text.
    */
  def dupSpans(spark: SparkSession, dir: String, L: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val grams = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= L)
      // explode positions of an attribute, not the regex (see shingles note)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - L)).as("i"))
      .select(col("doc_id"), mdhash(concat_ws(" ",
        (0 until L).map(j => element_at(col("t"), col("i") + j + 1)): _*))
        .as("h"))
    val byHashDoc = grams.repartition(col("h"))
      .groupBy("h", "doc_id").agg(count(lit(1)).as("cnt"))
      .withColumn("ndocs", count(lit(1)).over(Window.partitionBy("h")))
    byHashDoc.groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_grams"),
        coalesce(sum(when(col("ndocs") >= 2, col("cnt"))), lit(0L))
          .as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        bround(col("n_dup_grams").cast("double") / col("n_grams"), 6)
          .cast("decimal(10,6)").cast("double").as("dup_gram_frac"))
  }

  /** The TRANSFORM side of [[dupSpans]]: drop every token position covered
    * by a cross-document duplicated L-gram and re-emit the cleaned text —
    * the actual substring-dedup pass of Lee et al. 2022 (their §3: remove
    * duplicated spans, keep the rest), where [[dupSpans]] only measures the
    * signal. Deterministic rule: token position p (1-based) is dropped iff
    * some duplicated gram starts at i with i ≤ p ≤ i+L−1; docs shorter than
    * L tokens (no grams) pass through unchanged.
    *
    * Scale shape: the gram stream repartitions by hash ONCE, and the
    * doc-frequency aggregate + the dup-hash join are both partition-local
    * behind it; what flows back to documents is (doc_id, position) pairs —
    * 60-bit hashes and integer offsets, never text. Text is scanned once
    * and shuffled once (the final doc_id join materializes the cleaned
    * string); on a mostly-clean corpus the drop-set side is tiny and a
    * broadcast join would remove even that text shuffle.
    */
  def dedupSpansApply(spark: SparkSession, dir: String, L: Int = 8): DataFrame = {
    val (toks, _, dup) = spanStreams(spark, dir, L)
    spansApplyFrom(toks, dup, L)
  }

  /** The shared substring-dedup stage: tokenized docs, positioned token
    * L-grams behind ONE h-repartition, and their cross-document duplicated
    * subset. Both [[dedupSpansApply]] and the `corpus_clean` composition
    * ([[CurationOps.corpusClean]]) read these SAME frames — the gram
    * explode + hash shuffle (the dominant cost) canonicalizes identically
    * for every consumer, so ReuseExchange plans it once per query even
    * when a composition needs both the per-doc dup counts and the drop
    * positions.
    */
  private[graft] def spanStreams(spark: SparkSession, dir: String,
                                 L: Int = 8): (DataFrame, DataFrame, DataFrame) = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val grams = toks
      .filter(size(col("t")) >= L)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - L)).as("i"))
      .select(col("doc_id"), col("i"), mdhash(concat_ws(" ",
        (0 until L).map(j => element_at(col("t"), col("i") + j + 1)): _*))
        .as("h"))
      .repartition(col("h"))
    // doc frequency per hash and the dup-hash semi-join both run inside
    // the single h-partitioning — no second exchange on the gram stream.
    // "appears in ≥ 2 docs" needs only min(doc_id) ≠ max(doc_id), which a
    // plain hash agg answers without countDistinct's per-key expansion
    val dupH = grams.groupBy("h")
      .agg(min(col("doc_id")).as("d0"), max(col("doc_id")).as("d1"))
      .filter(col("d0") =!= col("d1"))
      .select("h")
    (toks, grams, grams.join(dupH, Seq("h"), "leftsemi"))
  }

  /** Cleaned-text emission over the duplicated positioned grams.
    *
    * The doc-side aggregate collects gram START offsets — one row per
    * duplicated gram through the exchange — and the L-wide expansion to
    * covered 1-based positions i+1 .. i+L (matching DuckDB's 1-based list
    * indexing in the oracle mirror) happens ROW-LOCALLY after the join
    * (`flatten∘transform∘sequence`): the earlier form exploded every gram
    * into its L covered positions BEFORE the groupBy, paying an L× row
    * multiplier through the shuffle plus a distinct-set merge over the
    * inflated stream for the identical result.
    */
  private[graft] def spansApplyFrom(toks: DataFrame, dup: DataFrame,
                                    L: Int): DataFrame = {
    val dropSets = dup
      .groupBy("doc_id")
      .agg(collect_set(col("i")).as("starts"))
    toks.join(dropSets, Seq("doc_id"), "left")
      .withColumn("drop",
        when(col("starts").isNull, lit(null))
          .otherwise(array_distinct(flatten(transform(col("starts"),
            s => sequence(s + 1, s + lit(L)))))))
      .select(
        col("doc_id"),
        array_join(
          when(col("drop").isNull, col("t"))
            .otherwise(filter(col("t"),
              (x, p) => !array_contains(col("drop"), p + 1))),
          " ").as("clean_text"),
        size(col("t")).cast("long").as("n_tokens"),
        coalesce(size(col("drop")), lit(0)).cast("long").as("n_dropped"))
  }

  /** LSH recall curve — the "measure, don't guess" evaluator for the
    * MinHash banding parameters: per exact-Jaccard decile band, what
    * fraction of true near-dup pairs does the 4×2 banding actually
    * surface? This is the empirical S-curve (1−(1−s^r)^b) that justifies —
    * or indicts — the banding choice before a full-corpus dedup run.
    *
    * Ground truth is inherently quadratic, so it runs on the SAME bounded
    * id sample as [[ngramJaccard]] (the yardstick); candidates come from
    * the production [[minhashLsh]] path restricted to the sample. At
    * 100 TB the identical query runs on a drawn sample — the curve, not
    * the pair list, is the product, and it transfers to the full corpus
    * because banding probability depends only on similarity.
    */
  def lshRecall(spark: SparkSession, dir: String,
                maxDocId: Long = 200): DataFrame = {
    val truth = ngramJaccard(spark, dir, maxDocId)
    val hits = minhashLsh(spark, dir)
      .filter(col("id1") < maxDocId && col("id2") < maxDocId)
      .select(col("id1"), col("id2"), lit(1).as("hit"))
    truth.join(hits, Seq("id1", "id2"), "left")
      .groupBy(floor(col("jaccard") * 10).cast("int").as("band"))
      .agg(count(lit(1)).as("n_pairs"), count(col("hit")).as("n_hit"))
      .select(col("band"), col("n_pairs"), col("n_hit"),
        bround(col("n_hit").cast("double") / col("n_pairs"), 6)
          .cast("decimal(10,6)").cast("double").as("recall"))
  }
}
