package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-data curation operators beyond the reference's surface (builder
  * contract: the ops a large-scale training-data pipeline needs as
  * first-class citizens): benchmark decontamination, embedding quantization,
  * and content-aware canonical-document selection over near-dup clusters.
  *
  * Scale notes are per-operator; the common discipline is the same as the
  * dedup family ([[DedupOps]]): shuffle 60-bit hashes or small aggregates,
  * never text; keep every edge cast DOUBLE after a `bround` so the result is
  * engine- and partitioning-independent.
  */
object CurationOps {

  import TextAnalysis.mdhash

  /** Benchmark decontamination: which held-out documents share any word
    * 3-gram with the training split (the n-gram-overlap test used to strip
    * eval contamination from pretraining corpora). Split is deterministic:
    * train = doc_id % 10 < 8, test = the rest.
    *
    * 100 TB shape: explode to (doc, shingle-hash), aggregate the train side
    * to a DISTINCT hash set, and LEFT JOIN test shingles against it — both
    * sides shuffle on the 60-bit hash, text never moves, and the train set
    * is an aggregate (tiny vs the corpus). No broadcast assumption: at
    * real scale the train-hash set is itself huge, and a shuffle join on
    * the hash is exactly the plan that survives.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = DedupOps.explodedShingles(spark, dir)
      .select(col("doc_id"), mdhash(col("s")).as("h"))
    val train = sh.filter(col("doc_id") % 10 < 8)
      .select(col("h")).distinct()
      .withColumn("hit", lit(1))
    sh.filter(col("doc_id") % 10 >= 8)
      .join(train, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_contaminated"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_contaminated"),
        bround(col("n_contaminated").cast("double") / col("n_shingles"), 6)
          .cast("decimal(10,6)").cast("double").as("contamination_ratio"),
        (col("n_contaminated") > 0).as("contaminated"))
  }

  /** Bloom-prefiltered decontamination — the SAME result as
    * [[decontaminate]] under the same oracle SQL, with the 100 TB plan: the
    * exact form shuffles EVERY test-side shingle into the join; here a
    * bloom filter built over the train-split hashes (`df.stat.bloomFilter`,
    * ~1.2 bytes/item at 1% fpp — mergeable, built distributed, broadcast
    * like any dim table) drops the overwhelmingly-clean majority BEFORE the
    * shuffle — the classic bloom semi-join reduction. False positives fall
    * out in the exact inner join on the survivors; bloom filters have no
    * false negatives, so the output is bit-identical to the exact form.
    *
    * The membership probe is Spark's native `BloomFilterMightContain`
    * Catalyst expression (the same predicate AQE's injected runtime bloom
    * filter, `spark.sql.optimizer.runtime.bloomFilter.enabled`, plants
    * inside a join) over the serialized filter as a binary literal — fully
    * codegen'd, no Scala UDF on the hot scan. We plant it explicitly rather
    * than relying on AQE's injection because injection is gated on runtime
    * size-estimate thresholds that a bench-scale corpus doesn't trip; the
    * explicit form keeps the plan deterministic at every scale.
    *
    * Cost accounting, honestly: this variant SCANS the exploded corpus more
    * often than the exact form (bloom build + train set + two test
    * branches; predicate pushdown below the distincts defeats
    * ReuseExchange, so the subtrees don't share). At bench scale scans
    * dominate and the bloom form reads ~2× the exact one; at cluster scale
    * the economics invert — scans are the cheap embarrassingly-parallel
    * part and the probe-side shuffle it removes (~99% of test shingles on
    * a clean corpus) is the expensive part. BENCH carries both forms so
    * the tradeoff stays measured.
    */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    // non-distinct exploded stream for everything keyed on h alone: the
    // bloom build needs NO shuffle at all (duplicate inserts are idempotent)
    // and the train set needs one distinct on h, not the (doc_id, s)
    // distinct + a second h distinct the naive composition pays
    // pinned: the train-side hashed stream is consumed TWICE — the bloom
    // build (an eager .stat action) and the exact-verify distinct — and an
    // unpinned reference ran the corpus tokenizer once per consumer
    // (guide §1.2.1). (doc_id, h) rows only: the pin is narrow.
    val raw = DedupOps.explodedShingles(spark, dir, distinctShingles = false)
      .select(col("doc_id"), mdhash(col("s")).as("h"))
    val trainRaw = TransientCache(raw.filter(col("doc_id") % 10 < 8))
    // size the filter from a cheap per-doc shingle-count BOUND: every
    // [a-z0-9]+ token needs >= 1 char + a separator, so tokens <= ceil(
    // n_chars/2) and shingles <= tokens — a true upper bound for ANY text
    // (chars/4 would undercount short-token corpora and silently push fpp
    // past the 1% target, the same erosion as the old fixed docs×200
    // bound). One single-column scan of the train split, no explode; the
    // overestimate only pads bits (~1.2 bytes/item at 1% fpp).
    val expected = math.max(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 10 < 8)
        .agg(coalesce(
          sum(greatest((col("n_chars") / lit(2L) + lit(1L)).cast("long"),
            lit(1L))),
          lit(1000L)).as("est"))
        .first().getLong(0),
      1000L)
    val bf = trainRaw.stat.bloomFilter("h", expected, 0.01)
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // native codegen'd probe: BloomFilterMightContain(<filter literal>, h)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    val mightContain = (h: Column) =>
      call_function("graft_bloom_might_contain", lit(bfBytes), h)
    val train = trainRaw.select(col("h")).distinct()
    // test side keeps the (doc_id, s)-level distinct of the exact form —
    // n_shingles counts distinct SHINGLES, not distinct hashes
    // pinned: the test stream feeds both the contamination-hit branch and
    // the per-doc n_shingles rollup — one tokenizer pass, two readers
    val test = TransientCache(DedupOps.explodedShingles(spark, dir)
      .select(col("doc_id"), mdhash(col("s")).as("h"))
      .filter(col("doc_id") % 10 >= 8))
    val hits = test.filter(mightContain(col("h")))
      .join(train, Seq("h"), "inner") // exact verify kills false positives
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
    test.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_contaminated"),
        bround(coalesce(col("n_hits"), lit(0L)).cast("double")
            / col("n_shingles"), 6)
          .cast("decimal(10,6)").cast("double").as("contamination_ratio"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Domain-mix rebalancing: the corpus-mixing audit+plan of a training
    * pipeline. Per (lang, source) stratum: actual mix share, the uniform
    * target share, an integer keep rate that rebalances toward the target
    * (capped at 1000‰ — undersampled strata are kept whole, upsampling is a
    * repeat factor decided downstream), and the realized kept count under
    * the same deterministic hash-mod rule as [[TextAnalysis.stratifiedSample]]
    * — reproducible across engines, runs, and cluster sizes, no RNG state.
    *
    * Everything is INTEGER arithmetic (permille via integer division), so
    * the gate is exact by construction. Scale shape: the stratum plan is an
    * aggregate of the corpus (strata-count rows — the global window runs
    * over that tiny frame, not the data); applying it back is a broadcast
    * join + pre-aggregated count shuffle. Docs themselves never shuffle.
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    val plan = mixPlan(docs)
    val kept = docs
      .join(broadcast(plan.select("lang", "source", "keep_permille")),
        Seq("lang", "source"))
      .filter(TextAnalysis.mdhash(col("doc_id").cast("string")) % 1000 <
        col("keep_permille"))
      .groupBy("lang", "source").agg(count(lit(1)).as("n_kept"))
    plan.drop("rep_permille") // audit schema: the capped keep rate only
      .join(kept, Seq("lang", "source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
  }

  /** The rebalancing plan shared by [[domainMix]] (the audit) and
    * [[mixApply]] (the transform): per (lang, source) stratum, actual and
    * target permille shares plus the integer keep rate. One definition so
    * audit and apply cannot drift.
    */
  private def mixPlan(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(lit(1))
    docs.groupBy("lang", "source").agg(count(lit(1)).as("n_docs"))
      .withColumn("tot", sum("n_docs").over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("lang"), col("source"), col("n_docs"),
        expr("n_docs * 1000 div tot").as("mix_permille"),
        expr("1000 div k").as("target_permille"),
        // the uncapped rebalance rate toward the uniform target: > 1000‰
        // means the stratum is undersampled (repeat — [[mixUpsample]]),
        // < 1000‰ oversampled (cut — [[mixApply]] via keep_permille)
        expr("tot * 1000 div (k * n_docs)").as("rep_permille"))
      .withColumn("keep_permille", least(lit(1000L), col("rep_permille")))
  }

  /** The APPLY side of [[domainMix]]: materialize the rebalanced corpus —
    * the per-document rows the plan keeps, under the same deterministic
    * `mdhash(doc_id) % 1000 < keep_permille` rule. [[domainMix]] is the
    * audit a pipeline reviews; this is the transform it ships. Emitting the
    * sampling `bucket` alongside makes every keep/drop decision auditable
    * row-by-row (bucket < keep_permille by construction, spec-asserted).
    *
    * Scale shape: the plan is a strata-count-row aggregate broadcast back
    * onto the corpus scan; the keep decision is a row-local hash — docs
    * never shuffle, nothing is collected, and the output is a filtered scan
    * that downstream stages consume in place. Reproducible across engines,
    * runs, and cluster sizes (no RNG state, unlike `TABLESAMPLE`).
    */
  def mixApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    docs
      .join(broadcast(mixPlan(docs).select("lang", "source", "keep_permille")),
        Seq("lang", "source"))
      .withColumn("bucket",
        TextAnalysis.mdhash(col("doc_id").cast("string")) % 1000)
      .filter(col("bucket") < col("keep_permille"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("keep_permille"), col("bucket"))
  }

  /** The UPSAMPLE side of the mix plan: [[domainMix]] caps keep rates at
    * 1000‰ and leaves upsampling "a repeat factor decided downstream" —
    * this is that downstream. Undersampled strata (rep rate > 1000‰) emit
    * each document `rep div 1000` times, plus one extra copy for the
    * deterministic hash-mod fraction of documents selected by
    * `bucket < rep mod 1000` — fractional-epoch repetition exactly as
    * training-mix recipes specify it ("repeat this source 2.3×"), with no
    * RNG and an exactly-realized aggregate rate. Oversampled strata pass
    * through at one copy (their cut is [[mixApply]]'s job, so composing
    * upsample∘apply realizes the full plan).
    *
    * Scale shape: the plan broadcast is strata-count rows; `n_copies` is a
    * row-local expression and the explode is a cheap generator over a
    * sequence literal (copies of doc IDs, not of text — downstream stages
    * join text by doc_id when they actually need it, or read the repeated
    * rows directly when they don't). Docs never shuffle.
    */
  def mixUpsample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    val plan = mixPlan(docs).select("lang", "source", "rep_permille")
    val withPlan = docs
      .join(broadcast(plan), Seq("lang", "source"))
      .withColumn("bucket",
        TextAnalysis.mdhash(col("doc_id").cast("string")) % 1000)
      .withColumn("n_copies",
        greatest(lit(1L),
          expr("rep_permille div 1000") +
            when(col("bucket") < col("rep_permille") % 1000, 1L).otherwise(0L)))
    withPlan
      .select(col("doc_id"), col("lang"), col("source"),
        col("rep_permille"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_id"))
  }

  /** Symmetric int8 quantization of L2-normalized embeddings:
    * q_d = ⌊127·x_d / ‖x‖ + 0.5⌋. One row per (vec_id, dimension).
    *
    * Zero-shuffle: the norm is a row-local fold over the vector and the
    * explode is row-local too — the whole operator is a single codegen'd
    * scan, which is the point at 100 TB (quantization is a write-side
    * transform, it must stream). `floor(x + 0.5)` instead of `round`:
    * floor is exact on doubles and identical across engines, while
    * HALF_UP/HALF_EVEN tie policies differ (the round-1 decimal lesson).
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val xs = transform(col("embedding"), x => x.cast("double"))
    val norm = sqrt(aggregate(xs, lit(0.0), (acc, x) => acc + x * x))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), norm.as("norm"),
        posexplode(xs).as(Seq("d", "x")))
      .filter(col("norm") > 0)
      .select(
        col("vec_id"), col("label"), col("d"),
        floor(col("x") * 127 / col("norm") + 0.5).cast("int").as("q"))
  }

  /** Content-aware canonical selection over near-dup clusters: within each
    * [[DedupOps.dedupClusters]] component keep the LONGEST document
    * (ties → lowest doc_id) — the usual curation policy (keep the superset
    * document, drop truncations), vs the cluster fold's id-min `keep`.
    *
    * Scale: clusters are bounded-size components of the LSH candidate
    * graph, so the per-cluster window never sees more rows than a cluster
    * has members — no global window, no skew hazard beyond the cluster
    * size itself.
    */
  /** Sequence packing: assign [[TextAnalysis.chunkDocs]] chunks to
    * fixed-token-budget training bins, greedily in (doc_id, chunk_id) order
    * within each (lang, source) shard. `bin_id = prefix_tokens div budget`
    * over a running window sum — the greedy-fill policy as pure window
    * arithmetic (a bin may overflow by at most one chunk; packers that
    * split chunks lose sample boundaries). Deterministic: no RNG, no
    * engine-dependent order.
    *
    * Scale: packing is inherently sequential WITHIN a shard, so the
    * parallelism unit is the shard key — (lang, source) here; at 100 TB the
    * same query packs per (lang, source, date-bucket) with shard sizes
    * chosen to fit a task. No global window exists.
    */
  def packChunks(spark: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val chunks = TextAnalysis.chunkDocs(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
    val dims = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("source"))
    val w = Window.partitionBy("lang", "source").orderBy("doc_id", "chunk_id")
    chunks.join(dims, Seq("doc_id"))
      .withColumn("prefix_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(
        col("lang"), col("source"), col("doc_id"), col("chunk_id"), col("n_tokens"),
        expr(s"prefix_before div $budget").as("bin_id"),
        (col("prefix_before") % budget).as("bin_offset"))
  }

  /** Leakage-safe train/val/test split — the eval-integrity discipline a
    * training pipeline applies AFTER near-dup detection: the split is
    * assigned by hashing the near-dup CLUSTER id, not the document id, so
    * two near-duplicate documents can never land in different splits (the
    * classic eval-leakage bug that a doc-hash split commits silently).
    * Singleton documents (no near-dup edges) are their own cluster.
    *
    * Same deterministic hash-mod discipline as [[TextAnalysis
    * .stratifiedSample]] (no RNG state — reproducible across engines,
    * runs, and cluster sizes): bucket = mdhash("split:" + cluster_id)
    * mod 1000; bucket < testPermille → test, next valPermille → val,
    * rest → train.
    *
    * Scale: one left join of the corpus against the (bounded, LSH-edge
    * derived) cluster view on doc_id, then a row-local projection — the
    * cheapest shuffle family in the suite. The cluster view is the
    * memoized [[DedupOps.dedupClusters]] materialization; at 100 TB both
    * sides are bucketed by doc_id, making the join co-partitioned.
    */
  def leakageSplit(spark: SparkSession, dir: String,
                   valPermille: Int = 100, testPermille: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val cl = DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    docs.join(cl, Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        TextAnalysis.mdhash(
          concat(lit("split:"), col("cluster_id").cast("string"))) % 1000)
      .select(col("doc_id"), col("cluster_id"),
        when(col("bucket") < testPermille, "test")
          .when(col("bucket") < testPermille + valPermille, "val")
          .otherwise("train").as("split"))
  }

  def dedupSelect(spark: SparkSession, dir: String): DataFrame = {
    val clusters = DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    clusters.join(docs, Seq("doc_id"))
      .withColumn("canonical_id", first(col("doc_id")).over(w))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"),
        col("canonical_id"), (col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** Per-semantic-cluster cap sampling — the topic-balancing policy the
    * [[SimilarityOps.semanticClusters]] handle exists for ("at most n
    * examples per semantic cluster", the Abbas et al. SemDeDup follow-up):
    * every document joins its embedding's τ-near component (singletons are
    * their own cluster, as in [[leakageSplit]]), members rank
    * deterministically by length (n_chars desc, doc_id asc — the
    * [[dedupSelect]] election rule generalized from keep-1 to keep-cap),
    * and `keep = rank <= cap`.
    *
    * Scale shape: the cluster map is EDGE-bounded (τ-near pairs, never
    * corpus-wide); the join back to documents moves (id, cluster) pairs
    * only; both windows (size, rank) share one partitioning on cluster_id,
    * so a single exchange of (id, cluster, n_chars) triples — no text —
    * serves the whole policy.
    */
  def clusterCapSample(spark: SparkSession, dir: String,
                       cap: Int = 2): DataFrame = {
    val cl = SimilarityOps.semanticClusters(spark, dir)
      .select(col("vec_id"), col("cluster_id"))
    val assign = Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(cl, Seq("vec_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
      .withColumnRenamed("vec_id", "doc_id")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val byCluster = Window.partitionBy("cluster_id")
    assign.join(docs, Seq("doc_id"))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("rank", row_number().over(
        byCluster.orderBy(col("n_chars").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"),
        col("cluster_size"), col("rank").cast("long").as("rank"),
        (col("rank") <= cap).as("keep"))
  }

  /** The curation pipeline composed as ONE relational query — the capstone
    * a training-data run actually executes, not three separate audits:
    *
    *   1. quality gate: only docs passing the full Gopher rule set
    *      ([[TextAnalysis.gopherFilterWith]]);
    *   2. near-dup election AMONG THE QUALITY SURVIVORS: per cluster, the
    *      longest passing document is canonical — so a cluster whose
    *      corpus-wide canonical fails quality still keeps its best passing
    *      member (a corpus-wide election ([[dedupSelect]]) would silently
    *      drop the whole cluster); unclustered docs pass;
    *   3. substring dedup: the surviving text has every cross-document
    *      duplicated 8-gram span removed ([[DedupOps.spansApplyFrom]]).
    *
    * The expensive stage — the positioned-gram explode + hash shuffle — is
    * built ONCE ([[DedupOps.spanStreams]]) and read by both the quality
    * gate's boilerplate signal (n_grams / n_dup_grams counts) and the drop
    * positions: the subtrees canonicalize identically, so ReuseExchange
    * plans the shuffle once. The DuckDB oracle composes the SAME stage
    * mirrors as nested CTE subqueries — drift in any stage fails this gate
    * too.
    *
    * 100 TB shape: each stage's own scale argument (see the three
    * operators) is unchanged by composition — the joins here are doc_id
    * equi-joins over per-doc rows, the cheapest shuffle in the suite.
    */
  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val (toks, grams, dup) = DedupOps.spanStreams(spark, dir)
    // per-doc substring-duplication counts from the shared gram stage —
    // value-identical to DedupOps.dupSpans (asserted in CurationSpec)
    val substr = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(dup.groupBy("doc_id").agg(count(lit(1)).as("n_dup_grams")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_grams"))
    val quality = TextAnalysis.gopherFilterWith(spark, dir, substr)
      .filter(col("passed"))
      .select(col("doc_id"), col("lang"), col("source"))
    // canonical election restricted to quality survivors
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val sel = DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
      .join(quality.select("doc_id"), Seq("doc_id"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        Seq("doc_id"))
      .withColumn("keep", col("doc_id") === first(col("doc_id")).over(w))
      .select(col("doc_id"), col("keep"))
    DedupOps.spansApplyFrom(toks, dup, 8)
      .join(quality, Seq("doc_id"))
      .join(sel, Seq("doc_id"), "left")
      .filter(coalesce(col("keep"), lit(true)))
      .select(col("doc_id"), col("lang"), col("source"), col("clean_text"),
        col("n_tokens"), col("n_dropped"))
  }

  /** PII redaction patterns — public so the DuckDB oracle interpolates the
    * SAME strings (no drift). Written in the common Java-regex/RE2 subset:
    * no backslash escapes (`[.]`/`[+]` instead of `\.`/`\+`), no
    * lookaround, no backreferences — the pattern means the same thing in
    * Spark (java.util.regex) and DuckDB (RE2).
    */
  val piiEmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val piiPhoneRe = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val piiNameRe  = "Customer#[0-9]+"

  /** PII redaction + pseudonymization — the scrub every training-data
    * pipeline runs before text leaves curation: replace emails, phone
    * numbers, and customer identifiers with category placeholders, count
    * what was removed per category (the redaction audit), and emit a
    * DETERMINISTIC pseudonym (md5-prefix of the identifier) so downstream
    * joins on "who" still work without the identity — key-preserving
    * pseudonymization, not suppression.
    *
    * The synthetic `documents` corpus is lowercase word-soup with no PII,
    * so the PII-bearing input is CONSTRUCTED here, deterministically, from
    * the customer table (contact-ticket text with the customer's name, a
    * derived e-mail, and — for 4/5 of customers — a derived E.164-ish
    * callback number; 1/3 get a second cc address so the category counts
    * take values 0/1/2, not constant 1). The construction is mirrored
    * verbatim in the oracle; the operator under test is the redaction
    * machinery itself.
    *
    * 100 TB shape: a single codegen'd projection — `regexp_replace` /
    * `regexp_extract_all` / `md5` are all native expressions, zero
    * shuffles, zero UDFs; redaction streams at scan speed, which is the
    * requirement for a write-side scrub (PlanSpec-gated: no exchange in
    * the plan).
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val key = col("c_custkey")
    val ks  = key.cast("string")
    val seg = lower(col("c_mktsegment"))
    val phone = concat(lit("+1-"),
      lpad((key % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((key * 7 % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((key * 31 % 10000).cast("string"), 4, "0"))
    val base = concat(lit("ticket: customer "), col("c_name"), lit(" ("),
      seg, lit(") wrote from user"), ks, lit("@"), seg, lit(".example.com"))
    val withCc = when(key % 3 === 0,
      concat(base, lit(" cc backup."), ks, lit("@example.org"))).otherwise(base)
    val text = when(key % 5 === 0, withCc)
      .otherwise(concat(withCc, lit(" callback "), phone))
    Tables.customer(spark, dir).select(
      key,
      regexp_replace(
        regexp_replace(
          regexp_replace(text, piiNameRe, "[NAME]"),
          piiEmailRe, "[EMAIL]"),
        piiPhoneRe, "[PHONE]").as("redacted"),
      size(regexp_extract_all(text, lit(piiNameRe), lit(0)))
        .cast("long").as("n_names"),
      size(regexp_extract_all(text, lit(piiEmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(text, lit(piiPhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      concat(lit("cust_"), substring(md5(col("c_name")), 1, 12))
        .as("pseudonym"))
  }

  /** k-anonymity threshold shared with the DuckDB oracle. */
  val kAnonK = 5

  /** k-anonymization — the companion to [[piiRedact]]: redaction removes
    * direct identifiers; this generalizes QUASI-identifiers (geography +
    * account-balance bracket) until every released equivalence class holds
    * at least [[kAnonK]] records, so no row is re-identifiable by joining
    * the released tuple against an external directory (Sweeney's
    * k-anonymity, via a fixed minimal-generalization hierarchy).
    *
    * Hierarchy (coarsening left to right, one level per step):
    *   L0 (nation, segment, $1000-balance bracket) →
    *   L1 (nation, segment) → L2 (region, segment) → L3 (segment) →
    *   L4 (fully suppressed).
    * Naive "take the first level whose FULL class reaches k" is NOT
    * k-anonymous: records whose L0 class already reached k release the
    * finer tuple, so the coarser released class holds only the leftovers
    * and can undershoot k. This uses RESIDUAL roll-up instead: records of
    * undersized classes merge upward, and each level tests the residual
    * count — the set of records actually releasing that tuple — against k.
    * Every released equivalence class therefore provably holds ≥ k records
    * (or is the terminal all-suppressed pool). Deterministic, no
    * tie-breaks; all records of one L0 class land on the same level.
    *
    * 100 TB shape: the class-size tables are bounded by the QI key space
    * (|nation|·|segment|·|bracket| ≈ 1.4k rows), NOT by the corpus — the
    * L0 count aggregates map-side, every residual roll-up runs over count
    * rows only, and all of it broadcasts back onto the scan, so the fact
    * table never shuffles (PlanSpec-gated: broadcast joins only).
    */
  def kAnonymize(spark: SparkSession, dir: String): DataFrame = {
    val k = kAnonK
    val base = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast("int").as("bal_bucket"))
    // L0 class sizes; each coarser level counts only the RESIDUAL records
    // (those still unreleased after the finer level)
    val c0 = base.groupBy("nation", "region", "segment", "bal_bucket")
      .agg(count(lit(1)).as("n0"))
    val g1 = c0.groupBy("nation", "region", "segment")
      .agg(sum(when(col("n0") < k, col("n0")).otherwise(0)).as("r1"))
    val g2 = g1.groupBy("region", "segment")
      .agg(sum(when(col("r1") < k, col("r1")).otherwise(0)).as("r2"))
    val g3 = g2.groupBy("segment")
      .agg(sum(when(col("r2") < k, col("r2")).otherwise(0)).as("r3"))
      // terminal pool: residual across segments (tiny frame, ≤|segment| rows)
      .withColumn("r4",
        sum(when(col("r3") < k, col("r3")).otherwise(0))
          .over(Window.partitionBy()))
    val lvl = when(col("n0") >= k, 0).when(col("r1") >= k, 1)
      .when(col("r2") >= k, 2).when(col("r3") >= k, 3).otherwise(4)
    base
      .join(broadcast(c0), Seq("nation", "region", "segment", "bal_bucket"))
      .join(broadcast(g1), Seq("nation", "region", "segment"))
      .join(broadcast(g2), Seq("region", "segment"))
      .join(broadcast(g3), Seq("segment"))
      .select(
        col("c_custkey"),
        when(lvl <= 1, col("nation")).when(lvl === 2, col("region"))
          .otherwise(lit("*")).as("qi_geo"),
        when(lvl <= 3, col("segment")).otherwise(lit("*")).as("qi_segment"),
        when(lvl === 0, col("bal_bucket").cast("string"))
          .otherwise(lit("*")).as("qi_bal"),
        lvl.as("anon_level"),
        when(lvl === 0, col("n0")).when(lvl === 1, col("r1"))
          .when(lvl === 2, col("r2")).when(lvl === 3, col("r3"))
          .otherwise(col("r4"))
          .cast("long").as("class_size"))
  }

  /** Span-level contamination ATTRIBUTION — [[decontaminate]] answers
    * "is this held-out doc contaminated?"; this answers "by which training
    * document, and how badly?" — the report an eval-integrity audit
    * actually files. Per contaminated test doc: how many distinct training
    * docs share a rare 3-gram with it, the total shared-gram mass, and the
    * single worst-offender training doc (most shared rare grams,
    * lowest-doc-id tie-break so the top-1 is deterministic).
    *
    * "Rare" = train doc-frequency ≤ `dfCap` (default 20): contamination
    * practice ignores boilerplate n-grams that appear everywhere — and the
    * cap is ALSO the scale bound: every gram hash contributes at most
    * `dfCap` (test,train) pairs, so the pair space is ≤ dfCap·|test grams|,
    * linear in corpus size, never quadratic. Only 60-bit hashes and doc ids
    * shuffle; text never moves. The top-1 window is row_number-filtered, so
    * Spark plans it as WindowGroupLimit (partial top-1 before the
    * exchange).
    */
  def contaminationReport(spark: SparkSession, dir: String,
                          dfCap: Int = 20): DataFrame = {
    // cached: this subtree (tokenize → corpus-wide distinct → hash) is read
    // three times (train-df, train join side, test side) and the cached form
    // is two longs per row — 16 bytes — so materialization is far cheaper
    // than two recomputes of the regex tokenizer (unlike the string-shingle
    // cache shardDedup deliberately avoids)
    val sh = TransientCache(DedupOps.explodedShingles(spark, dir)
      .select(col("doc_id"), mdhash(col("s")).as("h")))
    val tr = sh.filter(col("doc_id") % 10 < 8)
      .select(col("doc_id").as("train_doc"), col("h"))
    val rare = tr.groupBy("h").agg(count(lit(1)).as("train_df"))
      .filter(col("train_df") <= dfCap)
      .select("h")
    val pairs = sh.filter(col("doc_id") % 10 >= 8)
      .join(tr.join(rare, Seq("h")), Seq("h"))
      .groupBy(col("doc_id"), col("train_doc"))
      .agg(count(lit(1)).as("n_shared"))
    val w = Window.partitionBy("doc_id")
    val rk = Window.partitionBy("doc_id")
      .orderBy(col("n_shared").desc, col("train_doc").asc)
    pairs
      .withColumn("n_train_docs", count(lit(1)).over(w))
      .withColumn("n_shared_total", sum(col("n_shared")).over(w))
      .withColumn("rn", row_number().over(rk))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("n_train_docs").cast("long").as("n_train_docs"),
        col("n_shared_total").cast("long").as("n_shared_total"),
        col("train_doc").as("top_train_doc"),
        col("n_shared").as("top_shared"))
  }

  /** Deterministic training-export shuffle + sharding — the WRITE side of
    * the pipeline: examples are dealt into `nShards` shards by hash-mod and
    * ordered within each shard by an independent hash (the global "shuffle
    * the training data" step SGD wants), with NO RNG state anywhere — the
    * same corpus always exports byte-identical shards, on any engine, any
    * cluster size, any partitioning (the property hash-mod sampling already
    * gives [[TextAnalysis.stratifiedSample]], extended to ordering).
    *
    * Scale shape: the shard hash exchange is the ONE shuffle; the per-shard
    * position is a window whose partition IS the shuffle key, so rank
    * assignment is partition-local (no second exchange — PlanSpec-gated).
    * At 100 TB the physical write is `partitionBy(shard)` with the same
    * sort — shard files stream out ordered, nothing collects.
    */
  def exportShards(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        (mdhash(concat(lit("shard:"), col("doc_id").cast("string"))) % nShards)
          .as("shard"),
        mdhash(concat(lit("pos:"), col("doc_id").cast("string"))).as("hpos"))
    d.withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("hpos"), col("doc_id"))).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** Per-column profiling audit — the ingestion gate a 100 TB pipeline runs
    * on every incoming shard before it is admitted to the corpus: row count,
    * null count, distinct count, and min/max per column, as one table with a
    * row per column.
    *
    * Shape: ONE scan of the table unpivots each row into (column_name,
    * value-as-string) pairs — profiling C columns costs one pass + one
    * shuffle keyed (column_name, value), NOT C separate jobs. The distinct
    * count is staged explicitly as groupBy(column, value) → groupBy(column)
    * (no Expand-based planDistinct): map-side partial aggregation collapses
    * repeated values before anything shuffles, so the exchange carries at
    * most Σ|distinct(col)| rows per partition. The `text` column is
    * profiled through its md5 digest — the same text-never-shuffles
    * discipline as [[DedupOps]] (profiling full bodies through an exchange
    * would be the scan cost ×2).
    *
    * At 100 TB the drop-in swap is `approx_count_distinct` for the distinct
    * stage (one pass, no (col, value) shuffle at all); the exact version IS
    * the gate for that sketch, per the `approx_*` discipline.
    */
  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val profiled: Seq[(String, Column)] = Seq(
      "doc_id" -> col("doc_id").cast("string"),
      "lang" -> col("lang"),
      "source" -> col("source"),
      "n_chars" -> col("n_chars").cast("string"),
      "text_md5" -> md5(col("text")))
    val stacked = docs
      .select(explode(array(profiled.map { case (n, c) =>
        struct(lit(n).as("column_name"), c.as("v")) }: _*)).as("s"))
      .select(col("s.column_name").as("column_name"), col("s.v").as("v"))
    stacked.groupBy("column_name", "v").agg(count(lit(1)).as("c"))
      .groupBy("column_name")
      .agg(
        sum(col("c")).cast("long").as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("c"))), lit(0L))
          .cast("long").as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"))
  }

  /** The corpus report a data team actually reads: per (source, lang), how
    * many documents, how many tokens, and where the quality gate's rejects
    * concentrate — the rollup that drives [[domainMix]] decisions (a source
    * whose reject rate spikes gets its mix weight cut, not its survivors
    * upweighted). Shares [[TextAnalysis.qualitySignals]] with the
    * per-document `quality_filter` gate, so the report can never disagree
    * with the gate about what "passed" means.
    *
    * All counters are integers and the rate is integer-permille — the whole
    * report is engine- and partitioning-exact. Shape: the signal scan is
    * one narrow codegen pass; the only exchange carries (source, lang)
    * partial sums (map-side combined, dimension-bounded).
    */
  def sourceQualityReport(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualitySignals(spark, dir)
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        sum(col("n_chars")).cast("long").as("n_chars_total"),
        sum(when(col("passed"), 1L).otherwise(0L)).cast("long").as("n_passed"),
        sum(when(col("reject_reason") === "length", 1L).otherwise(0L))
          .cast("long").as("n_reject_length"),
        sum(when(col("reject_reason") === "repetitive", 1L).otherwise(0L))
          .cast("long").as("n_reject_repetitive"),
        sum(when(col("reject_reason") === "low_quality", 1L).otherwise(0L))
          .cast("long").as("n_reject_low_quality"))
      .withColumn("pass_permille", expr("n_passed * 1000 div n_docs"))
}
