package graft.oracle

import graft.functions.{CurationOps, DedupOps, TextAnalysis}

/** DuckDB mirrors of the TEXT-ANALYSIS / CURATION / RETRIEVAL operators
  * ([[graft.functions.TextAnalysis]] / [[graft.functions.CurationOps]]):
  * stats, lang-id, quality/Gopher filters, BPE, TF-IDF, BM25, mixing,
  * packing, decontamination, PII, k-anonymity, reports. Self-typed to
  * [[DedupSql]]: corpus_clean composes the gopher and cluster mirrors.
  * See [[TextSqlBase]] for the shared CTEs.
  */
private[oracle] trait CurationSql extends TextSqlBase { self: DedupSql =>


  val textStatsSql: String =
    s"""WITH $tokCte
       |SELECT doc_id, lang, source,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
       |  CAST(CAST(CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS ttr,
       |  CAST(CAST(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS avg_token_len,
       |  CAST(CAST(CAST(len(list_filter(t, x -> list_contains(
       |         [${TextAnalysis.stopwords.map(s => s"'$s'").mkString(",")}], x))) AS DOUBLE) / len(t)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS stop_ratio
       |FROM tok""".stripMargin


  val langIdSql: String = {
    val cnts = TextAnalysis.profileChars.map(ch =>
      s"(length(text) - length(replace(text, '$ch', '')))").toIndexedSeq
    def score(l: String): String =
      TextAnalysis.profileChars.indices
        .map(i => s"${cnts(i)} * ${TextAnalysis.weights(l)(i)}")
        .mkString(" + ")
    val scoreCols = TextAnalysis.langs
      .map(l => s"  CAST(${score(l)} AS BIGINT) AS s_$l").mkString(",\n")
    val gr = TextAnalysis.langs.map(l => s"s_$l").mkString("GREATEST(", ", ", ")")
    val pred = TextAnalysis.langs
      .map(l => s"WHEN s_$l = $gr THEN '$l'").mkString("CASE ", " ", " ELSE '??' END")
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS actual_lang,
       |$scoreCols
       |  FROM documents)
       |SELECT doc_id, actual_lang,
       |  ${TextAnalysis.langs.map(l => s"s_$l").mkString(", ")},
       |  $pred AS predicted_lang
       |FROM scored""".stripMargin
  }


  // Deterministic export sharding (CurationOps.exportShards): hash-mod
  // shard deal + independent-hash intra-shard order, no RNG anywhere
  val exportShardsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
       |      AS n_tokens,
       |    ${mdh("'shard:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard,
       |    ${mdh("'pos:' || CAST(doc_id AS VARCHAR)")} AS hpos
       |  FROM documents)
       |SELECT shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
       |    ORDER BY hpos, doc_id) AS BIGINT) AS pos,
       |  doc_id, lang, n_tokens
       |FROM d""".stripMargin


  // CurationOps.leakageSplit: split by hash of the near-dup CLUSTER id
  // (transitive closure over the same LSH candidate edges), singletons are
  // their own cluster
  val leakageSplitSql: String =
    s"""WITH RECURSIVE $candCte,
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM cand
       |  UNION SELECT id2, id1 FROM cand),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src),
       |d AS (
       |  SELECT doc.doc_id, COALESCE(l.cluster_id, doc.doc_id) AS cluster_id
       |  FROM documents doc LEFT JOIN labels l ON doc.doc_id = l.doc_id),
       |b AS (
       |  SELECT doc_id, cluster_id,
       |    ${mdh("'split:' || CAST(cluster_id AS VARCHAR)")} % 1000 AS bucket
       |  FROM d)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN bucket < 100 THEN 'test'
       |       WHEN bucket < 200 THEN 'val'
       |       ELSE 'train' END AS split
       |FROM b""".stripMargin


  // Two-pass quantile-cutoff selection (TextAnalysis.scoreSelectScaled):
  // claim query — exact side is the per-language doc count and exact-rank
  // target; the sketch-dependent kept count is asserted in-query (boolean)
  // and never hashed, so the oracle emits the claim as literal TRUE.
  val scoreSelectScaledSql: String =
    """SELECT lang, COUNT(*) AS n_lang,
      |  CAST(COUNT(*) * 500 // 1000 AS BIGINT) AS n_target,
      |  TRUE AS within_bound
      |FROM documents
      |WHERE len(regexp_extract_all(text, '[a-z0-9]+')) > 0
      |GROUP BY lang""".stripMargin


  val asofPriceJoinSql: String =
    s"""WITH ${OracleSql.orderEventsCte},
       |pe AS (SELECT * FROM order_events WHERE action IN (8, 9)),
       |wp AS (
       |  SELECT *, last_value(CASE WHEN action = 8 THEN val END IGNORE NULLS)
       |    OVER (PARTITION BY pool ORDER BY event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_price
       |  FROM pe)
       |SELECT pool, event_id, trader,
       |  CAST(val AS DOUBLE) AS trade_price,
       |  CAST(asof_price AS DOUBLE) AS asof_price,
       |  CAST(val - asof_price AS DOUBLE) AS slippage
       |FROM wp WHERE action = 9""".stripMargin


  val tokenCountsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS BIGINT)
      |    AS n_bpe_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens
      |FROM documents""".stripMargin


  /** Mirror of [[TextAnalysis.freqScore]]: train-split unigram table,
    * left join on token, integer rollups (HUGEINT sums cast back to
    * BIGINT per the gate's hashing rules).
    */
  val freqScoreSql: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
      |  FROM documents),
      |vocab AS (
      |  SELECT token, COUNT(*) AS cnt FROM tk WHERE doc_id % 10 < 8
      |  GROUP BY token)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(CASE WHEN cnt IS NULL THEN 1 END) AS BIGINT) AS n_oov,
      |  CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS sum_freq,
      |  CAST(CAST(CAST(COALESCE(SUM(cnt), 0) AS DOUBLE) / COUNT(*)
      |       AS DECIMAL(18,6)) AS DOUBLE) AS freq_score
      |FROM tk LEFT JOIN vocab USING (token)
      |GROUP BY doc_id""".stripMargin


  val qualityFilterSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT)
      |      AS n_uniq
      |  FROM documents),
      |s AS (
      |  SELECT *,
      |    CASE WHEN n_tok BETWEEN 30 AND 2000 THEN 2
      |         WHEN n_tok BETWEEN 10 AND 5000 THEN 1 ELSE 0 END AS len_score,
      |    CASE WHEN n_uniq * 4 >= n_tok THEN 1 ELSE 0 END AS rep_score
      |  FROM d)
      |SELECT doc_id, lang, n_chars, n_tok, n_uniq, len_score, rep_score,
      |  len_score + rep_score AS quality,
      |  (len_score + rep_score) >= 2 AS passed,
      |  CASE WHEN (len_score + rep_score) >= 2 THEN NULL
      |       WHEN len_score = 0 THEN 'length'
      |       WHEN rep_score = 0 THEN 'repetitive'
      |       ELSE 'low_quality' END AS reject_reason
      |FROM s""".stripMargin


  // mirrors TextAnalysis.chunkDocs defaults: chunkSize=40, stride=30
  val chunkDocsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents),
      |tk AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
      |nc AS (SELECT *,
      |  1 + CAST(ceil(CAST(GREATEST(n - 40, 0) AS DOUBLE) / 30) AS INT) AS n_chunks
      |  FROM tk),
      |ex AS (SELECT doc_id, t, n, i AS chunk_id
      |       FROM nc, UNNEST(generate_series(0, n_chunks - 1)) AS u(i))
      |SELECT doc_id,
      |  CAST(chunk_id AS BIGINT) AS chunk_id,
      |  array_to_string(t[(chunk_id * 30 + 1):(chunk_id * 30 + 40)], ' ') AS chunk_text,
      |  CAST(LEAST(n - chunk_id * 30, 40) AS BIGINT) AS n_tokens
      |FROM ex""".stripMargin


  val multimodalMetaSql: String =
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  md5(text) AS content_md5,
       |  'text/plain' AS mime,
       |  CAST(${mdh("text")} % 640 + 16 AS BIGINT) AS fake_width,
       |  CAST(${mdh("text")} % 480 + 16 AS BIGINT) AS fake_height
       |FROM documents""".stripMargin


  // frame sampler mirror (MultimodalOps.sampleFramesStub): the corpus is
  // pure ASCII (asserted by the Spark spec), so character slicing equals
  // the engine's byte slicing and md5-of-slice matches md5-of-substring.
  // Differential value: the Spark side is a typed mapPartitions flatMap —
  // an entirely different execution path from this set-based mirror.
  val frameSampleSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    GREATEST(length(text) // 64, 1) AS n_frames
       |  FROM documents),
       |idx AS (
       |  SELECT doc_id, text,
       |    UNNEST(range(0, CAST(n_frames AS INTEGER), 4)) AS frame_idx
       |  FROM f)
       |SELECT doc_id,
       |  CAST(frame_idx AS INTEGER) AS frame_idx,
       |  CAST(frame_idx * 64 AS BIGINT) AS "offset",
       |  CAST(length(substring(text, frame_idx * 64 + 1, 64)) AS INTEGER)
       |    AS n_bytes,
       |  substring(md5(substring(text, frame_idx * 64 + 1, 64)), 1, 16)
       |    AS frame_hash
       |FROM idx""".stripMargin


  // BPE encode mirror (TextAnalysis.bpeEncode): the replace chain is
  // GENERATED from the same frozen vocabulary + pass count the engine
  // uses; dialect differences are only the regex backreference ('\1' vs
  // '$1') and DuckDB's explicit 'g' flag
  val bpeEncodeSql: String = {
    val base = """regexp_replace(text, '(.)', '|\1', 'g') || '|'"""
    val enc = TextAnalysis.bpeVocab.foldLeft(base) { (s, m) =>
      (1 to TextAnalysis.bpePasses).foldLeft(s)((x, _) =>
        s"replace($x, '|${m.charAt(0)}|${m.charAt(1)}|', '|$m|')")
    }
    s"""WITH enc AS (
       |  SELECT doc_id, length(text) AS n_ch,
       |    length(text) - length(replace(text, ' ', '')) AS n_sp,
       |    $enc AS s
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    n_ch - n_sp AS n_units,
       |    length(s) - length(replace(s, '|', '')) - 1 - n_sp AS n_tok
       |  FROM enc)
       |SELECT doc_id,
       |  CAST(n_units AS BIGINT) AS n_units,
       |  CAST(n_tok AS BIGINT) AS n_tokens_bpe,
       |  CAST(CASE WHEN n_units > 0 THEN (n_tok * 1000000) // n_units
       |       ELSE 0 END AS BIGINT) AS compression_ppm
       |FROM c""".stripMargin
  }


  // hash-mod stratified sampling mirror (see TextAnalysis.stratifiedSample)
  val stratifiedSampleSql: String =
    s"""WITH d AS (
       |  SELECT lang,
       |    CASE WHEN lang = 'en' THEN 800 WHEN lang = 'de' THEN 500
       |         WHEN lang = 'fr' THEN 250 ELSE 100 END AS rate_permille,
       |    ${mdh("CAST(doc_id AS VARCHAR)")} % 1000 <
       |      CASE WHEN lang = 'en' THEN 800 WHEN lang = 'de' THEN 500
       |           WHEN lang = 'fr' THEN 250 ELSE 100 END AS kept
       |  FROM documents)
       |SELECT lang,
       |  CAST(MAX(rate_permille) AS BIGINT) AS rate_permille,
       |  COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) * 1000
       |    // COUNT(*) AS realized_permille
       |FROM d GROUP BY lang""".stripMargin


  // log-free rarity weight tf × N ÷ df: one correctly-rounded IEEE double
  // division — bit-identical across engines (see TextAnalysis.tfidfTopK)
  val tfidfTopKSql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf, df,
      |    CAST(tf * n AS DOUBLE) / df AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, term) AS rk
      |  FROM scored)
      |SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rk
      |FROM ranked WHERE rk <= 3""".stripMargin


  // sequence packing (mirror of CurationOps.packChunks): running window sum
  // of chunk token counts per (lang, source) shard, integer-divided by the
  // bin budget
  val packChunksSql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents),
      |tk AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
      |nc AS (SELECT *,
      |  1 + CAST(ceil(CAST(GREATEST(n - 40, 0) AS DOUBLE) / 30) AS INT) AS n_chunks
      |  FROM tk),
      |ex AS (SELECT doc_id, n, i AS chunk_id
      |       FROM nc, UNNEST(generate_series(0, n_chunks - 1)) AS u(i)),
      |ch AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |       CAST(LEAST(n - chunk_id * 30, 40) AS BIGINT) AS n_tokens FROM ex),
      |p AS (SELECT d.lang, d.source, ch.doc_id, ch.chunk_id, ch.n_tokens,
      |  SUM(ch.n_tokens) OVER (PARTITION BY d.lang, d.source
      |    ORDER BY ch.doc_id, ch.chunk_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ch.n_tokens AS pb
      |  FROM ch JOIN documents d USING (doc_id))
      |SELECT lang, source, doc_id, chunk_id, n_tokens,
      |  CAST(pb // 512 AS BIGINT) AS bin_id,
      |  CAST(pb % 512 AS BIGINT) AS bin_offset
      |FROM p""".stripMargin


  // train/test word-3-gram overlap (mirror of CurationOps.decontaminate):
  // train = doc_id % 10 < 8, test shingles LEFT JOIN the distinct train
  // hash set
  val decontaminateSql: String =
    s"""WITH ${shCte()},
       |h AS (SELECT doc_id, ${mdh("s")} AS h FROM sh),
       |tr AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 < 8),
       |te AS (SELECT doc_id, h.h AS h, tr.h AS hit
       |       FROM h LEFT JOIN tr USING (h) WHERE doc_id % 10 >= 8)
       |SELECT doc_id,
       |  COUNT(*) AS n_shingles,
       |  COUNT(hit) AS n_contaminated,
       |  CAST(CAST(CAST(COUNT(hit) AS DOUBLE) / COUNT(*) AS DECIMAL(10,6))
       |       AS DOUBLE) AS contamination_ratio,
       |  COUNT(hit) > 0 AS contaminated
       |FROM te GROUP BY doc_id""".stripMargin


  /** Mirror of [[TextAnalysis.gopherFilter]]: the three signal families
    * joined per doc, integer-threshold checks, `concat_ws` reason list
    * (skips NULL slots in both engines). Stopword list interpolated from
    * the same Scala constant as the Spark side.
    */
  val gopherFilterSql: String = {
    val stops = TextAnalysis.stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    val cLen = "(n_tokens BETWEEN 20 AND 2000)"
    val cWordLen = "(sum_tok_len >= n_tokens * 3 AND sum_tok_len <= n_tokens * 10)"
    val cStop = "(n_stop > 0)"
    val cTopTok = "(top_token_count * 10 <= n_tokens * 3)"
    val cBigram = "(n_bigrams = 0 OR dup_bigram_excess * 10 <= n_bigrams * 3)"
    val cSubstr = "(n_dup_grams * 10 <= n_grams * 6)"
    s"""WITH $tokCte,
       |$repGramCtes,
       |rep AS (
       |  SELECT doc_id, lang, source,
       |    CAST(SUM(CASE WHEN n = 1 THEN cnt END) AS BIGINT) AS n_tokens,
       |    CAST(MAX(CASE WHEN n = 1 THEN cnt END) AS BIGINT) AS top_token_count,
       |    CAST(COALESCE(SUM(CASE WHEN n = 2 THEN cnt END), 0) AS BIGINT)
       |      AS n_bigrams,
       |    CAST(COALESCE(SUM(CASE WHEN n = 2 THEN cnt - 1 END), 0) AS BIGINT)
       |      AS dup_bigram_excess
       |  FROM c GROUP BY doc_id, lang, source),
       |$dupGramCtes,
       |dup AS (
       |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
       |    CAST(COALESCE(SUM(CASE WHEN ndocs >= 2 THEN cnt END), 0) AS BIGINT)
       |      AS n_dup_grams
       |  FROM gw GROUP BY doc_id),
       |shape AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
       |      AS sum_tok_len,
       |    CAST(len(list_filter(t, x -> list_contains($stops, x))) AS BIGINT)
       |      AS n_stop
       |  FROM tok),
       |j AS (
       |  SELECT rep.*, shape.sum_tok_len, shape.n_stop,
       |    COALESCE(dup.n_grams, 0) AS n_grams,
       |    COALESCE(dup.n_dup_grams, 0) AS n_dup_grams
       |  FROM rep JOIN shape USING (doc_id) LEFT JOIN dup USING (doc_id))
       |SELECT doc_id, lang, source, n_tokens,
       |  ($cLen AND $cWordLen AND $cStop AND $cTopTok AND $cBigram AND $cSubstr)
       |    AS passed,
       |  concat_ws(',',
       |    CASE WHEN NOT $cLen THEN 'length' END,
       |    CASE WHEN NOT $cWordLen THEN 'word_length' END,
       |    CASE WHEN NOT $cStop THEN 'no_stopwords' END,
       |    CASE WHEN NOT $cTopTok THEN 'top_token' END,
       |    CASE WHEN NOT $cBigram THEN 'dup_bigrams' END,
       |    CASE WHEN NOT $cSubstr THEN 'boilerplate' END) AS reject_reasons
       |FROM j""".stripMargin
  }


  /** Mirror of [[graft.functions.CurationOps.domainMix]] — pure integer
    * permille arithmetic (`//` ≙ Spark `div`), hash-mod keep rule shared
    * with [[stratifiedSampleSql]].
    */
  val domainMixSql: String =
    s"""WITH s AS (
       |  SELECT lang, source, COUNT(*) AS n_docs
       |  FROM documents GROUP BY lang, source),
       |p AS (
       |  SELECT lang, source, n_docs,
       |    n_docs * 1000 // SUM(n_docs) OVER () AS mix_permille,
       |    1000 // COUNT(*) OVER () AS target_permille,
       |    LEAST(1000, SUM(n_docs) OVER () * 1000
       |      // (COUNT(*) OVER () * n_docs)) AS keep_permille
       |  FROM s),
       |k AS (
       |  SELECT d.lang, d.source, COUNT(*) AS n_kept
       |  FROM documents d JOIN p USING (lang, source)
       |  WHERE ${mdh("CAST(d.doc_id AS VARCHAR)")} % 1000 < p.keep_permille
       |  GROUP BY d.lang, d.source)
       |SELECT p.lang, p.source,
       |  CAST(p.n_docs AS BIGINT) AS n_docs,
       |  CAST(p.mix_permille AS BIGINT) AS mix_permille,
       |  CAST(p.target_permille AS BIGINT) AS target_permille,
       |  CAST(p.keep_permille AS BIGINT) AS keep_permille,
       |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
       |FROM p LEFT JOIN k USING (lang, source)""".stripMargin


  /** Mirror of [[graft.functions.TextAnalysis.bpeMerges]]: vocabulary from
    * the token CTE, adjacent char pairs per distinct word, frequency-weighted
    * pair counts, rank-limited with the pair-string tie-break.
    */
  val bpeMergesSql: String =
    s"""WITH $tokCte,
       |w AS (
       |  SELECT t[i] AS word, COUNT(*) AS cnt
       |  FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)
       |  GROUP BY t[i]),
       |p AS (
       |  SELECT substring(word, i, 2) AS pair, word, cnt
       |  FROM w, UNNEST(generate_series(1, length(word) - 1)) AS u(i)
       |  WHERE length(word) >= 2),
       |c AS (
       |  SELECT pair,
       |    CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words,
       |    CAST(SUM(cnt) AS BIGINT) AS total_count
       |  FROM p GROUP BY pair)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY total_count DESC, pair)
       |         AS BIGINT) AS rank,
       |  pair, n_words, total_count
       |FROM c ORDER BY rank LIMIT 20""".stripMargin


  /** Mirror of [[graft.functions.CurationOps.mixApply]] — the same plan CTE
    * as [[domainMixSql]] (integer permille, `//` ≙ Spark `div`), applied as
    * a per-document keep filter with the shared hash-mod rule.
    */
  val mixApplySql: String =
    s"""WITH s AS (
       |  SELECT lang, source, COUNT(*) AS n_docs
       |  FROM documents GROUP BY lang, source),
       |p AS (
       |  SELECT lang, source,
       |    LEAST(1000, SUM(n_docs) OVER () * 1000
       |      // (COUNT(*) OVER () * n_docs)) AS keep_permille
       |  FROM s)
       |SELECT d.doc_id, d.lang, d.source,
       |  CAST(p.keep_permille AS BIGINT) AS keep_permille,
       |  CAST(${mdh("CAST(d.doc_id AS VARCHAR)")} % 1000 AS BIGINT) AS bucket
       |FROM documents d JOIN p USING (lang, source)
       |WHERE ${mdh("CAST(d.doc_id AS VARCHAR)")} % 1000 < p.keep_permille""".stripMargin


  /** Mirror of [[graft.functions.CurationOps.mixUpsample]] — the uncapped
    * rebalance rate, integer base repeats + hash-mod fractional extra copy,
    * copies generated per document.
    */
  val mixUpsampleSql: String =
    s"""WITH s AS (
       |  SELECT lang, source, COUNT(*) AS n_docs
       |  FROM documents GROUP BY lang, source),
       |p AS (
       |  SELECT lang, source,
       |    SUM(n_docs) OVER () * 1000
       |      // (COUNT(*) OVER () * n_docs) AS rep_permille
       |  FROM s),
       |d AS (
       |  SELECT d.doc_id, d.lang, d.source,
       |    CAST(p.rep_permille AS BIGINT) AS rep_permille,
       |    CAST(GREATEST(1, p.rep_permille // 1000 +
       |      CASE WHEN ${mdh("CAST(d.doc_id AS VARCHAR)")} % 1000 <
       |        p.rep_permille % 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
       |  FROM documents d JOIN p USING (lang, source))
       |SELECT doc_id, lang, source, rep_permille,
       |  CAST(n_copies AS BIGINT) AS n_copies,
       |  CAST(c.copy_id AS BIGINT) AS copy_id
       |FROM d, UNNEST(generate_series(1, n_copies)) AS c(copy_id)""".stripMargin


  /** Mirror of [[graft.functions.TextAnalysis.scoreSelect]]: the freq_score
    * CTE ranked per language (score desc, doc_id tie-break), kept to the
    * target permille by exact rank.
    */
  val scoreSelectSql: String =
    s"""WITH fs AS ($freqScoreSql),
       |r AS (
       |  SELECT fs.doc_id, d.lang, fs.freq_score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY d.lang
       |      ORDER BY fs.freq_score DESC, fs.doc_id) AS BIGINT) AS rk,
       |    CAST(COUNT(*) OVER (PARTITION BY d.lang) AS BIGINT) AS n_lang
       |  FROM fs JOIN documents d USING (doc_id))
       |SELECT doc_id, lang, freq_score, rk, n_lang
       |FROM r WHERE rk * 1000 <= n_lang * 500""".stripMargin


  /** Mirror of [[graft.functions.FrequentItems.approxTopK]]'s exact side;
    * the `within_bound` MG claim is constant-true by the mergeable-summary
    * guarantee (see the Scaladoc there), so the oracle pins it to TRUE.
    */
  val approxTopKSql: String =
    s"""WITH $tokCte,
       |c AS (
       |  SELECT t[i] AS token, COUNT(*) AS cnt
       |  FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)
       |  GROUP BY t[i])
       |SELECT token, CAST(cnt AS BIGINT) AS exact_cnt, TRUE AS within_bound
       |FROM c ORDER BY cnt DESC, token ASC LIMIT 5""".stripMargin


  /** Mirror of [[graft.functions.CurationOps.corpusClean]]: the stage
    * mirrors composed as nested CTE subqueries — quality pass ∧
    * canonical-among-survivors-or-unclustered, emitting the span-cleaned
    * text. The canonical election runs over the QUALITY-PASSED cluster
    * members (longest doc, doc_id tie-break), mirroring the engine's
    * survivor-restricted window. DuckDB accepts `WITH` (incl. RECURSIVE,
    * inside dedupClustersSql's closure) in derived tables, so each stage's
    * SQL is embedded verbatim: any drift in a stage mirror breaks this
    * gate too.
    */
  def corpusCleanSql: String =
    s"""WITH gf AS (
       |  SELECT doc_id, lang, source FROM ($gopherFilterSql) WHERE passed),
       |cl AS (SELECT doc_id, cluster_id FROM ($dedupClustersSql)),
       |sel AS (
       |  SELECT cl.doc_id,
       |    cl.doc_id = FIRST_VALUE(cl.doc_id) OVER (
       |      PARTITION BY cl.cluster_id
       |      ORDER BY d.n_chars DESC, cl.doc_id ASC) AS keep
       |  FROM cl
       |  JOIN gf USING (doc_id)
       |  JOIN documents d USING (doc_id)),
       |sp AS (SELECT * FROM ($dedupSpansApplySql))
       |SELECT sp.doc_id, gf.lang, gf.source, sp.clean_text,
       |  sp.n_tokens, sp.n_dropped
       |FROM sp
       |JOIN gf USING (doc_id)
       |LEFT JOIN sel USING (doc_id)
       |WHERE COALESCE(sel.keep, TRUE)""".stripMargin


  // PII redaction (mirror of CurationOps.piiRedact): the contact-ticket
  // text is CONSTRUCTED identically from customer columns, then scrubbed
  // with the SAME interpolated patterns (common Java-regex/RE2 subset; the
  // only dialect difference is DuckDB's explicit 'g' flag vs Spark's
  // replace-all default)
  val piiRedactSql: String =
    s"""WITH t AS (
       |  SELECT c_custkey, c_name,
       |    'ticket: customer ' || c_name || ' (' || lower(c_mktsegment) ||
       |      ') wrote from user' || CAST(c_custkey AS VARCHAR) || '@' ||
       |      lower(c_mktsegment) || '.example.com' ||
       |      CASE WHEN c_custkey % 3 = 0
       |        THEN ' cc backup.' || CAST(c_custkey AS VARCHAR) ||
       |             '@example.org' ELSE '' END ||
       |      CASE WHEN c_custkey % 5 = 0 THEN ''
       |        ELSE ' callback +1-' ||
       |          lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
       |          lpad(CAST(c_custkey * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
       |          lpad(CAST(c_custkey * 31 % 10000 AS VARCHAR), 4, '0')
       |      END AS text
       |  FROM customer)
       |SELECT c_custkey,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '${CurationOps.piiNameRe}', '[NAME]', 'g'),
       |    '${CurationOps.piiEmailRe}', '[EMAIL]', 'g'),
       |    '${CurationOps.piiPhoneRe}', '[PHONE]', 'g') AS redacted,
       |  CAST(len(regexp_extract_all(text, '${CurationOps.piiNameRe}'))
       |    AS BIGINT) AS n_names,
       |  CAST(len(regexp_extract_all(text, '${CurationOps.piiEmailRe}'))
       |    AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '${CurationOps.piiPhoneRe}'))
       |    AS BIGINT) AS n_phones,
       |  'cust_' || substring(md5(c_name), 1, 12) AS pseudonym
       |FROM t""".stripMargin


  // k-anonymization (mirror of CurationOps.kAnonymize): residual roll-up
  // over the fixed hierarchy L0 (nation,segment,$1000 bracket) → L1
  // (nation,segment) → L2 (region,segment) → L3 (segment) → L4
  // (suppressed); k interpolated from the SAME Scala constant. SUM over
  // BIGINT is HUGEINT in DuckDB — every released count re-casts to BIGINT.
  val kAnonymizeSql: String = {
    val k = graft.functions.CurationOps.kAnonK
    s"""WITH base AS (
       |  SELECT c_custkey, n_name AS nation, r_name AS region,
       |    c_mktsegment AS segment,
       |    CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_bucket
       |  FROM customer
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey),
       |c0 AS (
       |  SELECT nation, region, segment, bal_bucket, COUNT(*) AS n0
       |  FROM base GROUP BY nation, region, segment, bal_bucket),
       |g1 AS (
       |  SELECT nation, region, segment,
       |    SUM(CASE WHEN n0 < $k THEN n0 ELSE 0 END) AS r1
       |  FROM c0 GROUP BY nation, region, segment),
       |g2 AS (
       |  SELECT region, segment,
       |    SUM(CASE WHEN r1 < $k THEN r1 ELSE 0 END) AS r2
       |  FROM g1 GROUP BY region, segment),
       |g3 AS (
       |  SELECT segment, SUM(CASE WHEN r2 < $k THEN r2 ELSE 0 END) AS r3
       |  FROM g2 GROUP BY segment),
       |g3w AS (
       |  SELECT segment, r3,
       |    SUM(CASE WHEN r3 < $k THEN r3 ELSE 0 END) OVER () AS r4
       |  FROM g3)
       |SELECT c_custkey,
       |  CASE WHEN n0 >= $k OR r1 >= $k THEN nation
       |       WHEN r2 >= $k THEN region ELSE '*' END AS qi_geo,
       |  CASE WHEN n0 >= $k OR r1 >= $k OR r2 >= $k OR r3 >= $k
       |       THEN segment ELSE '*' END AS qi_segment,
       |  CASE WHEN n0 >= $k THEN CAST(bal_bucket AS VARCHAR)
       |       ELSE '*' END AS qi_bal,
       |  CASE WHEN n0 >= $k THEN 0 WHEN r1 >= $k THEN 1
       |       WHEN r2 >= $k THEN 2 WHEN r3 >= $k THEN 3
       |       ELSE 4 END AS anon_level,
       |  CAST(CASE WHEN n0 >= $k THEN n0 WHEN r1 >= $k THEN r1
       |       WHEN r2 >= $k THEN r2 WHEN r3 >= $k THEN r3
       |       ELSE r4 END AS BIGINT) AS class_size
       |FROM base
       |JOIN c0 USING (nation, region, segment, bal_bucket)
       |JOIN g1 USING (nation, region, segment)
       |JOIN g2 USING (region, segment)
       |JOIN g3w USING (segment)""".stripMargin
  }


  // span-level contamination attribution (mirror of
  // CurationOps.contaminationReport): rare = train doc-frequency <= 20,
  // top-1 train doc per test doc by (shared grams DESC, train_doc ASC)
  val contaminationReportSql: String =
    s"""WITH ${shCte()},
       |h AS (SELECT doc_id, ${mdh("s")} AS h FROM sh),
       |tr AS (SELECT doc_id AS train_doc, h FROM h WHERE doc_id % 10 < 8),
       |rare AS (SELECT h FROM tr GROUP BY h HAVING COUNT(*) <= 20),
       |pairs AS (
       |  SELECT te.doc_id, tr.train_doc, COUNT(*) AS n_shared
       |  FROM h te
       |  JOIN rare USING (h)
       |  JOIN tr USING (h)
       |  WHERE te.doc_id % 10 >= 8
       |  GROUP BY te.doc_id, tr.train_doc),
       |r AS (
       |  SELECT doc_id, train_doc, n_shared,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS n_train_docs,
       |    SUM(n_shared) OVER (PARTITION BY doc_id) AS n_shared_total,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY n_shared DESC, train_doc ASC) AS rn
       |  FROM pairs)
       |SELECT doc_id,
       |  CAST(n_train_docs AS BIGINT) AS n_train_docs,
       |  CAST(n_shared_total AS BIGINT) AS n_shared_total,
       |  train_doc AS top_train_doc, n_shared AS top_shared
       |FROM r WHERE rn = 1""".stripMargin


  // BM25 ranked retrieval (mirror of TextAnalysis.bm25TopK, k1=1.2 b=0.75):
  // log-free idf as one exact-integer ratio cast to DOUBLE, per-term
  // contributions in the SAME parenthesization as the Spark expression tree
  // (correctly-rounded IEEE ops → bit-identical), summed left-associated.
  /** One-pass BM25 over `documents` restricted by `where` (empty = full
    * corpus). The tombstone-probe mirror: the Spark side never rescans the
    * corpus (broadcast anti-join + doclens stats correction over the
    * stored index), but a from-scratch ranking of the surviving docs is
    * exactly what it must equal — which is what this oracle computes.
    */
  def bm25TopKSqlWhere(where: String): String = {
    val qt = graft.functions.TextAnalysis.bm25Terms
    val tfCases = qt.map(t =>
      s"    CAST(SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS tf_$t")
      .mkString(",\n")
    val dfCases = qt.map(t =>
      s"    CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n")
    val inList = qt.map(t => s"x = '$t'").mkString(" OR ")
    val contribs = qt.map(t =>
      s"(CAST(df_$t * -2 + (n * 2 + 1) AS DOUBLE) / CAST(df_$t * 2 + 1 AS DOUBLE))" +
        s" * (CAST(tf_$t AS DOUBLE) * 2.2 / (CAST(tf_$t AS DOUBLE) + 0.3" +
        s" + 0.9 * CAST(dl AS DOUBLE) * n / d))")
      .mkString("\n    + ")
    val tfCols = qt.map(t => s"tf_$t").mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t
       |  FROM documents$where),
       |hits AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |    unnest(list_filter(t, x -> $inList)) AS term
       |  FROM tok),
       |tf AS (
       |  SELECT doc_id, MAX(dl) AS dl,
       |$tfCases
       |  FROM hits GROUP BY doc_id),
       |corpus AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS d
       |  FROM documents$where),
       |dfs AS (
       |  SELECT
       |$dfCases
       |  FROM tf),
       |scored AS (
       |  SELECT doc_id, dl, $tfCols,
       |    $contribs AS score
       |  FROM tf CROSS JOIN corpus CROSS JOIN dfs)
       |SELECT doc_id, dl, $tfCols, score
       |FROM scored ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  }


  val bm25TopKSql: String = bm25TopKSqlWhere("")


  /** Mirror of [[graft.functions.TextAnalysis.bm25TopKFromIndexDeleted]]
    * with tombstones = doc_id % 37 = 3: a from-scratch ranking of the
    * surviving corpus. */
  val bm25TopKDeletedSql: String =
    bm25TopKSqlWhere(" WHERE doc_id % 37 <> 3")


  // mirrors CurationOps.dataProfile: same column set, same string casts,
  // text profiled through md5 on both engines
  val dataProfileSql: String =
    """WITH stacked AS (
      |  SELECT 'doc_id' AS column_name, CAST(doc_id AS VARCHAR) AS v FROM documents
      |  UNION ALL SELECT 'lang', lang FROM documents
      |  UNION ALL SELECT 'source', source FROM documents
      |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
      |  UNION ALL SELECT 'text_md5', md5(text) FROM documents)
      |SELECT column_name,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
      |  MIN(v) AS min_val,
      |  MAX(v) AS max_val
      |FROM stacked GROUP BY column_name""".stripMargin


  // mirrors CurationOps.sourceQualityReport: the CTE is qualityFilterSql's
  // signal logic with `source` retained
  val sourceQualityReportSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source,
      |    CAST(length(text) AS BIGINT) AS n_chars,
      |    CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT)
      |      AS n_uniq
      |  FROM documents),
      |s AS (
      |  SELECT *,
      |    CASE WHEN n_tok BETWEEN 30 AND 2000 THEN 2
      |         WHEN n_tok BETWEEN 10 AND 5000 THEN 1 ELSE 0 END AS len_score,
      |    CASE WHEN n_uniq * 4 >= n_tok THEN 1 ELSE 0 END AS rep_score
      |  FROM d),
      |q AS (
      |  SELECT source, lang, n_chars, n_tok,
      |    (len_score + rep_score) >= 2 AS passed,
      |    CASE WHEN (len_score + rep_score) >= 2 THEN NULL
      |         WHEN len_score = 0 THEN 'length'
      |         WHEN rep_score = 0 THEN 'repetitive'
      |         ELSE 'low_quality' END AS reject_reason
      |  FROM s)
      |SELECT source, lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
      |  CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
      |  CAST(SUM(CASE WHEN reject_reason = 'length' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_reject_length,
      |  CAST(SUM(CASE WHEN reject_reason = 'repetitive' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_reject_repetitive,
      |  CAST(SUM(CASE WHEN reject_reason = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_reject_low_quality,
      |  CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) * 1000
      |    // COUNT(*) AS pass_permille
      |FROM q GROUP BY source, lang""".stripMargin
}
