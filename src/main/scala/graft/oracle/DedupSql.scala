package graft.oracle

import graft.functions.{CurationOps, DedupOps, TextAnalysis}

/** DuckDB mirrors of the DEDUPLICATION operators
  * ([[graft.functions.DedupOps]] / [[graft.functions.MultimodalOps]]):
  * exact/n-gram/MinHash-LSH/SimHash/span/media dedup, the shard admission
  * gate, and cluster assignment. See [[TextSqlBase]] for the shared CTEs.
  */
private[oracle] trait DedupSql extends TextSqlBase {


  val fingerprintSql: String = {
    val pows = TextAnalysis.polyPows.mkString("[", ", ", "]")
    s"""WITH $tokCte,
       |ex AS (
       |  SELECT doc_id, i - 1 AS pos, t[i] AS w
       |  FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)),
       |h AS (
       |  SELECT doc_id, pos, ${mdh("w")} AS h FROM ex)
       |SELECT a.doc_id,
       |  CAST(SUM((h % $P) * ($pows[(pos % 8) + 1]) % $P) % $P AS BIGINT) AS poly_fp,
       |  bit_xor(h) AS xor_fp,
       |  COUNT(*) AS n_tokens,
       |  substring(md5(min(d.text)), 1, 16) AS md5_fp
       |FROM h a JOIN documents d ON a.doc_id = d.doc_id
       |GROUP BY a.doc_id""".stripMargin
  }


  val exactDedupSql: String =
    """SELECT md5(text) AS content_hash,
      |  COUNT(*) AS n_copies,
      |  MIN(doc_id) AS keep_doc_id,
      |  MAX(doc_id) AS max_doc_id
      |FROM documents GROUP BY 1""".stripMargin


  val ngramJaccardSql: String =
    s"""WITH ${shCte("doc_id < 200")},
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, n_inter, c1.n_sh AS n1, c2.n_sh AS n2,
       |  CAST(CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN counts c1 ON id1 = c1.doc_id
       |JOIN counts c2 ON id2 = c2.doc_id
       |WHERE CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |           AS DECIMAL(10,6)) >= 0.02""".stripMargin


  val minhashLshSql: String = {
    val matches = (0 until 8)
      .map(k => s"CASE WHEN s1.m$k = s2.m$k THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $candCte
       |SELECT id1, id2,
       |  CAST(CAST(CAST($matches AS DOUBLE) / 8 AS DECIMAL(10,6)) AS DOUBLE)
       |    AS est_jaccard
       |FROM cand
       |JOIN sig s1 ON id1 = s1.doc_id
       |JOIN sig s2 ON id2 = s2.doc_id""".stripMargin
  }


  /** Exact Jaccard on LSH candidates (the scale-path composition): the
    * candidate CTE feeds the same intersection/union arithmetic as
    * [[ngramJaccardSql]], with no doc-id bound.
    */
  val ngramJaccardLshSql: String =
    s"""WITH $candCte,
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id1, c.id2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON c.id1 = a.doc_id
       |  JOIN sh b ON c.id2 = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2)
       |SELECT id1, id2, n_inter, c1.n_sh AS n1, c2.n_sh AS n2,
       |  CAST(CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN counts c1 ON id1 = c1.doc_id
       |JOIN counts c2 ON id2 = c2.doc_id
       |WHERE CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |           AS DECIMAL(10,6)) >= 0.02""".stripMargin


  // Asymmetric containment on LSH candidates (DedupOps.minhashContainment):
  // same candidate/intersection CTEs as ngramJaccardLshSql, containment in
  // both directions + max (GREATEST over same-scale DECIMALs stays DECIMAL)
  val minhashContainmentSql: String =
    s"""WITH $candCte,
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id1, c.id2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON c.id1 = a.doc_id
       |  JOIN sh b ON c.id2 = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT id1, id2, n_inter, c1.n_sh AS n1, c2.n_sh AS n2,
       |    CAST(CAST(n_inter AS DOUBLE) / c1.n_sh AS DECIMAL(10,6)) AS c1d,
       |    CAST(CAST(n_inter AS DOUBLE) / c2.n_sh AS DECIMAL(10,6)) AS c2d
       |  FROM inter
       |  JOIN counts c1 ON id1 = c1.doc_id
       |  JOIN counts c2 ON id2 = c2.doc_id)
       |SELECT id1, id2, n_inter, n1, n2,
       |  CAST(c1d AS DOUBLE) AS containment_1,
       |  CAST(c2d AS DOUBLE) AS containment_2,
       |  CAST(GREATEST(c1d, c2d) AS DOUBLE) AS containment
       |FROM scored
       |WHERE GREATEST(c1d, c2d) >= 0.1""".stripMargin


  /** Mirror of DedupOps.shardDedup: asymmetric shard-vs-corpus admission.
    * Same sig/bands CTEs; the pairing is shard (doc_id % 10 = 7) probing
    * corpus (the rest), candidates LEFT-joined to the intersection so a
    * zero-overlap banding false positive still counts at Jaccard 0.
    */
  def shardDedupSqlExcluding(corpusExtra: String): String =
    s"""WITH $sigBandsCte,
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS shard_id, y.doc_id AS corpus_id
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey
       |  WHERE x.doc_id % 10 = 7 AND y.doc_id % 10 <> 7$corpusExtra),
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.shard_id, c.corpus_id, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON c.shard_id = a.doc_id
       |  JOIN sh b ON c.corpus_id = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT c.shard_id, c.corpus_id,
       |    CAST(CAST(COALESCE(i.n_inter, 0) AS DOUBLE) /
       |      (c1.n_sh + c2.n_sh - COALESCE(i.n_inter, 0)) AS DECIMAL(10,6)) AS j
       |  FROM cand c
       |  LEFT JOIN inter i ON c.shard_id = i.shard_id AND c.corpus_id = i.corpus_id
       |  JOIN counts c1 ON c.shard_id = c1.doc_id
       |  JOIN counts c2 ON c.corpus_id = c2.doc_id),
       |roll AS (
       |  SELECT shard_id, COUNT(*) AS n_cand,
       |    SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END) AS n_dup
       |  FROM scored GROUP BY 1),
       |best AS (
       |  SELECT shard_id, corpus_id AS best_dup_id, CAST(j AS DOUBLE) AS best_jaccard
       |  FROM (SELECT shard_id, corpus_id, j,
       |          row_number() OVER (PARTITION BY shard_id
       |            ORDER BY j DESC, corpus_id) AS rn
       |        FROM scored WHERE j >= 0.5)
       |  WHERE rn = 1)
       |SELECT d.doc_id,
       |  CAST(COALESCE(r.n_cand, 0) AS BIGINT) AS n_cand,
       |  CAST(COALESCE(r.n_dup, 0) AS BIGINT) AS n_dup,
       |  b.best_dup_id, b.best_jaccard,
       |  COALESCE(r.n_dup, 0) = 0 AS admit
       |FROM documents d
       |LEFT JOIN roll r ON d.doc_id = r.shard_id
       |LEFT JOIN best b ON d.doc_id = b.shard_id
       |WHERE d.doc_id % 10 = 7""".stripMargin


  val shardDedupSql: String = shardDedupSqlExcluding("")


  /** Mirror of [[graft.functions.DedupOps.shardDedupDeleted]] with
    * tombstones = corpus doc_id % 37 = 3: deleted corpus docs produce no
    * admission candidates — the same verdict arithmetic over a corpus
    * that never contained them. (The shard side is the incoming batch
    * and is never tombstoned.) */
  val shardDedupDeletedSql: String =
    shardDedupSqlExcluding(" AND y.doc_id % 37 <> 3")


  // LSH recall curve (mirror of DedupOps.lshRecall): exact-Jaccard truth
  // on the bounded sample vs the production candidate set, bucketed by
  // similarity decile
  val lshRecallSql: String =
    s"""WITH $candCte,
       |counts AS (
       |  SELECT doc_id, COUNT(*) AS n_sh FROM sh
       |  WHERE doc_id < 200 GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  WHERE a.doc_id < 200 AND b.doc_id < 200
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id1, id2,
       |    CAST(CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |         AS DECIMAL(10,6)) AS DOUBLE) AS jaccard
       |  FROM inter
       |  JOIN counts c1 ON id1 = c1.doc_id
       |  JOIN counts c2 ON id2 = c2.doc_id
       |  WHERE CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |             AS DECIMAL(10,6)) >= 0.02),
       |hits AS (
       |  SELECT id1, id2, 1 AS hit FROM cand
       |  WHERE id1 < 200 AND id2 < 200)
       |SELECT CAST(floor(jaccard * 10) AS INTEGER) AS band,
       |  COUNT(*) AS n_pairs, COUNT(hit) AS n_hit,
       |  CAST(CAST(CAST(COUNT(hit) AS DOUBLE) / COUNT(*)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS recall
       |FROM truth LEFT JOIN hits USING (id1, id2)
       |GROUP BY 1""".stripMargin


  // connected components of the candidate graph by transitive closure
  // (recursive CTE); cluster id = min doc_id reachable. The Spark side
  // computes the same components by min-label propagation — different
  // algorithm, same fixpoint, which is the point of the differential gate.
  def dedupClustersSqlWhere(docFilter: String): String =
    s"""WITH RECURSIVE ${sigBandsFrom(shCte(docFilter))},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM cand
       |  UNION SELECT id2, id1 FROM cand),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  doc_id = cluster_id AS keep
       |FROM labels""".stripMargin

  val dedupClustersSql: String = dedupClustersSqlWhere("TRUE")

  // the takedown twin: the same closure over a corpus that never contained
  // the deleted docs (doc_id % 37 = 3 — the standing `*_deleted` fixture)
  val dedupClustersDeletedSql: String =
    dedupClustersSqlWhere("doc_id % 37 <> 3")


  val simhashSql: String =
    s"""WITH $tokCte,
       |ex AS (SELECT doc_id, unnest(t) AS w FROM tok),
       |h AS (SELECT doc_id, ${mdh("w")} AS h FROM ex),
       |bits AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS bitsum
       |  FROM h, UNNEST(generate_series(0, 31)) AS u(b)
       |  GROUP BY doc_id, b)
       |SELECT doc_id,
       |  CAST(SUM(CASE WHEN bitsum > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
       |       AS BIGINT) AS simhash32
       |FROM bits GROUP BY doc_id""".stripMargin


  val simhashPairsSql: String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
       |tok AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t FROM docs),
       |ex AS (SELECT doc_id, unnest(t) AS w FROM tok),
       |h AS (SELECT doc_id, ${mdh("w")} AS h FROM ex),
       |bits AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS bitsum
       |  FROM h, UNNEST(generate_series(0, 31)) AS u(b)
       |  GROUP BY doc_id, b),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN bitsum > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
       |         AS BIGINT) AS simhash32
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  CAST(bit_count(xor(a.simhash32, b.simhash32)) AS BIGINT) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash32, b.simhash32)) <= 6""".stripMargin


  val mediaDedupSql: String =
    s"""WITH ${sigBandsFrom(mediaShCte)},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id1, c.id2, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN sh a ON c.id1 = a.doc_id
       |  JOIN sh b ON c.id2 = b.doc_id AND a.s = b.s
       |  GROUP BY 1, 2)
       |SELECT id1, id2, n_inter, c1.n_sh AS n1, c2.n_sh AS n2,
       |  CAST(CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN counts c1 ON id1 = c1.doc_id
       |JOIN counts c2 ON id2 = c2.doc_id
       |WHERE CAST(CAST(n_inter AS DOUBLE) / (c1.n_sh + c2.n_sh - n_inter)
       |           AS DECIMAL(10,6)) >= 0.05""".stripMargin


  // Frame-hash near-dup mirror (MultimodalOps.frameDedup): the frame CTE is
  // frameSampleSql's (char slicing ≡ byte slicing on ASCII), then stop-frame
  // pruning (df > 50 dropped) before the hash self-join, per-doc counts on
  // the pruned universe, containment share vs the smaller side.
  val frameDedupSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    GREATEST(length(text) // 64, 1) AS n_frames
       |  FROM documents),
       |fr AS (
       |  SELECT DISTINCT doc_id,
       |    substring(md5(substring(text, i * 64 + 1, 64)), 1, 16) AS frame_hash
       |  FROM (SELECT doc_id, text,
       |          UNNEST(range(0, CAST(n_frames AS INTEGER), 4)) AS i
       |        FROM f)),
       |rare AS (
       |  SELECT frame_hash FROM fr GROUP BY frame_hash HAVING COUNT(*) <= 50),
       |pr AS (SELECT fr.doc_id, fr.frame_hash FROM fr JOIN rare USING (frame_hash)),
       |nf AS (SELECT doc_id, COUNT(*) AS n_f FROM pr GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
       |  FROM pr a JOIN pr b
       |    ON a.frame_hash = b.frame_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id1, id2, n_shared, n1.n_f AS n1, n2.n_f AS n2,
       |  CAST(CAST(CAST(n_shared AS DOUBLE) / LEAST(n1.n_f, n2.n_f)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS share
       |FROM shared
       |JOIN nf n1 ON id1 = n1.doc_id
       |JOIN nf n2 ON id2 = n2.doc_id
       |WHERE CAST(CAST(n_shared AS DOUBLE) / LEAST(n1.n_f, n2.n_f)
       |           AS DECIMAL(10,6)) >= 0.5""".stripMargin


  val dupSpansSql: String =
    s"""WITH $tokCte,
       |$dupGramCtes
       |SELECT doc_id,
       |  CAST(SUM(cnt) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(SUM(CASE WHEN ndocs >= 2 THEN cnt END), 0) AS BIGINT)
       |    AS n_dup_grams,
       |  CAST(CAST(CAST(COALESCE(SUM(CASE WHEN ndocs >= 2 THEN cnt END), 0)
       |         AS DOUBLE) / SUM(cnt) AS DECIMAL(10,6)) AS DOUBLE)
       |    AS dup_gram_frac
       |FROM gw GROUP BY doc_id""".stripMargin


  /** Mirror of [[DedupOps.dedupSpansApply]] (L = 8): positioned token
    * 8-gram hashes, dup-hash semi-join, 1-based covered-position sets,
    * index-lambda filter re-emitting the cleaned text. DuckDB's
    * `list_filter` index parameter is 1-based — the Spark side emits
    * 1-based drop positions for exactly this reason.
    */
  val dedupSpansApplySql: String = {
    val gram = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""WITH $tokCte,
       |g8p AS (
       |  SELECT doc_id, i, ${mdh(s"($gram)")} AS h
       |  FROM tok, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
       |  WHERE len(t) >= 8),
       |duph AS (SELECT h FROM (
       |  SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM g8p GROUP BY h)
       |  WHERE ndocs >= 2),
       |droppos AS (
       |  SELECT DISTINCT doc_id, i + j AS p
       |  FROM g8p JOIN duph USING (h),
       |       UNNEST(generate_series(0, 7)) AS v(j)),
       |dropsets AS (SELECT doc_id, list(p) AS dp FROM droppos GROUP BY doc_id)
       |SELECT tok.doc_id,
       |  -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
       |  COALESCE(array_to_string(
       |    CASE WHEN dp IS NULL THEN t
       |         ELSE list_filter(t, (x, i) -> NOT list_contains(dp, i)) END,
       |    ' '), '') AS clean_text,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(len(dp), 0) AS BIGINT) AS n_dropped
       |FROM tok LEFT JOIN dropsets USING (doc_id)""".stripMargin
  }


  /** Mirror of [[graft.functions.TextAnalysis.fuzzyPairs]]: distinct part
    * names, q-gram candidate join, exact levenshtein verify, canonical
    * election by part count (LEAST on ties).
    */
  val fuzzyPairsSql: String =
    """WITH n AS (
      |  SELECT p_name AS name, COUNT(*) AS cnt FROM part
      |  GROUP BY p_name HAVING length(p_name) >= 6),
      |g AS (
      |  SELECT DISTINCT name, cnt, substring(name, i, 3) AS g
      |  FROM n, UNNEST(generate_series(1, length(name) - 2)) AS u(i)),
      |c AS (
      |  SELECT DISTINCT a.name AS name1, a.cnt AS cnt1,
      |    b.name AS name2, b.cnt AS cnt2
      |  FROM g a JOIN g b ON a.g = b.g AND a.name < b.name
      |    AND abs(length(a.name) - length(b.name)) <= 1)
      |SELECT name1, name2,
      |  CAST(cnt1 AS BIGINT) AS cnt1, CAST(cnt2 AS BIGINT) AS cnt2,
      |  CAST(levenshtein(name1, name2) AS BIGINT) AS dist,
      |  CASE WHEN cnt1 > cnt2 THEN name1 WHEN cnt2 > cnt1 THEN name2
      |       ELSE LEAST(name1, name2) END AS canonical
      |FROM c WHERE levenshtein(name1, name2) <= 1""".stripMargin


  // longest-document-wins canonical selection over the near-dup clusters
  // (mirror of CurationOps.dedupSelect on top of the dedup_clusters CTE)
  val dedupSelectSql: String =
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
       |sized AS (
       |  SELECT l.doc_id, l.cluster_id, d.n_chars
       |  FROM labels l JOIN documents d USING (doc_id))
       |SELECT doc_id, cluster_id, n_chars,
       |  FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
       |    ORDER BY n_chars DESC, doc_id ASC) AS canonical_id,
       |  doc_id = FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
       |    ORDER BY n_chars DESC, doc_id ASC) AS keep
       |FROM sized""".stripMargin


  val repSignalsSql: String =
    s"""WITH $tokCte,
       |$repGramCtes
       |SELECT doc_id, lang, source,
       |  CAST(SUM(CASE WHEN n = 1 THEN cnt END) AS BIGINT) AS n_tokens,
       |  CAST(MAX(CASE WHEN n = 1 THEN cnt END) AS BIGINT) AS top_token_count,
       |  CAST(CAST(CAST(MAX(CASE WHEN n = 1 THEN cnt END) AS DOUBLE)
       |       / SUM(CASE WHEN n = 1 THEN cnt END)
       |       AS DECIMAL(10,6)) AS DOUBLE) AS top_token_frac,
       |  CAST(COALESCE(SUM(CASE WHEN n = 2 THEN cnt END), 0) AS BIGINT)
       |    AS n_bigrams,
       |  CAST(COALESCE(SUM(CASE WHEN n = 2 THEN cnt - 1 END), 0) AS BIGINT)
       |    AS dup_bigram_excess,
       |  CASE WHEN COALESCE(SUM(CASE WHEN n = 2 THEN cnt END), 0) > 0 THEN
       |    CAST(CAST(CAST(SUM(CASE WHEN n = 2 THEN cnt - 1 END) AS DOUBLE)
       |         / SUM(CASE WHEN n = 2 THEN cnt END)
       |         AS DECIMAL(10,6)) AS DOUBLE)
       |  ELSE 0.0 END AS dup_bigram_frac
       |FROM c GROUP BY doc_id, lang, source""".stripMargin
}
