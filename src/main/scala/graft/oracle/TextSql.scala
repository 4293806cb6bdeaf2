package graft.oracle

import graft.functions.{CurationOps, DedupOps, TextAnalysis}

/** DuckDB mirrors of the LLM-pipeline operators ([[graft.functions]]).
  * Hash constants, permutation coefficients, language profiles, and
  * polynomial powers are interpolated from the SAME Scala constants the
  * Spark side uses — the two engines cannot drift.
  *
  * Cross-engine primitives:
  *  - `mdhash(s)` ≙ `('0x' || substring(md5(s),1,15))::BIGINT` (60-bit).
  *  - tokens ≙ `regexp_extract_all(text, '[a-z0-9]+')`.
  *  - DuckDB list indexing is 1-based (Spark's posexplode is 0-based) —
  *    mirrored with explicit `i - 1` arithmetic where positions matter.
  */
object TextSql {

  private val P = TextAnalysis.P

  private def mdh(e: String) = s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  private val tokCte =
    "tok AS (SELECT doc_id, lang, source, text,\n" +
    "  regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents)"

  // word 3-gram shingles, distinct per doc (mirror of DedupOps.shingles)
  private def shCte(docFilter: String = "TRUE") =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t
       |        FROM documents WHERE $docFilter) d,
       |       UNNEST(generate_series(1, len(t) - 2)) AS u(i)
       |  WHERE len(t) >= 3)""".stripMargin

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

  // shingles → minhash signatures → banded buckets (no pairing yet):
  // shared by the symmetric candidate CTE below and the asymmetric
  // shard-vs-corpus probe in shardDedupSql
  // signatures + banding generated from the shared perms over ANY `sh`
  // CTE producing distinct (doc_id, s) — word shingles for the text
  // pipeline, byte windows for the media one (mediaDedupSql)
  private def sigBandsFrom(shingleCte: String): String = {
    val sigCols = DedupOps.perms.zipWithIndex.map { case ((a, b), k) =>
      s"    MIN(($a * (h % $P) + $b) % $P) AS m$k"
    }.mkString(",\n")
    val bands = (0 until 4).map { b =>
      s"  SELECT doc_id, $b AS band, CAST(m${2 * b} AS VARCHAR) || ':' || CAST(m${2 * b + 1} AS VARCHAR) AS bkey FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""$shingleCte,
       |h AS (SELECT doc_id, ${mdh("s")} AS h FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |$sigCols
       |  FROM h GROUP BY doc_id),
       |bands AS (
       |$bands)""".stripMargin
  }

  private val sigBandsCte: String = sigBandsFrom(shCte())

  // … → candidate pairs: shared by the LSH estimate query and the
  // duplicate-cluster closure
  private val candCte: String =
    s"""$sigBandsCte,
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin

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
  val dedupClustersSql: String =
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
       |  FROM reach GROUP BY src)
       |SELECT doc_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  doc_id = cluster_id AS keep
       |FROM labels""".stripMargin

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

  private def cosineExprOn(a: String, b: String): String =
    s"""CAST(
       |      list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
       |      (sqrt(list_sum(list_transform($a, x -> x * x))) *
       |       sqrt(list_sum(list_transform($b, x -> x * x))))
       |      AS DECIMAL(12,8))""".stripMargin

  private val cosineExpr = cosineExprOn("qv", "v")

  val cosineTopKSql: String =
    s"""WITH emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 20),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    $cosineExpr AS score
       |  FROM q, emb e WHERE e.vec_id <> q.query_id)
       |SELECT query_id, rank, neighbor_id, CAST(score AS DOUBLE) AS score FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin

  // multi-table LSH (mirrors SimilarityOps.{LshTables,LshBits}); note
  // DuckDB's int/int division is FLOAT division and its int casts ROUND —
  // FLOOR before casting mirrors Spark's truncating (double→int) cast
  private val nPlanes = graft.functions.SimilarityOps.LshTables *
    graft.functions.SimilarityOps.LshBits
  private val lshBits = graft.functions.SimilarityOps.LshBits

  private val bucketCte: String =
    s"""dims AS (
       |  SELECT vec_id, i - 1 AS d, CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS xd
       |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
       |planes AS (
       |  SELECT vec_id, d, xd, b AS p,
       |    (${mdh("CAST(b AS VARCHAR) || '_' || CAST(d AS VARCHAR)")} % 2001) - 1000 AS w
       |  FROM dims, UNNEST(generate_series(0, ${nPlanes - 1})) AS u(b)),
       |wsum AS (
       |  SELECT vec_id, p, SUM(w * xd) AS dp FROM planes GROUP BY vec_id, p),
       |buckets AS (
       |  SELECT vec_id, CAST(FLOOR(p / $lshBits) AS INT) AS tbl,
       |    CAST(SUM(CASE WHEN dp > 0
       |             THEN (CAST(1 AS BIGINT) << (p % $lshBits)) ELSE 0 END)
       |         AS BIGINT) AS bucket
       |  FROM wsum GROUP BY vec_id, CAST(FLOOR(p / $lshBits) AS INT))""".stripMargin

  val lshBucketsSql: String =
    s"""WITH $bucketCte
       |SELECT vec_id, tbl, bucket FROM buckets""".stripMargin

  val lshTopKSql: String =
    s"""WITH $bucketCte,
       |emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
       |  FROM buckets q
       |  JOIN buckets n ON q.tbl = n.tbl AND q.bucket = n.bucket
       |                AND n.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20),
       |pairs AS (
       |  SELECT c.query_id, c.neighbor_id, eq.v AS qv, en.v AS v
       |  FROM cand c
       |  JOIN emb eq ON eq.vec_id = c.query_id
       |  JOIN emb en ON en.vec_id = c.neighbor_id),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    $cosineExpr AS score
       |  FROM pairs)
       |SELECT query_id, rank, neighbor_id, CAST(score AS DOUBLE) AS score FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin

  private val centroidCte: String =
    """centroid AS (
      |  SELECT label, CAST(i - 1 AS INT) AS d,
      |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mean
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
      |  GROUP BY label, CAST(i - 1 AS INT))""".stripMargin

  val labelCentroidsSql: String =
    s"""WITH $centroidCte
       |SELECT label, d, mean FROM centroid""".stripMargin

  // shared by ivfTopKSql and semDedupSql: the rk = 1 nearest-centroid cell
  // assignment, mirroring SimilarityOps.rankedAssignment (cscore rounded to
  // DECIMAL(12,8) half-even on both engines)
  private val assignedCte: String =
    s"""$centroidCte,
       |cent AS (
       |  SELECT label, list(mean ORDER BY d) AS c FROM centroid GROUP BY label),
       |emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cellpairs AS (
       |  SELECT e.vec_id, e.v, c.label, c.c AS cv FROM emb e CROSS JOIN cent c),
       |scored_cells AS (
       |  SELECT vec_id, v, label,
       |    ${cosineExprOn("cv", "v")} AS cscore
       |  FROM cellpairs),
       |assigned AS (
       |  SELECT vec_id, v, label AS cell, cscore FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cscore DESC, label) AS rk
       |    FROM scored_cells) a
       |  WHERE rk = 1)""".stripMargin

  val ivfTopKSql: String =
    s"""WITH $assignedCte,
       |q AS (SELECT vec_id AS query_id, v AS q_v, cell FROM assigned
       |      WHERE vec_id < 20),
       |pairs AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id, q.q_v AS qv, a.v
       |  FROM q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.query_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, $cosineExpr AS score FROM pairs)
       |SELECT query_id, rank, neighbor_id, CAST(score AS DOUBLE) AS score FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin

  // SemDeDup (SimilarityOps.semDedup): within-cell pairwise cosine, keep
  // the low-centroid-similarity member of each τ-near pair (ties → low id)
  val semDedupSql: String =
    s"""WITH $assignedCte,
       |pairs AS (
       |  SELECT x.vec_id, x.cscore AS xc, y.vec_id AS other_id,
       |    y.cscore AS yc,
       |    ${cosineExprOn("x.v", "y.v")} AS cos
       |  FROM assigned x JOIN assigned y
       |    ON x.cell = y.cell AND x.vec_id <> y.vec_id),
       |near AS (
       |  SELECT vec_id, COUNT(*) AS n_near,
       |    MAX(CASE WHEN yc < xc OR (yc = xc AND other_id < vec_id)
       |        THEN 1 ELSE 0 END) AS dominated
       |  FROM pairs WHERE cos >= 0.3 GROUP BY vec_id)
       |SELECT a.vec_id, a.cell,
       |  CAST(a.cscore AS DOUBLE) AS centroid_cos,
       |  CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near,
       |  COALESCE(n.dominated, 0) = 0 AS keep
       |FROM assigned a LEFT JOIN near n ON a.vec_id = n.vec_id""".stripMargin

  // IVF-PQ with exact re-rank (SimilarityOps.pqTopK): sub-quantizer codes
  // by rounded-DECIMAL argmin (label tie-break), per-query ADC lookup
  // table, DECIMAL-exact m-addend sums, ADC shortlist top-16, exact cosine
  // re-rank — every stage mirrors the Spark expression tree
  def pqTopKSqlExcluding(qExtra: String, candExtra: String): String = {
    def subSlice(v: String, c: String, op: String): String =
      s"CAST(list_sum(list_transform(list_zip(" +
        s"list_slice($v, s * 2 + 1, s * 2 + 2), " +
        s"list_slice($c, s * 2 + 1, s * 2 + 2)), p -> $op)) AS DECIMAL(18,8))"
    s"""WITH $assignedCte,
       |subdist AS (
       |  SELECT e.vec_id, u.s, c.label,
       |    ${subSlice("e.v", "c.c", "(p[1] - p[2]) * (p[1] - p[2])")} AS dist
       |  FROM emb e CROSS JOIN cent c,
       |    UNNEST(generate_series(0, 31)) AS u(s)),
       |codes AS (
       |  SELECT vec_id, s, label AS code FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s
       |      ORDER BY dist, label) AS rk
       |    FROM subdist) t
       |  WHERE rk = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, cell FROM assigned
       |      WHERE vec_id < 20$qExtra),
       |cand AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id
       |  FROM q JOIN assigned a ON q.cell = a.cell
       |    AND a.vec_id <> q.query_id$candExtra),
       |lut AS (
       |  SELECT q.query_id, u.s, c.label AS code,
       |    ${subSlice("q.qv", "c.c", "p[1] * p[2]")} AS w
       |  FROM q CROSS JOIN cent c,
       |    UNNEST(generate_series(0, 31)) AS u(s)),
       |qnorms AS (
       |  SELECT query_id,
       |    sqrt(list_sum(list_transform(qv, x -> x * x))) AS qn
       |  FROM q),
       |codenorms AS (
       |  SELECT u.s, c.label AS code,
       |    CAST(list_sum(list_transform(
       |      list_slice(c.c, u.s * 2 + 1, u.s * 2 + 2), x -> x * x))
       |      AS DECIMAL(18,8)) AS n2
       |  FROM cent c, UNNEST(generate_series(0, 31)) AS u(s)),
       |sums AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    SUM(l.w) AS dots, SUM(n.n2) AS rn2
       |  FROM cand
       |  JOIN codes k2 ON k2.vec_id = cand.neighbor_id
       |  JOIN lut l ON l.query_id = cand.query_id AND l.s = k2.s
       |    AND l.code = k2.code
       |  JOIN codenorms n ON n.s = k2.s AND n.code = k2.code
       |  GROUP BY cand.query_id, cand.neighbor_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id, adc FROM (
       |    SELECT a.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc DESC, neighbor_id) AS srk
       |    FROM (
       |      SELECT s2.query_id, s2.neighbor_id,
       |        CAST(CAST(s2.dots AS DOUBLE) /
       |          (qn.qn * sqrt(CAST(s2.rn2 AS DOUBLE))) AS DECIMAL(12,8)) AS adc
       |      FROM sums s2 JOIN qnorms qn ON qn.query_id = s2.query_id) a) t
       |  WHERE srk <= 16),
       |rerank AS (
       |  SELECT sl.query_id, sl.neighbor_id, sl.adc,
       |    ${cosineExprOn("q.qv", "e.v")} AS score
       |  FROM shortlist sl
       |  JOIN q ON q.query_id = sl.query_id
       |  JOIN emb e ON e.vec_id = sl.neighbor_id)
       |SELECT query_id, rank, neighbor_id,
       |  CAST(score AS DOUBLE) AS score, CAST(adc AS DOUBLE) AS adc_score
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, neighbor_id) AS rank
       |  FROM rerank) t
       |WHERE rank <= 3""".stripMargin
  }

  val pqTopKSql: String = pqTopKSqlExcluding("", "")

  /** Mirror of [[graft.functions.SimilarityOps.pqTopKFromIndexDeleted]]
    * with tombstones = vec_id % 37 = 3: deleted vectors excluded from both
    * probe roles, codebook/codes (trained before the delete) UNCHANGED —
    * the centroid CTEs stay over the full corpus, which is exactly the
    * frozen-codebook deletion semantics the Spark probe implements. */
  val pqTopKDeletedSql: String = pqTopKSqlExcluding(
    " AND vec_id % 37 <> 3", " AND a.vec_id % 37 <> 3")

  // IVF recall evaluator (SimilarityOps.ivfRecall): exact brute-force
  // top-5 truth vs the multi-probe IVF ranking per nprobe ∈ {1,2,4} —
  // both rankings deterministic (DECIMAL(12,8) scores, id tie-breaks), so
  // the recall ratio is hash-gated integer arithmetic, not a sketch claim
  val ivfRecallSql: String = {
    val nprobes = Seq(1, 2, 4)
    val probeCtes = nprobes.map { np =>
      s"""ivf_$np AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT p.query_id, p.neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.query_id
         |        ORDER BY p.score DESC, p.neighbor_id) AS rnk
         |    FROM (
         |      SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         |        ${cosineExprOn("q.v", "a.v")} AS score
         |      FROM ranked q
         |      JOIN assigned a ON q.label = a.cell AND a.vec_id <> q.vec_id
         |      WHERE q.vec_id < 20 AND q.rk <= $np) p) t
         |  WHERE rnk <= 5)""".stripMargin
    }.mkString(",\n")
    val probeUnion = nprobes.map(np =>
      s"SELECT $np AS nprobe, query_id, neighbor_id FROM ivf_$np")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $centroidCte,
       |cent AS (
       |  SELECT label, list(mean ORDER BY d) AS c FROM centroid GROUP BY label),
       |emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |ranked AS (
       |  SELECT vec_id, v, label,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ${cosineExprOn("c.c", "e.v")} DESC, label) AS rk
       |  FROM emb e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, v, label AS cell FROM ranked WHERE rk = 1),
       |truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT s.query_id, s.neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY s.query_id
       |        ORDER BY s.score DESC, s.neighbor_id) AS rnk
       |    FROM (
       |      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |        ${cosineExprOn("q.v", "e.v")} AS score
       |      FROM emb q, emb e
       |      WHERE q.vec_id < 20 AND e.vec_id <> q.vec_id) s) t
       |  WHERE rnk <= 5),
       |n_t AS (SELECT COUNT(*) AS n_truth FROM truth),
       |$probeCtes,
       |probes AS (
       |  $probeUnion)
       |SELECT CAST(p.nprobe AS BIGINT) AS nprobe, n_t.n_truth,
       |  COUNT(*) AS n_hits,
       |  CAST(COUNT(*) * 1000000 // n_t.n_truth AS BIGINT) AS recall_ppm
       |FROM probes p
       |JOIN truth USING (query_id, neighbor_id)
       |CROSS JOIN n_t
       |GROUP BY p.nprobe, n_t.n_truth""".stripMargin
  }

  // Semantic clusters (SimilarityOps.semanticClusters): transitive closure
  // over the within-cell τ-near pair edges — same closure shape as
  // dedupClustersSql, edge set from the semdedup pair predicate
  val semanticClustersSql: String =
    s"""WITH RECURSIVE $assignedCte,
       |sedges AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM assigned x JOIN assigned y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE ${cosineExprOn("x.v", "y.v")} >= 0.3),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM sedges
       |  UNION SELECT id2, id1 FROM sedges),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |labels AS (
       |  SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT vec_id, cluster_id,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  vec_id = cluster_id AS keep
       |FROM labels""".stripMargin

  // Cluster-cap sampling (CurationOps.clusterCapSample): the semantic
  // clusters (reused verbatim as a nested CTE so the two oracles cannot
  // drift), singletons self-clustered, members ranked by (n_chars desc,
  // doc_id) with keep = rank <= 2
  val clusterCapSampleSql: String =
    s"""WITH sc AS ($semanticClustersSql),
       |assign AS (
       |  SELECT e.vec_id AS doc_id,
       |    COALESCE(sc.cluster_id, e.vec_id) AS cluster_id
       |  FROM embeddings e LEFT JOIN sc ON sc.vec_id = e.vec_id)
       |SELECT doc_id, cluster_id, n_chars,
       |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
       |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank,
       |  ROW_NUMBER() OVER (PARTITION BY cluster_id
       |    ORDER BY n_chars DESC, doc_id) <= 2 AS keep
       |FROM assign JOIN documents USING (doc_id)""".stripMargin

  // kNN graph (SimilarityOps.knnGraph): within-cell pairwise cosine,
  // per-vector top-5 window — the all-vectors generalization of ivfTopKSql
  val knnGraphSql: String =
    s"""WITH $assignedCte,
       |pairs AS (
       |  SELECT x.vec_id, x.cell, y.vec_id AS neighbor_id,
       |    ${cosineExprOn("x.v", "y.v")} AS cos
       |  FROM assigned x JOIN assigned y
       |    ON x.cell = y.cell AND x.vec_id <> y.vec_id)
       |SELECT vec_id, cell, rank, neighbor_id, CAST(cos AS DOUBLE) AS cos
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM pairs) t
       |WHERE rank <= 5""".stripMargin

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

  // candidates from the SAME multi-table LSH bucket join the engine uses
  // (bucketCte) — the gate checks the whole pipeline; recall vs brute force
  // is a property asserted in LlmOpsSpec, not hidden in the oracle
  val embeddingDedupSql: String =
    s"""WITH $bucketCte,
       |emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
       |  FROM buckets x
       |  JOIN buckets y ON x.tbl = y.tbl AND x.bucket = y.bucket
       |                AND x.vec_id < y.vec_id),
       |pairs AS (
       |  SELECT c.id1, c.id2, e1.v AS qv, e2.v AS v
       |  FROM cand c
       |  JOIN emb e1 ON e1.vec_id = c.id1
       |  JOIN emb e2 ON e2.vec_id = c.id2),
       |scored AS (
       |  SELECT id1, id2, $cosineExpr AS cos FROM pairs)
       |SELECT id1, id2, CAST(cos AS DOUBLE) AS cos,
       |  LEAST(id1, id2) AS keep_id, GREATEST(id1, id2) AS drop_id
       |FROM scored WHERE cos >= 0.5""".stripMargin

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

  // Media byte-shingle near-dup mirror (MultimodalOps.mediaDedup): the
  // blobs are ASCII text-as-bytes, so 16-byte windows at stride 8 over the
  // binary column equal character windows over text; the sig/band/verify
  // tail is generated from the SAME perms as the text pipeline.
  private val mediaShCte: String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, substring(text, i * 8 + 1, 16) AS s
       |  FROM (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |        FROM documents WHERE length(text) >= 16) d,
       |       UNNEST(range(0, CAST((n - 16) // 8 AS INTEGER) + 1)) AS u(i))""".stripMargin

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

  // symmetric int8 quantization (mirror of CurationOps.embedQuantize);
  // floor(x + 0.5) on a DOUBLE is tie-policy-free across engines
  val embedQuantizeSql: String =
    """WITH xs AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
      |  FROM xs)
      |SELECT vec_id, label, CAST(i - 1 AS INT) AS d,
      |  CAST(floor(v[i] * 127 / norm + 0.5) AS INT) AS q
      |FROM n, UNNEST(generate_series(1, len(v))) AS u(i)
      |WHERE norm > 0""".stripMargin

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

  /** Mirror of [[DedupOps.dupSpans]] (L = 8): token 8-gram hashes, per-h
    * doc frequency, per-doc duplicated-position rollup.
    */
  // token 8-gram doc-frequency CTEs, shared by dupSpansSql / gopherFilterSql
  private val dupGramCtes: String = {
    val gram = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""g8 AS (
       |  SELECT doc_id, ${mdh(s"($gram)")} AS h
       |  FROM tok, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
       |  WHERE len(t) >= 8),
       |gd AS (SELECT h, doc_id, COUNT(*) AS cnt FROM g8 GROUP BY h, doc_id),
       |gw AS (SELECT *, COUNT(*) OVER (PARTITION BY h) AS ndocs FROM gd)""".stripMargin
  }

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

  /** Mirror of [[TextAnalysis.repSignals]]: unigram/bigram tagged counts,
    * per-doc rollup. SUM(BIGINT) is HUGEINT in DuckDB → explicit BIGINT
    * casts; ratio columns use the shared bround-as-DECIMAL(10,6) bridge.
    */
  // tagged unigram/bigram count CTEs, shared by repSignalsSql /
  // gopherFilterSql — a def: object vals initialize in declaration order
  // and this is referenced from earlier-declared SQL
  private def repGramCtes: String =
    """g AS (
      |  SELECT doc_id, lang, source, 1 AS n, t[i] AS gram
      |  FROM tok, UNNEST(generate_series(1, len(t))) AS u(i)
      |  UNION ALL
      |  SELECT doc_id, lang, source, 2 AS n, t[i] || ' ' || t[i+1] AS gram
      |  FROM tok, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2),
      |c AS (
      |  SELECT doc_id, lang, source, n, gram, COUNT(*) AS cnt
      |  FROM g GROUP BY doc_id, lang, source, n, gram)""".stripMargin

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

  /** Mirror of [[graft.functions.SimilarityOps.knnClassify]]: majority
    * label over the exact cosine top-5 (ties toward the smaller label).
    */
  val knnClassifySql: String =
    s"""WITH emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 20),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    $cosineExpr AS score
       |  FROM q, emb e WHERE e.vec_id <> q.query_id),
       |nn AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS rank
       |    FROM scored) t
       |  WHERE rank <= 5),
       |votes AS (
       |  SELECT query_id, e.label, COUNT(*) AS votes
       |  FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
       |  GROUP BY 1, 2),
       |pred AS (
       |  SELECT query_id, label AS pred_label, votes FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY votes DESC, label) AS r
       |    FROM votes) t
       |  WHERE r = 1)
       |SELECT p.query_id, CAST(t.label AS BIGINT) AS true_label,
       |  CAST(p.pred_label AS BIGINT) AS pred_label, p.votes,
       |  p.pred_label = t.label AS correct
       |FROM pred p JOIN embeddings t ON p.query_id = t.vec_id""".stripMargin

  /** Mirror of [[graft.functions.SimilarityOps.hybridTopK]]: RRF fusion of
    * the rare-token lexical ranking and the exact cosine ranking. The rrf
    * arithmetic is the IDENTICAL double expression tree (two
    * correctly-rounded divisions + one fixed-order sum), so the fused
    * scores are bit-exact across engines.
    */
  val hybridTopKSql: String =
    s"""WITH ${shCte()},
       |nrow AS (SELECT COUNT(*) AS n FROM documents),
       |dfs AS (
       |  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
       |  HAVING COUNT(*) BETWEEN 2 AND 20),
       |rare AS (SELECT sh.doc_id, sh.s, d.df FROM sh JOIN dfs d USING (s)),
       |lex AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
       |    SUM(nrow.n - q.df) AS lex_score
       |  FROM rare q JOIN rare c USING (s) CROSS JOIN nrow
       |  WHERE q.doc_id < 10 AND c.doc_id <> q.doc_id
       |  GROUP BY 1, 2),
       |lexr AS (
       |  SELECT query_id, neighbor_id, CAST(r_lex AS BIGINT) AS r_lex FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY lex_score DESC, neighbor_id) AS r_lex
       |    FROM lex) t
       |  WHERE r_lex <= 20),
       |emb AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
       |scored AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |    $cosineExpr AS score
       |  FROM q, emb e WHERE e.vec_id <> q.query_id),
       |denser AS (
       |  SELECT query_id, neighbor_id, CAST(r_dense AS BIGINT) AS r_dense FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id) AS r_dense
       |    FROM scored) t
       |  WHERE r_dense <= 20),
       |fused AS (
       |  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
       |    COALESCE(l.neighbor_id, d.neighbor_id) AS neighbor_id,
       |    l.r_lex, d.r_dense,
       |    COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + l.r_lex AS DOUBLE),
       |             CAST(0.0 AS DOUBLE)) +
       |    COALESCE(CAST(1.0 AS DOUBLE) / CAST(60 + d.r_dense AS DOUBLE),
       |             CAST(0.0 AS DOUBLE)) AS rrf
       |  FROM lexr l FULL OUTER JOIN denser d
       |    ON l.query_id = d.query_id AND l.neighbor_id = d.neighbor_id)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       |  r_lex, r_dense, rrf
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf DESC, neighbor_id) AS rank
       |  FROM fused) f
       |WHERE rank <= 5""".stripMargin

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
