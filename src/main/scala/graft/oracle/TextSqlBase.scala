package graft.oracle

import graft.functions.{CurationOps, DedupOps, TextAnalysis}

/** Shared cross-engine primitives of the [[TextSql]] DuckDB mirrors —
  * the CTEs and expression builders (tokenization, shingling, MinHash
  * signatures/banding, cosine, IVF assignment, n-gram doc-frequency)
  * interpolated from the SAME Scala constants the Spark side uses, so the
  * two engines cannot drift. Split out of the single 1.8k-line TextSql
  * (round-11 verdict item 7); [[TextSql]] still exposes every member.
  */
private[oracle] trait TextSqlBase {


  private[oracle] val P = TextAnalysis.P


  private[oracle] def mdh(e: String) = s"('0x' || substring(md5($e), 1, 15))::BIGINT"


  private[oracle] val tokCte =
    "tok AS (SELECT doc_id, lang, source, text,\n" +
    "  regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents)"


  // word 3-gram shingles, distinct per doc (mirror of DedupOps.shingles)
  private[oracle] def shCte(docFilter: String = "TRUE") =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t
       |        FROM documents WHERE $docFilter) d,
       |       UNNEST(generate_series(1, len(t) - 2)) AS u(i)
       |  WHERE len(t) >= 3)""".stripMargin


  // shingles → minhash signatures → banded buckets (no pairing yet):
  // shared by the symmetric candidate CTE below and the asymmetric
  // shard-vs-corpus probe in shardDedupSql
  // signatures + banding generated from the shared perms over ANY `sh`
  // CTE producing distinct (doc_id, s) — word shingles for the text
  // pipeline, byte windows for the media one (mediaDedupSql)
  private[oracle] def sigBandsFrom(shingleCte: String): String = {
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


  private[oracle] val sigBandsCte: String = sigBandsFrom(shCte())


  // … → candidate pairs: shared by the LSH estimate query and the
  // duplicate-cluster closure
  private[oracle] val candCte: String =
    s"""$sigBandsCte,
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)""".stripMargin


  private[oracle] def cosineExprOn(a: String, b: String): String =
    s"""CAST(
       |      list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2])) /
       |      (sqrt(list_sum(list_transform($a, x -> x * x))) *
       |       sqrt(list_sum(list_transform($b, x -> x * x))))
       |      AS DECIMAL(12,8))""".stripMargin


  private[oracle] val cosineExpr = cosineExprOn("qv", "v")


  // multi-table LSH (mirrors SimilarityOps.{LshTables,LshBits}); note
  // DuckDB's int/int division is FLOAT division and its int casts ROUND —
  // FLOOR before casting mirrors Spark's truncating (double→int) cast
  private[oracle] val nPlanes = graft.functions.SimilarityOps.LshTables *
    graft.functions.SimilarityOps.LshBits

  private[oracle] val lshBits = graft.functions.SimilarityOps.LshBits


  private[oracle] val bucketCte: String =
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


  private[oracle] val centroidCte: String =
    """centroid AS (
      |  SELECT label, CAST(i - 1 AS INT) AS d,
      |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mean
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
      |  GROUP BY label, CAST(i - 1 AS INT))""".stripMargin


  // shared by ivfTopKSql and semDedupSql: the rk = 1 nearest-centroid cell
  // assignment, mirroring SimilarityOps.rankedAssignment (cscore rounded to
  // DECIMAL(12,8) half-even on both engines)
  private[oracle] val assignedCte: String =
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


  // Media byte-shingle near-dup mirror (MultimodalOps.mediaDedup): the
  // blobs are ASCII text-as-bytes, so 16-byte windows at stride 8 over the
  // binary column equal character windows over text; the sig/band/verify
  // tail is generated from the SAME perms as the text pipeline.
  private[oracle] val mediaShCte: String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, substring(text, i * 8 + 1, 16) AS s
       |  FROM (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |        FROM documents WHERE length(text) >= 16) d,
       |       UNNEST(range(0, CAST((n - 16) // 8 AS INTEGER) + 1)) AS u(i))""".stripMargin


  /** Mirror of [[DedupOps.dupSpans]] (L = 8): token 8-gram hashes, per-h
    * doc frequency, per-doc duplicated-position rollup.
    */
  // token 8-gram doc-frequency CTEs, shared by dupSpansSql / gopherFilterSql
  private[oracle] val dupGramCtes: String = {
    val gram = (0 until 8).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"""g8 AS (
       |  SELECT doc_id, ${mdh(s"($gram)")} AS h
       |  FROM tok, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
       |  WHERE len(t) >= 8),
       |gd AS (SELECT h, doc_id, COUNT(*) AS cnt FROM g8 GROUP BY h, doc_id),
       |gw AS (SELECT *, COUNT(*) OVER (PARTITION BY h) AS ndocs FROM gd)""".stripMargin
  }


  /** Mirror of [[TextAnalysis.repSignals]]: unigram/bigram tagged counts,
    * per-doc rollup. SUM(BIGINT) is HUGEINT in DuckDB → explicit BIGINT
    * casts; ratio columns use the shared bround-as-DECIMAL(10,6) bridge.
    */
  // tagged unigram/bigram count CTEs, shared by repSignalsSql /
  // gopherFilterSql — a def: object vals initialize in declaration order
  // and this is referenced from earlier-declared SQL
  private[oracle] def repGramCtes: String =
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
}
