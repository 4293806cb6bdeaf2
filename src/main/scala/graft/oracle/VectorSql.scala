package graft.oracle

import graft.functions.{CurationOps, DedupOps, TextAnalysis}

/** DuckDB mirrors of the VECTOR/similarity operators
  * ([[graft.functions.SimilarityOps]]): brute-force and LSH/IVF/PQ ANN,
  * SemDeDup, semantic clusters, kNN graph/classify, hybrid retrieval.
  * See [[TextSqlBase]] for the shared CTEs.
  */
private[oracle] trait VectorSql extends TextSqlBase {


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


  val labelCentroidsSql: String =
    s"""WITH $centroidCte
       |SELECT label, d, mean FROM centroid""".stripMargin


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


  // ── scaled-k quantizer mirrors (SimilarityOps.scaledAssignment) ──
  // the deterministic k ∝ N cell refinement: quantile tiles of B members
  // by (cscore DESC, vec_id) within each label cell, DECIMAL-exact
  // sub-centroid means, then reassignment to the nearest sub-centroid
  // within the label (rounded-DECIMAL argmax, low-tile tie-break) —
  // every stage mirrors the Spark expression tree; B is interpolated
  // from the SAME Scala constant the engine uses
  private[oracle] def scaledCte(b: Int): String =
    s"""$assignedCte,
       |tiled AS (
       |  SELECT vec_id, v, cell, cscore,
       |    CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY cell
       |      ORDER BY cscore DESC, vec_id) - 1) / $b) AS INT) AS tile
       |  FROM assigned),
       |subcent AS (
       |  SELECT cell, tile, list(mean ORDER BY d) AS sc FROM (
       |    SELECT cell, tile, CAST(i - 1 AS INT) AS d,
       |      CAST(SUM(CAST(v[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mean
       |    FROM tiled, UNNEST(generate_series(1, len(v))) AS u(i)
       |    GROUP BY cell, tile, CAST(i - 1 AS INT)) m
       |  GROUP BY cell, tile),
       |sscored AS (
       |  SELECT t.vec_id, t.v, t.cell, s.tile,
       |    ${cosineExprOn("s.sc", "t.v")} AS tscore
       |  FROM tiled t JOIN subcent s ON t.cell = s.cell),
       |sassigned AS (
       |  SELECT vec_id, v, cell, tile, tscore FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY tscore DESC, tile) AS srk
       |    FROM sscored) z
       |  WHERE srk = 1)""".stripMargin

  private def scaledB = graft.functions.SimilarityOps.scaledTargetCell

  // the quantizer pinned per-vector (SimilarityOps.scaledCells)
  val scaledCellsSql: String =
    s"""WITH ${scaledCte(scaledB)}
       |SELECT vec_id, cell, tile, CAST(tscore AS DOUBLE) AS tile_cos
       |FROM sassigned""".stripMargin

  // SemDeDup under the scaled quantizer (SimilarityOps.semDedupScaled):
  // same keep policy as semDedupSql, pairs within (cell, tile) only
  val semDedupScaledSql: String =
    s"""WITH ${scaledCte(scaledB)},
       |pairs AS (
       |  SELECT x.vec_id, x.tscore AS xc, y.vec_id AS other_id,
       |    y.tscore AS yc,
       |    ${cosineExprOn("x.v", "y.v")} AS cos
       |  FROM sassigned x JOIN sassigned y
       |    ON x.cell = y.cell AND x.tile = y.tile
       |    AND x.vec_id <> y.vec_id),
       |near AS (
       |  SELECT vec_id, COUNT(*) AS n_near,
       |    MAX(CASE WHEN yc < xc OR (yc = xc AND other_id < vec_id)
       |        THEN 1 ELSE 0 END) AS dominated
       |  FROM pairs WHERE cos >= 0.3 GROUP BY vec_id)
       |SELECT a.vec_id, a.cell, a.tile,
       |  CAST(a.tscore AS DOUBLE) AS centroid_cos,
       |  CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near,
       |  COALESCE(n.dominated, 0) = 0 AS keep
       |FROM sassigned a LEFT JOIN near n ON a.vec_id = n.vec_id""".stripMargin

  // transitive closure over the scaled τ-near graph
  // (SimilarityOps.semanticClustersScaled) — the semanticClustersSql
  // shape with the scaled cell in the edge predicate
  val semanticClustersScaledSql: String =
    s"""WITH RECURSIVE ${scaledCte(scaledB)},
       |sedges AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM sassigned x JOIN sassigned y
       |    ON x.cell = y.cell AND x.tile = y.tile
       |    AND x.vec_id < y.vec_id
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

  // the scaled quantizer's recall vs the fixed-k pair set
  // (SimilarityOps.scaledPairRecall): pairs split across tiles are the
  // loss the bounded cells accept for linear pair cost
  val scaledPairRecallSql: String =
    s"""WITH ${scaledCte(scaledB)},
       |full_pairs AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM assigned x JOIN assigned y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE ${cosineExprOn("x.v", "y.v")} >= 0.3),
       |scaled_pairs AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM sassigned x JOIN sassigned y
       |    ON x.cell = y.cell AND x.tile = y.tile AND x.vec_id < y.vec_id
       |  WHERE ${cosineExprOn("x.v", "y.v")} >= 0.3),
       |kept AS (
       |  SELECT COUNT(*) AS n_kept FROM full_pairs f
       |  WHERE EXISTS (SELECT 1 FROM scaled_pairs s
       |                WHERE s.id1 = f.id1 AND s.id2 = f.id2))
       |SELECT
       |  (SELECT COUNT(*) FROM full_pairs) AS n_full,
       |  (SELECT COUNT(*) FROM scaled_pairs) AS n_scaled,
       |  n_kept,
       |  CAST(n_kept * 1000000 // (SELECT COUNT(*) FROM full_pairs)
       |       AS BIGINT) AS recall_ppm
       |FROM kept""".stripMargin

  // ── tree-probe mirrors (SimilarityOps.treeAssignment) ──
  // the two-level descent over the scaled quantizer: tiles group into
  // branches of ⌈√T⌉ adjacent annuli, the probe picks the nearest branch
  // centroid then the nearest tile WITHIN that branch — every stage the
  // same DECIMAL mean / rounded-DECIMAL argmax as the flat form
  private[oracle] def treeCte(b: Int): String =
    s"""${scaledCte(b)},
       |bw AS (
       |  SELECT cell, CAST(CEIL(SQRT(MAX(tile) + 1)) AS INT) AS bw
       |  FROM tiled GROUP BY cell),
       |tbranch AS (
       |  SELECT t.vec_id, t.v, t.cell, CAST(t.tile // w.bw AS INT) AS branch
       |  FROM tiled t JOIN bw w ON t.cell = w.cell),
       |branchcent AS (
       |  SELECT cell, branch, list(mean ORDER BY d) AS bc FROM (
       |    SELECT cell, branch, CAST(i - 1 AS INT) AS d,
       |      CAST(SUM(CAST(v[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mean
       |    FROM tbranch, UNNEST(generate_series(1, len(v))) AS u(i)
       |    GROUP BY cell, branch, CAST(i - 1 AS INT)) m
       |  GROUP BY cell, branch),
       |bscored AS (
       |  SELECT t.vec_id, t.v, t.cell, b.branch,
       |    ${cosineExprOn("b.bc", "t.v")} AS bscore
       |  FROM tiled t JOIN branchcent b ON t.cell = b.cell),
       |bassigned AS (
       |  SELECT vec_id, v, cell, branch FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY bscore DESC, branch) AS brk
       |    FROM bscored) z
       |  WHERE brk = 1),
       |subbranch AS (
       |  SELECT s.cell, CAST(s.tile // w.bw AS INT) AS branch, s.tile, s.sc
       |  FROM subcent s JOIN bw w ON s.cell = w.cell),
       |tscored AS (
       |  SELECT a.vec_id, a.v, a.cell, a.branch, s.tile,
       |    ${cosineExprOn("s.sc", "a.v")} AS tscore
       |  FROM bassigned a JOIN subbranch s
       |    ON a.cell = s.cell AND a.branch = s.branch),
       |tassigned AS (
       |  SELECT vec_id, v, cell, branch, tile, tscore FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY tscore DESC, tile) AS trk
       |    FROM tscored) z
       |  WHERE trk = 1)""".stripMargin

  // the TREE gate dial — below scaledB so the gate corpus genuinely
  // branches and the mirror's branch-level argmax is exercised
  private def treeB = graft.functions.SimilarityOps.treeTargetCell

  // the probe pinned per-vector (SimilarityOps.treeCells)
  val treeCellsSql: String =
    s"""WITH ${treeCte(treeB)}
       |SELECT vec_id, cell, branch, tile, CAST(tscore AS DOUBLE) AS tile_cos
       |FROM tassigned""".stripMargin

  // pair-set agreement of the probe vs the flat scaled argmax
  // (SimilarityOps.treePairRecall): the probe both loses and forms
  // pairs, so n_flat / n_tree / n_common are all free observables
  val treePairRecallSql: String =
    s"""WITH ${treeCte(treeB)},
       |flat_pairs AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM sassigned x JOIN sassigned y
       |    ON x.cell = y.cell AND x.tile = y.tile AND x.vec_id < y.vec_id
       |  WHERE ${cosineExprOn("x.v", "y.v")} >= 0.3),
       |tree_pairs AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM tassigned x JOIN tassigned y
       |    ON x.cell = y.cell AND x.tile = y.tile AND x.vec_id < y.vec_id
       |  WHERE ${cosineExprOn("x.v", "y.v")} >= 0.3),
       |common AS (
       |  SELECT COUNT(*) AS n_common FROM flat_pairs f
       |  WHERE EXISTS (SELECT 1 FROM tree_pairs s
       |                WHERE s.id1 = f.id1 AND s.id2 = f.id2))
       |SELECT
       |  (SELECT COUNT(*) FROM flat_pairs) AS n_flat,
       |  (SELECT COUNT(*) FROM tree_pairs) AS n_tree,
       |  n_common,
       |  CAST(n_common * 1000000 // (SELECT COUNT(*) FROM flat_pairs)
       |       AS BIGINT) AS recall_ppm
       |FROM common""".stripMargin

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
  def semanticClustersSqlWhere(vecFilter: String): String =
    s"""WITH RECURSIVE $assignedCte,
       |sedges AS (
       |  SELECT x.vec_id AS id1, y.vec_id AS id2
       |  FROM assigned x JOIN assigned y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE (${vecFilter.replace("vec_id", "x.vec_id")})
       |    AND (${vecFilter.replace("vec_id", "y.vec_id")})
       |    AND ${cosineExprOn("x.v", "y.v")} >= 0.3),
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

  val semanticClustersSql: String = semanticClustersSqlWhere("TRUE")

  // the takedown twin: the same closure over vectors that never contained
  // the deleted ids (vec_id % 37 = 3 — the standing `*_deleted` fixture)
  val semanticClustersDeletedSql: String =
    semanticClustersSqlWhere("vec_id % 37 <> 3")

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
}
