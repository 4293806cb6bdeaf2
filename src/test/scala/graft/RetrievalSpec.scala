package graft

import graft.functions.SimilarityOps

/** Differential properties of the retrieval consumers: k-NN label
  * classification (majority vote over the exact neighbor list) and hybrid
  * RRF fusion (lexical ∪ dense, rank-reciprocal scores).
  */
class RetrievalSpec extends SparkSpec {

  test("knn_classify: prediction is the majority label of the exact top-5, ties to smaller label") {
    val labels = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nn = SimilarityOps.cosineTopK(spark, sfTiny, nQueries = 20, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val out = SimilarityOps.knnClassify(spark, sfTiny).collect()
    assert(out.length == 20, s"expected 20 query rows, got ${out.length}")
    out.foreach { r =>
      val q = r.getLong(0)
      val expectedVotes = nn(q).map(labels(_).toLong)
        .groupBy(identity).view.mapValues(_.size).toMap
      val best = expectedVotes.toSeq.sortBy { case (l, v) => (-v, l) }.head
      assert(r.getLong(2) == best._1,
        s"query $q: pred ${r.getLong(2)} != majority ${best._1} ($expectedVotes)")
      assert(r.getLong(3) == best._2, s"query $q: vote count mismatch")
      assert(r.getLong(1) == labels(q).toLong, s"query $q: true_label wrong")
      assert(r.getBoolean(4) == (r.getLong(2) == r.getLong(1)),
        s"query $q: correct flag inconsistent")
    }
  }

  test("hybrid_topk: every fused hit comes from a leg's top-20 and rrf is the exact rank-reciprocal sum") {
    val dense = SimilarityOps.cosineTopK(spark, sfTiny, nQueries = 10, k = 20)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val out = SimilarityOps.hybridTopK(spark, sfTiny).collect()
    assert(out.nonEmpty, "hybrid_topk returned nothing")
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.size == 10, s"expected 10 queries, got ${perQuery.size}")
    perQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length),
        s"query $q: ranks not dense 1..k")
      assert(rows.length <= 5, s"query $q: more than k rows")
    }
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      val rLex = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val rDense = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(rLex.isDefined || rDense.isDefined,
        s"($q,$n): fused hit missing from both legs")
      // the dense leg must agree with the brute-force ranking exactly
      rDense.foreach { rd =>
        assert(dense.get((q, n)).contains(rd),
          s"($q,$n): r_dense $rd != brute-force rank ${dense.get((q, n))}")
      }
      val expected = rLex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rDense.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(5) == expected,
        s"($q,$n): rrf ${r.getDouble(5)} != $expected")
    }
    // rank order must agree with rrf order (desc, neighbor_id tiebreak)
    perQuery.foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(1)).map(r => (r.getDouble(5), r.getLong(2)))
      assert(byRank.zip(byRank.tail).forall { case ((s1, n1), (s2, n2)) =>
        s1 > s2 || (s1 == s2 && n1 < n2)
      }, s"query $q: fused ranking not ordered by (rrf desc, neighbor_id)")
    }
    // both legs must actually contribute somewhere in the fused top-5
    assert(out.exists(r => !r.isNullAt(3)), "lexical leg never contributes")
    assert(out.exists(r => !r.isNullAt(4)), "dense leg never contributes")
  }
}
