package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimilarityOps, TextAnalysis}

/** Deletion lifecycle of the stored indexes (takedown /
  * right-to-be-forgotten) — the operation the generation scaladocs used to
  * mark out-of-scope, now first-class: a tombstone set removes docs/vectors
  * from every probe role WITHOUT a rebuild (broadcast anti-join + exact
  * stats correction), and compaction folds the tombstones into the layout
  * so the plain probe serves the deleted state afterwards.
  *
  * The oracle gate (`bm25_topk_deleted`, `pq_topk_deleted`) already pins
  * "tombstone probe ≡ from-scratch ranking of the survivors" against
  * DuckDB; this spec pins the lifecycle around it: survivor-index
  * equivalence, compaction application, absence of deleted ids, and the
  * no-corpus-rescan plan property.
  */
class TombstoneSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("bm25: tombstone probe == index built without the deleted docs; compaction applies tombstones") {
    Seq("tomb_bm", "tomb_bm_clean", "tomb_bm_compacted").foreach(t =>
      Seq("", "_stats", "_doclens").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    TextAnalysis.writePostingsIndex(spark, sfTiny, "tomb_bm")
    // the deletion request arrives as ids; derive them from the stored
    // sidecar (like the gated query does), NOT from the corpus — the
    // plan assertion below checks the whole probe tree corpus-free
    val tombs = spark.table("tomb_bm_doclens")
      .filter(col("doc_id") % 37 === 3).select("doc_id")
    assert(tombs.count() > 0, "fixture produced no tombstones")

    val probe = TextAnalysis.bm25TopKFromIndexDeleted(spark, "tomb_bm", tombs)
    val got = canon(probe)

    // survivor-index equivalence: scores must be BIT-IDENTICAL to an index
    // that never contained the deleted docs (the stats correction is exact,
    // not approximate)
    TextAnalysis.writePostingsGenerationOf(
      docs.filter(col("doc_id") % 37 =!= 3).select("doc_id", "text"),
      "tomb_bm_clean")
    assert(canon(TextAnalysis.bm25TopKFromIndex(spark, "tomb_bm_clean")) == got,
      "tombstone probe diverged from a from-scratch survivor index")

    // compaction applies tombstones: the PLAIN probe over the compacted
    // layout serves the deleted state (anti-join left the hot path)
    TextAnalysis.compactPostings(spark, Seq("tomb_bm"), "tomb_bm_compacted",
      tombs = Some(tombs))
    assert(canon(TextAnalysis.bm25TopKFromIndex(spark, "tomb_bm_compacted")) == got,
      "plain probe over the tombstone-compacted index diverged")
    assert(spark.table("tomb_bm_compacted")
      .join(tombs, Seq("doc_id"), "left_semi").isEmpty,
      "compaction left tombstoned postings in the layout")

    // no deleted doc in the results, and the probe never rescans the corpus
    val deleted = tombs.collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !deleted.contains(r.head.asInstanceOf[Long])))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"tombstone probe rescans the corpus:\n$plan")
  }

  test("minhash: tombstone probe == probe over an index never containing the deleted docs; compaction applies tombstones") {
    import graft.functions.DedupOps
    Seq("tomb_mh", "tomb_mh_clean", "tomb_mh_compacted").foreach(t =>
      Seq("_bands", "_shingles", "_counts").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    DedupOps.writeMinhashIndex(spark, sfTiny, "tomb_mh")
    // takedown ids derived from the stored counts table, not the corpus
    val tombs = spark.table("tomb_mh_counts")
      .filter(col("doc_id") % 37 === 3).select("doc_id")
    assert(tombs.count() > 0, "fixture produced no tombstones")

    val got = canon(DedupOps.shardDedupFromGenerations(
      spark, sfTiny, Seq("tomb_mh"), tombs = Some(tombs)))

    // survivor-index equivalence: the verdicts must equal a probe over an
    // index BUILT without the deleted corpus docs
    DedupOps.writeMinhashGeneration(spark, sfTiny,
      col("doc_id") % 10 =!= 7 && col("doc_id") % 37 =!= 3, "tomb_mh_clean")
    assert(canon(DedupOps.shardDedupFromIndex(spark, sfTiny, "tomb_mh_clean"))
      == got, "tombstone probe diverged from a survivor-built index")

    // compaction applies tombstones: plain probe serves the deleted state
    DedupOps.compactMinhashIndex(spark, Seq("tomb_mh"), "tomb_mh_compacted",
      tombs = Some(tombs))
    assert(canon(DedupOps.shardDedupFromIndex(
      spark, sfTiny, "tomb_mh_compacted")) == got,
      "plain probe over the tombstone-compacted index diverged")
    for (s <- Seq("_bands", "_shingles", "_counts"))
      assert(spark.table(s"tomb_mh_compacted$s")
        .join(tombs, Seq("doc_id"), "left_semi").isEmpty,
        s"compaction left tombstoned rows in $s")
  }

  test("pq: tombstone probe == plain probe over a tombstone-compacted layout; codebook frozen") {
    val base = "/tmp/graft-tomb-pq"
    val compacted = "/tmp/graft-tomb-pq-compact"
    SimilarityOps.writePqBase(spark, sfTiny, lit(true), base)
    val tombs = spark.read.parquet(s"${base}_cells")
      .filter(col("vec_id") % 37 === 3).select("vec_id")
    assert(tombs.count() > 0, "fixture produced no tombstones")

    val probe = SimilarityOps.pqTopKFromIndexDeleted(
      spark, base, s"${base}_cells", tombs)
    val got = canon(probe)
    assert(got.nonEmpty, "deleted probe returned no rows")

    SimilarityOps.compactPqIndex(spark, base, Nil, compacted, Some(tombs))
    assert(canon(SimilarityOps.pqTopKFromIndex(
      spark, compacted, s"${compacted}_cells")) == got,
      "plain probe over the tombstone-compacted layout diverged")
    // the codebook must be copied through UNCHANGED — deletion never
    // retrains (a retrain would re-key every surviving stored code)
    assert(spark.read.parquet(s"${compacted}_centroids")
      .exceptAll(spark.read.parquet(s"${base}_centroids")).isEmpty,
      "compaction changed the frozen codebook")

    // deleted vectors appear in NEITHER probe role
    val deleted = tombs.collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !deleted.contains(r.head.asInstanceOf[Long])),
      "a deleted vec_id survived as a query")
    assert(got.forall(r => !deleted.contains(r(2).asInstanceOf[Long])),
      "a deleted vec_id survived as a neighbor")
    assert(spark.read.parquet(compacted)
      .join(tombs, Seq("vec_id"), "left_semi").isEmpty,
      "compaction left tombstoned codes in the layout")
  }
}
