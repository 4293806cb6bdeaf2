package graft

import graft.functions.SimilarityOps

/** The stored-layout PQ probe ([[SimilarityOps.pqTopKFromIndex]]) must be
  * a bit-exact twin of the oracle-gated inline form ([[SimilarityOps
  * .pqTopK]]) — same ADC shortlist, same exact re-rank — while reading
  * NOTHING from the corpus: codes + cells from the PQ index, vectors from
  * the cell index, codebook from the `_centroids` sidecar. The second
  * assertion pins that property the strong way PlanSpec pins the MinHash
  * probe: no scan of `embeddings.parquet` anywhere in the physical plan.
  */
class PqIndexSpec extends SparkSpec {

  test("pqTopKFromIndex over stored layouts is bit-exact vs inline pqTopK; corpus absent from plan") {
    val pqPath = "/tmp/graft-pqidx-spec"
    val cellPath = "/tmp/graft-cellidx-spec"
    SimilarityOps.writePqIndex(spark, sfTiny, pqPath)
    SimilarityOps.writeCellIndex(spark, sfTiny, cellPath)

    def canon(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[Any]] =
      rows.map(_.toSeq).toSeq.sortBy(r =>
        (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

    val probe = SimilarityOps.pqTopKFromIndex(spark, pqPath, cellPath)
    val live = canon(SimilarityOps.pqTopK(spark, sfTiny).collect())
    val idx = canon(probe.collect())
    assert(idx == live, "stored-index PQ probe diverged from the gated inline form")

    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      s"stored-index PQ probe still scans the corpus:\n$plan")
  }

  test("stored-probe scans are pruned to the probed cells (dynamic partition pruning)") {
    val pqPath = "/tmp/graft-pqidx-spec"
    val cellPath = "/tmp/graft-cellidx-spec"
    // one query vector lives in one cell: the code scan and the vector
    // fetch pool must carry a dynamic partition-pruning subquery on the
    // cell directory column, not read all cells and filter later
    val probe = SimilarityOps.pqTopKFromIndex(spark, pqPath, cellPath, nQueries = 1)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the cell column:\n$plan")
  }

  test("memoizedPqIndex: content-only regeneration of embeddings rebuilds; probe tracks live") {
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft-pq-memo"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    graft.functions.DedupOps.invalidateDerived(dir)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(r =>
        (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    def probe(): Seq[Seq[Any]] = {
      val (pq, cell) = SimilarityOps.memoizedPqIndex(spark, dir)
      canon(SimilarityOps.pqTopKFromIndex(spark, pq, cell))
    }

    val before = probe()
    assert(before == canon(SimilarityOps.pqTopK(spark, dir)))
    // regenerate IN PLACE preserving row count and max vec_id — only the
    // vector CONTENT changes; reverse only the EVEN ids (a uniform
    // reverse is an isometry — cosine-invariant — and detected nothing),
    // so the relative geometry really moves. The file-signature term of
    // the fingerprint must force a rebuild with no manual invalidation,
    // and the probe must track the regenerated data
    spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .withColumn("embedding",
        when(col("vec_id") % 2 === 0, reverse(col("embedding")))
          .otherwise(col("embedding")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val after = probe()
    assert(after == canon(SimilarityOps.pqTopK(spark, dir)),
      "post-regeneration stored probe diverged from the live form — stale index served")
    assert(after != before, "regeneration changed no scores — mutation too weak to detect staleness")
  }
}
