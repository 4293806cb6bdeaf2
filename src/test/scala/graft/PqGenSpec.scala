package graft

import org.apache.spark.sql.functions._

import graft.functions.SimilarityOps

/** The PQ generation lifecycle ([[SimilarityOps.writePqBase]] /
  * [[SimilarityOps.writePqGeneration]] / [[SimilarityOps
  * .pqTopKFromGenerations]] / [[SimilarityOps.compactPqIndex]]) — the
  * vector twin of the MinHash/BM25 index generations: the codebook is
  * trained once at base-build time and FROZEN, later ingests append
  * delta generations encoded under it (cost linear in the delta — the
  * corpus is never re-encoded), probes fan in base ∪ deltas, and
  * compaction folds them back into one layout without re-encoding.
  *
  * The load-bearing property: because the encode kernel is deterministic
  * given the codebook, base(C₀) ∪ delta(D₁) must be BIT-IDENTICAL to a
  * from-scratch layout of C₀ ∪ D₁ under the same frozen codebook — so
  * incremental ingest can never drift from a rebuild.
  */
class PqGenSpec extends SparkSpec {

  private val base = "/tmp/graft-pqgen-base"
  private val gen1 = "/tmp/graft-pqgen-g1"
  private val full = "/tmp/graft-pqgen-full"
  private val compacted = "/tmp/graft-pqgen-compact"
  private val isBase = col("vec_id") % 10 =!= 7
  private val isDelta = col("vec_id") % 10 === 7

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(r =>
      (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

  test("fan-in probe over base ∪ frozen-codebook delta equals a from-scratch rebuild, bit-exact") {
    SimilarityOps.writePqBase(spark, sfTiny, isBase, base)
    SimilarityOps.writePqGeneration(spark, sfTiny, isDelta, base, gen1)
    // the rebuild yardstick: ALL vectors encoded under the SAME frozen
    // codebook (a delta generation with filter=true borrows base's book)
    SimilarityOps.writePqGeneration(spark, sfTiny, lit(true), base, full)
    // promote the rebuild to a standalone base layout: a generation shares
    // its base's codebook, so adopting one as a base copies the sidecar —
    // the same move compactPqIndex makes
    spark.read.parquet(s"${base}_centroids")
      .write.mode("overwrite").parquet(s"${full}_centroids")

    val fanIn = canon(SimilarityOps.pqTopKFromGenerations(spark, base, Seq(gen1)))
    val rebuild = canon(SimilarityOps.pqTopKFromGenerations(spark, full, Nil))
    assert(fanIn == rebuild,
      "incremental base ∪ delta probe drifted from the frozen-codebook rebuild")
    assert(fanIn.nonEmpty, "probe returned no rows — fixture too small or filters wrong")
  }

  test("generations are append-only: every vec_id lives in exactly one generation") {
    val ids = spark.read.parquet(base).select("vec_id")
      .union(spark.read.parquet(gen1).select("vec_id"))
    assert(ids.groupBy("vec_id").count().filter(col("count") > 1).isEmpty,
      "a vec_id appears in more than one generation")
    val expected = spark.read.parquet(s"$sfTiny/embeddings.parquet").count()
    assert(ids.count() == expected, "base ∪ delta does not cover the corpus")
  }

  test("compaction folds generations into one layout row-identically, without re-encoding, and is guarded against self-overwrite") {
    SimilarityOps.compactPqIndex(spark, base, Seq(gen1), compacted)
    val fanIn = canon(SimilarityOps.pqTopKFromGenerations(spark, base, Seq(gen1)))
    assert(canon(SimilarityOps.pqTopKFromGenerations(spark, compacted, Nil)) == fanIn,
      "compacted layout probe diverged from the generation fan-in")
    // no re-encode: compacted codes are the union of the input code rows
    val inCodes = spark.read.parquet(base).unionByName(spark.read.parquet(gen1))
    assert(spark.read.parquet(compacted).exceptAll(inCodes).isEmpty &&
      inCodes.exceptAll(spark.read.parquet(compacted)).isEmpty,
      "compaction changed code rows — it must be a pure file reshuffle")
    // reading an input while overwriting it is the SnapshotCrashSpec
    // data-loss shape; the writer must refuse, not corrupt
    intercept[IllegalArgumentException] {
      SimilarityOps.compactPqIndex(spark, base, Seq(gen1), gen1)
    }
  }

  test("fan-in probe scans are cell-pruned per generation BRANCH (pruning survives the union)") {
    // the scaladoc's claim: each generation keeps its own cell-partitioned
    // directory layout, so a probe reads only probed-cell directories PER
    // GENERATION — the union must not widen any branch's scan back to all
    // cells
    val probe = SimilarityOps.pqTopKFromGenerations(spark, base, Seq(gen1),
      nQueries = 1)
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    val pruned = "dynamicpruning".r
      .findAllMatchIn(plan.toLowerCase).size
    assert(pruned >= 4,
      s"fan-in branches are not partition-pruned to the probed cells " +
        s"(found $pruned dynamicpruning filters):\n$plan")
  }

  test("delta encode is delta-bounded: the expensive stages see only filtered rows") {
    // the filter must sit between the scan and the encode cross-join so a
    // shard-sized ingest never pays a corpus-sized encode; assert the
    // generation's row counts match the delta exactly
    val deltaN = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .filter(isDelta).count()
    assert(spark.read.parquet(gen1).count() == deltaN)
    assert(spark.read.parquet(s"${gen1}_cells").count() == deltaN)
  }
}
