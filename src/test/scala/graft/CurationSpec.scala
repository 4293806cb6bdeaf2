package graft

import org.apache.spark.sql.functions._
import graft.functions.CurationOps

/** Curation operators: values are oracle-gated (decontaminate /
  * embed_quantize / dedup_select rows in CORRECTNESS); these specs pin the
  * properties and the plan shapes that matter at scale.
  */
class CurationSpec extends SparkSpec {

  test("embed_quantize is a zero-shuffle scan with bounded codes") {
    val q = CurationOps.embedQuantize(spark, sfTiny)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quantization must not shuffle — it is a write-side stream transform:\n$plan")
    val bad = q.filter(col("q") > 127 || col("q") < -127).count()
    assert(bad == 0, "int8 code out of range")
    // quantized norm ≈ 127 for every vector (the scale was per-vector L2)
    val norms = q.groupBy("vec_id")
      .agg(sqrt(sum(col("q") * col("q"))).as("qn"))
      .filter(col("qn") < 120 || col("qn") > 134).count()
    assert(norms == 0, "quantized vector norm far from 127")
  }

  test("leakage_split: near-dup clusters never straddle splits, full coverage, sane fractions") {
    val rows = graft.functions.CurationOps.leakageSplit(spark, sfTiny).collect()
    val n = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(rows.length == n, s"one split per doc expected: ${rows.length} vs $n")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "duplicate doc_id rows")
    // THE property: every cluster maps to exactly one split — a near-dup
    // pair in different splits is the eval-leakage bug this op exists to
    // prevent
    val byCluster = rows.groupBy(_.getLong(1)).map { case (c, rs) =>
      c -> rs.map(_.getString(2)).distinct
    }
    byCluster.foreach { case (c, splits) =>
      assert(splits.length == 1, s"cluster $c straddles splits: ${splits.toList}")
    }
    // the fixture must actually exercise the guarantee (multi-doc clusters
    // exist) and produce all three splits at plausible hash-mod fractions
    assert(byCluster.exists(_ => true) &&
      rows.groupBy(_.getLong(1)).exists(_._2.length > 1),
      "fixture has no multi-doc near-dup cluster — property untested")
    val frac = rows.groupBy(_.getString(2)).view.mapValues(_.length.toDouble / n).toMap
    assert(frac.keySet == Set("train", "val", "test"), s"missing split: $frac")
    assert(frac("train") > 0.6 && frac("val") < 0.25 && frac("test") < 0.25,
      s"implausible split fractions for 800/100/100 permille: $frac")
    // and the cluster ids agree with the canonical cluster view for every
    // doc that HAS near-dups (singletons fall back to their own id)
    val canon = graft.functions.DedupOps.dedupClusters(spark, sfTiny)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val want = canon.getOrElse(r.getLong(0), r.getLong(0))
      assert(r.getLong(1) == want,
        s"doc ${r.getLong(0)} split on cluster ${r.getLong(1)}, canonical $want")
    }
  }

  test("decontaminate covers exactly the test split, ratios consistent") {
    val d = CurationOps.decontaminate(spark, sfTiny)
    assert(d.filter(col("doc_id") % 10 < 8).count() == 0,
      "train docs leaked into the report")
    assert(d.filter(col("n_contaminated") > col("n_shingles")).count() == 0)
    assert(d.filter(col("contaminated") =!= (col("n_contaminated") > 0)).count() == 0)
    assert(d.count() > 0)
  }

  test("corpus_clean: composition consistent with its three stages") {
    import org.apache.spark.sql.functions.col
    val out = CurationOps.corpusClean(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val passed = graft.functions.TextAnalysis.gopherFilter(spark, sfTiny)
      .filter(col("passed")).select("doc_id").collect().map(_.getLong(0)).toSet
    val nchars = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the election runs AMONG QUALITY SURVIVORS: per cluster, the longest
    // passing doc is canonical; a cluster whose corpus-wide canonical
    // fails quality must still keep its best passing member
    val dropped = graft.functions.DedupOps.dedupClusters(spark, sfTiny)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(c => passed(c._1))
      .groupBy(_._2).values
      .flatMap(ms => ms.map(_._1).sortBy(id => (-nchars(id), id)).drop(1))
      .toSet
    val cleaned = graft.functions.DedupOps.dedupSpansApply(spark, sfTiny)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(out.keySet == passed -- dropped,
      s"membership diverged: extra=${(out.keySet -- (passed -- dropped)).take(3)} missing=${((passed -- dropped) -- out.keySet).take(3)}")
    // the emitted text is the span-cleaned text, verbatim
    out.foreach { case (id, r) =>
      assert(r.getAs[String]("clean_text") == cleaned(id), s"text drift for doc $id")
    }
    // non-vacuous: the election actually removed docs
    assert(out.nonEmpty && dropped.nonEmpty,
      "dedup election removed nothing — composition untested")
    // the shared-gram substr signal feeding the quality gate is
    // value-identical to the gated dup_spans operator
    val (_, grams, dup) = graft.functions.DedupOps.spanStreams(spark, sfTiny)
    val fromShared = grams.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_grams"))
      .join(dup.groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_dup_grams")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_grams"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromGated = graft.functions.DedupOps.dupSpans(spark, sfTiny)
      .select("doc_id", "n_grams", "n_dup_grams")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromShared == fromGated, "shared-gram counts diverged from dup_spans")
  }

  test("decontaminate_bloom is bit-identical to the exact form and prunes") {
    val exact = CurationOps.decontaminate(spark, sfTiny).collect()
      .map(_.toSeq).toSet
    val bloom = CurationOps.decontaminateBloom(spark, sfTiny).collect()
      .map(_.toSeq).toSet
    assert(exact.nonEmpty && bloom == exact,
      s"bloom variant diverged: ${(bloom -- exact).take(3)} vs ${(exact -- bloom).take(3)}")
  }

  test("domain_mix: undersampled strata kept whole, oversampled strata cut toward target") {
    val rows = CurationOps.domainMix(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val tot = rows.map(_.getAs[Long]("n_docs")).sum
    val k = rows.length
    rows.foreach { r =>
      val (n, keep, kept) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("keep_permille"), r.getAs[Long]("n_kept"))
      assert(kept <= n)
      if (n * k <= tot) { // at or below the uniform target share
        assert(keep == 1000L, s"undersampled stratum cut: $r")
        assert(kept == n, s"keep_permille=1000 must keep everything: $r")
      } else {
        assert(keep < 1000L, s"oversampled stratum not cut: $r")
        // integer-division plan: realized keep tracks the planned rate
        // loosely (hash-mod is uniform, strata here are small)
        assert(kept <= n, s"kept more than present: $r")
      }
    }
  }

  test("mix_apply realizes exactly the counts domain_mix audits") {
    val kept = CurationOps.mixApply(spark, sfTiny).cache()
    // every keep decision is auditable row-by-row: bucket < keep_permille
    assert(kept.filter(col("bucket") >= col("keep_permille")).count() == 0,
      "kept a doc whose hash bucket is outside the keep rate")
    // apply and audit agree stratum-by-stratum (shared plan, shared rule)
    val applied = kept.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    CurationOps.domainMix(spark, sfTiny).collect().foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      assert(applied.getOrElse(key, 0L) == r.getAs[Long]("n_kept"),
        s"apply/audit drift for $key")
    }
    kept.unpersist()
  }

  test("mix_upsample: fractional-epoch repeats realize the uncapped rate") {
    val up = CurationOps.mixUpsample(spark, sfTiny).cache()
    // copy_ids are dense 1..n_copies per doc
    val bad = up.groupBy("doc_id", "n_copies")
      .agg(count(lit(1)).as("n"), min("copy_id").as("lo"), max("copy_id").as("hi"))
      .filter(col("n") =!= col("n_copies") || col("lo") =!= 1 ||
        col("hi") =!= col("n_copies")).count()
    assert(bad == 0, "copy_id not dense 1..n_copies")
    // oversampled strata (rep<=1000) stay single-copy; undersampled strata
    // realize the fractional rate: total copies within 1 per-mille step of
    // n_docs * rep / 1000 (hash-mod uniformity gives exactness only in
    // expectation, but base copies are exact: >= n_docs * (rep div 1000))
    val strata = up.groupBy("lang", "source", "rep_permille")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_copies_tot"))
      .collect()
    assert(strata.nonEmpty)
    strata.foreach { r =>
      val (rep, n, tot) = (r.getAs[Long]("rep_permille"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_copies_tot"))
      if (rep <= 1000) assert(tot == n, s"oversampled stratum repeated: $r")
      else {
        assert(tot >= n * (rep / 1000), s"fewer than base repeats: $r")
        assert(tot <= n * (rep / 1000 + 1), s"more than base+1 repeats: $r")
      }
    }
    // at least one stratum actually upsamples on this fixture
    assert(strata.exists(_.getAs[Long]("rep_permille") > 1000),
      "fixture exercises no upsampled stratum")
    up.unpersist()
  }

  test("pack_chunks: greedy bins are dense, ordered, and bounded") {
    val p = CurationOps.packChunks(spark, sfTiny, budget = 512).cache()
    assert(p.filter(col("bin_offset") < 0 || col("bin_offset") >= 512).count() == 0,
      "bin_offset out of [0, budget)")
    // bin ids are monotone non-decreasing along the shard order and start at 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "source").orderBy("doc_id", "chunk_id")
    val bad = p.withColumn("prev", lag(col("bin_id"), 1).over(w))
      .filter(col("prev").isNotNull && col("bin_id") < col("prev")).count()
    assert(bad == 0, "bin_id not monotone within shard")
    val firsts = p.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(firsts.filter(col("bin_id") =!= 0 || col("bin_offset") =!= 0).count() == 0,
      "every shard must start at bin 0 offset 0")
  }

  test("k_anonymize: every released equivalence class holds >= k records") {
    val k = CurationOps.kAnonK
    val a = CurationOps.kAnonymize(spark, sfTiny)
    // the property itself, on the RELEASED tuples (what an adversary joins
    // on) — not the reported class_size column
    val undersized = a.groupBy("qi_geo", "qi_segment", "qi_bal")
      .agg(count(lit(1)).as("n"))
      // the terminal all-suppressed pool is allowed to be < k (nothing to
      // generalize further); every other tuple must reach k
      .filter(col("n") < k && !(col("qi_geo") === "*" && col("qi_segment") === "*"))
      .count()
    assert(undersized == 0, "a released quasi-identifier class is under k")
    // class_size must report the released-tuple group size exactly
    val mismatch = a.groupBy("qi_geo", "qi_segment", "qi_bal", "class_size")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") =!= col("class_size")).count()
    assert(mismatch == 0, "class_size disagrees with the released group size")
    // non-vacuous: generalization actually exercised beyond L0
    val levels = a.select("anon_level").distinct().count()
    assert(levels >= 2, "hierarchy never engaged — test data degenerate")
    // nothing re-identifiable leaked: no L0 bucket release from an
    // undersized class is possible by construction; spot-check coverage
    assert(a.count() == graft.sources.Tables.customer(spark, sfTiny).count())
  }

  test("dedup_select keeps exactly one canonical per cluster, longest wins") {
    val s = CurationOps.dedupSelect(spark, sfTiny).cache()
    val perCluster = s.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        max(col("n_chars")).as("max_chars"))
    assert(perCluster.filter(col("n_keep") =!= 1).count() == 0,
      "every cluster must elect exactly one canonical")
    // the canonical's n_chars is the cluster max
    val canon = s.filter(col("keep"))
      .join(perCluster, Seq("cluster_id"))
      .filter(col("n_chars") =!= col("max_chars"))
    assert(canon.count() == 0, "canonical is not the longest document")
  }

  test("data_profile: one pass, staged distinct (no Expand), key column is unique") {
    val q = CurationOps.dataProfile(spark, sfTiny)
    val plan = q.queryExecution.executedPlan.toString
    // the distinct count must be the explicit two-stage agg, not the
    // Expand-based distinct rewrite (which doubles the unpivoted stream)
    assert(!plan.contains("Expand"), s"distinct stage planned via Expand:\n$plan")
    // profiling C columns is ONE scan of documents, not C jobs
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"expected a single documents scan:\n$plan")
    val rows = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val n = graft.sources.Tables.documents(spark, sfTiny).count()
    assert(rows.keySet == Set("doc_id", "lang", "source", "n_chars", "text_md5"))
    rows.foreach { case (c, (nRows, nNull, _)) =>
      assert(nRows == n, s"$c: n_rows $nRows != $n")
      assert(nNull == 0L, s"$c: unexpected nulls")
    }
    assert(rows("doc_id")._3 == n, "doc_id must be unique (primary key)")
    assert(rows("lang")._3 <= 64 && rows("source")._3 <= 64,
      "dimension columns should be low-cardinality")
  }

  test("source_quality_report agrees with the per-document quality_filter gate") {
    import graft.functions.TextAnalysis
    val rep = CurationOps.sourceQualityReport(spark, sfTiny)
    // recompute the rollup from the GATED per-doc frame + the source dim —
    // the report must be exactly the gate's groupBy, nothing else
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("source"))
    val expected = TextAnalysis.qualityFilter(spark, sfTiny)
      .join(docs, Seq("doc_id"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("passed"), 1L).otherwise(0L)).as("n_passed"))
    val joined = rep.as("r").join(expected.as("e"), Seq("source", "lang"), "full")
      .filter(col("r.n_docs").isNull || col("e.n_docs").isNull ||
        col("r.n_docs") =!= col("e.n_docs") ||
        col("r.n_passed") =!= col("e.n_passed"))
    assert(joined.count() == 0, "report disagrees with the quality gate")
    // permille arithmetic + reject decomposition: passed + rejects = docs
    val bad = rep.filter(
      col("pass_permille") =!= expr("n_passed * 1000 div n_docs") ||
      col("n_passed") + col("n_reject_length") + col("n_reject_repetitive") +
        col("n_reject_low_quality") =!= col("n_docs")).count()
    assert(bad == 0, "reject decomposition or permille broken")
  }
}
