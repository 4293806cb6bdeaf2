package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.{BookQueries, Olap, OrderEvents, OrderState}

/** 100 TB plan-shape assertions (the "would this survive a 1000× scale-up"
  * gate): filters must reach the parquet scan, small dims must broadcast,
  * and shuffle counts must match the design — one per co-partitionable
  * stage, never per operator.
  */
class PlanSpec extends SparkSpec {

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffles(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    var n = 0
    plan.foreach {
      case _: ShuffleExchangeExec => n += 1
      case a: AdaptiveSparkPlanExec =>
        a.executedPlan.foreach { case _: ShuffleExchangeExec => n += 1; case _ => }
      case _ =>
    }
    n
  }

  test("q6: all predicates push down to the parquet scan") {
    val plan = physicalPlan(Olap.q6Revenue(spark, sfTiny))
    assert(plan.contains("PushedFilters:"), "no pushed filters in scan")
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThanOrEqual"),
      s"shipdate range not pushed:\n$plan")
    // column pruning: only the 4 referenced columns are read
    assert(!plan.contains("l_orderkey"), "scan reads unneeded columns")
  }

  test("q5: dimension joins broadcast — no shuffle for region/nation/supplier/customer") {
    val plan = physicalPlan(Olap.q5LocalSupplier(spark, sfTiny))
    assert(plan.contains("BroadcastHashJoin"), "dimension joins are not broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "a dimension join degraded to sort-merge — would shuffle TBs at scale")
  }

  test("order fold: exactly one shuffle serves both the window and the aggregation") {
    val oc = OrderState.ordersCurrent(OrderEvents(spark, sfTiny))
    // the (pool,trader) hash partitioning must be reused across the window,
    // the groupBy, and the dedup-window — Catalyst plans one Exchange.
    // 0 is also legal: the cache manager may substitute the materialized
    // serving view (BookQueries.views) for the equivalent plan fragment.
    val n = shuffles(oc)
    val cached = physicalPlan(oc).contains("InMemoryTableScan")
    assert(n == 1 || (cached && n == 0),
      s"expected 1 shuffle (or cached), got $n:\n${physicalPlan(oc)}")
  }

  test("orderbook query: whole-stage codegen covers the aggregation pipeline") {
    val df = BookQueries.orderbook(spark, sfTiny)
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = physicalPlan(df)
    // codegen stages render as "*(n)" prefixes in the executed plan
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no codegen spans:\n$plan")
    // Spark plants a partial top-k (WindowGroupLimit) below the shuffle —
    // the reference's hand-rolled "truncate before hydrate" for free
    assert(plan.contains("WindowGroupLimit"), "partial top-k pushdown missing")
  }

  test("sessionize: both window passes and the aggregation share one shuffle") {
    val df = Olap.qSessionize(spark, sfTiny)
    assert(shuffles(df) == 1,
      s"expected 1 shuffle (user_id partitioning reused), got ${shuffles(df)}")
  }

  test("price levels: partial aggregation present (map-side combine before shuffle)") {
    val (ev) = OrderEvents(spark, sfTiny)
    val plan = physicalPlan(BookQueries.priceLevelsQ(spark, sfTiny))
    assert(plan.contains("HashAggregate"), "no hash aggregation")
  }

  test("range band join: broadcast NLJ — facts never shuffle for the theta join") {
    val plan = physicalPlan(Olap.qRangeBandJoin(spark, sfTiny))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"theta join did not broadcast the band dim:\n$plan")
  }

  test("simhash_pairs: pigeonhole banding — no cartesian/nested-loop over doc pairs") {
    val plan = physicalPlan(graft.functions.DedupOps.simhashPairs(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"simhash pair generation is an all-pairs cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"simhash pair generation is an all-pairs nested loop:\n$plan")
  }

  test("ngram_jaccard_lsh: exact verify on LSH candidates — no all-pairs join") {
    val plan = physicalPlan(graft.functions.DedupOps.ngramJaccardLsh(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"LSH-composed jaccard verify is an all-pairs cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"LSH-composed jaccard verify is an all-pairs nested loop:\n$plan")
  }

  test("shard_dedup: asymmetric banding probe is an equi-join — no all-pairs scan of the corpus") {
    val plan = physicalPlan(graft.functions.DedupOps.shardDedup(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"shard admission probes the corpus via a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"shard admission probes the corpus via a nested loop:\n$plan")
  }

  test("shard_dedup: verify join is candidates-bounded — shingle index pruned by a broadcast semi-join") {
    val df = graft.functions.DedupOps.shardDedup(spark, sfTiny)
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = physicalPlan(df)
    // the exact-verify side must read the shingle index THROUGH a broadcast
    // LeftSemi prune on candidate doc ids — without it the verify join
    // shuffles every corpus shingle hash, linear in corpus size instead of
    // bounded by candidates (the round-6 regression this pin prevents).
    // 'LeftSemi' alone is not enough: a Shuffled/SortMerge LeftSemi would
    // still shuffle every corpus shingle — the prune must be a BROADCAST
    // hash join (at sf0.001 the candidate-id set is far below the guard in
    // DedupOps.shardDedup, so the hint always applies here).
    val bhjSemi = plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(bhjSemi,
      s"shingle prune is not a broadcast LeftSemi (corpus shingles would " +
        s"shuffle at scale):\n$plan")
    assert(!plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("LeftSemi")),
      s"shingle prune regressed to a shuffled semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"shard verify became an all-pairs join:\n$plan")
  }

  test("semdedup: pairwise stage is a cell equi-join — the only nested loop is the centroid broadcast") {
    val df = graft.functions.SimilarityOps.semDedup(spark, sfTiny)
    df.collect() // AQE finalizes the physical plan only on execution
    // count by TREE traversal, not plan-string lines: the memoized cell
    // assignment renders its cached subplan (which legitimately holds the
    // bounded ~|cells| centroid nested loop) once per InMemoryTableScan
    // reference, so string counts overstate executed nodes
    def count(pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      var n = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s if pred(s) => n += 1
        case _ =>
      }
      walk(df.queryExecution.executedPlan)
      n
    }
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    assert(count(_.isInstanceOf[CartesianProductExec]) == 0,
      s"semdedup pairwise stage is a cartesian:\n${physicalPlan(df)}")
    // the nearest-centroid assignment broadcasts ~|cells| centroid rows (a
    // deliberate bounded nested loop, usually hidden inside the cached
    // assignment); the within-cell pairwise must stay an equi-join on the
    // cell id — a second executed nested loop means the n² corpus join
    // materialized
    assert(count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 1,
      s"pairwise stage regressed to all-pairs:\n${physicalPlan(df)}")
  }

  test("semdedup_scaled: pairwise stage is a (cell, tile) equi-join — no cartesian, quantizer broadcast only") {
    val df = graft.functions.SimilarityOps.semDedupScaled(spark, sfTiny)
    df.collect()
    def count(pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      var n = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s if pred(s) => n += 1
        case _ =>
      }
      walk(df.queryExecution.executedPlan)
      n
    }
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    assert(count(_.isInstanceOf[CartesianProductExec]) == 0,
      s"scaled pairwise stage is a cartesian:\n${physicalPlan(df)}")
    // the label-centroid assignment keeps its one deliberate bounded
    // nested loop (inside the memoized ranked assignment); the
    // sub-centroid reassignment is an EQUI-join on the label and the
    // pairwise stage an equi-join on (cell, tile) — any further nested
    // loop means a corpus-sized join materialized
    assert(count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 1,
      s"scaled pairwise/reassignment regressed to all-pairs:\n${physicalPlan(df)}")
  }

  test("tree probe: both descent levels are broadcast equi-joins, pairwise on (cell, tile) — no cartesian") {
    val df = graft.functions.SimilarityOps.treePairs(spark, sfTiny)
    df.collect()
    def count(pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
      var n = 0
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s if pred(s) => n += 1
        case _ =>
      }
      walk(df.queryExecution.executedPlan)
      n
    }
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    assert(count(_.isInstanceOf[CartesianProductExec]) == 0,
      s"tree probe stage is a cartesian:\n${physicalPlan(df)}")
    // the one deliberate bounded nested loop stays the label-centroid
    // assignment (inside the memoized ranked assignment); branch descent
    // joins on the label, tile descent on (label, branch), pairwise on
    // (cell, tile) — all equi-joins against broadcast quantizer lists
    assert(count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 1,
      s"tree descent/pairwise regressed to all-pairs:\n${physicalPlan(df)}")
  }

  test("keep-tombs fold read path: chain resolve is ONE doc_id aggregation — no per-version shuffle") {
    // verdict r15 item 4: with chain bounding default-on, resolveAssign
    // over a ≤32-version chain is the steady-state SERVING plan of the
    // maintained views — pin its shape like the book/dedup plans. Four
    // delta versions → the fold must still be: union of version scans,
    // partial aggregation, ONE exchange on doc_id, final aggregation.
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val p = "planmx"
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(p)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    graft.streaming.MixedIngest.invalidateCursor(spark, p)
    def feed(adds: Seq[(Long, Long)]) =
      adds.toDF("id1", "id2").withColumn("op", lit("add"))
        .select("op", "id1", "id2")
    Seq(Seq((1L, 2L)), Seq((2L, 3L)), Seq((10L, 11L)), Seq((3L, 4L)))
      .zipWithIndex.foreach { case (adds, i) =>
        graft.streaming.MixedIngest.mergeBatch(feed(adds), p, i.toLong)
      }
    val vers = graft.streaming.MixedIngest.committedFull(spark, p)
    val ch = graft.streaming.VersionChain.chain(vers, vers.last)
    assert(ch.size >= 3, s"chain too short to gate the fold: $ch")
    val df = graft.streaming.MixedIngest.current(spark, p).get
    assert(shuffles(df) == 1,
      s"chain fold should cost ONE doc_id exchange, got ${shuffles(df)}:\n${physicalPlan(df)}")
    // map-side combine below the exchange: the per-version union partial-
    // aggregates before any rows move (max_by demotes to SortAggregate —
    // struct-typed buffer — fine for a state+delta-sized read-side fold)
    assert(physicalPlan(df).contains("partial_max_by"),
      s"fold lost its partial aggregation below the shuffle:\n${physicalPlan(df)}")
    assert(!physicalPlan(df).contains("CartesianProduct"),
      s"cartesian in the chain fold:\n${physicalPlan(df)}")
  }

  test("cell index: stored assignment partition-prunes — a 1-cell probe reads 1 directory") {
    val path = java.nio.file.Files.createTempDirectory("cellidx").toString
    try {
      graft.functions.SimilarityOps.writeCellIndex(spark, sfTiny, path)
      // layout: one directory per cell — the probe cost model of the 100 TB
      // claim (nprobe cells → nprobe directories)
      val cells = new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cells.length >= 2, s"expected >=2 cell partitions, got ${cells.length}")
      val probe = graft.functions.SimilarityOps.readCell(spark, path, 3)
      val plan = physicalPlan(probe)
      assert(plan.contains("PartitionFilters: [isnotnull(cell"),
        s"cell predicate did not reach the partition pruner:\n$plan")
      // and it is PRUNING, not a post-scan filter: the data filter set has
      // no cell predicate (cell is a partition column, not a data column)
      assert(!plan.contains("PushedFilters: [IsNotNull(cell"),
        s"cell filtered post-scan instead of pruned:\n$plan")
      // probing one cell returns exactly that cell's members
      val got = probe.select("vec_id").collect().map(_.getLong(0)).toSet
      val want = graft.functions.SimilarityOps.semDedup(spark, sfTiny)
        .filter(col("cell") === 3).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"stored cell 3 ${got.size} ids != live assignment ${want.size}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("pq index: stored code table partition-prunes by cell and codes match the live encode") {
    val path = java.nio.file.Files.createTempDirectory("pqidx").toString
    try {
      graft.functions.SimilarityOps.writePqIndex(spark, sfTiny, path)
      // one directory per cell — the IVF-PQ probe cost model (nprobe
      // directories of 16 B/vector code rows, vectors untouched)
      val cells = new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cells.length >= 2, s"expected >=2 cell partitions, got ${cells.length}")
      val probe = graft.functions.SimilarityOps.readCell(spark, path, 3)
      val plan = physicalPlan(probe)
      assert(plan.contains("PartitionFilters: [isnotnull(cell"),
        s"cell predicate did not reach the partition pruner:\n$plan")
      // stored codes for the probed cell equal the live encode, in order
      val got = probe.collect()
        .map(r => r.getLong(r.fieldIndex("vec_id")) ->
          r.getSeq[Int](r.fieldIndex("codes")).toSeq).toMap
      val live = graft.functions.SimilarityOps.pqCodes(spark, sfTiny).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      assert(got.nonEmpty)
      got.foreach { case (v, cs) =>
        assert(cs == live(v), s"vec $v: stored codes $cs != live ${live(v)}")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("embedding_dedup: LSH candidate front-end — no all-pairs join") {
    val plan = physicalPlan(graft.functions.SimilarityOps.embeddingDedup(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"embedding dedup is an all-pairs cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"embedding dedup is an all-pairs nested loop:\n$plan")
  }

  test("tfidf: per-doc top-k gets a partial WindowGroupLimit below the shuffle") {
    val df = graft.functions.TextAnalysis.tfidfTopK(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k not pushed below the window shuffle:\n$plan")
  }

  test("bm25: top-k is a partial TakeOrderedAndProject, postings filtered before the explode") {
    val df = graft.functions.TextAnalysis.bm25TopK(spark, sfTiny)
    val plan = physicalPlan(df)
    // limit+orderBy must plan the partial per-partition top-k, never a
    // global Sort over all matching docs
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 top-k planned a global sort instead of TakeOrderedAndProject:\n$plan")
    // the corpus-sized generator must explode the HOF-FILTERED token array
    // (query-term postings only, aliased by the Project feeding the
    // Generate) — an unfiltered explode shuffles every token occurrence
    // instead of only the query terms' postings
    assert(plan.contains("Generate explode") &&
      plan.contains("filter(regexp_extract_all"),
      s"bm25 explodes the unfiltered token array (full token stream would shuffle):\n$plan")
  }

  test("score_select_scaled: no per-document rank window — the scale point of the two-pass form") {
    val df = graft.functions.TextAnalysis.scoreSelectScaledRows(spark, sfTiny)
    val plan = physicalPlan(df)
    // the exact-rank form ranks every doc inside one per-language window
    // frame; the quantile-cutoff form must plan ONLY aggregates + a
    // broadcast join back — any Window operator means the scale ceiling
    // came back
    assert(!plan.contains("Window"),
      s"two-pass selection still plans a rank window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-language cutoffs are not broadcast back to the row-local filter:\n$plan")
  }

  test("pq_topk: LUT probe is broadcast and the corpus never joins all-pairs") {
    val df = graft.functions.SimilarityOps.pqTopK(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      s"PQ probe materializes a cartesian:\n$plan")
    // the per-query ADC lookup table must reach the code stream as a
    // broadcast — shuffling corpus codes against a shuffled LUT would put
    // an exchange on the corpus-sized side of the hot probe join
    assert(plan.contains("BroadcastHashJoin"),
      s"ADC lookup table is not broadcast to the probe join:\n$plan")
  }

  test("export_shards: one hash exchange — the position window reuses the shard partitioning") {
    val df = graft.functions.CurationOps.exportShards(spark, sfTiny)
    val n = shuffles(df)
    assert(n == 1,
      s"export must shuffle exactly once (shard deal); found $n exchanges:\n${physicalPlan(df)}")
  }

  test("knn_graph: cell equi-join (no all-pairs) with a partial per-vertex top-k") {
    val df = graft.functions.SimilarityOps.knnGraph(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      s"kNN graph materializes all pairs via a cartesian:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-vertex rank<=k not pushed below the window shuffle:\n$plan")
  }

  test("rep_signals: prunes to the 4 used columns, single doc_id shuffle") {
    val df = graft.functions.TextAnalysis.repSignals(spark, sfTiny)
    val plan = physicalPlan(df)
    // only doc_id/lang/source/text leave the scan — n_chars must be pruned
    assert(!plan.contains("n_chars"), s"scan reads unneeded n_chars:\n$plan")
    // the doc_id repartition is the ONLY exchange: both aggregations are
    // partition-local above it (HashPartitioning(doc_id) satisfies their
    // clustering requirements) — the gram stream never crosses the network
    assert(shuffles(df) == 1,
      s"repetition signals should cost exactly the one doc_id text shuffle:\n$plan")
  }

  test("mix_apply: plan broadcasts onto the corpus scan — docs never shuffle") {
    val df = graft.functions.CurationOps.mixApply(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"strata plan not broadcast back onto the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled to meet its own tiny plan:\n$plan")
  }

  test("mix_upsample: plan broadcasts onto the corpus scan — docs never shuffle") {
    val df = graft.functions.CurationOps.mixUpsample(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"strata plan not broadcast back onto the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled to meet its own tiny plan:\n$plan")
  }

  test("bpe_merges: corpus collapses to vocab first; ranking window is post-aggregate") {
    val df = graft.functions.TextAnalysis.bpeMerges(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    // word agg + pair agg (+ the |alphabet|²-row single-partition ranking):
    // nothing corpus-sized reaches the window
    assert(shuffles(df) <= 4,
      s"pair counting shuffles more than vocab-sized frames:\n$plan")
    assert(plan.contains("HashAggregate"), "no map-side combine on the vocab agg")
  }

  test("fuzzy_pairs: q-gram candidate join — no cartesian/nested-loop over names") {
    val plan = physicalPlan(graft.functions.TextAnalysis.fuzzyPairs(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"fuzzy pairing is an all-pairs cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy pairing is an all-pairs nested loop:\n$plan")
  }

  test("dup_spans: hash repartition serves count + doc-frequency window — two exchanges total") {
    val df = graft.functions.DedupOps.dupSpans(spark, sfTiny)
    val plan = physicalPlan(df)
    assert(shuffles(df) <= 2,
      s"dup_spans should cost the h repartition + the per-doc rollup only:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("corpus_clean: the composed pipeline stays join-shaped — no cartesian anywhere") {
    val df = graft.functions.CurationOps.corpusClean(spark, sfTiny)
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"composition introduced a non-equi join:\n$plan")
  }

  test("dedup_spans_apply: one gram-hash exchange, offsets back to docs, text moves once") {
    val df = graft.functions.DedupOps.dedupSpansApply(spark, sfTiny)
    val plan = physicalPlan(df)
    // h repartition + (doc_id, p) rollup + the one text join — the gram
    // doc-frequency aggregate and the dup-hash semi-join must reuse the h
    // partitioning, and nothing may shuffle text a second time
    assert(shuffles(df) <= 4,
      s"dedup_spans_apply grew extra exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("pii_redact: write-side scrub is a zero-shuffle codegen projection") {
    val df = graft.functions.CurationOps.piiRedact(spark, sfTiny)
    val plan = physicalPlan(df)
    // regexp_replace / regexp_extract_all / md5 are native expressions —
    // the scrub must stream at scan speed, nothing may cross the network
    assert(shuffles(df) == 0,
      s"redaction projection grew an exchange:\n$plan")
    assert(!plan.contains("UDF("),
      s"redaction fell off codegen onto a Scala UDF:\n$plan")
  }

  test("bpe_encode: the whole tokenizer is a zero-shuffle codegen projection") {
    val df = graft.functions.TextAnalysis.bpeEncode(spark, sfTiny)
    val plan = physicalPlan(df)
    // 24 chained native string kernels over the scan — no explode, no
    // UDF, nothing crosses the network; tokenization runs at scan speed
    assert(shuffles(df) == 0, s"tokenizer grew an exchange:\n$plan")
    assert(!plan.contains("UDF("), s"tokenizer fell off codegen:\n$plan")
    assert(!plan.contains("Generate"), s"tokenizer exploded rows:\n$plan")
  }

  test("contamination_report: df-capped pair space, partial top-1 below the window") {
    val df = graft.functions.CurationOps.contaminationReport(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"contamination attribution became an all-pairs join:\n$plan")
    // the row_number()===1 filter must plant a WindowGroupLimit so the
    // top-offender election truncates before the doc_id exchange
    assert(plan.contains("WindowGroupLimit"),
      s"top-1 train doc not truncated below the window shuffle:\n$plan")
  }

  test("k_anonymize: class-size roll-ups broadcast back — the fact side never shuffles for a join") {
    val df = graft.functions.CurationOps.kAnonymize(spark, sfTiny)
    df.collect() // AQE finalizes on execution
    val plan = physicalPlan(df)
    // the L0 count aggregates once; every residual level runs over count
    // rows and joins back as a broadcast — a SortMergeJoin would mean the
    // corpus shuffled to meet its own ~1.4k-row statistics
    assert(plan.contains("BroadcastHashJoin"),
      s"class-size tables not broadcast onto the scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fact table shuffled to meet its own QI statistics:\n$plan")
  }

  test("decontaminate_bloom: native codegen probe filters the probe side below the join") {
    val df = graft.functions.CurationOps.decontaminateBloom(spark, sfTiny)
    val plan = physicalPlan(df)
    // the probe must be Spark's native BloomFilterMightContain expression
    // (codegen'd), not a Scala UDF, and must sit UNDER the exact-verify
    // join, not above it — that ordering is the entire semi-join reduction
    assert(!plan.contains("UDF("),
      s"bloom probe regressed to a Scala UDF:\n$plan")
    val joinAt = plan.indexOf("SortMergeJoin")
    val probeAt = plan.lastIndexOf("might_contain")
    assert(probeAt >= 0, s"native bloom membership probe missing from the plan:\n$plan")
    assert(joinAt < 0 || probeAt > joinAt,
      s"bloom probe not below the exact-verify join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("hybrid_topk: lexical leg is a postings equi-join — the only nested loop is the dense yardstick") {
    val plan = physicalPlan(graft.functions.SimilarityOps.hybridTopK(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"hybrid fusion contains a cartesian:\n$plan")
    // exactly one non-Cross BNLJ: cosineTopK's intentional brute-force
    // query×corpus scorer (the ANN index replaces it at scale); a second
    // one would mean the lexical leg regressed to all-pairs. Cross BNLJs
    // against one-row corpus scalars (the broadcast N frame) are fine.
    val bnlj = plan.linesIterator
      .count(l => l.contains("BroadcastNestedLoopJoin") && !l.contains(", Cross"))
    assert(bnlj == 1,
      s"expected exactly the dense yardstick's nested loop, found $bnlj:\n$plan")
    // the per-query top-k must be a partial window limit, not a full sort
    assert(plan.contains("WindowGroupLimit"),
      s"fused per-query top-k lacks a partial WindowGroupLimit:\n$plan")
  }

  test("funnel: one user-keyed exchange + the final single-row agg — step logic is row-local") {
    val plan = physicalPlan(graft.operators.Olap.qFunnel(spark, sfTiny))
    // the event_type prune must reach the parquet scan
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"funnel step filter not pushed to the scan:\n$plan")
    // exactly 2 exchanges: groupBy(user) + the one-row global count; a
    // third would mean a step resolved via join/window instead of the
    // row-local HOF chain
    val ex = "Exchange".r.findAllIn(plan).size
    assert(ex <= 2, s"expected <= 2 exchanges, found $ex:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"funnel must not join:\n$plan")
  }

  test("retention_cohorts: every exchange carries only id/week longs, no cartesian") {
    val plan = physicalPlan(graft.operators.Olap.qRetentionCohorts(spark, sfTiny))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"retention rollup contains a nested loop:\n$plan")
    // the events scan must prune to (ts, user_id) — dragging value/props
    // through the (user, week) dedup would multiply the exchange payload
    assert(plan.contains("ReadSchema") && !plan.contains("props"),
      s"retention scan reads unneeded columns:\n$plan")
  }

  test("knn_classify: everything after retrieval is neighbor-bounded — no cartesian beyond the yardstick") {
    val plan = physicalPlan(graft.functions.SimilarityOps.knnClassify(spark, sfTiny))
    assert(!plan.contains("CartesianProduct"),
      s"knn vote contains a cartesian:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj == 1,
      s"expected exactly the dense yardstick's nested loop, found $bnlj:\n$plan")
  }
}
