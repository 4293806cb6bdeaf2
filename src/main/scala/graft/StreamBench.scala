package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.WireFixture
import graft.streaming.{IngestDedup, SemIngest, StreamOps, WireStream}

/** Streaming at-scale rehearsal (round-9 verdict item 5): replay the three
  * stateful ingest pipelines over a full data dir on the ROCKSDB state
  * store — the 100 TB deployment shape — and record throughput, state
  * size, and batch-boundary convergence against each pipeline's batch
  * twin. One JSON line on stdout:
  *
  * {{{ {"metric":"stream_bench","streams":{"wire_fold":{"rows":N,
  *      "seconds":S,"rows_per_sec":R,"batches":B,"state_rows":K,
  *      "converged":true},...},"sf":dir} }}}
  *
  * Sources are FILE streams (chunked parquet + maxFilesPerTrigger), so the
  * replay exercises real multi-batch state maintenance, not one giant
  * batch. Convergence is asserted the strong way: the drained stream
  * output is materialized and except-compared to the batch computation —
  * the same equivalence the specs pin at sf0.001, here at rehearsal scale.
  * Usage: runMain graft.StreamBench [sfDir] [filesPerTrigger] [sections] [targetCell]
  * `sections` is a comma list from {wire,dedup,sem,sem_scaled,sem_tree,
  * pq,bm,cluster,takedown,mixed,burst}, or `all` for every section (default:
  * the historical eight — so decade-over-decade JSONs stay comparable;
  * sem_scaled and burst are the r16 additions, opted in explicitly or
  * via `all`; unknown names fail loudly); `targetCell` is the scaled
  * quantizer dial for sem_scaled (default 2000 — the production-shaped
  * setting where per-arrival cost is dominated by the bounded
  * within-cell compare, not the k ∝ N sub-centroid probe).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val perTrigger = if (args.length > 1) args(1).toInt else 8
    val historical = Set("wire", "dedup", "sem", "pq", "bm", "cluster",
      "takedown", "mixed")
    val known = historical ++ Set("sem_scaled", "sem_tree", "burst")
    val sections: Set[String] =
      if (args.length > 2 && args(2) == "all") known
      else if (args.length > 2) {
        val asked = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
        // a typo'd section name silently running NOTHING would let stale
        // evidence keep passing while the rehearsal was never re-run —
        // fail loudly instead
        val unknown = asked -- known
        require(unknown.isEmpty,
          s"StreamBench: unknown section(s) ${unknown.mkString(", ")} — " +
            s"valid: ${known.toSeq.sorted.mkString(", ")}, or 'all'")
        asked
      } else historical
    val targetCell = if (args.length > 3) args(3).toInt else 2000
    def want(x: String): Boolean = sections.contains(x)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = s"/tmp/graft-streambench-${ProcessHandle.current().pid()}"
    val metrics = new StreamOps.MetricsSink()
    spark.streams.addListener(metrics)
    val out = scala.collection.mutable.LinkedHashMap[String, String]()

    def record(name: String, rows: Long, secs: Double, converged: Boolean,
               extra: String = ""): Unit = {
      val ms = metrics.metrics.filter(_.queryName == name)
      val state = if (ms.isEmpty) 0L else ms.map(_.stateRows).max
      out(name) = f"""{"rows":$rows,"seconds":$secs%.1f,""" +
        f""""rows_per_sec":${rows / secs}%.0f,"batches":${ms.size},""" +
        s""""state_rows":$state,"converged":$converged$extra}"""
      System.err.println(s"[streambench] $name: ${out(name)}")
      // drop transient pins between pipelines (ADVICE r13): the batch-twin
      // equivalence checks register intra-query pins that would otherwise
      // accumulate for the session and tax later sections' plan
      // canonicalization (or serve them stale warm blocks)
      graft.functions.TransientCache.release(spark)
    }

    /** Per-version durable write bytes of a maintained-view prefix, from
      * the sink's write ledger (verdict r13 item 1 done-criteria: the
      * delta layout must show per-batch written bytes ~ O(batch), not
      * O(state) — the old layout re-wrote the full edge+tombstone+
      * assignment state every micro-batch, visible here as monotonically
      * growing entries; deltas read as ~flat after the base version).
      */
    def writeBytesExtra(prefix: String): String = {
      val led = graft.streaming.MixedIngest.writeLedger
        .getOrDefault(prefix, Vector.empty)
      if (led.isEmpty) ""
      else {
        val bytes = led.map(_._2)
        s""","write_bytes_per_version":${bytes.mkString("[", ",", "]")}""" +
          s""","write_bytes_max":${bytes.max}""" +
          s""","write_bytes_total":${bytes.sum}"""
      }
    }

    /** Chunk a batch frame into `n` range-partitioned parquet files so the
      * file source replays it as ⌈n/perTrigger⌉ micro-batches. */
    def chunk(df: DataFrame, path: String, byCol: String, n: Int = 32): Long = {
      df.repartitionByRange(n, col(byCol)).write.mode("overwrite").parquet(path)
      spark.read.parquet(path).count()
    }
    def fileStream(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", perTrigger)
        .parquet(path)
    def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val t0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      (System.nanoTime() - t0) / 1e9
    }

    // ── 1. wire order fold: streaming aggregation over the full frame log ──
    if (want("wire")) {
      val frames = WireFixture.frames(spark, sfDir)
      val nRows = chunk(frames, s"$work/frames", "block_number")
      val pools = WireFixture.pools(spark, sfDir)
      val tokens = WireFixture.tokens(spark, sfDir)
      // Update-mode sink: last emitted state per (pool, order_id) — the
      // driver map is bounded by live orders, not events
      val state = scala.collection.mutable.Map.empty[(String, Long), org.apache.spark.sql.Row]
      val q = WireStream.wireOrdersStream(
          fileStream(s"$work/frames", frames.schema), pools, tokens)
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", s"$work/ckpt-wire")
        .queryName("wire_fold")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach { r =>
            state((r.getAs[String]("pool"), r.getAs[Long]("order_id"))) = r
          }
        }.start()
      val secs = drain(q)
      val batch = graft.operators.WireOrderFold.wireOrdersCurrent(spark, sfDir)
      val streamDf = spark.createDataFrame(
        spark.sparkContext.parallelize(state.values.toSeq), batch.schema)
      val converged = streamDf.except(batch).isEmpty && batch.except(streamDf).isEmpty &&
        state.size.toLong == batch.count()
      record("wire_fold", nRows, secs, converged)
    }

    // ── 2. LSH admission dedup: per-bucket stateful candidate stream ──
    if (want("dedup")) {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val nRows = chunk(docs, s"$work/docs", "doc_id")
      val q = IngestDedup.candidateStream(
          fileStream(s"$work/docs", docs.schema))
        .toDF("id1", "id2", "est_jaccard")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$work/ckpt-dedup")
        .queryName("ingest_dedup")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$work/cand-out")
        }.start()
      val secs = drain(q)
      val streamed = spark.read.parquet(s"$work/cand-out").distinct()
      val batch = graft.functions.DedupOps.minhashLsh(spark, sfDir)
      val converged = streamed.except(batch).isEmpty && batch.except(streamed).isEmpty
      record("ingest_dedup", nRows, secs, converged)
    }

    // ── 3. semantic ingest: per-cell τ-near pair stream ──
    if (want("sem")) {
      val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      val nRows = chunk(vecs, s"$work/vecs", "vec_id")
      val centroids = graft.functions.SimilarityOps.centroidVectors(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
      val q = SemIngest.pairStream(
          fileStream(s"$work/vecs", vecs.schema), centroids)
        .toDF("id1", "id2", "cos")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$work/ckpt-sem")
        .queryName("sem_ingest")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$work/sem-out")
        }.start()
      val secs = drain(q)
      val streamed = spark.read.parquet(s"$work/sem-out").distinct()
      val batch = graft.functions.SimilarityOps.semDedupPairs(spark, sfDir)
        .toDF("id1", "id2", "cos")
      val converged = streamed.except(batch).isEmpty && batch.except(streamed).isEmpty
      record("sem_ingest", nRows, secs, converged)
    }

    // ── 4. PQ index maintenance: one generation per arriving vector batch ──
    // The ingest-maintenance operating mode: the base layout covers 90% of
    // the corpus (codebook frozen at base-build time), the remaining 10%
    // arrives as a multi-batch stream, and the fan-in probe afterwards must
    // equal a one-shot frozen-codebook encode of the same delta.
    if (want("pq")) {
      val isBase = col("vec_id") % 10 =!= 7
      val isDelta = col("vec_id") % 10 === 7
      val base = s"$work/pq-base"
      graft.functions.SimilarityOps.writePqBase(spark, sfDir, isBase, base)
      val delta = graft.sources.Tables.embeddings(spark, sfDir)
        .filter(isDelta).select("vec_id", "embedding")
      val nRows = chunk(delta, s"$work/pq-delta", "vec_id")
      val secs = drain(graft.streaming.PqIngest.start(
        fileStream(s"$work/pq-delta", delta.schema),
        base, s"$work/pq-gens", s"$work/ckpt-pq"))
      val gens = graft.streaming.PqIngest.listGenerations(spark, s"$work/pq-gens")
      graft.functions.SimilarityOps.writePqGeneration(
        spark, sfDir, isDelta, base, s"$work/pq-oneshot")
      val streamed = graft.functions.SimilarityOps
        .pqTopKFromGenerations(spark, base, gens)
      val oneShot = graft.functions.SimilarityOps
        .pqTopKFromGenerations(spark, base, Seq(s"$work/pq-oneshot"))
      val converged = gens.nonEmpty &&
        streamed.except(oneShot).isEmpty && oneShot.except(streamed).isEmpty
      record("pq_ingest", nRows, secs, converged)
    }

    // ── 5. BM25 postings maintenance: one generation per document batch ──
    // Same shape for the lexical index; convergence is the STRONG form —
    // base ∪ streamed generations must reproduce the one-pass full-corpus
    // gate query exactly, summed stats included.
    if (want("bm")) {
      val isBase = col("doc_id") % 10 =!= 7
      val isDelta = col("doc_id") % 10 === 7
      graft.functions.TextAnalysis.writePostingsGeneration(
        spark, sfDir, isBase, "streambench_bm_base")
      val delta = graft.sources.Tables.documents(spark, sfDir)
        .filter(isDelta).select("doc_id", "text")
      val nRows = chunk(delta, s"$work/bm-delta", "doc_id")
      val secs = drain(graft.streaming.BmIngest.start(
        fileStream(s"$work/bm-delta", delta.schema),
        "streambench_bm", s"$work/ckpt-bm"))
      val gens = graft.streaming.BmIngest.listGenerations(spark, "streambench_bm")
      val streamed = graft.functions.TextAnalysis
        .bm25TopKIncremental(spark, "streambench_bm_base" +: gens)
      val onePass = graft.functions.TextAnalysis.bm25TopK(spark, sfDir)
      val converged = gens.nonEmpty &&
        streamed.except(onePass).isEmpty && onePass.except(streamed).isEmpty
      record("bm_ingest", nRows, secs, converged)
    }

    // ── 6. cluster maintenance: per-batch delta merge of the assignment ──
    // Candidate pairs stream in; each micro-batch is folded into the
    // versioned assignment table via the delta-sized label-graph merge.
    // Convergence is the strong form: the maintained view must be
    // bit-identical to the one-shot batch fixpoint over ALL pairs — the
    // same assignment the DuckDB transitive-closure oracle gates.
    if (want("cluster")) {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("streambench_cl")).foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
      graft.streaming.ClusterIngest.invalidateCursor(spark, "streambench_cl")
      graft.streaming.MixedIngest.recordWrites = true
      graft.streaming.MixedIngest.writeLedger.remove("streambench_cl")
      val pairs = graft.functions.DedupOps.minhashLsh(spark, sfDir)
        .select(col("id1"), col("id2"))
      val nRows = chunk(pairs, s"$work/cl-pairs", "id1")
      val secs = drain(graft.streaming.ClusterIngest.start(
        fileStream(s"$work/cl-pairs", pairs.schema),
        "streambench_cl", s"$work/ckpt-cl"))
      val maintained = graft.streaming.ClusterIngest.current(spark, "streambench_cl")
      val batch = graft.functions.DedupOps.componentsOver(pairs)
      val converged = maintained.isDefined &&
        maintained.get.except(batch).isEmpty && batch.except(maintained.get).isEmpty
      record("cluster_ingest", nRows, secs, converged,
        extra = writeBytesExtra("streambench_cl"))
    }

    // ── 7. takedown maintenance: one tombstone generation per request batch ──
    // The delete side of the sink family (the seventh pipeline — absent
    // from the r10 rehearsal, verdict item 4): takedown notices stream in
    // as id batches, each becoming a tombstone generation; the admission
    // probe under the streamed tombstone set must equal the probe under
    // the same ids delivered as ONE batch (the form TakedownStreamSpec
    // pins hermetically at sf0.001 — here at rehearsal scale on RocksDB).
    if (want("takedown")) {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("streambench_td")).foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
      graft.functions.DedupOps.writeMinhashIndex(spark, sfDir, "streambench_td_mh")
      val notice = spark.table("streambench_td_mh_counts")
        .filter(col("doc_id") % 37 === 3).select("doc_id")
      val nRows = chunk(notice, s"$work/td-ids", "doc_id")
      val secs = drain(graft.streaming.TakedownIngest.start(
        fileStream(s"$work/td-ids", notice.schema),
        "streambench_td", s"$work/ckpt-td"))
      val streamedTombs = graft.streaming.TakedownIngest
        .tombstones(spark, "streambench_td")
      val probeStreamed = graft.functions.DedupOps.shardDedupFromGenerations(
        spark, sfDir, Seq("streambench_td_mh"), tombs = streamedTombs)
      val probeOneShot = graft.functions.DedupOps.shardDedupFromGenerations(
        spark, sfDir, Seq("streambench_td_mh"), tombs = Some(notice))
      val converged = streamedTombs.isDefined &&
        probeStreamed.except(probeOneShot).isEmpty &&
        probeOneShot.except(probeStreamed).isEmpty
      record("takedown_ingest", nRows, secs, converged)
    }

    // ── 8. MIXED maintenance: adds and takedowns interleaved in ONE stream ──
    // The composition the split pipelines (6: adds, 7: deletes) never
    // rehearse together (verdict r11 item 2): candidate pairs and takedown
    // notices share a feed, range-chunked over the shared id domain so
    // deletes land before, between, and after the edges they affect.
    // Convergence is the strong form: the maintained view must equal the
    // one-shot closure over pairs whose endpoints were never deleted —
    // tombstone-wins ordering independence at rehearsal scale on RocksDB.
    if (want("mixed")) {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("streambench_mx")).foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
      graft.streaming.MixedIngest.invalidateCursor(spark, "streambench_mx")
      graft.streaming.MixedIngest.recordWrites = true
      graft.streaming.MixedIngest.writeLedger.remove("streambench_mx")
      val pairs = graft.functions.DedupOps.minhashLsh(spark, sfDir)
        .select(col("id1"), col("id2"))
      val dels = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id").filter(col("doc_id") % 37 === 3)
      val feed = pairs.withColumn("op", lit("add"))
        .unionByName(dels.select(col("doc_id").as("id1"))
          .withColumn("id2", lit(null).cast("long"))
          .withColumn("op", lit("del")))
        .select("op", "id1", "id2")
      val nRows = chunk(feed, s"$work/mx-feed", "id1")
      val secs = drain(graft.streaming.MixedIngest.start(
        fileStream(s"$work/mx-feed", feed.schema),
        "streambench_mx", s"$work/ckpt-mx"))
      val maintained = graft.streaming.MixedIngest.current(spark, "streambench_mx")
      val livePairs = pairs
        .join(broadcast(dels.select(col("doc_id").as("id1"))), Seq("id1"), "left_anti")
        .join(broadcast(dels.select(col("doc_id").as("id2"))), Seq("id2"), "left_anti")
        .select("id1", "id2")
      val batch = graft.functions.DedupOps.componentsOver(livePairs)
      val converged = maintained.isDefined &&
        maintained.get.except(batch).isEmpty && batch.except(maintained.get).isEmpty
      record("mixed_ingest", nRows, secs, converged,
        extra = writeBytesExtra("streambench_mx"))
      graft.streaming.MixedIngest.writeLedger.remove("streambench_mx")

      // ── 8b. COMPACT mid-stream, then resume on the SAME checkpoint ──
      // (verdict r12 item 1 done-criteria): the fold must not change the
      // served view (tombstones drop, duplicate edges collapse), and the
      // resumed stream must keep converging — now with the documented
      // reset semantics. The resume wave re-feeds exactly the edges the
      // tombstones had suppressed (pairs \ livePairs), so the maintained
      // view must land on the FULL closure componentsOver(pairs): live
      // edges ∪ re-admitted edges = every candidate pair.
      val pre = maintained.get.localCheckpoint()
      graft.streaming.MixedIngest.compact(spark, "streambench_mx")
      val (post, edgesC, tombsC) =
        graft.streaming.MixedIngest.currentState(spark, "streambench_mx").get
      val folded = tombsC.isEmpty &&
        edgesC.count() == edgesC.distinct().count() &&
        post.except(pre).isEmpty && pre.except(post).isEmpty
      val reAdd = pairs.except(livePairs)
        .withColumn("op", lit("add")).select("op", "id1", "id2")
      // APPEND into the same feed dir and resume on the SAME checkpoint —
      // the file source picks up only the new chunks and batch ids
      // continue past the stamp/ordering guards, exactly like a restarted
      // production feed
      reAdd.repartitionByRange(32, col("id1"))
        .write.mode("append").parquet(s"$work/mx-feed")
      val nRows2 = spark.read.parquet(s"$work/mx-feed").count() - nRows
      val secs2 = drain(graft.streaming.MixedIngest.start(
        fileStream(s"$work/mx-feed", feed.schema),
        "streambench_mx", s"$work/ckpt-mx"))
      val resumed = graft.streaming.MixedIngest.current(spark, "streambench_mx")
      val full = graft.functions.DedupOps.componentsOver(pairs)
      val converged2 = folded && resumed.isDefined &&
        resumed.get.except(full).isEmpty && full.except(resumed.get).isEmpty
      record("mixed_compact_resume", nRows2, secs2, converged2,
        extra = writeBytesExtra("streambench_mx"))
    }

    // ── 3b. SCALED semantic ingest: the k ∝ N quantizer (verdict r15
    // item 1) ── same admission stream as section 3, state keyed by the
    // scaled (cell, tile): per-arrival cost = ~|labels| + ~|label's tiles|
    // sub-centroid cosines (both against a broadcast-sized list) + one
    // compare against the ~targetCell members of the scaled cell — FLAT
    // per-op as the corpus grows, where the fixed-k path grew linearly.
    // Convergence: drained pair set == batch semDedupPairsScaled.
    if (want("sem_scaled")) {
      val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      val nRows = chunk(vecs, s"$work/vecs-sc", "vec_id")
      val centroids = graft.functions.SimilarityOps.centroidVectors(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
      val subCents = graft.functions.SimilarityOps
        .scaledCentroidVectors(spark, sfDir, targetCell).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .groupBy(_._1).map { case (c, xs) =>
          c -> xs.map(x => (x._2, x._3)).toSeq.sortBy(_._1) }
      val kCells = subCents.values.map(_.size).sum
      // realized population bound of the reassigned cells (the quantile
      // seeds target `targetCell`; reassignment can shift members between
      // adjacent annuli — record what actually happened)
      val maxPop = graft.functions.SimilarityOps
        .scaledAssignment(spark, sfDir, targetCell)
        .groupBy(col("cell"), col("tile")).count()
        .agg(max(col("count"))).head().getLong(0)
      val q = SemIngest.scaledPairStream(
          fileStream(s"$work/vecs-sc", vecs.schema), centroids, subCents)
        .toDF("id1", "id2", "cos")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$work/ckpt-sem-sc")
        .queryName("sem_ingest_scaled")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$work/sem-sc-out")
        }.start()
      val secs = drain(q)
      val streamed = spark.read.parquet(s"$work/sem-sc-out").distinct()
      val batch = graft.functions.SimilarityOps
        .semDedupPairsScaled(spark, sfDir, targetCell = targetCell)
        .toDF("id1", "id2", "cos")
      val converged = streamed.except(batch).isEmpty && batch.except(streamed).isEmpty
      record("sem_ingest_scaled", nRows, secs, converged,
        extra = s""","target_cell":$targetCell,"k_cells":$kCells""" +
          s""","max_cell_pop":$maxPop""")
    }

    // ── 8b'. the TREE probe over the same dial (SimilarityOps
    // .treeAssignment) ── identical bounded (cell, tile) state, but the
    // per-arrival assignment descends label → branch → tile (~2√T
    // cosines) instead of the flat argmax over all T of the label's
    // tiles; at a dial where T is large the assignment term dominates
    // and the probe's advantage is directly measurable as rows/s against
    // sem_ingest_scaled run at the SAME dial
    if (want("sem_tree")) {
      val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      val nRows = chunk(vecs, s"$work/vecs-tr", "vec_id")
      val centroids = graft.functions.SimilarityOps.centroidVectors(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toSeq
      val (branchCents, tilesByBranch) = graft.functions.SimilarityOps
        .treeProbeStructures(spark, sfDir, targetCell)
      val kBranches = branchCents.values.map(_.size).sum
      val kTiles = tilesByBranch.values.map(_.size).sum
      // realized population bound of the PROBED cells (the bound-honesty
      // observable the flat section records): the descent approximates
      // the flat argmax, so concentration beyond the flat quantizer's
      // realized bound must be visible in the evidence, not assumed away
      val maxPop = graft.functions.SimilarityOps
        .treeAssignment(spark, sfDir, targetCell)
        .groupBy(col("cell"), col("tile")).count()
        .agg(max(col("count"))).head().getLong(0)
      val q = SemIngest.treePairStream(
          fileStream(s"$work/vecs-tr", vecs.schema), centroids,
          branchCents, tilesByBranch)
        .toDF("id1", "id2", "cos")
        .writeStream.outputMode(OutputMode.Append)
        .option("checkpointLocation", s"$work/ckpt-sem-tr")
        .queryName("sem_ingest_tree")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$work/sem-tr-out")
        }.start()
      val secs = drain(q)
      val streamed = spark.read.parquet(s"$work/sem-tr-out").distinct()
      val batch = graft.functions.SimilarityOps
        .treePairs(spark, sfDir, targetCell = targetCell)
        .toDF("id1", "id2", "cos")
      val converged = streamed.except(batch).isEmpty && batch.except(streamed).isEmpty
      record("sem_ingest_tree", nRows, secs, converged,
        extra = s""","target_cell":$targetCell,"k_branches":$kBranches""" +
          s""","k_tiles":$kTiles,"max_cell_pop":$maxPop""")
    }

    // ── 8c. MIXED maintenance under a TAKEDOWN BURST (verdict r15 stretch
    // item 6) ── the sf10 mixed rehearsal deletes proportionally; here a
    // single resume wave carries a 30%-of-corpus takedown burst, with the
    // broadcast ceiling forced DOWN so the per-batch tombstone anti-joins
    // take the shuffle-anti-join degradation path at rehearsal scale
    // (MixedIngest.tombBroadcastLimit) — the shape a mass-unpublish event
    // has in production. Convergence stays the strong closure form and
    // write bytes must stay O(batch).
    if (want("burst")) {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("streambench_bu")).foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
      graft.streaming.MixedIngest.invalidateCursor(spark, "streambench_bu")
      graft.streaming.MixedIngest.recordWrites = true
      graft.streaming.MixedIngest.writeLedger.remove("streambench_bu")
      val pairs = graft.functions.DedupOps.minhashLsh(spark, sfDir)
        .select(col("id1"), col("id2"))
      val feedAdds = pairs.withColumn("op", lit("add")).select("op", "id1", "id2")
      val nRows = chunk(feedAdds, s"$work/bu-feed", "id1")
      val secs = drain(graft.streaming.MixedIngest.start(
        fileStream(s"$work/bu-feed", feedAdds.schema),
        "streambench_bu", s"$work/ckpt-bu", name = "mixed_burst"))
      // the burst: 30% of the doc id space in ONE wave, anti-joined under
      // a deliberately tiny broadcast ceiling
      val dels = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id").filter(col("doc_id") % 10 < 3)
      val burst = dels.select(col("doc_id").as("id1"))
        .withColumn("id2", lit(null).cast("long"))
        .withColumn("op", lit("del")).select("op", "id1", "id2")
      burst.coalesce(4).write.mode("append").parquet(s"$work/bu-feed")
      val nBurst = spark.read.parquet(s"$work/bu-feed").count() - nRows
      sys.props("graft.mixed.tombBroadcastLimit") = "1000"
      val secs2 = try drain(graft.streaming.MixedIngest.start(
          fileStream(s"$work/bu-feed", feedAdds.schema),
          "streambench_bu", s"$work/ckpt-bu", name = "mixed_burst"))
        finally sys.props.remove("graft.mixed.tombBroadcastLimit")
      val maintained = graft.streaming.MixedIngest.current(spark, "streambench_bu")
      val livePairs = pairs
        .filter(col("id1") % 10 >= 3 && col("id2") % 10 >= 3)
        .select("id1", "id2")
      val batch = graft.functions.DedupOps.componentsOver(livePairs)
      val converged = maintained.isDefined &&
        maintained.get.except(batch).isEmpty && batch.except(maintained.get).isEmpty
      record("mixed_burst", nBurst, secs + secs2, converged,
        extra = f""","adds_seconds":$secs%.1f,"burst_seconds":$secs2%.1f""" +
          writeBytesExtra("streambench_bu"))
      graft.streaming.MixedIngest.writeLedger.remove("streambench_bu")
    }

    val streams = out.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_bench","streams":$streams,"files_per_trigger":$perTrigger,"state_store":"rocksdb","sf":"$sfDir"}""")
    spark.stop()
  }
}
