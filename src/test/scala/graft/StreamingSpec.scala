package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{OrderEvents, OrderFold}
import graft.operators.OrderFold.{Ev, St}
import graft.streaming.OrderBookStream

/** M6: the streaming lift must produce the same final state as the batch
  * fold regardless of micro-batch boundaries (ST1 batch-boundary
  * independence — the property the reference's offset machinery is meant to
  * provide, `src/services/block-event-manager.ts:63-92`).
  */
class StreamingSpec extends SparkSpec {

  /** Feed `events` through the streaming fold in the given batch sizes and
    * return the last emitted state per key.
    */
  private def runBatches(events: Seq[Ev], splits: Seq[Int]): Map[(String, Long), St] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Ev]
    val folded = OrderBookStream.foldStream(source.toDS())
    val query = folded.writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName("fold_out")
      .start()
    try {
      var rest = events
      splits.foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        rest = tail
        if (batch.nonEmpty) { source.addData(batch); query.processAllAvailable() }
      }
      if (rest.nonEmpty) { source.addData(rest); query.processAllAvailable() }
      // memory sink accumulates every update; last row per key wins.
      // collect in sink arrival order — updates for a key only ever append.
      spark.table("fold_out").as[St].collect()
        .foldLeft(Map.empty[(String, Long), St]) { (m, s) => m + ((s.pool, s.trader) -> s) }
    } finally query.stop()
  }

  test("batch-boundary independence: 1 batch == many batches == batch fold") {
    val events = OrderFold.toEvents(OrderEvents(spark, sfTiny))
      .collect().toSeq.sortBy(_.eventId).take(400)

    val oracle = events.groupBy(e => (e.pool, e.trader))
      .flatMap { case (k, g) => OrderFold.fold(g.sortBy(_.eventId)).map(k -> _) }
      .toMap

    val oneBatch = runBatches(events, Seq(events.size))
    spark.sql("DROP TABLE IF EXISTS fold_out")
    val tenBatches = runBatches(events, Seq.fill(10)(events.size / 10))
    spark.sql("DROP TABLE IF EXISTS fold_out")
    val unevenBatches = runBatches(events, Seq(1, 7, 150, 3, 90))

    assert(oneBatch == oracle, "single-batch streaming != batch fold")
    assert(tenBatches == oracle, "10-batch streaming != batch fold")
    assert(unevenBatches == oracle, "uneven-batch streaming != batch fold")
  }

  test("RocksDB state store (M9): fold stream converges with state-size metrics") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the SURVEY §7.2 cluster config, exercised rather than documented:
    // same fold, same oracle, state store = RocksDB (bounded executor heap,
    // the provider a 100 TB deployment runs)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sink = new graft.streaming.StreamOps.MetricsSink()
    spark.streams.addListener(sink)
    try {
      val events = OrderFold.toEvents(OrderEvents(spark, sfTiny))
        .collect().toSeq.sortBy(_.eventId).take(400)
      val oracle = events.groupBy(e => (e.pool, e.trader))
        .flatMap { case (k, g) => OrderFold.fold(g.sortBy(_.eventId)).map(k -> _) }
        .toMap
      spark.sql("DROP TABLE IF EXISTS rocks_fold_out")
      val source = MemoryStream[Ev]
      val folded = OrderBookStream.foldStream(source.toDS())
      val query = folded.writeStream
        .outputMode(OutputMode.Update)
        .format("memory")
        .queryName("rocks_fold_out")
        .start()
      try {
        events.grouped(100).foreach { b =>
          source.addData(b); query.processAllAvailable()
        }
        val got = spark.table("rocks_fold_out").as[St].collect()
          .foldLeft(Map.empty[(String, Long), St]) { (m, s) =>
            m + ((s.pool, s.trader) -> s)
          }
        assert(got == oracle, "RocksDB-backed streaming fold != batch fold")
        val so = query.lastProgress.stateOperators
        assert(so.nonEmpty && so.map(_.numRowsTotal).sum > 0,
          "no stateful operator rows reported")
        assert(so.exists(_.customMetrics.keySet.asScala
            .exists(_.toLowerCase.contains("rocksdb"))),
          s"provider did not engage RocksDB: ${so.map(_.customMetrics.keySet.asScala).toSeq}")
      } finally query.stop()
      // listener bus is async — poll until the state-size rows land
      val deadline = System.nanoTime() + 10e9.toLong
      while (!sink.metrics.exists(_.stateRows > 0) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(sink.metrics.exists(_.stateRows > 0),
        "MetricsSink captured no state-size metrics")
    } finally {
      spark.streams.removeListener(sink)
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("change feed surfaces updated keys per micro-batch (ST8)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = spark.read.parquet(s"$sfTiny/events.parquet")
    val source = MemoryStream[Long]
    // replay the raw schema through the SAME normalization as batch
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val updates = scala.collection.concurrent.TrieMap[Long, Seq[St]]()
    val streamDf = source.toDS().toDF("idx")
      .join(raw, expr("event_id % 60") === col("idx")) // deterministic slice per tick
    val query = OrderBookStream.changeFeed(streamDf.drop("idx"), ckpt) {
      (batchId, sts) => updates.put(batchId, sts)
    }
    try {
      source.addData(0L); query.processAllAvailable()
      assert(updates.values.flatten.nonEmpty, "no change-feed updates received")
      val keys = updates.values.flatten.map(s => (s.pool, s.trader)).toSet
      assert(keys.nonEmpty)
    } finally query.stop()
  }

  test("windowed volume (ST3): streaming event-time windows match the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = spark.read.parquet(s"$sfTiny/events.parquet")
    val rawRows = raw.limit(400).collect()
    val rawDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rawRows.toSeq), raw.schema)

    val source = MemoryStream[Long]
    val stream = source.toDS().toDF("tick")
      .join(rawDf, expr("event_id div 200") === col("tick")).drop("tick")
    val query = OrderBookStream.windowedVolume(stream, "30 minutes", "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("win_out").start()
    val streamed = try {
      source.addData(0L); query.processAllAvailable()
      source.addData(1L); query.processAllAvailable()
      spark.table("win_out").collect()
    } finally query.stop()

    // append-mode only emits windows sealed by the watermark; with a
    // bounded replay the last windows stay open — compare the emitted
    // subset against the batch computation of the same windows
    val batch = OrderBookStream.windowedVolume(rawDf, "0 seconds", "1 minute")
    val batchMap = batch.collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDecimal(2), r.getLong(3))).toMap
    assert(streamed.nonEmpty, "no sealed windows emitted")
    streamed.foreach { r =>
      val k = (r.getString(0), r.getTimestamp(1))
      assert(batchMap.contains(k), s"streamed window $k missing from batch")
      assert(batchMap(k) == ((r.getDecimal(2), r.getLong(3))),
        s"window $k: streamed ${(r.getDecimal(2), r.getLong(3))} != batch ${batchMap(k)}")
    }
  }

  test("stream-stream interval join matches the batch join") {
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_seconds
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // trades enriched with quotes from the same pool in the 10 s before the
    // trade — the streaming form of the as-of/interval enrichment, with
    // watermarks bounding both sides' state
    val trades = Seq(("A", 100L, 1.0), ("A", 110L, 2.0), ("B", 105L, 3.0),
      ("A", 130L, 4.0), ("B", 140L, 5.0))
    val quotes = Seq(("A", 95L, 10.0), ("A", 108L, 11.0), ("B", 100L, 12.0),
      ("A", 125L, 13.0), ("B", 139L, 14.0), ("B", 150L, 15.0))

    def joinOf(t: org.apache.spark.sql.DataFrame, q: org.apache.spark.sql.DataFrame) =
      t.join(q, col("pool") === col("qpool") &&
          col("q_ts") >= col("t_ts") - expr("interval 10 seconds") &&
          col("q_ts") <= col("t_ts"))
        .select(col("pool"), col("ts_s"), col("qty"), col("qts_s"), col("px"))

    val ts = MemoryStream[(String, Long, Double)]
    val qs = MemoryStream[(String, Long, Double)]
    val tDf = ts.toDS().toDF("pool", "ts_s", "qty")
      .withColumn("t_ts", timestamp_seconds(col("ts_s")))
      .withWatermark("t_ts", "10 seconds")
    val qDf = qs.toDS().toDF("qpool", "qts_s", "px")
      .withColumn("q_ts", timestamp_seconds(col("qts_s")))
      .withWatermark("q_ts", "10 seconds")
    val query = joinOf(tDf, qDf).writeStream
      .outputMode("append").format("memory").queryName("ssj_out").start()
    val streamed = try {
      ts.addData(trades.take(3)); qs.addData(quotes.take(3))
      query.processAllAvailable()
      ts.addData(trades.drop(3)); qs.addData(quotes.drop(3))
      query.processAllAvailable()
      spark.table("ssj_out").collect().map(_.toString).sorted.toSeq
    } finally query.stop()

    val tBatch = spark.createDataset(trades).toDF("pool", "ts_s", "qty")
      .withColumn("t_ts", timestamp_seconds(col("ts_s")))
    val qBatch = spark.createDataset(quotes).toDF("qpool", "qts_s", "px")
      .withColumn("q_ts", timestamp_seconds(col("qts_s")))
    val batch = joinOf(tBatch, qBatch).collect().map(_.toString).sorted.toSeq
    assert(batch.nonEmpty && streamed == batch,
      s"stream-stream join mismatch:\nstream=$streamed\nbatch=$batch")
  }

  test("streaming exact dedup (dropDuplicates) keeps one row per key across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val query = source.toDS().toDF("id", "h").dropDuplicates("h")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    val rows = try {
      source.addData(Seq((1L, "ha"), (2L, "hb"), (3L, "ha")))
      query.processAllAvailable()
      // duplicates arriving in LATER batches must also be suppressed
      source.addData(Seq((4L, "hb"), (5L, "hc"), (6L, "ha")))
      query.processAllAvailable()
      spark.table("dedup_out").collect()
    } finally query.stop()
    assert(rows.map(_.getString(1)).sorted.toSeq == Seq("ha", "hb", "hc"))
    // first arrival wins — the id kept for each hash is the earliest
    assert(rows.map(r => r.getString(1) -> r.getLong(0)).toMap ==
      Map("ha" -> 1L, "hb" -> 2L, "hc" -> 5L))
  }

  test("metrics sink (S13): per-batch progress captured as structured rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sink = new graft.streaming.StreamOps.MetricsSink()
    spark.streams.addListener(sink)
    try {
      val source = MemoryStream[Int]
      source.addData(1 to 50: _*)
      val q = source.toDS().writeStream
        .format("memory").queryName("s13_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the listener bus is async — poll for delivery
      val deadline = System.nanoTime() + 10e9.toLong
      while (sink.metrics.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val m = sink.metrics
      assert(m.nonEmpty, "no progress events captured")
      assert(m.map(_.numInputRows).sum == 50)
      assert(m.map(_.batchId).distinct == m.map(_.batchId), "duplicate batch ids")
      val df = sink.toDF(spark)
      assert(df.columns.toSet.contains("processedRowsPerSecond"))
      assert(df.count() == m.size)
    } finally spark.streams.removeListener(sink)
  }

  test("supervisor (ST7): restarts a failed query from its checkpoint, exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Int]
    source.addData(1 to 10: _*)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-st7").toString
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val seen = scala.collection.concurrent.TrieMap[Long, Seq[Int]]()
    def start() = source.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Int], bid: Long) =>
        if (failOnce.compareAndSet(false, true))
          throw new RuntimeException("transient provider outage")
        seen(bid) = df.collect().toSeq
        ()
      }
      .start()
    val restarts = graft.streaming.StreamOps.superviseWithRetry(
      () => start(), maxRestarts = 3, backoffMs = 10L)
    assert(restarts == 1, s"expected exactly one restart, got $restarts")
    // the failed batch was replayed from the checkpoint, delivered once
    assert(seen.values.flatten.toSeq.sorted == (1 to 10),
      s"resume lost or duplicated data: $seen")
    // budget exhaustion rethrows: a permanently-failing query surfaces
    val always = new RuntimeException("hard failure")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-st7b").toString
    val source2 = MemoryStream[Int]
    source2.addData(1, 2, 3)
    def startBad() = source2.toDS().writeStream
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.Dataset[Int], _: Long) =>
        throw always
      }
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      graft.streaming.StreamOps.superviseWithRetry(
        () => startBad(), maxRestarts = 1, backoffMs = 10L)
    }
  }

  test("trending terms: streaming MG window sketches hold the bound under any micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 8
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120).collect()
      .map(r => (new java.sql.Timestamp(3600000L + (r.getLong(0) % 3) * 60000L),
        r.getString(1)))
    // exact per-window token counts, straight-line in-memory oracle
    val tok = "[a-z0-9]+".r
    val exact = docs.toSeq
      .flatMap { case (ts, text) => tok.findAllIn(text).map(t => (ts.getTime, t)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mass = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap

    def runSplit(batches: Seq[Seq[(java.sql.Timestamp, String)]],
                 name: String): Array[org.apache.spark.sql.Row] = {
      val source = MemoryStream[(java.sql.Timestamp, String)]
      val query = graft.streaming.TrendingTerms
        .windowedTokenSketch(source.toDS().toDF("ts", "text"), "1 minute", "10 minutes", k)
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      try {
        batches.foreach { b =>
          if (b.nonEmpty) { source.addData(b); query.processAllAvailable() }
        }
        spark.table(name).collect()
      } finally query.stop()
    }
    val splits = Seq(
      runSplit(Seq(docs.take(40).toSeq, docs.slice(40, 90).toSeq, docs.drop(90).toSeq), "mg_a"),
      runSplit(Seq(docs.take(7).toSeq, docs.drop(7).toSeq), "mg_b"))
    splits.foreach { rows =>
      assert(rows.length == 3, s"expected 3 windows, got ${rows.length}")
      rows.foreach { r =>
        val w = r.getTimestamp(r.fieldIndex("w_start")).getTime
        val mg = r.getMap[String, Long](r.fieldIndex("mg"))
        val n = r.getLong(r.fieldIndex("n"))
        assert(n == mass(w), s"window $w: token mass $n != exact ${mass(w)}")
        assert(mg.size <= k)
        // the MG guarantee for EVERY token of the window: est is a lower
        // bound and undershoots by at most n/(k+1) — independent of how
        // micro-batches split the stream (mergeable-summaries property)
        exact.foreach { case ((ew, t), cnt) if ew == w =>
          val est = mg.getOrElse(t, 0L)
          assert(est <= cnt, s"window $w token $t: est $est overshoots $cnt")
          assert((cnt - est) * (k + 1) <= n,
            s"window $w token $t: undershoot ${cnt - est} breaks n/(k+1) with n=$n")
        case _ => ()
        }
      }
    }
  }

  private def expr(s: String) = org.apache.spark.sql.functions.expr(s)
  private def col(s: String) = org.apache.spark.sql.functions.col(s)
}
