package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{BookQueries, BookServing, BookViews, OrderEvents, OrderFold, OrderState}
import graft.operators.OrderFold.{Ev, St}
import graft.streaming.OrderBookStream

/** A7 nested assembly + S9 durable snapshot sink. */
class ServingSpec extends SparkSpec {

  test("nested order book: structure, side ordering, volume consistency") {
    val books = BookServing.orderBook(spark, sfTiny, depth = 10).collect()
    assert(books.nonEmpty)
    val flat = BookQueries.orderbook(spark, sfTiny, depth = 10).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(3)), r.getDouble(4))).toMap
    books.foreach { row =>
      val pool = row.getString(0)
      val bids = row.getSeq[org.apache.spark.sql.Row](4)
      val asks = row.getSeq[org.apache.spark.sql.Row](5)
      // bids strictly descending, asks strictly ascending (W1/W2)
      val bidPrices = bids.map(_.getLong(0))
      val askPrices = asks.map(_.getLong(0))
      assert(bidPrices == bidPrices.sorted.reverse, s"$pool bids not descending")
      assert(askPrices == askPrices.sorted, s"$pool asks not ascending")
      // nested totals must equal the flat oracle-checked view
      bids.foreach { lvl =>
        assert(flat((pool, "BUY", lvl.getLong(0))) == lvl.getDouble(1),
          s"$pool bid level ${lvl.getLong(0)} volume mismatch vs flat view")
        // per-level orders sum to the level volume
        val orderSum = lvl.getSeq[org.apache.spark.sql.Row](2)
          .map(_.getDouble(3)).sum
        assert(math.abs(orderSum - lvl.getDouble(1)) < 1e-6)
      }
    }
  }

  test("order book JSON rendering (S12) is well-formed") {
    val json = BookServing.orderBookJson(spark, sfTiny).collect()
    assert(json.length == 5)
    json.foreach { r =>
      val s = r.getString(1)
      assert(s.startsWith("{") && s.contains("\"bids\":[") && s.contains("\"asks\":["))
    }
  }

  test("snapshot sink (S9): parquet snapshot converges to the batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-snap")
    val snapPath = s"$tmp/state"
    val ckpt = s"$tmp/ckpt"

    val raw = spark.read.parquet(s"$sfTiny/events.parquet").limit(300).collect()
    val schema = spark.read.parquet(s"$sfTiny/events.parquet").schema
    val source = MemoryStream[Long]
    val rawDf = spark.createDataFrame(
      spark.sparkContext.parallelize(raw.toSeq), schema)
    // stream-static trick: tick t releases the contiguous block
    // [t*100, (t+1)*100) — deliveries stay in offset order across batches,
    // the monotone-block-order contract the source provides (ST1/ST4)
    val stream = source.toDS().toDF("tick")
      .join(rawDf, expr("event_id div 100") === col("tick"))
      .drop("tick")
    val query = OrderBookStream.snapshotSink(stream, ckpt, snapPath)
    try {
      source.addData(0L); query.processAllAvailable()
      source.addData(1L); query.processAllAvailable()
      source.addData(2L); query.processAllAvailable()
    } finally query.stop()

    val snapshot = OrderBookStream.readSnapshot(spark, snapPath).collect()
      .map(s => (s.pool, s.trader) -> s).toMap
    val oracle = OrderFold.toEvents(OrderEvents.derive(rawDf)).collect().toSeq
      .groupBy(e => (e.pool, e.trader))
      .flatMap { case (k, g) => OrderFold.fold(g.sortBy(_.eventId)).map(k -> _) }
      .toMap
    assert(snapshot == oracle, "snapshot diverged from batch fold")
    assert(snapshot.nonEmpty)
  }

  test("W4 (get-amount-out) served from the streaming snapshot == batch swap scan") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-snap-w4")
    val snapPath = s"$tmp/state"
    val ckpt = s"$tmp/ckpt"

    val raw = spark.read.parquet(s"$sfTiny/events.parquet").limit(300).collect()
    val schema = spark.read.parquet(s"$sfTiny/events.parquet").schema
    val source = MemoryStream[Long]
    val rawDf = spark.createDataFrame(
      spark.sparkContext.parallelize(raw.toSeq), schema)
    val stream = source.toDS().toDF("tick")
      .join(rawDf, expr("event_id div 100") === col("tick"))
      .drop("tick")
    val query = OrderBookStream.snapshotSink(stream, ckpt, snapPath)
    try {
      source.addData(0L, 1L, 2L); query.processAllAvailable()
    } finally query.stop()

    // the realistic W4 deployment (VERDICT r5): the swap scan reads the
    // maintained snapshot, not the event log — cents back to the exact
    // DECIMAL order shape, then the same priceLevels -> swap-scan core
    val snapOrders = OrderBookStream.readSnapshot(spark, snapPath).toDF()
      .select(col("pool"), col("trader"), col("orderId").as("order_id"),
        col("side"),
        (col("priceCents").cast("decimal(30,2)") / 100)
          .cast("decimal(28,2)").as("price"),
        (col("remainingCents").cast("decimal(30,2)") / 100)
          .cast("decimal(28,2)").as("remaining"),
        col("active"))
    val ev = OrderEvents.derive(rawDf)
    val amt = BigDecimal("50000.00")
    val served = BookQueries.amountOutBuyFrom(
      BookViews.pools(ev), BookViews.priceLevels(snapOrders), amt, 100)
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = BookQueries.amountOutBuyFrom(
      BookViews.pools(ev), BookViews.priceLevels(OrderState.ordersCurrent(ev)),
      amt, 100)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(served.nonEmpty, "snapshot-served amount-out returned nothing")
    assert(served.toSeq == batch.toSeq,
      "amount-out over the streamed snapshot diverged from the batch scan")
  }

  test("snapshot sink rewrites only buckets whose pools changed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-snap-scope")
    val snapPath = s"$tmp/state"
    val ckpt = s"$tmp/ckpt"

    val all = spark.read.parquet(s"$sfTiny/events.parquet").limit(300)
    val schema = all.schema
    val pools = all.select("event_type").distinct().as[String].collect().sorted
    val onlyPool = pools.head // batch 1 touches a single pool
    val raw0 = all.filter(col("event_type") =!= onlyPool).collect()
    val raw1 = all.filter(col("event_type") === onlyPool).collect()
    val source = MemoryStream[Long]
    def df(rows: Array[org.apache.spark.sql.Row]) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
    val stream = source.toDS().toDF("tick")
      .join(df(raw0).withColumn("tick", lit(0L))
          .union(df(raw1).withColumn("tick", lit(1L))),
        Seq("tick")).drop("tick")
    val query = OrderBookStream.snapshotSink(stream, ckpt, snapPath)
    def versions: Map[String, Set[String]] =
      new java.io.File(snapPath).listFiles().filter(_.getName.startsWith("b"))
        .map(b => b.getName -> b.listFiles().map(_.getName).toSet).toMap
    try {
      source.addData(0L); query.processAllAvailable()
      val v0 = versions
      source.addData(1L); query.processAllAvailable()
      val v1 = versions
      // exactly one bucket advanced; every other bucket kept its v0 dir
      // untouched (merge I/O ∝ changed pools, not total state)
      val advanced = v1.filter { case (b, vs) => v0.getOrElse(b, Set.empty) != vs }
      assert(advanced.keySet.size == 1,
        s"expected 1 rewritten bucket, got: $advanced")
    } finally query.stop()

    // convergence is still exact after the partial rewrite
    val snapshot = OrderBookStream.readSnapshot(spark, snapPath).collect()
      .map(s => (s.pool, s.trader) -> s).toMap
    val oracle = OrderFold.toEvents(OrderEvents.derive(df(raw0) union df(raw1)))
      .collect().toSeq
      .groupBy(e => (e.pool, e.trader))
      .flatMap { case (k, g) => OrderFold.fold(g.sortBy(_.eventId)).map(k -> _) }
      .toMap
    assert(snapshot == oracle)
  }
}
