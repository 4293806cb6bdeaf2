package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.WireOrderFold
import graft.sources.{WireEvents, WireFixture}
import graft.streaming.WireStream

/** The wire ingest as a STREAMING pipeline: JSON parse → stream-static
  * token-dim scaling join → order_id-keyed streaming aggregation. The whole
  * batch fold [[WireOrderFold.ordersByOrderId]] runs unchanged as a
  * streaming aggregation — this spec proves the plan is streamable and that
  * incremental state across micro-batch boundaries converges to the batch
  * fold (the engine's one-fold-definition discipline, extended to the wire
  * path).
  */
object WireStreamSpec {
  // top-level: inner case classes can't be encoded by MemoryStream
  case class Frame(block_number: Long, log_index: Int,
                   block_time: java.sql.Timestamp,
                   pool: String, event_type: String, payload: String)
}

class WireStreamSpec extends SparkSpec {
  import WireStreamSpec.Frame

  test("streaming wire fold across micro-batches == batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val frames = WireFixture.frames(spark, sfTiny)
    val pools = WireFixture.pools(spark, sfTiny)
    val tokens = WireFixture.tokens(spark, sfTiny)

    val all = frames.collect().map(r => Frame(
      r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
      r.getAs[java.sql.Timestamp]("block_time"),
      r.getAs[String]("pool"), r.getAs[String]("event_type"),
      r.getAs[String]("payload"))).sortBy(f => (f.block_number, f.log_index))

    val source = MemoryStream[Frame]
    val folded = WireStream.wireOrdersStream(source.toDF(), pools, tokens)

    // Update-mode sink: keep the LAST emitted state per key
    val state = scala.collection.mutable.Map.empty[(String, Long), Row]
    val query = folded.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          state((r.getAs[String]("pool"), r.getAs[Long]("order_id"))) = r
        }
      }
      .start()
    try {
      // three prefix-ordered micro-batches (offset order, ST1/ST4)
      val cut1 = all.length / 3
      val cut2 = 2 * all.length / 3
      source.addData(all.slice(0, cut1).toIndexedSeq); query.processAllAvailable()
      source.addData(all.slice(cut1, cut2).toIndexedSeq); query.processAllAvailable()
      source.addData(all.slice(cut2, all.length).toIndexedSeq); query.processAllAvailable()
    } finally query.stop()

    val batchRows = WireOrderFold.wireOrdersCurrent(spark, sfTiny).collect()
    assert(batchRows.nonEmpty && state.nonEmpty)
    val batchMap = batchRows
      .map(r => (r.getAs[String]("pool"), r.getAs[Long]("order_id")) -> r.toSeq).toMap
    val streamMap = state.view.mapValues(_.toSeq).toMap
    assert(streamMap.keySet == batchMap.keySet,
      "streaming fold emitted a different key set than the batch fold")
    val diverged = batchMap.collect {
      case (k, v) if streamMap(k) != v => k
    }
    assert(diverged.isEmpty, s"state diverged for keys: ${diverged.take(5)}")
  }

  test("streaming latest_price across micro-batches == batch view") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val frames = WireFixture.frames(spark, sfTiny)
    val pools = WireFixture.pools(spark, sfTiny)
    val tokens = WireFixture.tokens(spark, sfTiny)
    val all = frames.collect().map(r => Frame(
      r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
      r.getAs[java.sql.Timestamp]("block_time"),
      r.getAs[String]("pool"), r.getAs[String]("event_type"),
      r.getAs[String]("payload"))).sortBy(f => (f.block_number, f.log_index))

    val source = MemoryStream[Frame]
    val lp = WireStream.latestPriceStream(source.toDF(), pools, tokens)
    val state = scala.collection.mutable.Map.empty[String, Double]
    val query = lp.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          state(r.getAs[String]("pool")) = r.getAs[Double]("latest_price")
        }
      }
      .start()
    try {
      val cut = all.length / 2
      source.addData(all.slice(0, cut).toIndexedSeq); query.processAllAvailable()
      source.addData(all.slice(cut, all.length).toIndexedSeq); query.processAllAvailable()
    } finally query.stop()

    val batchLp = graft.operators.WireViews.wireLatestPrice(spark, sfTiny)
      .collect().map(r => r.getAs[String]("pool") -> r.getAs[Double]("latest_price"))
      .toMap
    assert(batchLp.nonEmpty)
    assert(state.toMap == batchLp,
      s"streaming latest_price diverged: ${state.toMap} vs $batchLp")
  }

  test("streaming market-order history (Append, stateless) == batch view") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val frames = WireFixture.frames(spark, sfTiny)
    val pools = WireFixture.pools(spark, sfTiny)
    val tokens = WireFixture.tokens(spark, sfTiny)
    val all = frames.collect().map(r => Frame(
      r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
      r.getAs[java.sql.Timestamp]("block_time"),
      r.getAs[String]("pool"), r.getAs[String]("event_type"),
      r.getAs[String]("payload"))).sortBy(f => (f.block_number, f.log_index))

    val source = MemoryStream[Frame]
    val mo = WireStream.marketOrdersStream(source.toDF(), pools, tokens)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val query = mo.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        rows ++= batch.collect().map(_.toSeq)
        ()
      }
      .start()
    try {
      val cut = all.length / 2
      source.addData(all.slice(0, cut).toIndexedSeq); query.processAllAvailable()
      source.addData(all.slice(cut, all.length).toIndexedSeq); query.processAllAvailable()
    } finally query.stop()

    val batchRows = graft.operators.WireViews.wireMarketOrders(spark, sfTiny)
      .collect().map(_.toSeq)
    assert(batchRows.nonEmpty)
    // Append mode: each qualifying event emitted exactly once, no dupes/loss
    assert(rows.sortBy(_.toString) == batchRows.toSeq.sortBy(_.toString),
      s"stream emitted ${rows.length} rows, batch has ${batchRows.length}")
  }

  test("wire_market_orders: trader path-parameter overload (endpoint parity)") {
    import graft.operators.WireViews
    // the full (ungated) executed-order stream, as the endpoint would see it
    val full = WireViews.marketOrdersFrom(
      WireEvents.normalize(
        WireFixture.frames(spark, sfTiny),
        WireFixture.pools(spark, sfTiny),
        WireFixture.tokens(spark, sfTiny)),
      lit(true)).cache()
    try {
      // pick a (pool, trader) OUTSIDE the gate's `% 7 = 3` default — the
      // round-5 hard-pin could not serve this key at all
      val r = full.filter(col("trader") % 7 =!= 3)
        .select("pool", "trader").head()
      val (pool, trader) = (r.getString(0), r.getLong(1))
      val got = WireViews.wireMarketOrders(spark, sfTiny, pool, trader)
        .collect().map(_.toSeq)
      val want = full
        .filter(col("pool") === pool && col("trader") === trader)
        .collect().map(_.toSeq)
      assert(got.nonEmpty, s"no rows for ($pool, $trader)")
      assert(got.sortBy(_.toString).toSeq == want.sortBy(_.toString).toSeq,
        s"param overload diverged for ($pool, $trader)")
    } finally { full.unpersist(); () }
  }

  test("dynamic pool registry: mid-stream HiveCoreCreated enriches from that point (== batch fold, no static pools dim)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tokens = WireFixture.tokens(spark, sfTiny)
    def toFrames(df: org.apache.spark.sql.DataFrame): Array[Frame] =
      df.collect().map(r => Frame(
        r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
        r.getAs[java.sql.Timestamp]("block_time"),
        r.getAs[String]("pool"), r.getAs[String]("event_type"),
        r.getAs[String]("payload")))
    val factory = toFrames(WireFixture.factoryFrames(spark, sfTiny))
      .sortBy(f => (f.block_number, f.log_index))
    val orders = toFrames(WireFixture.frames(spark, sfTiny))
      .sortBy(f => (f.block_number, f.log_index))

    // split pools: half register BEFORE any order flow (batch 1), half
    // register only in batch 2 — their batch-1 order frames must be held
    // back and enriched on registration, the hive-factory-listener
    // dynamic-registration scenario (ts:101-115)
    val poolIds = factory.map(_.pool).distinct.sorted
    val late = poolIds.zipWithIndex.collect { case (p, i) if i % 2 == 1 => p }.toSet
    val cut = orders.length / 2

    val source = MemoryStream[Frame]
    val folded = WireStream.wireOrdersStreamDynamic(source.toDF(), tokens)
    val state = scala.collection.mutable.Map.empty[(String, Long), Row]
    val query = folded.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          state((r.getAs[String]("pool"), r.getAs[Long]("order_id"))) = r
        }
      }
      .start()
    try {
      source.addData((factory.filterNot(f => late(f.pool)) ++
        orders.slice(0, cut)).toIndexedSeq)
      query.processAllAvailable()
      source.addData((factory.filter(f => late(f.pool)) ++
        orders.slice(cut, orders.length)).toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    val batchRows = WireOrderFold.wireOrdersCurrent(spark, sfTiny).collect()
    assert(batchRows.nonEmpty && state.nonEmpty)
    val batchMap = batchRows
      .map(r => (r.getAs[String]("pool"), r.getAs[Long]("order_id")) -> r.toSeq).toMap
    val streamMap = state.view.mapValues(_.toSeq).toMap
    assert(streamMap.keySet == batchMap.keySet,
      "dynamic-registry fold emitted a different key set than the batch fold " +
        s"(missing: ${(batchMap.keySet -- streamMap.keySet).take(5)}, " +
        s"extra: ${(streamMap.keySet -- batchMap.keySet).take(5)})")
    val diverged = batchMap.collect { case (k, v) if streamMap(k) != v => k }
    assert(diverged.isEmpty, s"state diverged for keys: ${diverged.take(5)}")
    assert(late.nonEmpty, "fixture produced no late-registered pools")
  }

  test("dynamic registry property: random factory/order interleavings and batch cuts all converge to the batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tokens = WireFixture.tokens(spark, sfTiny)
    def toFrames(df: org.apache.spark.sql.DataFrame): Array[Frame] =
      df.collect().map(r => Frame(
        r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
        r.getAs[java.sql.Timestamp]("block_time"),
        r.getAs[String]("pool"), r.getAs[String]("event_type"),
        r.getAs[String]("payload")))
    val factory = toFrames(WireFixture.factoryFrames(spark, sfTiny))
    val orders = toFrames(WireFixture.frames(spark, sfTiny))
      .sortBy(f => (f.block_number, f.log_index))
    val batchMap = WireOrderFold.wireOrdersCurrent(spark, sfTiny).collect()
      .map(r => (r.getAs[String]("pool"), r.getAs[Long]("order_id")) -> r.toSeq).toMap

    val rnd = new scala.util.Random(42) // deterministic
    for (trial <- 1 to 3) {
      // registrations land at random positions in the order flow (possibly
      // AFTER their pool's first orders → exercises the buffer), and the
      // whole sequence is cut into 2-4 micro-batches at random points.
      // Within-pool order flow stays in (block, log) order — the engine's
      // ingest contract (ST4); only the registry's arrival is adversarial.
      val seq = new scala.collection.mutable.ArrayBuffer[Frame]
      seq ++= orders
      factory.foreach(f => seq.insert(rnd.nextInt(seq.length + 1), f))
      val nCuts = 1 + rnd.nextInt(3)
      val cuts = (Seq(0, seq.length) ++ Seq.fill(nCuts)(rnd.nextInt(seq.length)))
        .distinct.sorted

      val source = MemoryStream[Frame]
      val folded = WireStream.wireOrdersStreamDynamic(source.toDF(), tokens)
      val state = scala.collection.mutable.Map.empty[(String, Long), Seq[Any]]
      val query = folded.writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            state((r.getAs[String]("pool"), r.getAs[Long]("order_id"))) = r.toSeq
          }
        }
        .start()
      try {
        cuts.sliding(2).foreach { case Seq(a, b) =>
          source.addData(seq.slice(a, b).toIndexedSeq)
          query.processAllAvailable()
        }
      } finally query.stop()
      assert(state.toMap == batchMap,
        s"trial $trial (cuts=$cuts) diverged from the batch fold")
    }
  }

  test("dynamic registry composes: latest_price with no static pools dim == batch view") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tokens = WireFixture.tokens(spark, sfTiny)
    def toFrames(df: org.apache.spark.sql.DataFrame): Array[Frame] =
      df.collect().map(r => Frame(
        r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
        r.getAs[java.sql.Timestamp]("block_time"),
        r.getAs[String]("pool"), r.getAs[String]("event_type"),
        r.getAs[String]("payload")))
    val all = (toFrames(WireFixture.factoryFrames(spark, sfTiny)) ++
      toFrames(WireFixture.frames(spark, sfTiny)))
      .sortBy(f => (f.block_number, f.log_index))

    val source = MemoryStream[Frame]
    val lp = WireStream.latestPriceStreamDynamic(source.toDF(), tokens)
    val state = scala.collection.mutable.Map.empty[String, Double]
    val query = lp.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          state(r.getAs[String]("pool")) = r.getAs[Double]("latest_price")
        }
      }
      .start()
    try {
      val cut = all.length / 2
      source.addData(all.slice(0, cut).toIndexedSeq); query.processAllAvailable()
      source.addData(all.slice(cut, all.length).toIndexedSeq); query.processAllAvailable()
    } finally query.stop()

    val batchLp = graft.operators.WireViews.wireLatestPrice(spark, sfTiny)
      .collect().map(r => r.getAs[String]("pool") -> r.getAs[Double]("latest_price"))
      .toMap
    assert(batchLp.nonEmpty)
    assert(state.toMap == batchLp,
      s"dynamic latest_price diverged: ${state.toMap} vs $batchLp")
  }

  test("streaming pool catalog (S3/S4): factory-event fold across micro-batches == batch catalog") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = WireFixture.factoryFrames(spark, sfTiny).collect().map(r => Frame(
      r.getAs[Long]("block_number"), r.getAs[Int]("log_index"),
      r.getAs[java.sql.Timestamp]("block_time"),
      r.getAs[String]("pool"), r.getAs[String]("event_type"),
      r.getAs[String]("payload")))
      .sortBy(f => (f.pool, f.event_type, f.payload))

    val source = MemoryStream[Frame]
    val catalog = graft.operators.WireCatalog.poolCatalog(source.toDF())
    val state = scala.collection.mutable.Map.empty[String, Seq[Any]]
    val query = catalog.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => state(r.getAs[String]("pool")) = r.toSeq)
      }
      .start()
    try {
      // split mid-pool so one pool's catalog row is built incrementally
      // across the batch boundary (QuoteTokenAdded arriving after the
      // HiveCoreCreated was already aggregated)
      val cut = all.length / 2
      source.addData(all.slice(0, cut).toIndexedSeq); query.processAllAvailable()
      source.addData(all.slice(cut, all.length).toIndexedSeq); query.processAllAvailable()
    } finally query.stop()

    val batchRows = graft.operators.WireCatalog.wirePoolCatalog(spark, sfTiny)
      .collect().map(r => r.getAs[String]("pool") -> r.toSeq).toMap
    assert(batchRows.nonEmpty && state.nonEmpty)
    assert(state.toMap == batchRows,
      s"streaming catalog diverged: ${state.toMap.keySet} vs ${batchRows.keySet}")
  }
}
