package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import graft.sources.WireEvents

/** M1/M2: ABI-shaped wire frames → parsed payloads → normalized stream,
  * over the FIXTURES.md §A lifecycle matrix.
  */
class WireEventsSpec extends SparkSpec {

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")

  private def frame(block: Long, log: Int, pool: String, tpe: String, payload: String) =
    Row(block, log, ts, pool, tpe, payload)

  private lazy val fixtures = Seq(
    // pool discovery
    frame(1, 0, "0xpool1", "HiveCoreCreated",
      """{"hiveCoreAddress":"0xpool1","baseToken":"0xbase","quoteToken":"0xquote"}"""),
    // create → partial fill → update → cancel, with raw 1e18 fixed-point
    frame(2, 0, "0xpool1", "OrderCreated",
      """{"trader":"0xt1","orderId":7,"price":"2500000000000000000","amount":"10000000000000000000","orderType":0}"""),
    frame(2, 1, "0xpool1", "OrderFilled",
      """{"orderId":7,"trader":"0xt1","amount":"4000000000000000000","filled":"4000000000000000000","remaining":"6000000000000000000","orderType":0}"""),
    frame(3, 0, "0xpool1", "OrderUpdated",
      """{"orderId":7,"trader":"0xt1","newAmount":"8000000000000000000"}"""),
    frame(4, 0, "0xpool1", "OrderCancelled", """{"orderId":7,"trader":"0xt1"}"""),
    // price tick + market order (SELL side decode, 1)
    frame(5, 0, "0xpool1", "LatestPrice", """{"price":"2600000000000000000"}"""),
    frame(5, 1, "0xpool1", "MarketOrderExecuted",
      """{"trader":"0xt2","amount":"1000000000000000000","price":"2600000000000000000","orderType":1,"filledAmount":"1000000000000000000"}"""))

  private lazy val wire = spark.createDataFrame(
    spark.sparkContext.parallelize(fixtures), WireEvents.envelopeSchema)

  private lazy val pools = {
    import spark.implicits._
    Seq(("0xpool1", "0xbase", "0xquote")).toDF("pool", "base_token", "quote_token")
  }
  private lazy val tokens = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(Row("0xbase", "Base", "BASE", 18))),
    WireEvents.tokenSchema)

  test("parse: each frame yields exactly its own typed payload") {
    val parsed = WireEvents.parse(wire).collect()
    assert(parsed.length == 7)
    val created = parsed.find(_.getAs[String]("event_type") == "OrderCreated").get
    val p = created.getAs[Row]("p_OrderCreated")
    assert(p.getAs[String]("trader") == "0xt1")
    assert(p.getAs[java.math.BigDecimal]("price").longValueExact() == 2500000000000000000L)
    assert(created.isNullAt(created.fieldIndex("p_OrderFilled")))
  }

  test("normalize: decimal scaling, enum decode, (block, log_index) order") {
    val norm = WireEvents.normalize(wire, pools, tokens).collect()
    assert(norm.length == 7)
    // (block, log_index) total order — the ST4 divergence made concrete
    val keys = norm.map(r => (r.getAs[Long]("block_number"), r.getAs[Int]("log_index")))
    assert(keys.toSeq == keys.toSeq.sorted)
    val created = norm.find(_.getAs[String]("event_type") == "OrderCreated").get
    assert(created.getAs[java.math.BigDecimal]("price").doubleValue() == 2.5)
    assert(created.getAs[java.math.BigDecimal]("amount").doubleValue() == 10.0)
    assert(created.getAs[String]("side") == "BUY")
    assert(created.getAs[Long]("order_id") == 7L)
    val mkt = norm.find(_.getAs[String]("event_type") == "MarketOrderExecuted").get
    assert(mkt.getAs[String]("side") == "SELL")
    assert(mkt.getAs[String]("trader") == "0xt2")
    val cancel = norm.find(_.getAs[String]("event_type") == "OrderCancelled").get
    assert(cancel.isNullAt(cancel.fieldIndex("price")))
  }

  test("same-block Created→Filled sequencing is preserved (not per-type batches)") {
    val norm = WireEvents.normalize(wire, pools, tokens).collect()
    val block2 = norm.filter(_.getAs[Long]("block_number") == 2L)
    assert(block2.map(_.getAs[String]("event_type")).toSeq ==
      Seq("OrderCreated", "OrderFilled"),
      "intra-block log order must win over event-type order (SURVEY §7.4)")
  }
}
