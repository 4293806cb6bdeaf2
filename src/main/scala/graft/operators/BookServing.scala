package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving-edge assembly of the nested OrderBook response (SURVEY §2.4 A7 +
  * §2.1 S12): the reference's REST shape
  * `OrderBook{baseToken, quoteToken, latestPrice, bids: PriceLevel[], asks:
  * PriceLevel[]}` with each `PriceLevel{price, orders[], totalVolume}`
  * (`src/models/types.ts:21-33`, assembled at
  * `src/models/order-book.ts:335-349`).
  *
  * The relational core stays flat (that is what the oracle checks); nesting
  * happens here, at the edge, in one pass:
  *   orders_current → collect_list(struct) per level   (J1's hydration join,
  *   inverted: instead of fanning out one GET per order id per level,
  *   order-book.ts:209-213, the aggregation carries the orders with it)
  *   → top-k levels per side → sort_array → one struct row per pool.
  *
  * Per-level `orders` arrays are bounded by orders-per-price-level (skew
  * note: SURVEY §7.4 — a popular price level caps at the trader count per
  * pool; at 100 TB the depth-k truncation happens BEFORE collect_list via
  * the rank filter, so unbounded levels never materialize).
  */
object BookServing {

  /** One nested row per pool: the full two-sided book at `depth`. */
  def orderBook(spark: SparkSession, dir: String, depth: Int = 10): DataFrame = {
    val ev = OrderEvents(spark, dir)
    val oc = OrderState.ordersCurrent(ev)

    // price level with its member orders (A7's PriceLevel{price, orders[], totalVolume})
    val levels = oc.filter(col("active"))
      .withColumn("price_lvl", floor(col("price")).cast("long"))
      .groupBy("pool", "side", "price_lvl")
      .agg(
        sum(col("remaining")).cast("double").as("total_volume"),
        sort_array(collect_list(struct(
          col("order_id"), col("trader"),
          col("price").cast("double").as("price"),
          col("remaining").cast("double").as("remaining")))).as("orders"))

    // top-k before nesting anything further (rank filter = limit pushdown)
    val w = Window.partitionBy("pool", "side")
      .orderBy(when(col("side") === "BUY", -col("price_lvl")).otherwise(col("price_lvl")))
    val topk = levels
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= depth)

    // side arrays, bids desc / asks asc (order-book.ts:207-208, :237-238)
    val sides = topk
      .groupBy("pool")
      .agg(
        sort_array(collect_list(when(col("side") === "BUY",
          struct((-col("price_lvl")).as("sort_key"), col("price_lvl").as("price"),
            col("total_volume"), col("orders")))), asc = true).as("bids_raw"),
        sort_array(collect_list(when(col("side") === "SELL",
          struct(col("price_lvl").as("sort_key"), col("price_lvl").as("price"),
            col("total_volume"), col("orders")))), asc = true).as("asks_raw"))
      .select(col("pool"),
        expr("transform(bids_raw, x -> struct(x.price as price, x.total_volume as total_volume, x.orders as orders))").as("bids"),
        expr("transform(asks_raw, x -> struct(x.price as price, x.total_volume as total_volume, x.orders as orders))").as("asks"))

    sides
      .join(broadcast(BookViews.pools(ev)), Seq("pool"), "left")
      .join(broadcast(BookViews.latestPrice(ev)), Seq("pool"), "left")
      .select(col("pool"), col("base_token"), col("quote_token"),
        col("latest_price").cast("double").as("latest_price"),
        col("bids"), col("asks"))
  }

  /** S12: the REST JSON rendering — one JSON document per pool. */
  def orderBookJson(spark: SparkSession, dir: String, depth: Int = 10): DataFrame =
    orderBook(spark, dir, depth)
      .select(col("pool"), to_json(struct(
        col("base_token"), col("quote_token"), col("latest_price"),
        col("bids"), col("asks"))).as("book_json"))
}
