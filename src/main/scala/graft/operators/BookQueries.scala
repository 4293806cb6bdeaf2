package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's query surface (SURVEY §2.8 / §7.2 M5), each REST endpoint
  * re-expressed as one declarative DataFrame query over the derived views.
  *
  * Output columns are cast DECIMAL → DOUBLE at this serving edge only; all
  * upstream arithmetic is exact, so the doubles are bit-identical to the
  * DuckDB oracle's.
  */
object BookQueries {

  /** Materialized current-state view, computed once per (session, dir).
    *
    * This mirrors the reference's architecture faithfully: it maintains the
    * order state *continuously* and every read query consumes the
    * materialized view (`src/models/order-book.ts` reads Redis state, never
    * replays events). Re-deriving the fold per query would be the
    * unfaithful — and at 100 TB, catastrophic — design; in production this
    * view is the streaming fold's state store or its Delta snapshot.
    */
  // bounded + releasable like every other long-lived view memo (the old
  // TrieMap was unbounded and had no unpersist hook, so the fold's
  // persisted state could never be released for the session's life)
  private val viewCache =
    new graft.functions.BoundedMemo[(SparkSession, String), (DataFrame, DataFrame)](
      4, _._2.unpersist())

  private def views(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    viewCache.getOrBuild((spark, dir)) {
      val ev = OrderEvents(spark, dir)
      (ev, OrderState.ordersCurrent(ev).persist())
    }

  /** Release the memoized order-book fold views (cache-hygiene hook). */
  def invalidateViewCache(): Unit = viewCache.invalidate()

  /** `GET /pools/:a/orderbook?depth=k` (order-book-controller.ts:62-76) —
    * two-sided top-k price levels with per-level volume (W1/W2/W3 + A2).
    * The reference sorts the level map and slices before hydrating orders
    * (order-book.ts:207-213,237-243) — a hand-rolled limit pushdown; here a
    * rank-over-window per (pool, side), which AQE/Catalyst executes as a
    * partial top-k under the shuffle. BUY side descends, SELL ascends
    * (order-book.ts:207-208 vs :237-238): one window keyed on a side-signed
    * sort expression, so both sides rank in a single pass.
    */
  def orderbook(spark: SparkSession, dir: String, depth: Int = 10): DataFrame = {
    val (ev, oc) = views(spark, dir)
    val levels = BookViews.priceLevels(oc)
    val w = Window.partitionBy("pool", "side")
      .orderBy(when(col("side") === "BUY", -col("price_lvl")).otherwise(col("price_lvl")))
    levels
      .withColumn("level_rank", row_number().over(w))
      .filter(col("level_rank") <= depth)
      .select(
        col("pool"), col("side"), col("level_rank").cast("long").as("level_rank"),
        col("price_lvl"),
        col("volume").cast("double").as("volume"), col("n_orders"))
  }

  /** `GET /pools/:a/orderbook` nested form (A7): per-(pool, side) order-book
    * snapshot with the top-k levels' aggregates rolled up — volume-weighted,
    * as the reference's OrderBook response assembles (order-book.ts:335-349).
    * Kept relational (flat) for the oracle; the nested struct assembly is
    * `collect_list(struct(...))` at a true serving edge.
    */
  def orderbookSummary(spark: SparkSession, dir: String, depth: Int = 10): DataFrame =
    orderbook(spark, dir, depth)
      .groupBy("pool", "side")
      .agg(
        count(lit(1)).as("n_levels"),
        sum(col("volume").cast("decimal(28,6)")).cast("double").as("total_volume"),
        min("price_lvl").as("min_price"),
        max("price_lvl").as("max_price"))

  /** `GET /pools/:a/get-amount-out?orderType=BUY&amount=x` (W4,
    * order-book.ts:262-333) — the swap simulation. The reference walks sorted
    * ask levels greedily, breaking when the input is spent (:285-307). The
    * set-based form: running cost totals over a cumulative window, then
    * marginal-fill arithmetic per level — no iteration, scans ≤ |levels| rows.
    *
    * BUY spends `amountIn` quote against SELL levels ascending
    * (order-book.ts:267-270, 291-298). The single division (partial fill of
    * the marginal level, :293) is double math rounded straight back to
    * DECIMAL(18,6) so the final aggregation stays exact.
    */
  def amountOutBuy(spark: SparkSession, dir: String,
                   amountIn: BigDecimal = BigDecimal("50000.00"),
                   maxLevels: Int = 100): DataFrame = {
    val (ev, oc) = views(spark, dir)
    amountOutBuyFrom(BookViews.pools(ev), BookViews.priceLevels(oc),
      amountIn, maxLevels)
  }

  /** The swap-scan core over ANY price-level view — shared by the
    * synthetic-book gate above and the wire-built book
    * ([[WireViews.wireAmountOutBuy]]). `pools` is the pool universe (for the
    * empty-book branch); `levels` must carry (pool, side, price_lvl, volume)
    * with volume in exact DECIMAL.
    */
  private[graft] def amountOutBuyFrom(pools: DataFrame, levels: DataFrame,
                                      amountIn: BigDecimal,
                                      maxLevels: Int): DataFrame = {
    val asks = levels.filter(col("side") === "SELL")
    val rankW = Window.partitionBy("pool").orderBy("price_lvl")
    val cumW = rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val in = lit(amountIn.underlying).cast("decimal(28,2)")
    // the reference silently considers at most `limit=100` levels
    // (order-book.ts:202,232,269-270) — replicated as maxLevels
    val sim = asks
      .withColumn("lvl_rank", row_number().over(rankW))
      .filter(col("lvl_rank") <= maxLevels)
      .withColumn("cost", col("volume") * col("price_lvl"))
      .withColumn("cum_cost", sum(col("cost")).over(cumW))
      .withColumn("prev_cost", col("cum_cost") - col("cost"))
      .withColumn("base_taken",
        when(col("cum_cost") <= in, col("volume").cast("decimal(18,6)"))
          .when(col("prev_cost") < in,
            ((in - col("prev_cost")).cast("double") / col("price_lvl"))
              .cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)")))
    val agg = sim.groupBy("pool").agg(
      sum(col("base_taken")).cast("double").as("amount_out"),
      sum(when(col("base_taken") > 0, 1).otherwise(0)).as("levels_hit"),
      max(when(col("base_taken") > 0, col("price_lvl"))).as("worst_price"),
      (max(col("cum_cost")) < in).as("insufficient_liquidity"),
      // hitPrices[] (types.ts:49-54, filled at order-book.ts:295-306): the
      // price levels consumed, in hit order (ascending for a buy). Emitted
      // as a canonical comma-joined string — a scalar the cross-engine hash
      // treats identically, where list hashing is engine-defined.
      expr("array_join(transform(sort_array(collect_list(" +
        "CASE WHEN base_taken > 0 THEN price_lvl END)), x -> CAST(x AS STRING)), ',')")
        .as("hit_prices"))
    // pools with an EMPTY opposite side still answer: 0 out, insufficient —
    // the reference's empty-book branch (order-book.ts:272-279)
    pools.select(col("pool"))
      .join(agg, Seq("pool"), "left")
      .select(col("pool"),
        coalesce(col("amount_out"), lit(0.0)).as("amount_out"),
        coalesce(col("levels_hit"), lit(0L)).as("levels_hit"),
        col("worst_price"),
        coalesce(col("insufficient_liquidity"), lit(true)).as("insufficient_liquidity"),
        in.cast("double").as("amount_in"),
        coalesce(col("hit_prices"), lit("")).as("hit_prices"))
  }

  /** SELL direction: sell `amountIn` base into BUY levels descending
    * (order-book.ts:300-304) — min(volume, remaining) per level, no division.
    */
  def amountOutSell(spark: SparkSession, dir: String,
                    amountIn: BigDecimal = BigDecimal("500.00"),
                    maxLevels: Int = 100): DataFrame = {
    val (ev, oc) = views(spark, dir)
    amountOutSellFrom(BookViews.pools(ev), BookViews.priceLevels(oc),
      amountIn, maxLevels)
  }

  /** SELL-direction swap-scan core; see [[amountOutBuyFrom]]. */
  private[graft] def amountOutSellFrom(pools: DataFrame, levels: DataFrame,
                                       amountIn: BigDecimal,
                                       maxLevels: Int): DataFrame = {
    val bids = levels.filter(col("side") === "BUY")
    val rankW = Window.partitionBy("pool").orderBy(col("price_lvl").desc)
    val cumW = rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val in = lit(amountIn.underlying).cast("decimal(28,2)")
    val sim = bids
      .withColumn("lvl_rank", row_number().over(rankW))
      .filter(col("lvl_rank") <= maxLevels)
      .withColumn("cum_vol", sum(col("volume")).over(cumW))
      .withColumn("prev_vol", col("cum_vol") - col("volume"))
      .withColumn("base_sold",
        when(col("cum_vol") <= in, col("volume"))
          .when(col("prev_vol") < in, in - col("prev_vol"))
          .otherwise(lit(0).cast("decimal(18,2)")))
      .withColumn("quote_out", col("base_sold") * col("price_lvl"))
    val agg = sim.groupBy("pool").agg(
      sum(col("quote_out")).cast("double").as("amount_out"),
      sum(when(col("base_sold") > 0, 1).otherwise(0)).as("levels_hit"),
      min(when(col("base_sold") > 0, col("price_lvl"))).as("worst_price"),
      (max(col("cum_vol")) < in).as("insufficient_liquidity"),
      // hitPrices[] in hit order — DESCENDING for a sell (order-book.ts:300-306)
      expr("array_join(transform(sort_array(collect_list(" +
        "CASE WHEN base_sold > 0 THEN price_lvl END), false), x -> CAST(x AS STRING)), ',')")
        .as("hit_prices"))
    // empty-book branch (order-book.ts:272-279), as in amountOutBuy
    pools.select(col("pool"))
      .join(agg, Seq("pool"), "left")
      .select(col("pool"),
        coalesce(col("amount_out"), lit(0.0)).as("amount_out"),
        coalesce(col("levels_hit"), lit(0L)).as("levels_hit"),
        col("worst_price"),
        coalesce(col("insufficient_liquidity"), lit(true)).as("insufficient_liquidity"),
        in.cast("double").as("amount_in"),
        coalesce(col("hit_prices"), lit("")).as("hit_prices"))
  }

  /** `GET /pools/:a/:trader/orders` (order-book-controller.ts:44-60) — a
    * trader's orders *including inactive* (the reference applies no active
    * filter, order-book.ts:351-359 — replicated; it's semantics, SURVEY §7.4).
    * The trader secondary index (S8/J2) is just a pushed-down filter here.
    */
  def userOrders(spark: SparkSession, dir: String, pool: String, trader: Long): DataFrame =
    userOrders(spark, dir, col("pool") === pool && col("trader") === trader)

  def userOrders(spark: SparkSession, dir: String,
                 where: org.apache.spark.sql.Column = col("trader") % 7 === 3): DataFrame = {
    val (_, oc) = views(spark, dir)
    oc.filter(where)
      .select(
        col("pool"), col("trader"), col("order_id"), col("side"),
        col("price").cast("double").as("price"),
        col("amount").cast("double").as("amount"),
        col("filled").cast("double").as("filled"),
        col("remaining").cast("double").as("remaining"),
        col("active"))
  }

  /** `GET /pools/:a/orders/:id` (order-book-controller.ts:78-97) — point
    * lookup of one order; S6 KV `GET` becomes a pushed-down predicate.
    */
  def orderLookup(spark: SparkSession, dir: String, pool: String, orderId: Long): DataFrame =
    orderLookup(spark, dir, col("pool") === pool && col("order_id") === orderId)

  def orderLookup(spark: SparkSession, dir: String,
                  where: org.apache.spark.sql.Column =
                    col("pool") === "click" && col("trader") === 42): DataFrame = {
    val (_, oc) = views(spark, dir)
    oc.filter(where)
      .select(
        col("pool"), col("trader"), col("order_id"), col("side"),
        col("price").cast("double").as("price"),
        col("amount").cast("double").as("amount"),
        col("filled").cast("double").as("filled"),
        col("remaining").cast("double").as("remaining"),
        col("active"))
  }

  /** `GET /pools/:a/:trader/market-orders` (order-book-controller.ts:26-42) —
    * trade history per trader (A6).
    */
  def userMarketOrders(spark: SparkSession, dir: String): DataFrame =
    userMarketOrders(spark, dir, col("trader") % 7 === 3)

  /** Path-parameter overload (the endpoint's actual shape). */
  def userMarketOrders(spark: SparkSession, dir: String, pool: String,
                       trader: Long): DataFrame =
    userMarketOrders(spark, dir, col("pool") === pool && col("trader") === trader)

  def userMarketOrders(spark: SparkSession, dir: String,
                       where: org.apache.spark.sql.Column): DataFrame = {
    val (ev, _) = views(spark, dir)
    BookViews.marketOrders(ev)
      .filter(where)
      .select(
        col("pool"), col("trader"), col("event_id"), col("side"),
        col("amount").cast("double").as("amount"),
        col("price").cast("double").as("price"),
        col("filled_amount").cast("double").as("filled_amount"))
  }

  /** `GET /api/pools` + `GET /api/pools/:a` (pool-controller.ts:6-28) — pool
    * catalog enriched with latest price (J3 broadcast-join of the small dim;
    * `broadcast()` pins what AQE would choose anyway at this cardinality).
    */
  def poolInfo(spark: SparkSession, dir: String): DataFrame = {
    val (ev, _) = views(spark, dir)
    BookViews.pools(ev)
      .join(broadcast(BookViews.latestPrice(ev)), Seq("pool"), "left")
      .select(
        col("pool"), col("base_token"), col("quote_token"),
        col("created_at"), col("n_events"),
        col("latest_price").cast("double").as("latest_price"))
  }

  /** Full current-order-state dump (A5) — the fold itself, exposed for the
    * oracle gate.
    */
  def ordersCurrentQ(spark: SparkSession, dir: String): DataFrame = {
    val (_, oc) = views(spark, dir)
    oc.select(
      col("pool"), col("trader"), col("order_id"), col("side"),
      col("price").cast("double").as("price"),
      col("amount").cast("double").as("amount"),
      col("filled").cast("double").as("filled"),
      col("remaining").cast("double").as("remaining"),
      col("active"))
  }

  /** Price-level view (A1/A2) exposed for the oracle gate. */
  def priceLevelsQ(spark: SparkSession, dir: String): DataFrame = {
    val (_, oc) = views(spark, dir)
    BookViews.priceLevels(oc)
      .select(col("pool"), col("side"), col("price_lvl"),
        col("volume").cast("double").as("volume"), col("n_orders"))
  }

  /** Latest-price view (A4) exposed for the oracle gate. */
  def latestPriceQ(spark: SparkSession, dir: String): DataFrame = {
    val (ev, _) = views(spark, dir)
    BookViews.latestPrice(ev)
      .select(col("pool"), col("latest_price").cast("double").as("latest_price"))
  }
}
