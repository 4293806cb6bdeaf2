package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{WireEvents, WireFixture}

/** Wire-path materialized views beyond the order fold: the remaining state
  * the reference maintains per pool — `latest_price`
  * (`src/models/order-book.ts:361-368`) and the per-trader market-order
  * history (`src/models/order-book.ts:184-194`) — plus the swap-simulation
  * endpoint composed over the wire-built book. Each is fed by the FULL wire
  * ingest (JSON payload parse → fixed-point scaling → fold), so every
  * materialized view the reference keeps now has an oracle gate through the
  * ingest path, not only over the synthetic columnar table
  * ([[BookViews]] covers that form).
  */
object WireViews {

  /** The normalized wire event stream, pinned: ONE ingest (fixture window
    * passes → JSON render → typed parse → fixed-point scaling) feeds all
    * six wire-path gated views (`wire_orders_current` / `_fidelity`,
    * `wire_latest_price`, `wire_market_orders`, `wire_amount_out` /
    * `_sell`) — exactly how production runs: events are ingested once and
    * every maintained view folds from the same normalized stream, not six
    * re-ingests (guide §2.4 — share the exchange-heavy subtree; the
    * TransientCache discipline the dedup family already uses). The pin is
    * event-row-sized, deterministic on recompute (windows ordered by
    * event_id, stable exprs), and released with the session's transient
    * scope.
    */
  private[operators] def norm(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TransientCache(WireEvents.normalize(
      WireFixture.frames(spark, dir),
      WireFixture.pools(spark, dir),
      WireFixture.tokens(spark, dir)))

  private def edge(c: Column): Column = c.cast("decimal(28,2)").cast("double")

  /** `latest_price` maintained from LatestPrice frames: last-write-wins over
    * the injective (block, log_index) total order — one hash agg, shuffling
    * only (pool, price, order) triples (A4 through the wire path).
    */
  def wireLatestPrice(spark: SparkSession, dir: String): DataFrame =
    latestPriceFrom(norm(spark, dir))

  /** Core of [[wireLatestPrice]], shared verbatim with the streaming lift
    * ([[graft.streaming.WireStream.latestPriceStream]]) — one
    * implementation, no batch/stream drift.
    */
  private[graft] def latestPriceFrom(normalized: DataFrame): DataFrame =
    normalized
      .filter(col("event_type") === "LatestPrice")
      .groupBy("pool")
      .agg(max_by(col("price"), WireOrderFold.evOrder).as("p"))
      .select(col("pool"), edge(col("p")).as("latest_price"))

  /** `GET /pools/:a/:trader/market-orders` through the wire path: the
    * reference appends each MarketOrderExecuted to a per-trader array;
    * relationally it is a filtered projection of the parsed stream (A6).
    * The endpoint takes pool + trader as path parameters
    * (order-book-controller.ts:26-42) — mirrored here as a point-predicate
    * overload, with a `where`-Column form underneath (the `userOrders` /
    * `orderLookup` pattern, [[BookQueries]]). The CORRECTNESS gate keeps
    * the fixture-selectivity default (`trader % 7 = 3` — many traders, so
    * the oracle checks more than one key) unchanged.
    */
  def wireMarketOrders(spark: SparkSession, dir: String,
                       pool: String, trader: Long): DataFrame =
    marketOrdersFrom(norm(spark, dir),
      col("pool") === pool && col("trader").cast("long") === trader)

  def wireMarketOrders(spark: SparkSession, dir: String): DataFrame =
    marketOrdersFrom(norm(spark, dir))

  /** Core of [[wireMarketOrders]], shared with the streaming lift
    * ([[graft.streaming.WireStream.marketOrdersStream]]): a stateless
    * filtered projection, so the stream form is pure Append mode.
    */
  private[graft] def marketOrdersFrom(
      normalized: DataFrame,
      where: Column = col("trader").cast("long") % 7 === 3): DataFrame =
    normalized
      .filter(col("event_type") === "MarketOrderExecuted" && where)
      .select(
        col("pool"), col("trader").cast("long").as("trader"),
        col("block_number"), col("log_index"),
        col("side"),
        edge(col("amount")).as("amount"),
        edge(col("price")).as("price"),
        edge(col("filled")).as("filled_amount"),
        unix_micros(col("block_time")).as("executed_at"))

  /** `get-amount-out` over the WIRE-built book: ingest → order_id fold →
    * price levels → greedy cumulative swap scan (order-book.ts:262-333) —
    * the reference's full read path (§3.3) chained under ONE oracle. The
    * order_id fold keeps every order (the reference's native key space), so
    * this book is denser than the synthetic latest-per-(pool, trader) one —
    * a genuinely distinct gate, not a re-run of `amount_out_buy`. Volume
    * stays exact DECIMAL from fold to scan ([[WireOrderFold.ordersByOrderIdExact]]).
    */
  /** The wire-built price-level book shared by both swap directions:
    * fold → levels runs once, pinned (level rows are (pool, side, price)-
    * bounded — tiny), and `wire_amount_out` / `wire_amount_out_sell` scan
    * the same book exactly as the reference's two directions read one
    * maintained order book (order-book.ts:262-333).
    */
  private def wireLevels(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TransientCache(
      BookViews.priceLevels(WireOrderFold.ordersByOrderIdExact(norm(spark, dir))))

  def wireAmountOutBuy(spark: SparkSession, dir: String,
                       amountIn: BigDecimal = BigDecimal("50000.00")): DataFrame =
    BookQueries.amountOutBuyFrom(
      WireFixture.pools(spark, dir),
      wireLevels(spark, dir), amountIn, maxLevels = 100)

  /** SELL direction of [[wireAmountOutBuy]]: the bid-side cumulative volume
    * scan over the same wire-built book — completes W4 parity through the
    * ingest path in both trade directions.
    */
  def wireAmountOutSell(spark: SparkSession, dir: String,
                        amountIn: BigDecimal = BigDecimal("500.00")): DataFrame =
    BookQueries.amountOutSellFrom(
      WireFixture.pools(spark, dir),
      wireLevels(spark, dir), amountIn, maxLevels = 100)
}
