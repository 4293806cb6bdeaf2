package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order-lifecycle fold keyed by `order_id` — the reference's *native* key
  * (`src/models/order-book.ts:80-182`: every handler does
  * `orderBook.orders[orderId]`). Unlike [[OrderState]] (which keys on
  * (pool, trader) because the synthetic `events` table carries no order ids),
  * this fold consumes the wire-format stream where OrderFilled /
  * OrderCancelled / OrderUpdated each carry their `orderId`
  * (hive-core.json:525-648) — so NO window segmentation is needed: the fold
  * is ONE hash aggregation, shuffling once on (pool, order_id).
  *
  * That is the 100 TB shape: with the key on every event, the plan is
  * scan → partial agg → exchange(pool, order_id) → final agg. The
  * [[OrderState]] window variant exists only for id-less synthetic data.
  *
  * Two modes (order-book.ts:146-167):
  *  - derived  (default): `filled` = Σ OrderFilled.amount — re-derived by the
  *    engine, the trust-nothing mode.
  *  - fidelity: `filled`/`remaining` taken from the LAST OrderFilled event's
  *    authoritative payload fields, exactly as the reference trusts the
  *    contract's own accounting. Equivalent on clean streams (see
  *    WireFoldSpec); divergent if events carry corrections.
  */
object WireOrderFold {

  private val dec0_38_18 = lit(0).cast("decimal(38,18)")

  /** Injective total event order within a block stream: (block_number,
    * log_index) encoded as block·2^32 + log_index. EVM blocks routinely
    * carry hundreds of logs (hive-listener.ts:153-175 scans whole block
    * ranges), so any small-base encode (block·10 + log) collides across
    * blocks and can mis-pick the "last" update. A struct ordering key would
    * be injective too, but a struct in the max_by buffer demotes the agg to
    * SortAggregate (see fixed-width note in [[ordersByOrderIdExact]]) — the
    * shifted LONG keeps HashAggregate. log_index < 2^32 always.
    */
  private[graft] def evOrder: org.apache.spark.sql.Column =
    shiftleft(col("block_number"), 32) + col("log_index")

  /** Normalized wire events (see [[WireEvents.normalize]]) → one row per
    * (pool, order_id), money columns as exact DECIMAL(28,2) — the form
    * downstream views (price levels, swap scan) consume so their sums stay
    * order-independent. [[ordersByOrderId]] is the serving-edge DOUBLE cast.
    * All money arithmetic DECIMAL; scale reduced to 2 here (values are exact
    * 2-dp) so the DOUBLE serving cast is identical in Spark and DuckDB
    * regardless of internal scale.
    */
  def ordersByOrderIdExact(norm: DataFrame, fidelity: Boolean = false): DataFrame = {
    // HashAggregate (not the SortAggregate fallback) requires every agg
    // BUFFER field to be fixed-width (UnsafeRow.isMutable): no strings.
    // `trader` rides on every order event payload (hive-core.json:525-648),
    // so it is functionally dependent on (pool, order_id) and moves into the
    // GROUP BY key — hash-map keys may be variable-width. `side` exists only
    // on OrderCreated, so it folds as an int code and decodes at the edge.
    val folded = norm
      .filter(col("order_id").isNotNull)
      .withColumn("side_code",
        when(col("side") === "BUY", 0).when(col("side") === "SELL", 1))
      .groupBy("pool", "order_id", "trader")
      .agg(
        max(when(col("event_type") === "OrderCreated", col("side_code"))).as("side_code"),
        max(when(col("event_type") === "OrderCreated", col("price"))).as("price"),
        max(when(col("event_type") === "OrderCreated", col("amount"))).as("amount0"),
        sum(when(col("event_type") === "OrderFilled", col("amount"))
          .otherwise(dec0_38_18)).as("filled_sum"),
        max_by(when(col("event_type") === "OrderFilled", col("filled")),
          when(col("event_type") === "OrderFilled", evOrder).otherwise(lit(-1L)))
          .as("filled_auth"),
        max(when(col("event_type") === "OrderCancelled", 1).otherwise(0)).as("cancelled"),
        max_by(when(col("event_type") === "OrderUpdated", col("amount")),
          when(col("event_type") === "OrderUpdated", evOrder).otherwise(lit(-1L)))
          .as("upd_amount"),
        max(when(col("event_type") === "OrderCreated", col("block_time"))).as("created_at"))

    val amount = coalesce(col("upd_amount"), col("amount0"))
    // fidelity trusts the event's running `filled` total; `remaining` is
    // re-derived from the CURRENT amount either way, because an OrderUpdated
    // after the last fill supersedes the fill event's remaining snapshot —
    // exactly the reference's recompute on update (order-book.ts:104-117)
    val filled =
      if (fidelity) coalesce(col("filled_auth"), dec0_38_18)
      else col("filled_sum")
    val remaining =
      when(amount > filled, amount - filled).otherwise(dec0_38_18)

    // scale-2 reduction here, ahead of any DOUBLE edge cast: at scale 18 a
    // sum's unscaled int128 can exceed 2^53 and DuckDB's decimal→double
    // pathway (int→double, then ÷10^scale) rounds differently from
    // BigDecimal's correctly-rounded toDouble; every value is exact at 2 dp.
    def exact(c: org.apache.spark.sql.Column) = c.cast("decimal(28,2)")
    folded.select(
      col("pool"), col("order_id"),
      col("trader").cast("long").as("trader"),
      when(col("side_code") === 0, "BUY").when(col("side_code") === 1, "SELL")
        .as("side"),
      exact(col("price")).as("price"),
      exact(amount).as("amount"),
      exact(filled).as("filled"),
      exact(remaining).as("remaining"),
      (col("cancelled") === 0 && remaining > dec0_38_18).as("active"),
      col("created_at"))
  }

  /** Serving-edge form: exact fold with money columns cast to DOUBLE and
    * created_at to epoch-micros (the oracle-gated shape).
    */
  def ordersByOrderId(norm: DataFrame, fidelity: Boolean = false): DataFrame =
    ordersByOrderIdExact(norm, fidelity).select(
      col("pool"), col("order_id"), col("trader"), col("side"),
      col("price").cast("double").as("price"),
      col("amount").cast("double").as("amount"),
      col("filled").cast("double").as("filled"),
      col("remaining").cast("double").as("remaining"),
      col("active"),
      unix_micros(col("created_at")).as("created_at"))

  /** The gated query: fixture frames → full wire ingest → order_id fold.
    * The normalized stream comes from [[WireViews.norm]] — the ONE pinned
    * ingest every wire-path view folds from (see its scaladoc).
    */
  def wireOrdersCurrent(spark: SparkSession, dir: String,
                        fidelity: Boolean = false): DataFrame =
    ordersByOrderId(WireViews.norm(spark, dir), fidelity)
}
