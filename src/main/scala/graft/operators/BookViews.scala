package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derived materialized views over the folded order state (SURVEY §7.2 M4).
  *
  * The reference maintains each of these incrementally in Redis; here each is
  * a declarative aggregation Catalyst plans as a single hash-agg (partial →
  * shuffle on the group key → final). All volume math stays DECIMAL until the
  * serving edge, so partial-aggregation order can never change a result.
  */
object BookViews {

  /** Price-level aggregate view (A1 + A2): the reference's `price_levels` map
    * (`src/models/order-book.ts:55-73,94-144`) + per-level volume sum
    * (`:218-224,248-254`). Only *active* orders contribute — the reference
    * encodes liveness by deleting ids from the map (order-book.ts:163-165,179);
    * we state it as an explicit filter (SURVEY §2.2 P7), which Catalyst pushes
    * below the shuffle. Prices are bucketed to integer levels.
    */
  def priceLevels(ordersCurrent: DataFrame): DataFrame =
    ordersCurrent
      .filter(col("active"))
      .withColumn("price_lvl", floor(col("price")).cast("long"))
      .groupBy("pool", "side", "price_lvl")
      .agg(
        sum(col("remaining")).as("volume"),
        count(lit(1)).as("n_orders"))

  /** Last-value aggregate (A4): `latest_price` per pool, last-write-wins over
    * LatestPrice events (`src/models/order-book.ts:361-368`, fed at
    * `src/services/hive-listener.ts:198-201,301-309`). `max_by` over the total
    * event order replaces the reference's overwrite-on-arrival.
    */
  def latestPrice(orderEvents: DataFrame): DataFrame =
    orderEvents
      .filter(col("action") === 8)
      .groupBy("pool")
      .agg(max_by(col("val"), col("event_id")).as("latest_price"))

  /** Append-only market-order fact view (A6): the reference pushes each
    * MarketOrderExecuted onto a per-trader JSON array
    * (`src/models/order-book.ts:184-194`); relationally it is just a filtered
    * projection of the event log. Side derives from block parity (the
    * reference decodes it from the event payload, hive-listener.ts:311-335).
    */
  def marketOrders(orderEvents: DataFrame): DataFrame =
    orderEvents
      .filter(col("action") === 9)
      .select(
        col("pool"), col("trader"), col("event_id"),
        col("block_time"),
        when(col("block_number") % 2 === 0, "BUY").otherwise("SELL").as("side"),
        col("val").as("amount"),
        col("val").as("price"),
        col("val").as("filled_amount"))

  /** Pool dimension (S4/S5/S7): the reference bootstraps a pool catalog via
    * factory enumeration + per-pool RPC metadata fetches
    * (`src/services/hive-factory-listener.ts:52-65`,
    * `src/services/hive-listener.ts:54-111`); here the dimension is derived
    * once from the stream and broadcast-joined wherever needed (J3).
    */
  def pools(orderEvents: DataFrame): DataFrame =
    orderEvents
      .groupBy("pool")
      .agg(
        min(col("block_time")).as("created_at"),
        count(lit(1)).as("n_events"))
      .select(
        col("pool"),
        concat(lit("base_"), col("pool")).as("base_token"),
        concat(lit("quote_"), col("pool")).as("quote_token"),
        col("created_at"), col("n_events"))
}
