package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-lifecycle state fold (SURVEY §2.4 A5 / §7.2 M3) — the heart of the
  * reference: Created → (Filled | Updated | Cancelled)* collapsed to current
  * state per order (`src/models/order-book.ts:80-182`, dispatched at
  * `src/services/hive-listener.ts:178-206`).
  *
  * The reference maintains this fold imperatively, one Redis read-modify-write
  * per event. Spark-first, the batch reconstruction is pure relational algebra:
  *
  *   1. running `max` window assigns every lifecycle event to its governing
  *      Create (last-create-wins segmentation),
  *   2. one hash aggregation per (pool, trader, create_id) folds the segment:
  *      `filled = Σ fill amounts`, `amount = last OrderUpdated ?? created
  *      amount` (order-book.ts:104-117), `cancelled = ∃ cancel`
  *      (order-book.ts:170-182),
  *   3. `row_number` keeps only the latest Create per key,
  *   4. derived columns: `remaining = max(amount − filled, 0)`,
  *      `active = ¬cancelled ∧ remaining > 0` (full-fill deactivation,
  *      order-book.ts:163-165).
  *
  * Events are ordered by `event_id` ≙ (block, log_index) — a deliberate
  * divergence from the reference, which processes event *types* in a fixed
  * order per batch (hive-listener.ts:178-206) and can mis-sequence same-block
  * Created→Filled (SURVEY §7.4).
  *
  * Scale: exactly one shuffle on (pool, trader) serves both the window and the
  * aggregation (Catalyst reuses the hash partitioning); all money arithmetic is
  * DECIMAL (exact, order-independent — safe under any partial-aggregation
  * schedule). At 100 TB this runs as a standard 2-stage job; the streaming lift
  * ([[graft.streaming.OrderBookStream]]) folds the same semantics
  * incrementally with keyed state instead of re-scanning history.
  */
object OrderState {

  private val dec0 = lit(0).cast("decimal(18,2)")

  /** Normalized order events → one current-state row per (pool, trader). */
  def ordersCurrent(orderEvents: DataFrame): DataFrame = {
    val life = orderEvents.filter(col("action") <= 7)

    // 1. segment by governing Create
    val seg = Window.partitionBy("pool", "trader").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segmented = life
      .withColumn("create_id", max(when(col("action") <= 3, col("event_id"))).over(seg))
      .filter(col("create_id").isNotNull) // events before any Create are no-ops

    // 2. fold each segment (one hash agg; partial/final split is safe: decimal)
    val folded = segmented.groupBy("pool", "trader", "create_id").agg(
      max(when(col("event_id") === col("create_id"), col("val"))).as("price"),
      max(when(col("event_id") === col("create_id"), col("val") * 10)).as("amount0"),
      sum(when(col("action").isin(4, 5), col("val")).otherwise(dec0)).as("filled"),
      max(when(col("action") === 6, 1).otherwise(0)).as("cancelled"),
      max_by(
        when(col("action") === 7, col("val") * 5),
        when(col("action") === 7, col("event_id")).otherwise(lit(-1L))).as("upd_amount"),
      max(when(col("event_id") === col("create_id"), col("block_time"))).as("created_at"))

    // 3. latest Create per (pool, trader) wins
    val latest = folded
      .withColumn("rn", row_number().over(
        Window.partitionBy("pool", "trader").orderBy(col("create_id").desc)))
      .filter(col("rn") === 1)

    // 4. derived state. NOTE: not `greatest` — DuckDB degrades GREATEST over
    // mixed-scale decimals to DOUBLE, breaking the exact-decimal pathway; a
    // CASE keeps both engines in decimal.
    latest
      .withColumn("amount", coalesce(col("upd_amount"), col("amount0")).cast("decimal(28,2)"))
      .withColumn("remaining",
        when(col("amount") > col("filled"),
          (col("amount") - col("filled")).cast("decimal(28,2)"))
          .otherwise(lit(0).cast("decimal(28,2)")))
      .select(
        col("pool"), col("trader"), col("create_id").as("order_id"),
        when(col("create_id") % 2 === 0, "BUY").otherwise("SELL").as("side"),
        col("price"), col("amount"), col("filled"), col("remaining"),
        (col("cancelled") === 0 && col("remaining") > 0).as("active"),
        col("created_at"))
  }
}
