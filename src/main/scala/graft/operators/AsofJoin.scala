package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time AS-OF join (SURVEY §2.3 note: absent from the reference,
  * listed as a custom-operator candidate in the build contract).
  *
  * Semantics: attach to each MarketOrderExecuted the most recent LatestPrice
  * for the same pool at-or-before it — the union-window as-of pattern:
  * union both streams (here they already share the event log), order by
  * event time within the key, and carry the right side forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame.
  *
  * Why not a join algorithm: the window form does ONE shuffle on the key and
  * a single ordered pass — the classic sort-merge as-of without the merge,
  * and the only formulation that stays linear when the right side is dense.
  * At 100 TB, partition by (pool, coarse time bucket) and the same window
  * runs per bucket with a small head-of-bucket overlap (or Spark's native
  * range-join hints when both sides are separate relations).
  */
object AsofJoin {

  /** Market orders enriched with the as-of pool price and the implied
    * slippage (trade price − as-of reference price, exact DECIMAL).
    */
  def marketOrdersWithAsofPrice(spark: SparkSession, dir: String): DataFrame = {
    val ev = OrderEvents(spark, dir).filter(col("action").isin(8, 9))
    val w = Window.partitionBy("pool").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("asof_price",
        last(when(col("action") === 8, col("val")), ignoreNulls = true).over(w))
      .filter(col("action") === 9)
      .select(
        col("pool"), col("event_id"), col("trader"),
        col("val").cast("double").as("trade_price"),
        col("asof_price").cast("double").as("asof_price"),
        (col("val") - col("asof_price")).cast("double").as("slippage"))
  }
}
