package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Normalized order-event stream (SURVEY §2 M2).
  *
  * The reference ingests 7 typed EVM contract-event streams per block
  * (`src/services/hive-listener.ts:153-206`, ABIs
  * `src/abis/hive-core.json:476-648`) and folds them into keyed state. The
  * driver testdata has no EVM logs, so we derive a deterministic equivalent
  * stream from the `events` table — the SAME derivation is expressed in the
  * DuckDB oracle SQL (see [[graft.oracle.OracleSql.orderEventsCte]]), so every
  * downstream operator is checked end-to-end against an independent engine.
  *
  * Mapping (all arithmetic in DECIMAL(18,2) — exact, engine-independent):
  *   - pool         := event_type            (5 pools, like the factory's
  *                     HiveCoreCreated registry, hive-factory-listener.ts:77-99)
  *   - trader       := user_id
  *   - block/log    := event_id / 10, event_id % 10 (micro-batch offset order,
  *                     block-event-manager.ts:63-92)
  *   - action       := event_id % 10:
  *       0-3 OrderCreated   (price=val, amount=val*10, side=create_id%2)
  *       4-5 OrderFilled    (fill amount=val)
  *       6   OrderCancelled
  *       7   OrderUpdated   (newAmount=val*5)
  *       8   LatestPrice    (price=val)
  *       9   MarketOrderExecuted (amount=val, price=val, filled=val)
  *
  * Orders are keyed (pool, trader): each trader has one evolving order per
  * pool; a later Create supersedes the previous one (last-create-wins), and
  * Fill/Cancel/Update apply to the most recent Create — mirroring the
  * reference's per-order lifecycle fold (`src/models/order-book.ts:80-182`)
  * with a key the synthetic data can express.
  *
  * Scale note: this is a narrow projection + integer arithmetic over one scan —
  * no shuffle, fully codegen'd, and the parquet reader prunes to the five used
  * columns. At 100 TB the stream would be partitioned by block-range and this
  * stage stays embarrassingly parallel.
  */
object OrderEvents {

  /** Raw events → normalized order-event stream. Pure projection (no shuffle). */
  def derive(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("pool"),
      col("user_id").as("trader"),
      col("event_id"),
      (col("event_id") / 10).cast("long").as("block_number"),
      (col("event_id") % 10).cast("int").as("log_index"),
      // epoch-MICROS long, schema-adaptive (oracle: epoch_us(ts))
      Tables.tsMicros(events).as("block_time"),
      (col("event_id") % 10).cast("int").as("action"),
      col("value").cast("decimal(18,2)").as("val"))

  def apply(spark: SparkSession, dir: String): DataFrame =
    derive(Tables.events(spark, dir))
}
