package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic wire-format fixture: renders the driver's `events` table as
  * ABI-shaped wire frames ([[WireEvents.envelopeSchema]] + JSON payloads) so
  * the FULL ingest path — JSON parse → typed payloads → fixed-point scaling →
  * order_id-keyed lifecycle fold — runs under the DuckDB oracle gate, not just
  * a unit spec. This is the reference's *actual* core semantics
  * (`src/models/order-book.ts:80-182` folds per `orderId`;
  * `src/services/hive-listener.ts:153-206` decodes the frames).
  *
  * Mapping (same action decode as [[graft.operators.OrderEvents]]):
  * `action := event_id % 10` → 0-3 OrderCreated, 4-5 OrderFilled,
  * 6 OrderCancelled, 7 OrderUpdated, 8 LatestPrice, 9 MarketOrderExecuted.
  * Stream position: `block_number := event_id div 25`,
  * `log_index := event_id mod 25` — 25 logs per block, so log_index exceeds
  * one decimal digit and the fold's (block, log) ordering encode is
  * collision-tested by the oracle gate itself (not just a unit spec).
  *
  * `order_id` := the governing OrderCreated's event_id per (pool, trader) —
  * a running-max window. In production wire data every fill/cancel/update
  * carries its `orderId` natively (hive-core.json:525-648), so this window
  * exists ONLY in the synthetic generator; the engine pipeline under test
  * never needs it. Lifecycle events with no governing Create are dropped
  * (the chain would never emit a fill for a nonexistent order).
  *
  * Fixed-point: payload amounts are raw uint256 `val · 10^decimals` with
  * per-pool token decimals 2 + ascii(pool[0]) mod 17 (∈ [2,18], several
  * distinct values across the 5 pools) — exercising the multi-decimals
  * scaling path (P2, hive-listener.ts:239-241) end-to-end. OrderFilled also
  * carries the authoritative running `filled`/`remaining` the ABI defines
  * (hive-core.json:581-623), for the fidelity fold mode.
  */
object WireFixture {

  /** Per-pool ERC-20 decimals: deterministic, multi-valued, ≥ 2 so that
    * DECIMAL(18,2) values scale to integral raw amounts.
    */
  def tokenDecimals(pool: Column): Column =
    lit(2) + ascii(substring(pool, 1, 1)) % 17

  /** (pool, base_token, quote_token) registry — what HiveCoreCreated feeds. */
  def pools(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("event_type").as("pool")).distinct()
      .select(col("pool"),
        concat(lit("tok_"), col("pool")).as("base_token"),
        concat(lit("quote_"), col("pool")).as("quote_token"))

  /** Token dimension ([[WireEvents.tokenSchema]] shape). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    pools(spark, dir).select(
      col("base_token").as("address"),
      upper(col("pool")).as("name"),
      upper(substring(col("pool"), 1, 3)).as("symbol"),
      tokenDecimals(col("pool")).cast("int").as("decimals"))

  /** Factory event frames ([[WireEvents.envelopeSchema]]): one
    * HiveCoreCreated per pool at block 0 (hive-factory.json:152-176) plus a
    * deterministic 1 + ascii(pool[0]) mod 3 QuoteTokenAdded frames
    * (hive-factory.json:177-189) — the pool-discovery / quote-registry
    * stream the reference bootstraps from (hive-listener.ts:54-111).
    */
  def factoryFrames(spark: SparkSession, dir: String): DataFrame = {
    val p = pools(spark, dir)
    val t0 = timestamp_micros(lit(0L))
    val created = p.select(
      lit(0L).as("block_number"),
      (ascii(substring(col("pool"), 1, 1)) % 50).cast("int").as("log_index"),
      t0.as("block_time"),
      col("pool"),
      lit("HiveCoreCreated").as("event_type"),
      to_json(struct(
        col("pool").as("hiveCoreAddress"),
        col("base_token").as("baseToken"),
        col("quote_token").as("quoteToken"))).as("payload"))
    val nQuote = lit(1) + ascii(substring(col("pool"), 1, 1)) % 3
    val quotes = p
      .withColumn("k", explode(sequence(lit(0), nQuote - 1)))
      .select(
        lit(0L).as("block_number"),
        (lit(100) + col("k")).cast("int").as("log_index"),
        t0.as("block_time"),
        col("pool"),
        lit("QuoteTokenAdded").as("event_type"),
        to_json(struct(
          concat(lit("q"), col("k"), lit("_"), col("pool")).as("quoteToken")))
          .as("payload"))
    created.unionByName(quotes)
  }

  /** events parquet → wire frames conforming to [[WireEvents.envelopeSchema]]. */
  def frames(spark: SparkSession, dir: String): DataFrame = {
    val rawEvents = Tables.events(spark, dir)
    val ev = rawEvents.select(
      col("event_type").as("pool"),
      col("user_id").as("trader"),
      col("event_id"),
      // 25 logs per block: log_index runs past one decimal digit, so a
      // small-base ordering encode (block·10 + log_index) COLLIDES and
      // mis-orders across block boundaries — the oracle gate itself now
      // regresses WireOrderFold's injective (block, log) encoding
      (col("event_id") / 25).cast("long").as("block_number"),
      (col("event_id") % 25).cast("int").as("log_index"),
      // schema-adaptive micros: both engines' precision floor
      timestamp_micros(Tables.tsMicros(rawEvents)).as("block_time"),
      (col("event_id") % 10).cast("int").as("action"),
      col("value").cast("decimal(18,2)").as("val"))

    // governing Create per (pool, trader) — synthetic-only, see scaladoc
    val seg = Window.partitionBy("pool", "trader").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oid = max(when(col("action") <= 3, col("event_id"))).over(seg)

    // explicit compute parallelism (the cosineTopK pattern, r17): the
    // whole wire ingest — both lifecycle windows, the JSON render, and
    // the downstream parse — inherits THIS exchange's width (hash on
    // (pool, trader) satisfies both windows' clustering, so no further
    // exchange re-widens it). It is the suite's one CPU-dense
    // small-bytes stage, so its width must follow CORES, not the
    // data-proportional default ([[graft.Tuning]]): at 9 partitions the
    // first wire query of a session paid 3.4-4.0 s for the shared
    // ingest vs ~0.5-1.2 s at cores-wide (bracketed BenchOne A/B,
    // OPTIMIZATION_r17.md). Exchange COUNT is unchanged — only width.
    val withOid = ev
      .repartition(spark.sparkContext.defaultParallelism,
        col("pool"), col("trader"))
      .withColumn("order_id", oid)
      // drop lifecycle events with no governing order (see scaladoc)
      .filter(!(col("action").between(4, 7) && col("order_id").isNull))

    // authoritative running lifecycle (what the contract would emit in the
    // OrderFilled payload): current amount = last update ?? created amount,
    // filled = Σ fills so far — windowed on the governing segment itself
    val segByOrder = Window.partitionBy("pool", "trader", "order_id")
      .orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec0 = lit(0).cast("decimal(18,2)")
    val enriched = withOid
      .withColumn("amt_now", coalesce(
        last(when(col("action") === 7, col("val") * 5), ignoreNulls = true).over(segByOrder),
        max(when(col("event_id") === col("order_id"), col("val") * 10)).over(segByOrder)))
      .withColumn("run_filled",
        sum(when(col("action").isin(4, 5), col("val")).otherwise(dec0)).over(segByOrder))
      .withColumn("run_remaining",
        when(col("amt_now") > col("run_filled"), col("amt_now") - col("run_filled"))
          .otherwise(dec0))

    // fixed-point raw encode: DECIMAL end-to-end (P2 — the reference routes
    // this through float64; we don't)
    val scale = pow(lit(10), tokenDecimals(col("pool"))).cast("decimal(38,0)")
    def raw(c: Column): Column = (c * scale).cast("decimal(38,0)")
    val traderStr = col("trader").cast("string")
    val orderIdU256 = col("order_id").cast("decimal(38,0)")
    val sideByte = (col("order_id") % 2).cast("byte")

    val payload =
      when(col("action") <= 3, to_json(struct(
        traderStr.as("trader"), orderIdU256.as("orderId"),
        raw(col("val")).as("price"), raw(col("val") * 10).as("amount"),
        sideByte.as("orderType"))))
      .when(col("action").isin(4, 5), to_json(struct(
        orderIdU256.as("orderId"), traderStr.as("trader"),
        raw(col("val")).as("amount"), raw(col("run_filled")).as("filled"),
        raw(col("run_remaining")).as("remaining"), sideByte.as("orderType"))))
      .when(col("action") === 6, to_json(struct(
        orderIdU256.as("orderId"), traderStr.as("trader"))))
      .when(col("action") === 7, to_json(struct(
        orderIdU256.as("orderId"), traderStr.as("trader"),
        raw(col("val") * 5).as("newAmount"))))
      .when(col("action") === 8, to_json(struct(raw(col("val")).as("price"))))
      .otherwise(to_json(struct(
        traderStr.as("trader"), raw(col("val")).as("amount"),
        raw(col("val")).as("price"),
        (col("block_number") % 2).cast("byte").as("orderType"),
        raw(col("val")).as("filledAmount"))))

    val eventType =
      when(col("action") <= 3, "OrderCreated")
        .when(col("action").isin(4, 5), "OrderFilled")
        .when(col("action") === 6, "OrderCancelled")
        .when(col("action") === 7, "OrderUpdated")
        .when(col("action") === 8, "LatestPrice")
        .otherwise("MarketOrderExecuted")

    enriched.select(
      col("block_number"), col("log_index"), col("block_time"),
      col("pool"), eventType.as("event_type"), payload.as("payload"))
  }
}
