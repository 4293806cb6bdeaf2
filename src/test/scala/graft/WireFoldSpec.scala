package graft

import org.apache.spark.sql.functions._
import graft.operators.{OrderEvents, OrderState, WireOrderFold}
import graft.sources.{Tables, WireEvents, WireFixture}

/** The order_id-keyed wire fold (the reference's native semantics,
  * order-book.ts:80-182) — gated by the DuckDB oracle for values; these
  * specs pin the cross-mode and cross-operator equivalences.
  */
class WireFoldSpec extends SparkSpec {

  private lazy val wire = WireOrderFold.wireOrdersCurrent(spark, sfTiny)
  private lazy val wireFidelity =
    WireOrderFold.wireOrdersCurrent(spark, sfTiny, fidelity = true)

  test("derived and fidelity modes agree on a clean stream") {
    // the fixture's OrderFilled payloads carry the contract's authoritative
    // running filled/remaining; on an uncorrected stream both folds must
    // produce identical state (order-book.ts:146-167)
    assert(wire.exceptAll(wireFidelity).isEmpty &&
      wireFidelity.exceptAll(wire).isEmpty)
  }

  test("latest order per (pool, trader) matches the OrderState fold") {
    // OrderState keys on (pool, trader) and keeps only the latest Create;
    // the wire fold keeps every order. Restricting the wire fold to each
    // key's latest order must reproduce OrderState exactly (same lifecycle
    // semantics, different key) — a full-pipeline equivalence: JSON encode →
    // parse → scale → fold ≡ direct columnar fold.
    val viaState = OrderState.ordersCurrent(OrderEvents(spark, sfTiny))
      .select(col("pool"), col("trader"), col("order_id"), col("side"),
        col("price").cast("double").as("price"),
        col("amount").cast("double").as("amount"),
        col("filled").cast("double").as("filled"),
        col("remaining").cast("double").as("remaining"), col("active"))
    val latestWire = wire
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("pool", "trader").orderBy(col("order_id").desc)))
      .filter(col("rn") === 1)
      .select("pool", "trader", "order_id", "side", "price", "amount",
        "filled", "remaining", "active")
    assert(latestWire.exceptAll(viaState).isEmpty &&
      viaState.exceptAll(latestWire).isEmpty)
  }

  test("multi-decimals scaling round-trips exactly") {
    // every pool gets distinct ERC-20 decimals (2 + ascii mod 17); the raw
    // uint256 encode → decimal scale-down must be value-exact, so price
    // equals the source `value` column verbatim
    val src = Tables.events(spark, sfTiny)
      .filter(col("event_id") % 10 <= 3)
      .select(col("event_id").as("order_id"),
        col("value").cast("double").as("price_src"))
    val joined = wire.join(src, "order_id")
      .filter(col("price") =!= col("price_src"))
    assert(joined.isEmpty, "fixed-point roundtrip diverged")
  }

  /** Hand-built normalized stream for one order: rows of
    * (event_type, block_number, log_index, amount, authoritative filled).
    */
  private def mkNorm(rows: Seq[(String, Long, Int, String, String)]) = {
    import spark.implicits._
    rows.toDF("event_type", "block_number", "log_index", "amt", "fill")
      .select(
        lit("poolX").as("pool"), lit("7").as("trader"), lit(1L).as("order_id"),
        col("event_type"),
        when(col("event_type") === "OrderCreated", "BUY").as("side"),
        lit("3").cast("decimal(38,18)").as("price"),
        col("amt").cast("decimal(38,18)").as("amount"),
        col("fill").cast("decimal(38,18)").as("filled"),
        lit(null).cast("decimal(38,18)").as("remaining"),
        col("block_number"), col("log_index"),
        timestamp_micros(lit(0L)).as("block_time"))
  }

  test("event ordering survives blocks with more than 10 logs") {
    // EVM blocks carry hundreds of logs; the fold's max_by ordering key must
    // be injective over (block_number, log_index). This scenario is built so
    // the naive block·10+log encode INVERTS the order (block 1 log 16 → 26
    // vs block 2 log 5 → 25): the last OrderUpdated amount and the last
    // authoritative OrderFilled accounting must come from block 2.
    val norm = mkNorm(Seq(
      ("OrderCreated", 0L, 0, "100", null),
      ("OrderFilled", 1L, 15, "10", "10"),   // naive encode 25
      ("OrderUpdated", 1L, 16, "50", null),  // naive encode 26
      ("OrderFilled", 2L, 4, "20", "30"),    // naive encode 24 < 25: inverted
      ("OrderUpdated", 2L, 5, "70", null)))  // naive encode 25 < 26: inverted
    val derived = WireOrderFold.ordersByOrderId(norm).collect().head
    assert(derived.getAs[Double]("amount") == 70.0,
      "last OrderUpdated must be block 2's, not the colliding block 1 encode")
    assert(derived.getAs[Double]("filled") == 30.0) // Σ fills: 10 + 20
    val fidelity =
      WireOrderFold.ordersByOrderId(norm, fidelity = true).collect().head
    assert(fidelity.getAs[Double]("filled") == 30.0,
      "authoritative filled must come from block 2's OrderFilled")
  }

  test("fidelity and derived modes diverge on a correction stream") {
    // The two modes are equivalent only on clean streams (the first test).
    // When the contract emits a correction — the last OrderFilled's
    // authoritative running total (12) disagreeing with Σ fill amounts
    // (10 + 5 = 15) — they must diverge exactly as documented
    // (WireOrderFold scaladoc vs order-book.ts:146-167): derived trusts
    // nothing and re-sums; fidelity trusts the event's own accounting.
    val norm = mkNorm(Seq(
      ("OrderCreated", 0L, 0, "100", null),
      ("OrderFilled", 1L, 0, "10", "10"),
      ("OrderFilled", 2L, 0, "5", "12"))) // correction: says 12, not 15
    val derived = WireOrderFold.ordersByOrderId(norm).collect().head
    assert(derived.getAs[Double]("filled") == 15.0 &&
      derived.getAs[Double]("remaining") == 85.0,
      s"derived mode must re-sum fill amounts: $derived")
    val fidelity =
      WireOrderFold.ordersByOrderId(norm, fidelity = true).collect().head
    assert(fidelity.getAs[Double]("filled") == 12.0 &&
      fidelity.getAs[Double]("remaining") == 88.0,
      s"fidelity mode must trust the last authoritative total: $fidelity")
  }

  test("wire fold is one hash aggregation — no window exchange") {
    // with order_id on every event the fold needs NO segmentation window:
    // the physical plan must contain zero WindowExec beyond the synthetic
    // fixture generator's own (which at 100 TB does not exist — wire data
    // carries order ids natively)
    val norm = WireEvents.normalize(
      WireFixture.frames(spark, sfTiny),
      WireFixture.pools(spark, sfTiny), WireFixture.tokens(spark, sfTiny))
      .localCheckpoint() // cut the fixture generator out of the plan
    val plan = WireOrderFold.ordersByOrderId(norm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in fold plan:\n$plan")
    assert(plan.contains("HashAggregate"), "fold must be a hash aggregation")
  }
}
