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
