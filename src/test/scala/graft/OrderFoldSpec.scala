package graft

import org.apache.spark.sql.functions._
import graft.operators.{OrderEvents, OrderFold, OrderState}
import graft.operators.OrderFold.{Ev, St}

/** M3 equivalence: the three fold strategies (relational window/agg, typed
  * Aggregator, straight-line Scala) must agree row-for-row (SURVEY §5.2).
  */
class OrderFoldSpec extends SparkSpec {

  private def ev(id: Long, action: Int, cents: Long,
                 pool: String = "p1", trader: Long = 1L): Ev =
    Ev(pool, trader, id, action, cents, blockTime = id * 1000)

  test("fold lifecycle matrix: create/fill/cancel/update semantics") {
    // create: price 5.00 → amount 50.00
    val created = OrderFold.fold(Seq(ev(0, 0, 500))).get
    assert(created.amountCents == 5000 && created.remainingCents == 5000)
    assert(created.active && created.side == "BUY")

    // partial fill
    val partial = OrderFold.fold(Seq(ev(0, 0, 500), ev(4, 4, 2000))).get
    assert(partial.filledCents == 2000 && partial.remainingCents == 3000 && partial.active)

    // full fill (over-fill clamps to 0, deactivates)
    val full = OrderFold.fold(Seq(ev(0, 0, 500), ev(4, 4, 6000))).get
    assert(full.remainingCents == 0 && !full.active)

    // cancel is a permanent soft delete within the segment
    val cancelled = OrderFold.fold(Seq(ev(0, 0, 500), ev(6, 6, 0), ev(4, 4, 100))).get
    assert(cancelled.cancelled && !cancelled.active && cancelled.filledCents == 100)

    // update replaces amount (reference order-book.ts:104-117)
    val updated = OrderFold.fold(Seq(ev(0, 0, 500), ev(7, 7, 900))).get
    assert(updated.amountCents == 4500 && updated.remainingCents == 4500)

    // update can re-activate a fully-filled order, but never a cancelled one
    val refilled = OrderFold.fold(Seq(ev(0, 0, 500), ev(4, 4, 6000), ev(7, 7, 2000))).get
    assert(refilled.active && refilled.remainingCents == 10000 - 6000)
    val deadCancel = OrderFold.fold(Seq(ev(0, 0, 500), ev(6, 6, 0), ev(7, 7, 2000))).get
    assert(!deadCancel.active)

    // pre-create events are no-ops; later create starts fresh
    assert(OrderFold.fold(Seq(ev(4, 4, 100))).isEmpty)
    val recreated = OrderFold.fold(Seq(ev(0, 0, 500), ev(6, 6, 0), ev(3, 3, 700))).get
    assert(recreated.orderId == 3 && !recreated.cancelled && recreated.active)
    assert(recreated.side == "SELL") // side from create event id parity
  }

  private def canon(rows: Seq[St]): Seq[(String, Long, Long, String, Long, Long, Long, Long, Boolean)] =
    rows.map(s => (s.pool, s.trader, s.orderId, s.side, s.priceCents,
      s.amountCents, s.filledCents, s.remainingCents, s.active))
      .sortBy(t => (t._1, t._2))

  test("relational fold == Aggregator fold == straight-line fold on sf0.001") {
    import spark.implicits._
    // relational (DECIMAL) → cents
    val relational = OrderState.ordersCurrent(OrderEvents(spark, sfTiny))
      .select(col("pool"), col("trader"), col("order_id"), col("side"),
        (col("price") * 100).cast("long").as("priceCents"),
        (col("amount") * 100).cast("long").as("amountCents"),
        (col("filled") * 100).cast("long").as("filledCents"),
        (col("remaining") * 100).cast("long").as("remainingCents"),
        col("active"))
      .as[(String, Long, Long, String, Long, Long, Long, Long, Boolean)]
      .collect().toSeq.sortBy(t => (t._1, t._2))

    // typed Aggregator
    val typed = canon(OrderFold.ordersCurrentTyped(spark, sfTiny).collect().toSeq)

    // straight-line oracle: group + sort + fold on the driver
    val events = OrderFold.toEvents(OrderEvents(spark, sfTiny)).collect().toSeq
    val oracle = canon(
      events.groupBy(e => (e.pool, e.trader)).values
        .flatMap(g => OrderFold.fold(g.sortBy(_.eventId))).toSeq)

    assert(typed == oracle, "Aggregator fold != straight-line fold")
    assert(relational == oracle, "relational fold != straight-line fold")
    assert(relational.nonEmpty)
  }
}
