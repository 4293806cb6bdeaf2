package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The order-lifecycle fold as straight-line Scala — the single semantic
  * definition shared by three execution strategies:
  *
  *   1. the relational window/agg reconstruction ([[OrderState]]) — batch,
  *   2. the typed [[OrderFold.FoldAggregator]] — batch, SQL-callable,
  *   3. the streaming keyed-state fold ([[graft.streaming.OrderBookStream]]).
  *
  * All three are equivalence-tested against each other (SURVEY §5.2: the
  * "readable-obviously-correct oracle"). Amounts are integer CENTS — the
  * DECIMAL(18,2) event amounts ×100 — so every strategy is exact-integer and
  * trivially comparable.
  *
  * Semantics mirror the reference fold (`src/models/order-book.ts:80-182`):
  * Create resets the order (last-create-wins), Fill accumulates `filled`
  * (order-book.ts:146-168), Update replaces `amount` (order-book.ts:104-117),
  * Cancel soft-deletes (order-book.ts:170-182); `active = ¬cancelled ∧
  * remaining > 0` (full-fill deactivation, order-book.ts:163-165). Events
  * apply in (block, log_index) ≙ event_id order — our deliberate divergence
  * from the reference's per-type batch order (SURVEY §7.4).
  */
object OrderFold {

  /** One lifecycle event, amounts in cents. action: 0-3 create / 4-5 fill /
    * 6 cancel / 7 update (see [[OrderEvents]]).
    */
  case class Ev(pool: String, trader: Long, eventId: Long, action: Int,
                cents: Long, blockTime: Long)

  /** Current order state per (pool, trader), amounts in cents. `cancelled`
    * is the raw soft-delete flag; `active` is derived (¬cancelled ∧
    * remaining > 0) — kept separately so an incremental continuation can
    * distinguish "cancelled" from "fully filled" (an Update can re-activate
    * the latter but never the former).
    */
  case class St(pool: String, trader: Long, orderId: Long, side: String,
                priceCents: Long, amountCents: Long, filledCents: Long,
                remainingCents: Long, cancelled: Boolean, active: Boolean,
                createdAt: Long)

  /** The fold: events MUST be pre-sorted by eventId. Returns None when no
    * Create has been seen (pre-Create events are no-ops, matching the
    * reference's missing-order guard, order-book.ts:109-111).
    */
  def fold(events: Seq[Ev]): Option[St] = foldFrom(None, events)

  /** Incremental form: continue from a prior state (the streaming path folds
    * each micro-batch on top of its keyed state). foldFrom(foldFrom(s, a), b)
    * == foldFrom(s, a ++ b) — the batch-boundary-independence property the
    * streaming tests assert.
    */
  def foldFrom(prior: Option[St], events: Seq[Ev]): Option[St] = {
    var st: St = prior.orNull
    events.foreach { e =>
      e.action match {
        case a if a <= 3 => // OrderCreated: reset (last-create-wins)
          st = St(e.pool, e.trader, e.eventId,
            side = if (e.eventId % 2 == 0) "BUY" else "SELL",
            priceCents = e.cents, amountCents = e.cents * 10,
            filledCents = 0L, remainingCents = e.cents * 10,
            cancelled = false, active = true, createdAt = e.blockTime)
        case 4 | 5 if st != null => // OrderFilled: accumulate
          st = st.copy(filledCents = st.filledCents + e.cents)
        case 6 if st != null => // OrderCancelled: soft delete
          st = st.copy(cancelled = true)
        case 7 if st != null => // OrderUpdated: replace amount
          st = st.copy(amountCents = e.cents * 5)
        case _ => // fill/cancel/update before any create: no-op
      }
    }
    // derive remaining/active (idempotent — safe to re-derive on every batch)
    Option(st).map { s =>
      val remaining = math.max(s.amountCents - s.filledCents, 0L)
      s.copy(remainingCents = remaining, active = !s.cancelled && remaining > 0)
    }
  }

  /** Typed Aggregator form of the fold (usable from `Dataset.groupByKey.agg`
    * and registerable for SQL). The buffer collects the key's events and the
    * finish step sorts + folds — correct under Spark's unordered partial
    * merges because ordering is imposed at the end. Appropriate when events
    * per key are bounded (an order's lifecycle is short); the streaming path
    * handles the unbounded-history case with incremental state instead.
    */
  class FoldAggregator extends Aggregator[Ev, Vector[Ev], Option[St]] {
    def zero: Vector[Ev] = Vector.empty
    def reduce(b: Vector[Ev], e: Ev): Vector[Ev] = b :+ e
    def merge(a: Vector[Ev], b: Vector[Ev]): Vector[Ev] = a ++ b
    def finish(b: Vector[Ev]): Option[St] = fold(b.sortBy(_.eventId))
    def bufferEncoder: Encoder[Vector[Ev]] = Encoders.kryo[Vector[Ev]]
    def outputEncoder: Encoder[Option[St]] = Encoders.kryo[Option[St]]
  }

  /** SQL-facing variant (SURVEY §4: "a TypedImperativeAggregate … if we want
    * it available from SQL" — an `Aggregator` + `functions.udaf` covers it):
    * null output instead of Option so the result is a plain nullable struct
    * column. Registered as `order_fold(pool, trader, event_id, action,
    * cents, block_time)` by [[graft.GraftCatalog.register]].
    */
  class FoldSqlAggregator extends Aggregator[Ev, Vector[Ev], St] {
    def zero: Vector[Ev] = Vector.empty
    def reduce(b: Vector[Ev], e: Ev): Vector[Ev] = b :+ e
    def merge(a: Vector[Ev], b: Vector[Ev]): Vector[Ev] = a ++ b
    def finish(b: Vector[Ev]): St = fold(b.sortBy(_.eventId)).orNull
    def bufferEncoder: Encoder[Vector[Ev]] = Encoders.kryo[Vector[Ev]]
    def outputEncoder: Encoder[St] = Encoders.product[St]
  }

  /** The normalized order-event DataFrame ([[OrderEvents]]) as a typed
    * Dataset[Ev] (cents conversion is exact: DECIMAL(18,2) × 100).
    */
  def toEvents(orderEvents: DataFrame): org.apache.spark.sql.Dataset[Ev] = {
    val spark = orderEvents.sparkSession
    import spark.implicits._
    orderEvents.filter(col("action") <= 7)
      .select(
        col("pool"), col("trader").as("trader"),
        col("event_id").as("eventId"),
        col("action"),
        (col("val") * 100).cast("long").as("cents"),
        col("block_time").as("blockTime"))
      .as[Ev]
  }

  /** Aggregator-driven orders_current, for equivalence testing against
    * [[OrderState.ordersCurrent]].
    */
  def ordersCurrentTyped(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[St] = {
    import spark.implicits._
    val agg = new FoldAggregator().toColumn
    toEvents(OrderEvents(spark, dir))
      .groupByKey(e => (e.pool, e.trader))
      .agg(agg.name("st"))
      .flatMap { case (_, st) => st }
  }
}
