package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.WireOrderFold
import graft.sources.WireEvents

/** Streaming lift of the wire-format ingest (the reference's actual runtime
  * shape: a block-event listener feeding the per-orderId fold,
  * `src/services/hive-listener.ts:153-206` → `src/models/order-book.ts:80-182`).
  *
  * The SAME [[WireOrderFold.ordersByOrderId]] aggregation runs as a
  * Structured STREAMING aggregation in Update output mode — no separate
  * streaming fold implementation exists to drift from the batch one: the
  * JSON payload parse, the broadcast stream-static token-dim scaling join,
  * and the (pool, order_id, trader)-keyed fold are all incrementally
  * maintained by Spark's streaming state store. Each micro-batch emits the
  * updated order rows (Update mode ≙ the reference's per-event Redis
  * upserts, ST6-durable instead of fire-and-forget).
  *
  * At 100 TB/day this is the deployment shape: offsets = block ranges,
  * state store = RocksDB, sink = the bucketed snapshot MERGE
  * ([[OrderBookStream.snapshotSink]]'s layout).
  */
object WireStream {

  /** One wire frame + its (possibly null) HiveCoreCreated baseToken,
    * pre-extracted so the registry fold below never parses JSON. */
  case class DynFrame(block_number: Long, log_index: Int,
                      block_time: java.sql.Timestamp, pool: String,
                      event_type: String, payload: String,
                      base_token_evt: Option[String])

  /** A frame whose pool registration is resolved: `base_token` attached. */
  case class EnrichedFrame(base_token: String, block_number: Long,
                           log_index: Int, block_time: java.sql.Timestamp,
                           pool: String, event_type: String, payload: String)

  /** Per-pool registry state: the bound base token once the pool's
    * HiveCoreCreated has been seen, plus order frames that arrived BEFORE
    * registration (held back, released in order on registration). */
  case class PoolReg(baseToken: Option[String], buffered: List[DynFrame])

  /** frames: a STREAMING DataFrame with [[WireEvents.envelopeSchema]];
    * pools/tokens: static dimensions (broadcast into every micro-batch).
    */
  def wireOrdersStream(frames: DataFrame, pools: DataFrame, tokens: DataFrame,
                       fidelity: Boolean = false): DataFrame =
    WireOrderFold.ordersByOrderId(
      WireEvents.normalize(frames, pools, tokens, sort = false), fidelity)

  /** DYNAMIC-REGISTRY variant of [[wireOrdersStream]]: no static pools dim —
    * pool registration is itself part of the stream, exactly the
    * reference's runtime shape (its factory listener registers each
    * HiveCoreCreated pool on the fly and the core listener enriches events
    * for that pool from that moment,
    * `src/services/hive-factory-listener.ts:101-115`).
    *
    * `framesWithFactory` carries BOTH factory events (HiveCoreCreated /
    * QuoteTokenAdded) and order events on one envelope stream. Keying by
    * pool puts a pool's registration and its order flow in the same
    * `flatMapGroupsWithState` group, so the binding is visible to the SAME
    * micro-batch's later events — strictly stronger than a per-batch dim
    * re-read (which only sees pools as of the previous batch). Order frames
    * arriving before their pool's registration are buffered in the group
    * state and released in (block, log) order on registration — the
    * reference silently drops those (it can't subscribe to an unknown
    * address); buffering is the durable-engine upgrade of the same rule.
    *
    * Output chain: Append-mode fMGWS (registration resolve) → [[WireEvents
    * .normalizeWithBase]] (JSON parse + broadcast token-dim scaling) → the
    * unchanged [[WireOrderFold.ordersByOrderId]] streaming aggregation.
    * State size: one (pool → base_token) binding per pool (pools are born
    * once — tiny forever) + the pre-registration buffer, which drains on
    * registration and only accretes for pools that never register (the
    * stream's own factory log bounds that to a transient window; a TTL
    * timeout is the production knob, same as ST5).
    */
  def wireOrdersStreamDynamic(framesWithFactory: DataFrame, tokens: DataFrame,
                              fidelity: Boolean = false): DataFrame =
    WireOrderFold.ordersByOrderId(
      normalizeDynamic(framesWithFactory, tokens), fidelity)

  /** `latest_price` over the dynamic registry — [[latestPriceStream]]
    * without a static pools dim; the same enrichment stage feeds any view.
    */
  def latestPriceStreamDynamic(framesWithFactory: DataFrame,
                               tokens: DataFrame): DataFrame =
    graft.operators.WireViews.latestPriceFrom(
      normalizeDynamic(framesWithFactory, tokens))

  /** The shared dynamic-registry front end: registration-resolving fMGWS →
    * JSON parse → broadcast token-dim scaling. Every `*StreamDynamic` view
    * composes on top of this one normalized stream.
    */
  private def normalizeDynamic(framesWithFactory: DataFrame,
                               tokens: DataFrame): DataFrame = {
    val spark = framesWithFactory.sparkSession
    import spark.implicits._
    val dyn: Dataset[DynFrame] = framesWithFactory
      .withColumn("base_token_evt",
        when(col("event_type") === "HiveCoreCreated",
          from_json(col("payload"),
            WireEvents.payloadSchemas("HiveCoreCreated")).getField("baseToken")))
      .as[DynFrame]
    val enriched: Dataset[EnrichedFrame] = dyn
      .groupByKey(_.pool)
      .flatMapGroupsWithState[PoolReg, EnrichedFrame](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, evs, state: GroupState[PoolReg]) =>
          val st = state.getOption.getOrElse(PoolReg(None, Nil))
          val sorted = evs.toSeq.sortBy(f => (f.block_number, f.log_index))
          def enrich(bt: String, f: DynFrame) = EnrichedFrame(bt,
            f.block_number, f.log_index, f.block_time, f.pool, f.event_type,
            f.payload)
          var baseToken = st.baseToken
          var buffered = st.buffered
          val out = Seq.newBuilder[EnrichedFrame]
          sorted.foreach { f =>
            if (f.event_type == "HiveCoreCreated") {
              // a malformed payload (from_json → null baseToken) must NOT
              // clear an existing binding or drop the held-back buffer —
              // only a well-formed registration binds and releases
              f.base_token_evt.foreach { bt =>
                baseToken = Some(bt)
                buffered.reverse.foreach(b => out += enrich(bt, b))
                buffered = Nil
              }
            } else if (f.event_type != "QuoteTokenAdded") baseToken match {
              case Some(bt) => out += enrich(bt, f)
              case None     => buffered = f :: buffered
            }
          }
          state.update(PoolReg(baseToken, buffered))
          out.result().iterator
      }
    WireEvents.normalizeWithBase(WireEvents.parse(enriched.toDF()), tokens)
  }

  /** `latest_price` as a streaming aggregation: the SAME
    * [[graft.operators.WireViews.latestPriceFrom]] `max_by` over the
    * injective (block, log_index) order runs in Update mode — per-pool
    * last-trade state is a single (price, order) pair per key in the state
    * store, emitted on change (≙ the reference's LatestPrice Redis upsert,
    * `src/models/order-book.ts:361-368`).
    */
  def latestPriceStream(frames: DataFrame, pools: DataFrame,
                        tokens: DataFrame): DataFrame =
    graft.operators.WireViews.latestPriceFrom(
      WireEvents.normalize(frames, pools, tokens, sort = false))

  /** Per-trader market-order history as a stream: a STATELESS filtered
    * projection (Append mode, no state store) — the reference's
    * MarketOrderExecuted array-append (`src/models/order-book.ts:184-194`)
    * is, relationally, just the arriving rows themselves.
    */
  def marketOrdersStream(frames: DataFrame, pools: DataFrame,
                         tokens: DataFrame): DataFrame =
    graft.operators.WireViews.marketOrdersFrom(
      WireEvents.normalize(frames, pools, tokens, sort = false))
}
