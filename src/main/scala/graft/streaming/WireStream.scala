package graft.streaming

import org.apache.spark.sql.DataFrame
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

  /** frames: a STREAMING DataFrame with [[WireEvents.envelopeSchema]];
    * pools/tokens: static dimensions (broadcast into every micro-batch).
    */
  def wireOrdersStream(frames: DataFrame, pools: DataFrame, tokens: DataFrame,
                       fidelity: Boolean = false): DataFrame =
    WireOrderFold.ordersByOrderId(
      WireEvents.normalize(frames, pools, tokens, sort = false), fidelity)

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
