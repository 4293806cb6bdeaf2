package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the online analog of the batch
  * `Olap.qSessionize` gap rule (a new session starts when a user's
  * inter-event gap exceeds `gapUs`): `flatMapGroupsWithState` keyed by
  * user, state = the OPEN session's (start, last, counts), sessions
  * identified by their start timestamp (globally meaningful — no counter
  * to restart when state is pruned).
  *
  * Emission contract (Update mode, last row per (user, session-start)
  * wins): every batch re-emits the open session's current aggregate
  * (`closed = false`); when a gap closes a session, its FINAL row is
  * emitted once with `closed = true` and the state rolls to the new
  * session. Batch-boundary independence holds by construction: the fold
  * over a user's event sequence is associative in the replay order, so any
  * micro-batch split yields the same final row per session
  * (`SessionStreamSpec` asserts 1-batch == n-batch == a plain Scala
  * oracle).
  *
  * Ordering: events sort by (ts, event_id) within each batch group; across
  * batches the source replays in event order (the block-stream discipline
  * of [[OrderBookStream]] — the wire gives a total order). At production
  * scale the state-lifecycle knob is `GroupStateTimeout.EventTimeTimeout`
  * under a watermark: an idle session times out, emits its final row, and
  * its state is REMOVED — per-user state is one open session, total state
  * is O(active users in the gap window), not O(all users ever seen).
  * Session-start identity makes that pruning safe: a user returning after
  * eviction simply opens a new session keyed by its own start.
  */
object SessionizeStream {

  /** Input event: micros timestamp, value in cents (exact integer money). */
  case class SEv(userId: Long, eventId: Long, tsUs: Long, cents: Long)

  /** Open-session state. */
  case class SState(startUs: Long, lastUs: Long, nEvents: Long, cents: Long)

  /** Emitted session row; `closed` flips exactly once, on the gap. */
  case class SOut(userId: Long, startUs: Long, endUs: Long,
                  nEvents: Long, cents: Long, closed: Boolean)

  val GapUs: Long = 1800L * 1000000L // 30 min, matches Olap.qSessionize

  def sessionStream(events: Dataset[SEv],
                    gapUs: Long = GapUs): Dataset[SOut] = {
    implicit val stEnc = Encoders.product[SState]
    implicit val outEnc = Encoders.product[SOut]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SState, SOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[SEv], state: GroupState[SState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsUs, e.eventId))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SOut]
          sorted.foreach { e =>
            if (st == null) {
              st = SState(e.tsUs, e.tsUs, 1L, e.cents)
            } else if (e.tsUs - st.lastUs > gapUs) {
              out += SOut(userId, st.startUs, st.lastUs, st.nEvents, st.cents,
                closed = true)
              st = SState(e.tsUs, e.tsUs, 1L, e.cents)
            } else {
              st = SState(st.startUs, e.tsUs, st.nEvents + 1L, st.cents + e.cents)
            }
          }
          if (st != null) {
            state.update(st)
            out += SOut(userId, st.startUs, st.lastUs, st.nEvents, st.cents,
              closed = false)
          }
          out.result().iterator
      }
  }
}
