package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the online analog of the batch
  * [[graft.operators.Olap.qFunnel]] (view → click → purchase, strict
  * temporal order): `flatMapGroupsWithState` keyed by user, state = the
  * three step timestamps, each set exactly once.
  *
  * On an ordered replay (the block-stream discipline of [[OrderBookStream]]
  * — events arrive in event-time order across batches, sorted within each
  * batch group), "min step ts strictly after the previous step" degenerates
  * to "FIRST step ts after the previous step", so the online fold is a
  * 3-slot write-once register: a view sets s1 if unset; a click sets s2 if
  * s1 is set, s2 unset, and ts > s1; a purchase likewise against s2. That
  * makes the fold trivially batch-boundary independent (each slot's final
  * value depends only on the event sequence, not its micro-batch split) —
  * `FunnelStreamSpec` asserts 1-batch == n-batch == a plain Scala fold ==
  * the gated batch query's reach counts.
  *
  * Emission contract (Update mode, last row per user wins): a user's
  * current (s1, s2, s3) re-emits on every batch that advances or touches
  * the user. At production scale the state is three longs per user under
  * `EventTimeTimeout` (a funnel window: users idle past the attribution
  * horizon emit their final row and drop) — per-user state is O(1), total
  * state is O(users active inside the horizon).
  */
object FunnelStream {

  /** Input funnel event: micros timestamp, step name. */
  case class FEv(userId: Long, tsUs: Long, step: String)

  /** Write-once step registers; 0 = unset (ts are strictly positive). */
  case class FState(s1: Long, s2: Long, s3: Long)

  /** Emitted per-user funnel row. */
  case class FOut(userId: Long, s1: Long, s2: Long, s3: Long, reached: Int)

  def funnelStream(events: Dataset[FEv]): Dataset[FOut] = {
    implicit val stEnc = Encoders.product[FState]
    implicit val outEnc = Encoders.product[FOut]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FState, FOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[FEv], state: GroupState[FState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsUs, e.step))
          var st = state.getOption.getOrElse(FState(0L, 0L, 0L))
          sorted.foreach { e =>
            st = e.step match {
              case "view" if st.s1 == 0L => st.copy(s1 = e.tsUs)
              case "click" if st.s1 != 0L && st.s2 == 0L && e.tsUs > st.s1 =>
                st.copy(s2 = e.tsUs)
              case "purchase" if st.s2 != 0L && st.s3 == 0L && e.tsUs > st.s2 =>
                st.copy(s3 = e.tsUs)
              case _ => st
            }
          }
          state.update(st)
          val reached =
            if (st.s3 != 0L) 3 else if (st.s2 != 0L) 2 else if (st.s1 != 0L) 1 else 0
          Iterator.single(FOut(userId, st.s1, st.s2, st.s3, reached))
      }
  }
}
