package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** One funnel event (user + step name + event-time micros). */
final case class FunnelEvent(userId: Long, step: String, us: Long)

/** Per-user funnel cursor carried across micro-batches: the accepted
  * time of each stage, -1 while unreached. O(1) per user, keyed state. */
final case class FunnelCursor(t1: Long, t2: Long, t3: Long)

/** Emitted whenever a user ADVANCES a stage (append semantics: at most
  * three rows per user, ever). */
final case class FunnelAdvance(userId: Long, stage: Int, atUs: Long)

/** Streaming funnel tracker — the real-time twin of the batch
  * `funnel_window` query (view → click → purchase, each step within one
  * day of the previous): `flatMapGroupsWithState` keyed by user, state =
  * one 3-slot cursor, emitting a [[FunnelAdvance]] the moment a user
  * reaches a new stage. This is the speed layer a conversion dashboard
  * reads seconds after the purchase lands; `funnel_window` is its exact
  * batch reconciliation.
  *
  * Ordering contract: events are folded in event-time order WITHIN each
  * micro-batch (sorted before the fold); stages only advance, so a
  * late-arriving EARLIER view cannot retroactively lower t1 once a later
  * view was accepted — the documented speed-layer approximation. When a
  * group's whole history arrives in one batch (the spec's equivalence
  * case), the fold reproduces the batch query's min/earliest semantics
  * exactly.
  */
object StreamFunnel {

  val DayUs: Long = 86400000000L

  /** Pure per-user fold, exposed for unit testing: accept the first
    * view, then the earliest strictly-later click within `windowUs`,
    * then the earliest strictly-later purchase within `windowUs`. */
  def advance(events: Seq[(String, Long)], state: Option[FunnelCursor],
              windowUs: Long): (Seq[(Int, Long)], FunnelCursor) = {
    var c = state.getOrElse(FunnelCursor(-1L, -1L, -1L))
    val out = Seq.newBuilder[(Int, Long)]
    events.sortBy(_._2).foreach { case (step, us) =>
      step match {
        case "view" if c.t1 < 0L =>
          c = c.copy(t1 = us); out += ((1, us))
        case "click" if c.t1 >= 0L && c.t2 < 0L &&
            us > c.t1 && us - c.t1 <= windowUs =>
          c = c.copy(t2 = us); out += ((2, us))
        case "purchase" if c.t2 >= 0L && c.t3 < 0L &&
            us > c.t2 && us - c.t2 <= windowUs =>
          c = c.copy(t3 = us); out += ((3, us))
        case _ => ()
      }
    }
    (out.result(), c)
  }

  /** @param timeoutMs evict completed/stale cursors after this
    *   processing-time idle gap (None = keep state for the run — the
    *   `Trigger.AvailableNow` drain mode, as in StatefulSessions). */
  def track(events: Dataset[FunnelEvent],
            windowUs: Long = DayUs,
            timeoutMs: Option[Long] = None): Dataset[FunnelAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = SpeedLayer.timeoutConf(timeoutMs)
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelCursor, FunnelAdvance](
        OutputMode.Append(), timeoutConf) {
        (user: Long, it: Iterator[FunnelEvent], st: GroupState[FunnelCursor]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val (advances, cursor) =
              advance(it.map(e => (e.step, e.us)).toSeq, st.getOption, windowUs)
            st.update(cursor)
            timeoutMs.foreach(st.setTimeoutDuration)
            advances.map { case (stage, us) =>
              FunnelAdvance(user, stage, us)
            }.iterator
          }
      }
  }
}
