package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** One event of the interleaved click/purchase flow, keyed by user. */
final case class FlowEvent(userId: Long, us: Long, isClick: Boolean, eventId: Long)

/** Latest-click-so-far state carried across micro-batches (one small row
  * per user — O(active users), partitioned by key). */
final case class ClickState(us: Long, eventId: Long)

/** A purchase attributed to the latest strictly-earlier click
  * (`clickId = -1` when no click precedes it). */
final case class AttributedPurchase(userId: Long, purchaseId: Long, purchaseUs: Long,
                                    clickId: Long, clickUs: Long, gapUs: Long)

/** Streaming temporal (as-of) enrichment — the unbounded twin of the
  * native batch operator (graft.plans.AsOfJoinExec) and the third shape
  * in the attribution family: `asof_join_native` (batch, exact),
  * `StreamJoin.attribute` (stream×stream window join, ALL clicks in a
  * horizon), and this — each purchase decorated with exactly the LATEST
  * earlier click, Flink's "temporal table join" pattern.
  *
  * Why not the stream-stream join: a symmetric join buffers BOTH sides
  * bounded by watermark+horizon and emits every in-horizon click. The
  * as-of semantics need only ONE candidate — so state is a single
  * (us, eventId) pair per user, not a click buffer, and there is no
  * horizon bound on how far back the click may lie (a click seen once
  * attributes purchases forever, until newer clicks replace it).
  *
  * Ordering contract: within a micro-batch, events fold in (us, eventId)
  * order, so arrival order inside a batch never matters. ACROSS batches
  * the operator is emit-once: a click arriving in a later batch than a
  * purchase it should have attributed cannot retro-attribute it
  * (streaming emits each purchase exactly once). That is the standard
  * lambda-architecture split — the watermarked batch twin reconciles.
  */
object StreamAsOf {

  /** Pure per-group transition, exposed for direct unit testing: fold
    * this batch's events in event-time order over the carried state.
    * Clicks advance the state monotonically (max (us, eventId) — the
    * batch operator's tiebreak); purchases emit against the state at
    * their event-time position, strictly-earlier semantics. */
  def advance(events: Seq[FlowEvent], state: Option[ClickState])
      : (Seq[AttributedPurchase], Option[ClickState]) = {
    var last = state
    val out = Seq.newBuilder[AttributedPurchase]
    events.sortBy(e => (e.us, e.eventId)).foreach { e =>
      if (e.isClick) {
        if (last.forall(s => s.us < e.us || (s.us == e.us && s.eventId < e.eventId)))
          last = Some(ClickState(e.us, e.eventId))
      } else {
        out += (last match {
          case Some(s) if s.us < e.us =>
            AttributedPurchase(e.userId, e.eventId, e.us, s.eventId, s.us, e.us - s.us)
          case _ =>
            AttributedPurchase(e.userId, e.eventId, e.us, -1L, -1L, -1L)
        })
      }
    }
    (out.result(), last)
  }

  /** @param timeoutMs evict a user's click state after this much
    *   processing-time idleness. None (default) = no timers — the right
    *   mode for `Trigger.AvailableNow` drains (pending timers would keep
    *   scheduling micro-batches); set it for continuous deployments to
    *   bound state to recently-active users. */
  def enrich(events: Dataset[FlowEvent],
             timeoutMs: Option[Long] = None): Dataset[AttributedPurchase] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = SpeedLayer.timeoutConf(timeoutMs)
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[ClickState, AttributedPurchase](
        OutputMode.Append(), timeoutConf) {
        (_: Long, it: Iterator[FlowEvent], st: GroupState[ClickState]) =>
          if (st.hasTimedOut) {
            st.remove() // idle user: drop the candidate click
            Iterator.empty
          } else {
            val (out, next) = advance(it.toSeq, st.getOption)
            next match {
              case Some(s) =>
                st.update(s)
                timeoutMs.foreach(st.setTimeoutDuration)
              case None => ()
            }
            out.iterator
          }
      }
  }
}
