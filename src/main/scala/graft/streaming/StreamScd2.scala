package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One dimension-attribute observation (user, event-time micros, unique
  * event id as the total-order tiebreaker, attribute value). */
final case class TierEvent(user: Long, us: Long, eventId: Long, tier: String)

/** The open (current) dimension version carried per user. */
final case class TierState(tier: String, fromUs: Long)

/** A CLOSED dimension version — emitted the moment a change supersedes it.
  *
  * Edge: two different-tier events in the SAME microsecond produce a
  * degenerate interval (validTo = validFrom − 1) — deliberately identical
  * to the batch `cdc_scd2` build (the pinned equivalence), and harmless
  * downstream: no fact timestamp can land inside an empty interval, so
  * the point-in-time join skips it. Consumers treating intervals as
  * `BETWEEN` must tolerate validTo < validFrom rather than assume
  * well-formedness.
  */
final case class TierInterval(user: Long, tier: String, validFrom: Long,
                              validTo: Long)

/** Streaming type-2 dimension maintenance — the speed layer of the batch
  * `cdc_scd2` build: instead of recomputing validity intervals from the
  * full history nightly, each user's OPEN version rides in state and a
  * closed interval row is appended the moment an arriving event changes
  * the attribute. Append mode emits exactly the batch query's
  * `is_current = false` rows (the open version lives in state, not in the
  * output — a batch view over the emitted intervals plus state IS the
  * dimension; StreamScd2Spec pins closed-row equivalence to cdc_scd2).
  *
  * In-order delivery per user is assumed across micro-batches (within a
  * batch, events sort on (us, eventId)); out-of-order streams reorder
  * upstream with a watermark, as with the other speed-layer twins.
  * State is O(1) per user — one (tier, fromUs) pair.
  */
object StreamScd2 {

  /** Pure per-group transition, exposed for direct unit testing. */
  def advance(events: Seq[(Long, Long, String)], state: Option[TierState])
      : (Seq[(String, Long, Long)], Option[TierState]) = {
    var open = state
    val closed = Seq.newBuilder[(String, Long, Long)]
    events.sortBy(e => (e._1, e._2)).foreach { case (us, _, tier) =>
      open match {
        case Some(s) if s.tier != tier =>
          closed += ((s.tier, s.fromUs, us - 1L))
          open = Some(TierState(tier, us))
        case Some(_) => () // same attribute value: version unchanged
        case None => open = Some(TierState(tier, us))
      }
    }
    (closed.result(), open)
  }

  def maintain(events: Dataset[TierEvent]): Dataset[TierInterval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[TierState, TierInterval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TierEvent], st: GroupState[TierState]) =>
          val (closed, open) = advance(
            it.map(e => (e.us, e.eventId, e.tier)).toSeq, st.getOption)
          open.foreach(st.update)
          closed.map { case (tier, from, to) =>
            TierInterval(user, tier, from, to)
          }.iterator
      }
  }
}
