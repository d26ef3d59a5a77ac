package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** One event for the stateful sessionizer (person + event-time micros). */
final case class SessionEvent(person: String, us: Long)

/** Per-person open-session accumulator carried across micro-batches. */
final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

/** A closed session emitted downstream. */
final case class ClosedSession(person: String, startUs: Long, endUs: Long,
                               nEvents: Long, durationSec: Double)

/** T4 — the reference's cross-row stateful accumulation
  * (`/root/reference/src/KissmetricsToDatabase.php:462-497` carries
  * identity/cluster maps across rows), generalized to the low-latency
  * streaming shape: `flatMapGroupsWithState` over a
  * `KeyValueGroupedDataset`, keyed by person, with explicit timeout-driven
  * session close.
  *
  * State size is O(open sessions) — one small case class per active person
  * — and partitioned by key, so it scales horizontally with executors; the
  * batch twin of this operator is the `events_sessionize` window query
  * (same gap semantics, zero state).
  */
object StatefulSessions {

  val DefaultGapUs: Long = 30L * 60 * 1000000 // 30 min, matches the batch query

  /** Pure per-group transition: fold sorted new events into the open
    * session, emitting a ClosedSession whenever a gap exceeds `gapUs`.
    * Exposed for direct unit testing without a streaming harness.
    *
    * Cross-batch disorder: within a batch events sort first, but a LATE
    * event (us ≤ the open session's lastUs, arriving in a later batch)
    * must not move the session boundary backwards — it ABSORBS into the
    * open session (count up, start extended earlier if needed, lastUs
    * monotone), the same late-data stance the sibling speed layers take
    * (StreamStreaks' day guard, StreamAsOf's monotonic click guard).
    * Without the min/max the state could regress lastUs below startUs
    * and emit negative-duration sessions or spurious splits.
    */
  def advance(events: Seq[Long], state: Option[SessionState], gapUs: Long)
      : (Seq[SessionState], Option[SessionState]) = {
    var open = state
    val closed = Seq.newBuilder[SessionState]
    events.sorted.foreach { us =>
      open match {
        case Some(s) if us - s.lastUs > gapUs =>
          closed += s
          open = Some(SessionState(us, us, 1))
        case Some(s) =>
          open = Some(SessionState(math.min(s.startUs, us),
            math.max(s.lastUs, us), s.nEvents + 1))
        case None =>
          open = Some(SessionState(us, us, 1))
      }
    }
    (closed.result(), open)
  }

  private def toClosed(person: String, s: SessionState): ClosedSession =
    ClosedSession(person, s.startUs, s.lastUs, s.nEvents,
      (s.lastUs - s.startUs) / 1e6)

  /** @param timeoutMs close idle sessions after this processing-time gap.
    *   None (default) = no timers: sessions close only when a later event
    *   proves the gap — the right mode for `Trigger.AvailableNow` drains,
    *   where pending timers would keep scheduling micro-batches and the
    *   query would never terminate. Set for continuous deployments.
    */
  def sessionize(events: Dataset[SessionEvent],
                 gapUs: Long = DefaultGapUs,
                 timeoutMs: Option[Long] = None): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = SpeedLayer.timeoutConf(timeoutMs)
    events.groupByKey(_.person)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeoutConf) {
        (person: String, it: Iterator[SessionEvent], st: GroupState[SessionState]) =>
          if (st.hasTimedOut) {
            // idle person: close whatever is open
            val out = st.getOption.map(toClosed(person, _)).toSeq
            st.remove()
            out.iterator
          } else {
            val (closed, open) =
              advance(it.map(_.us).toSeq, st.getOption, gapUs)
            open match {
              case Some(s) =>
                st.update(s)
                timeoutMs.foreach(st.setTimeoutDuration)
              case None => st.remove()
            }
            closed.map(s => toClosed(person, s)).iterator
          }
      }
  }
}
