package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One activity observation: (user, epoch day). */
final case class DayEvent(user: Long, day: Long)

/** Per-user streak accumulator: the open streak plus lifetime stats. */
final case class StreakState(lastDay: Long, curStart: Long, curLen: Long,
                             longestLen: Long, longestStart: Long,
                             nDays: Long, nStreaks: Long)

/** A streak update emitted for each NEW active day — the row a "7-day
  * streak" badge service consumes. */
final case class StreakUpdate(user: Long, day: Long, curStreak: Long,
                              longestStreak: Long, longestStart: Long,
                              nActiveDays: Long, nStreaks: Long)

/** Streaming gaps-and-islands — the speed layer of the batch
  * `streak_islands` query: each user's open consecutive-day streak rides
  * in O(1) state; every first-sighting of a day appends an update row
  * with the current and lifetime-longest streak. Ties on longest length
  * keep the EARLIEST start (the batch query's min-start rule, which the
  * chronological fold gets for free by replacing only on strictly longer).
  * Repeated events within a day and late re-deliveries of already-counted
  * days are absorbed by the `day > lastDay` guard; as with the other
  * speed-layer twins, cross-batch delivery is assumed per-user in order.
  * StreamStreaksSpec pins the fold and final-state ≡ batch equivalence.
  */
object StreamStreaks {

  /** Pure per-group transition, exposed for direct unit testing. */
  def advance(days: Seq[Long], state: Option[StreakState])
      : (Seq[StreakUpdate], Option[StreakState]) = {
    var st = state.orNull
    val out = Seq.newBuilder[StreakUpdate]
    // sorted + distinct: several events in one micro-batch may share a day
    days.distinct.sorted.foreach { d =>
      val advanced =
        if (st == null) {
          st = StreakState(d, d, 1L, 1L, d, 1L, 1L); true
        } else if (d > st.lastDay) {
          val (start, len, streaks) =
            if (d == st.lastDay + 1) (st.curStart, st.curLen + 1, st.nStreaks)
            else (d, 1L, st.nStreaks + 1)
          val (bl, bs) =
            if (len > st.longestLen) (len, start)
            else (st.longestLen, st.longestStart)
          st = StreakState(d, start, len, bl, bs, st.nDays + 1, streaks)
          true
        } else false // already-counted or stale day: no state change, no emit
      if (advanced)
        out += StreakUpdate(0L, d, st.curLen, st.longestLen, st.longestStart,
          st.nDays, st.nStreaks)
    }
    (out.result(), Option(st))
  }

  def track(events: Dataset[DayEvent]): Dataset[StreakUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[StreakState, StreakUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[DayEvent], st: GroupState[StreakState]) =>
          val (ups, next) = advance(it.map(_.day).toSeq, st.getOption)
          next.foreach(st.update)
          ups.map(_.copy(user = user)).iterator
      }
  }
}
