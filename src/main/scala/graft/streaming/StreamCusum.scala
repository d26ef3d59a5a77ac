package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key CUSUM state: the open day's accumulating count plus the
  * running one-sided statistic over all CLOSED days — three longs per
  * key regardless of history length. */
final case class CusumState(openDay: Long, openCnt: Long, s: Long)

/** One CLOSED day's CUSUM point — same fold step as the batch
  * `ts_cusum` row for (key, dayNo) under the same reference mean. */
final case class CusumPoint(key: String, dayNo: Long, cnt: Long,
                            cusumMilli: Long, alarm: Boolean)

/** Streaming CUSUM drift alarm — the speed-layer twin of the batch
  * `ts_cusum` query, with ONE declared semantic difference the parity
  * spec encodes rather than hides: the batch query derives the
  * reference mean μ from the corpus's full day grid, which a stream
  * cannot see without look-ahead, so this layer takes μ per key as an
  * INPUT (production feeds the batch stats of the previous corpus
  * snapshot, or a frozen reference window — exactly how production
  * CUSUM charts are parameterized). Given the same μ table, the stream
  * fold is the batch fold: drained stream ≡ batch grid minus each key's
  * open day, pinned by StreamCusumSpec. State is O(1) — (openDay,
  * openCnt, S) — and the emission/late contracts match the DayRing
  * layers: a day closes when a strictly newer day arrives, gap days
  * close at count 0 (the statistic DECAYS through them by −(μ+κ) per
  * day, floored at 0), and a late event past the horizon throws.
  */
object StreamCusum {

  /** Pure per-group transition. κ = μ/4 (slack) and h = μ (alarm) are
    * the batch constants — one definition of the fold step, asserted
    * equal to the batch readout by the spec. */
  def advance(events: Seq[(Long, Long)], state: Option[CusumState],
              key: String, muMilli: Long): (Seq[CusumPoint], CusumState) = {
    val drift = muMilli + muMilli / 4L
    val byDay = events.groupBy(_._1).toSeq
      .map { case (d, es) => d -> es.map(_._2).sum }.sortBy(_._1)
    var st = state.orNull
    val out = Seq.newBuilder[CusumPoint]
    byDay.foreach { case (d, n) =>
      if (st == null)
        st = CusumState(d, n, 0L)
      else if (d < st.openDay)
        throw new IllegalStateException(
          s"late event past the emission horizon: key=$key day=$d " +
            s"openDay=${st.openDay} — upstream must replay in day order")
      else if (d == st.openDay)
        st = st.copy(openCnt = st.openCnt + n)
      else {
        // close openDay .. d−1 (gap days carry count 0)
        var (day, cnt, s) = (st.openDay, st.openCnt, st.s)
        while (day < d) {
          s = math.max(0L, s + cnt * 1000L - drift)
          out += CusumPoint(key, day, cnt, s, s > muMilli)
          day += 1
          cnt = 0L
        }
        st = CusumState(d, n, s)
      }
    }
    (out.result(), st)
  }

  /** Continuous drift alarms over a stream (or batch frame) of
    * DayCountEvents. `muMilli` maps each key to its reference mean
    * (keys absent from the map are monitored against the `default`).
    * Append mode; NoTimeout so `Trigger.AvailableNow` drains terminate
    * ([[SpeedLayer.timeoutConf]] arms the production idle flush). */
  def alarms(events: Dataset[DayCountEvent], muMilli: Map[String, Long],
             default: Long = 0L): Dataset[CusumPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[DayCountEvent], st: GroupState[CusumState]) =>
          val (points, next) = advance(it.map(e => (e.dayNo, e.n)).toSeq,
            st.getOption, key, muMilli.getOrElse(key, default))
          st.update(next)
          points.iterator
      }
  }
}
