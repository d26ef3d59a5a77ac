package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One day-bucketed observation for a metric key (pre-counted: `n`
  * events of `key` on day `dayNo`; a raw event is n = 1). */
final case class DayCountEvent(key: String, dayNo: Long, n: Long)

/** Per-key EWMA state: the OPEN day plus the trailing 12-day count ring —
  * `ring(k)` is the count for day `openDay − k`, so the whole state is
  * 13 longs per key regardless of history length. */
final case class EwmaRing(openDay: Long, ring: Seq[Long])

/** One CLOSED day's smoothed trend point — same algebra as the batch
  * `ts_ewma` row for (key, dayNo). */
final case class EwmaPoint(key: String, dayNo: Long, cnt: Long,
                           ewmaMilli: Long)

/** Streaming EWMA trend line — the speed-layer twin of the batch
  * `ts_ewma` query, and the reason EWMA is THE canonical streaming
  * metric: the trailing-horizon weighted sum needs only a fixed ring of
  * the last 12 daily counts per key, O(1) state carried by
  * `flatMapGroupsWithState` exactly like the sessionizer.
  *
  * Emission contract: a day's point is released when a STRICTLY newer
  * day first arrives for that key — that is the moment the day's count
  * is complete under in-order arrival (the T3 contract every layer
  * shares; same-day events may straddle micro-batches freely, since the
  * open day accumulates in state and is only ever emitted once closed).
  * Gap days close too (cnt 0, trailing mass decaying through them), so
  * a drained stream reproduces the batch grid EXACTLY minus each key's
  * final (still-open) day — pinned by StreamEwmaSpec. Events older than
  * the open day are LATE past the horizon: the point they belong to is
  * already out, so the layer FAILS LOUDLY (throws; rollback-and-replay
  * upstream is the recovery path, the StreamPipeline contract) rather
  * than silently double-emitting or dropping the observation.
  */
object StreamEwma {

  /** Age-k weight 3^k·4^(11−k) and the closed-form normalizer
    * (α = 1/4, 12-day trailing horizon). This is the ONE definition —
    * the batch `ts_ewma` query references it, so stream ≡ batch parity
    * on the weight table holds by construction. */
  val Weights: IndexedSeq[Long] =
    (0 to 11).map(k => math.pow(3, k).toLong * math.pow(4, 11 - k).toLong)
  val Norm: Long = Weights.sum // 4^12 − 3^12

  private def point(key: String, day: Long, ring: Seq[Long]): EwmaPoint = {
    val sw = ring.iterator.zip(Weights.iterator).map { case (c, w) => c * w }.sum
    EwmaPoint(key, day, ring.head, 1000L * sw / Norm)
  }

  /** Pure per-group transition: fold the micro-batch's day counts (any
    * within-batch order — they pre-sum per day) into the ring, closing
    * and emitting every day a newer arrival passes over. Delegates to
    * the shared [[DayRing.advance]] (also the StreamHolt transition —
    * the layers differ only in the per-closed-day emission). Exposed
    * for direct unit testing. */
  def advance(events: Seq[(Long, Long)], state: Option[EwmaRing],
              key: String): (Seq[EwmaPoint], EwmaRing) =
    DayRing.advance(events, state, key)((d, r) => point(key, d, r))

  /** Continuous trend over a stream (or batch frame) of DayCountEvents.
    * Append mode; NoTimeout so `Trigger.AvailableNow` drains terminate
    * (production would arm a ProcessingTimeTimeout to flush the open day
    * after an idle interval — [[SpeedLayer.timeoutConf]]). */
  def trend(events: Dataset[DayCountEvent]): Dataset[EwmaPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaRing, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[DayCountEvent], st: GroupState[EwmaRing]) =>
          val (points, next) =
            advance(it.map(e => (e.dayNo, e.n)).toSeq, st.getOption, key)
          st.update(next)
          points.iterator
      }
  }
}
