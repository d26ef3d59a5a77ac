package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One metric observation (user, event-time micros, integer-cent value). */
final case class MetricEvent(user: Long, us: Long, vq: Long)

/** Per-user running moments: exact BIGINT (n, Σv, Σv²) — the same
  * sufficient statistics the batch `anomaly_zscore` aggregates, carried
  * incrementally. */
final case class MomentState(n: Long, sv: Long, svv: Long)

/** An anomalous observation: z-scored against the user's PRIOR history. */
final case class AnomalyHit(user: Long, us: Long, vq: Long, z: Double,
                            nPrior: Long)

/** Streaming outlier monitor — the speed-layer twin of the batch
  * `anomaly_zscore` query: score each arriving value against its user's
  * OWN history so a fraud/abuse spike alerts while it happens, not at the
  * nightly batch.
  *
  * Two deliberate semantic differences from the batch query, both
  * inherent to detection-at-arrival-time:
  * prior-only scoring (each value is judged against the history BEFORE
  * it — the batch query's leave-nothing-out z includes the value in its
  * own baseline), and a warm-up floor (no verdicts until `minPrior`
  * observations exist, since a 2-point "distribution" flags everything).
  * StreamAnomalySpec pins the prior-scoring recurrence against a hand
  * fold and the stream ≡ single-drain equivalence.
  *
  * State is O(1) per user — three BIGINTs, exact in any arrival order
  * within a batch only after the deterministic (us, vq) sort — and
  * partitioned by key, so the monitor scales horizontally exactly like
  * the sessionizer (StatefulSessions) it shares its skeleton with.
  */
object StreamAnomaly {

  val DefaultMinPrior: Long = 5L
  val DefaultThreshold: Double = 3.0

  /** Pure per-group transition: sort the micro-batch's events into
    * deterministic (us, vq) order, z-score each against the running
    * PRIOR moments, then fold it in. Exposed for direct unit testing. */
  def advance(events: Seq[(Long, Long)], state: Option[MomentState],
              minPrior: Long, threshold: Double)
      : (Seq[(Long, Long, Double, Long)], MomentState) = {
    var st = state.getOrElse(MomentState(0L, 0L, 0L))
    val hits = Seq.newBuilder[(Long, Long, Double, Long)]
    events.sorted.foreach { case (us, vq) =>
      if (st.n >= minPrior) {
        val n = st.n.toDouble
        val mean = st.sv.toDouble / n
        val varPop = (st.svv.toDouble - st.sv.toDouble * st.sv.toDouble / n) / n
        if (varPop > 0.0) {
          val z = (vq.toDouble - mean) / math.sqrt(varPop)
          if (math.abs(z) > threshold) hits += ((us, vq, z, st.n))
        }
      }
      // exact overflow detection, not silent wrap: a wrapped svv makes
      // varPop <= 0 and the guard above would silently DISABLE detection
      // for exactly the largest-value accounts — fail loudly instead
      // (|v| >= ~3e9 cents in one event, or ~9e6 events at ~1e6 cents,
      // overflow the sum of squares)
      st = MomentState(st.n + 1, Math.addExact(st.sv, vq),
        Math.addExact(st.svv, Math.multiplyExact(vq, vq)))
    }
    (hits.result(), st)
  }

  /** Continuous detection over a stream (or batch frame) of MetricEvents.
    * Append mode; NoTimeout so `Trigger.AvailableNow` drains terminate —
    * user state is three longs and never needs eviction at test scale
    * (production would add a state TTL via timeout, like the sessionizer).
    */
  def detect(events: Dataset[MetricEvent],
             minPrior: Long = DefaultMinPrior,
             threshold: Double = DefaultThreshold): Dataset[AnomalyHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[MomentState, AnomalyHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[MetricEvent], st: GroupState[MomentState]) =>
          val (hits, next) = advance(
            it.map(e => (e.us, e.vq)).toSeq, st.getOption, minPrior, threshold)
          st.update(next)
          hits.map { case (us, vq, z, np) =>
            AnomalyHit(user, us, vq, z, np)
          }.iterator
      }
  }
}
