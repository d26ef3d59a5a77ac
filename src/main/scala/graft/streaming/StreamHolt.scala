package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One CLOSED day's Holt trend point — same algebra as the batch
  * `ts_holt` row for (key, dayNo): smoothed level, slope, and the
  * one-step forecast level + trend. */
final case class HoltPoint(key: String, dayNo: Long, cnt: Long,
                           levelMilli: Long, trendMilli: Long,
                           forecastMilli: Long)

/** Shared day-ring transition for the trailing-horizon speed layers
  * (StreamEwma, StreamHolt — both carry the same [[EwmaRing]] state
  * shape: the OPEN day plus the trailing 12-day count ring). Folds a
  * micro-batch's pre-summed day counts into the state, emitting one
  * point per CLOSED day — gap days close with count 0 so trailing mass
  * decays through them — and failing LOUDLY on a late event past the
  * horizon (the T3 in-order contract: the point it belongs to is
  * already emitted, so rollback-and-replay upstream is the only honest
  * recovery). Extracted verbatim from StreamEwma when StreamHolt
  * arrived; the two layers differ ONLY in what they emit per closed
  * day, which is exactly the `emit` parameter. */
object DayRing {
  def advance[P](events: Seq[(Long, Long)], state: Option[EwmaRing],
                 key: String)(emit: (Long, Seq[Long]) => P)
      : (Seq[P], EwmaRing) = {
    val byDay = events.groupBy(_._1).toSeq
      .map { case (d, es) => d -> es.map(_._2).sum }.sortBy(_._1)
    var st = state.orNull
    val out = Seq.newBuilder[P]
    byDay.foreach { case (d, n) =>
      if (st == null)
        st = EwmaRing(d, n +: Seq.fill(11)(0L))
      else if (d < st.openDay)
        throw new IllegalStateException(
          s"late event past the emission horizon: key=$key day=$d " +
            s"openDay=${st.openDay} — upstream must replay in day order")
      else if (d == st.openDay)
        st = st.copy(ring = (st.ring.head + n) +: st.ring.tail)
      else {
        // close openDay .. d−1, sliding the ring one day at a time so
        // gap days emit their zero-count decaying points too
        var (day, ring) = (st.openDay, st.ring)
        while (day < d) {
          out += emit(day, ring)
          ring = 0L +: ring.init
          day += 1
        }
        st = EwmaRing(d, (ring.head + n) +: ring.tail)
      }
    }
    (out.result(), st)
  }
}

/** Streaming Holt linear trend — the speed-layer twin of the batch
  * `ts_holt` query: level + slope + one-step forecast from the same
  * fixed 12-day count ring StreamEwma carries (O(1) state per key; the
  * coupled recurrence collapses to two weighted sums over the ring
  * because the dyadic coefficient tables below ARE the recurrence).
  * Emission contract identical to StreamEwma (a day closes when a
  * strictly newer day arrives; gaps close at zero; late-past-horizon
  * throws) — both delegate to [[DayRing.advance]], so the contracts
  * cannot drift. Drained stream ≡ batch ts_holt grid minus each key's
  * open day, pinned by StreamHoltSpec.
  */
object StreamHolt {

  /** Exact dyadic Holt coefficient tables — the ONE definition; the
    * batch `ts_holt` query references these, so stream ≡ batch parity
    * on the tables holds by construction (the StreamEwma.Weights
    * ownership pattern). Index k = age of the observation (0 = the
    * current day), numerators over 2^24. Derived at class-init by
    * running the recurrence l' = (y + l + b)/2, b' = (l' − l)/2 + b/2
    * SYMBOLICALLY: the state is each observation's coefficient in
    * (level, trend) as BigInt numerators over 2^60; with α = β = 1/2
    * every update is a halving, exactness asserted at each step (≤ 23
    * halvings reach any coefficient, so 2^24 scaling is lossless — the
    * assert turns silent truncation into a failed class-init). The
    * coupled system's eigenvalues are complex, so BOTH tables oscillate
    * negative — why every readout floors a double quotient instead of
    * sign-divergent integer div. */
  val Scale: Long = 1L << 24
  val Horizon: Int = 12
  private val derivedWeights: (IndexedSeq[Long], IndexedSeq[Long]) = {
    val S = 60
    def half(n: BigInt): BigInt = {
      require(!n.testBit(0), s"Holt halving lost a bit: $n")
      n >> 1
    }
    var l = Vector.fill(Horizon)(BigInt(0))
    var b = Vector.fill(Horizon)(BigInt(0))
    val one = BigInt(1) << S
    for (i <- 0 until Horizon) {
      val l2 = Vector.tabulate(Horizon) { j =>
        half((if (j == i) one else BigInt(0)) + l(j) + b(j))
      }
      val b2 = Vector.tabulate(Horizon) { j => half(l2(j) - l(j)) + half(b(j)) }
      l = l2; b = b2
    }
    val down = BigInt(1) << (S - 24)
    def scaled(v: Vector[BigInt]): IndexedSeq[Long] = (0 until Horizon).map { k =>
      val n = v(Horizon - 1 - k) // age k = the last-processed obs
      require(n % down == 0, s"Holt weight not representable over 2^24: $n")
      (n / down).toLong
    }
    (scaled(l), scaled(b))
  }
  val LevelWeights: IndexedSeq[Long] = derivedWeights._1
  val TrendWeights: IndexedSeq[Long] = derivedWeights._2

  private def point(key: String, day: Long, ring: Seq[Long]): HoltPoint = {
    val sl = ring.iterator.zip(LevelWeights.iterator).map { case (c, w) => c * w }.sum
    val sb = ring.iterator.zip(TrendWeights.iterator).map { case (c, w) => c * w }.sum
    // (1000·s) AS LONG first, then ONE double division — the exact
    // operation order of the batch readout, so the floored quotient is
    // bit-identical to ts_holt's
    def milli(s: Long): Long = math.floor((1000L * s).toDouble / Scale).toLong
    HoltPoint(key, day, ring.head, milli(sl), milli(sb), milli(sl + sb))
  }

  /** Pure per-group transition — see [[DayRing.advance]]. Exposed for
    * direct unit testing. */
  def advance(events: Seq[(Long, Long)], state: Option[EwmaRing],
              key: String): (Seq[HoltPoint], EwmaRing) =
    DayRing.advance(events, state, key)((d, r) => point(key, d, r))

  /** Continuous level/trend/forecast over a stream (or batch frame) of
    * DayCountEvents. Append mode; NoTimeout so `Trigger.AvailableNow`
    * drains terminate ([[SpeedLayer.timeoutConf]] arms the production
    * idle flush). */
  def trend(events: Dataset[DayCountEvent]): Dataset[HoltPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[EwmaRing, HoltPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, it: Iterator[DayCountEvent], st: GroupState[EwmaRing]) =>
          val (points, next) =
            advance(it.map(e => (e.dayNo, e.n)).toSeq, st.getOption, key)
          st.update(next)
          points.iterator
      }
  }
}
