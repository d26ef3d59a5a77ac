package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Split-invariance property for the three day-fold speed layers: for
  * ANY in-order day/count sequence (random gaps, repeated days, zero
  * counts) and ANY micro-batch partitioning of it, the piecewise
  * advance must emit exactly the points of the one-shot advance and
  * land in the same state. This is THE streaming correctness property —
  * micro-batch boundaries are an infrastructure accident the semantics
  * must not see — and the real-data parity specs only ever exercise one
  * midpoint split. Deterministic scalacheck-style generation (seeded
  * LCG, the repo's fixed-seed discipline) keeps every run reproducible.
  */
class DayRingPropertySpec extends AnyFunSuite {

  /** Tiny deterministic LCG so failures reproduce exactly. */
  private final class Lcg(seed: Long) {
    private var s = seed
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound) + bound).toInt % bound
    }
  }

  /** Random in-order (day, n) events: gaps 0..4, repeated days, n 0..9. */
  private def genEvents(seed: Long): Seq[(Long, Long)] = {
    val r = new Lcg(seed)
    var day = 100L + r.next(50)
    (0 until (5 + r.next(60))).map { _ =>
      day += r.next(5) // 0 keeps the day open across events
      (day, r.next(10).toLong)
    }
  }

  /** Random partition of events into consecutive micro-batches. */
  private def genSplits(events: Seq[(Long, Long)], seed: Long): Seq[Seq[(Long, Long)]] = {
    val r = new Lcg(seed ^ 0x9e3779b97f4a7c15L)
    val out = Seq.newBuilder[Seq[(Long, Long)]]
    var rest = events
    while (rest.nonEmpty) {
      val k = 1 + r.next(math.min(rest.length, 7))
      out += rest.take(k)
      rest = rest.drop(k)
    }
    out.result()
  }

  private def checkSplitInvariance[P, S](
      advance: (Seq[(Long, Long)], Option[S]) => (Seq[P], S),
      events: Seq[(Long, Long)], batches: Seq[Seq[(Long, Long)]]): Unit = {
    val (onePoints, oneState) = advance(events, None)
    var st: Option[S] = None
    val pieces = Seq.newBuilder[P]
    batches.foreach { b =>
      val (ps, s2) = advance(b, st)
      pieces ++= ps
      st = Some(s2)
    }
    assert(pieces.result() === onePoints)
    assert(st.get === oneState)
  }

  test("StreamEwma / StreamHolt / StreamCusum advances are micro-batch-split invariant") {
    (0L until 60L).foreach { seed =>
      val events = genEvents(seed)
      val batches = genSplits(events, seed)
      checkSplitInvariance[EwmaPoint, EwmaRing](
        (es, st) => StreamEwma.advance(es, st, "k"), events, batches)
      checkSplitInvariance[HoltPoint, EwmaRing](
        (es, st) => StreamHolt.advance(es, st, "k"), events, batches)
      val mu = 1000L + new Lcg(seed).next(5000)
      checkSplitInvariance[CusumPoint, CusumState](
        (es, st) => StreamCusum.advance(es, st, "k", mu), events, batches)
    }
  }

  test("every closed day emits exactly once, in order, with gaps filled") {
    (0L until 30L).foreach { seed =>
      val events = genEvents(seed)
      val (points, state) = StreamEwma.advance(events, None, "k")
      val d0 = events.head._1
      assert(points.map(_.dayNo) === (d0 until state.openDay))
      // closed-day counts match the raw per-day sums
      val byDay = events.groupBy(_._1).map { case (d, es) => d -> es.map(_._2).sum }
      points.foreach(p => assert(p.cnt === byDay.getOrElse(p.dayNo, 0L)))
    }
  }
}
