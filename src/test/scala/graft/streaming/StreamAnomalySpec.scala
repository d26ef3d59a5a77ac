package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("advance: warm-up floor, zero-variance guard, prior-only scoring") {
    // five identical warm-up values: below minPrior nothing is judged,
    // and once judged, zero variance never divides
    val (h0, s0) = StreamAnomaly.advance(
      (1L to 6L).map(i => (i, 100L)), None, 5L, 3.0)
    assert(h0.isEmpty && s0 == MomentState(6L, 600L, 60000L))
    // a spike against the flat prior flags; the spike's own contribution
    // is NOT in its baseline
    val varied = (7L to 10L).map(i => (i, 100L + (i % 2))) :+ (11L, 500L)
    val (h1, s1) = StreamAnomaly.advance(varied, Some(s0), 5L, 3.0)
    assert(h1.map(t => (t._1, t._2)) == Seq((11L, 500L)))
    val prior = MomentState(10L, s1.sv - 500L, s1.svv - 500L * 500L)
    val mean = prior.sv.toDouble / prior.n
    val v = (prior.svv.toDouble - prior.sv.toDouble * prior.sv / prior.n) / prior.n
    assert(math.abs(h1.head._3 - (500.0 - mean) / math.sqrt(v)) < 1e-12)
    assert(h1.head._4 == 10L)
    // the spike is folded into state afterwards
    assert(s1.n == 11L && s1.sv == prior.sv + 500L)
  }

  test("stream across micro-batches equals one sequential fold") {
    implicit val sqlCtx = spark.sqlContext
    val all = ((1L to 8L).map(i => MetricEvent(3L, i, 100L + (i % 3))) :+
      MetricEvent(3L, 9L, 900L)) ++
      (1L to 7L).map(i => MetricEvent(4L, i, 50L)) // flat user: no hits ever
    val source = MemoryStream[MetricEvent]
    val q = StreamAnomaly.detect(source.toDS())
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(9)
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
      val got = spark.table("anomaly_out").as[AnomalyHit].collect()
        .map(h => (h.user, h.us, h.vq, h.z, h.nPrior)).sorted.toSeq
      val expected = all.groupBy(_.user).toSeq.flatMap { case (u, evs) =>
        StreamAnomaly.advance(evs.map(e => (e.us, e.vq)), None,
          StreamAnomaly.DefaultMinPrior, StreamAnomaly.DefaultThreshold)
          ._1.map(t => (u, t._1, t._2, t._3, t._4))
      }.sorted
      assert(got == expected && got.nonEmpty)
      assert(got.forall(_._1 == 3L), "flat user must never alert")
    } finally q.stop()
  }
}
