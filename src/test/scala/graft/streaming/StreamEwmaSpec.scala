package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("advance: closes days in order, decays through gaps, accumulates the open day") {
    // day 10: 5 events across two calls (open-day accumulation)
    val (e0, s0) = StreamEwma.advance(Seq((10L, 3L)), None, "k")
    assert(e0.isEmpty && s0 == EwmaRing(10L, 3L +: Seq.fill(11)(0L)))
    val (e1, s1) = StreamEwma.advance(Seq((10L, 2L)), Some(s0), "k")
    assert(e1.isEmpty && s1.ring.head == 5L)
    // day 13 arrives: days 10, 11, 12 close — 11 and 12 are gap days
    val (e2, s2) = StreamEwma.advance(Seq((13L, 7L)), Some(s1), "k")
    assert(e2.map(p => (p.dayNo, p.cnt)) == Seq((10L, 5L), (11L, 0L), (12L, 0L)))
    val w = StreamEwma.Weights
    assert(e2(0).ewmaMilli == 1000L * 5L * w(0) / StreamEwma.Norm)
    assert(e2(1).ewmaMilli == 1000L * 5L * w(1) / StreamEwma.Norm)
    assert(e2(2).ewmaMilli == 1000L * 5L * w(2) / StreamEwma.Norm)
    assert(s2.openDay == 13L && s2.ring.head == 7L && s2.ring(3) == 5L)
    // late event past the horizon fails loudly
    intercept[IllegalStateException] {
      StreamEwma.advance(Seq((11L, 1L)), Some(s2), "k")
    }
  }

  test("stream across micro-batches equals the batch ts_ewma grid minus open days") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        expr("unix_micros(ts) div 86400000000").as("dayNo"),
        lit(1L).as("n"))
      .as[DayCountEvent].collect().sortBy(e => (e.key, e.dayNo)).toSeq
    val source = MemoryStream[DayCountEvent]
    val q = StreamEwma.trend(source.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      // split INSIDE a day (day order preserved per key because the
      // input is key-day sorted) to prove open-day accumulation across
      // micro-batches
      val (b1, b2) = events.splitAt(events.length / 2)
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
      val got = spark.table("ewma_out").as[EwmaPoint].collect()
        .map(p => (p.key, p.dayNo) -> ((p.cnt, p.ewmaMilli))).toMap
      val batch = Registry.queries("ts_ewma")(spark, sfDir).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("ewma_milli")))).toMap
      val openDays = batch.keys.groupBy(_._1).map { case (k, ks) =>
        k -> ks.map(_._2).max
      }
      val expected = batch.filter { case ((k, d), _) => d < openDays(k) }
      assert(got === expected)
      assert(got.size > 100)
    } finally q.stop()
  }
}
