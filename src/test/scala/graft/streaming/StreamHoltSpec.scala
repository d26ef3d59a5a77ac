package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

class StreamHoltSpec extends SparkSpec {
  import spark.implicits._

  test("advance: closes days in order, emits level/trend/forecast from the ring") {
    val (e0, s0) = StreamHolt.advance(Seq((10L, 4L)), None, "k")
    assert(e0.isEmpty && s0 == EwmaRing(10L, 4L +: Seq.fill(11)(0L)))
    // day 12 arrives: days 10 and 11 close (11 is a gap day)
    val (e1, s1) = StreamHolt.advance(Seq((12L, 6L)), Some(s0), "k")
    assert(e1.map(p => (p.dayNo, p.cnt)) === Seq((10L, 4L), (11L, 0L)))
    val (wl, wb) = (StreamHolt.LevelWeights, StreamHolt.TrendWeights)
    def milli(s: Long): Long =
      math.floor((1000L * s).toDouble / StreamHolt.Scale).toLong
    assert(e1(0).levelMilli === milli(4L * wl(0)))
    assert(e1(0).trendMilli === milli(4L * wb(0)))
    assert(e1(0).forecastMilli === milli(4L * wl(0) + 4L * wb(0)))
    assert(e1(1).levelMilli === milli(4L * wl(1)))
    assert(s1.openDay === 12L && s1.ring(2) === 4L)
    // late event past the horizon fails loudly (the shared DayRing contract)
    intercept[IllegalStateException] {
      StreamHolt.advance(Seq((10L, 1L)), Some(s1), "k")
    }
  }

  test("stream across micro-batches equals the batch ts_holt grid minus open days") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        expr("unix_micros(ts) div 86400000000").as("dayNo"),
        lit(1L).as("n"))
      .as[DayCountEvent].collect().sortBy(e => (e.key, e.dayNo)).toSeq
    val source = MemoryStream[DayCountEvent]
    val q = StreamHolt.trend(source.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = events.splitAt(events.length / 2)
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
      val got = spark.table("holt_out").as[HoltPoint].collect()
        .map(p => (p.key, p.dayNo) ->
          ((p.cnt, p.levelMilli, p.trendMilli, p.forecastMilli))).toMap
      val batch = Registry.queries("ts_holt")(spark, sfDir).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("level_milli"),
            r.getAs[Long]("trend_milli"), r.getAs[Long]("forecast_milli"))))
        .toMap
      val openDays = batch.keys.groupBy(_._1).map { case (k, ks) =>
        k -> ks.map(_._2).max
      }
      val expected = batch.filter { case ((k, d), _) => d < openDays(k) }
      assert(got === expected)
      assert(got.size > 100)
    } finally q.stop()
  }
}
