package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  test("advance: folds closed days, decays through gaps, floors at zero") {
    val mu = 2000L // drift = mu + mu/4 = 2500 milli
    val (e0, s0) = StreamCusum.advance(Seq((10L, 5L)), None, "k", mu)
    assert(e0.isEmpty && s0 == CusumState(10L, 5L, 0L))
    // day 13 closes 10 (5000 - 2500 = 2500, alarm), 11 and 12 (gaps decay)
    val (e1, s1) = StreamCusum.advance(Seq((13L, 1L)), Some(s0), "k", mu)
    assert(e1 === Seq(
      CusumPoint("k", 10L, 5L, 2500L, true),
      CusumPoint("k", 11L, 0L, 0L, false), // 2500 - 2500
      CusumPoint("k", 12L, 0L, 0L, false))) // floored
    assert(s1 === CusumState(13L, 1L, 0L))
    intercept[IllegalStateException] {
      StreamCusum.advance(Seq((11L, 1L)), Some(s1), "k", mu)
    }
  }

  test("stream with the batch mu equals ts_cusum minus open days") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        expr("unix_micros(ts) div 86400000000").as("dayNo"),
        lit(1L).as("n"))
      .as[DayCountEvent].collect().sortBy(e => (e.key, e.dayNo)).toSeq
    // the declared semantic difference: the stream cannot derive the
    // corpus mean without look-ahead, so it is FED the batch mu table
    val mu = events.groupBy(_.key).map { case (k, es) =>
      val ds = es.map(_.dayNo)
      k -> es.map(_.n).sum * 1000L / (ds.max - ds.min + 1)
    }
    val source = MemoryStream[DayCountEvent]
    val q = StreamCusum.alarms(source.toDS(), mu)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = events.splitAt(events.length / 2)
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
      val got = spark.table("cusum_out").as[CusumPoint].collect()
        .map(p => (p.key, p.dayNo) -> ((p.cnt, p.cusumMilli, p.alarm))).toMap
      val batch = Registry.queries("ts_cusum")(spark, sfDir).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
          ((r.getAs[Long]("cnt"), r.getAs[Long]("cusum_milli"),
            r.getAs[Boolean]("alarm")))).toMap
      val openDays = batch.keys.groupBy(_._1).map { case (k, ks) =>
        k -> ks.map(_._2).max
      }
      val expected = batch.filter { case ((k, d), _) => d < openDays(k) }
      assert(got === expected)
      assert(got.size > 100)
    } finally q.stop()
  }
}
