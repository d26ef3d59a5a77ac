package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamScd2Spec extends SparkSpec {
  import spark.implicits._

  test("advance: opens, holds, closes versions; tiebreak by event id") {
    val (c0, s0) = StreamScd2.advance(Seq((100L, 1L, "low")), None)
    assert(c0.isEmpty && s0.contains(TierState("low", 100L)))
    // same tier: no new version; change closes [100, 199]
    val (c1, s1) = StreamScd2.advance(
      Seq((150L, 2L, "low"), (200L, 3L, "mid")), s0)
    assert(c1 == Seq(("low", 100L, 199L)))
    assert(s1.contains(TierState("mid", 200L)))
    // two changes in one batch close two versions in order
    val (c2, s2) = StreamScd2.advance(
      Seq((400L, 5L, "mid"), (300L, 4L, "high")), s1)
    assert(c2 == Seq(("mid", 200L, 299L), ("high", 300L, 399L)))
    assert(s2.contains(TierState("mid", 400L)))
  }

  test("one-batch drain reproduces cdc_scd2's closed intervals (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("user"), unix_micros(col("ts")).as("us"),
        col("event_id").as("eventId"),
        expr("CASE WHEN value < 50.0 THEN 'low' WHEN value < 150.0 THEN 'mid' " +
          "ELSE 'high' END").as("tier"))
      .as[TierEvent]
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[TierEvent]
    val q = StreamScd2.maintain(source.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      source.addData(ev.collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("scd2_out").as[TierInterval].collect()
        .map(i => (i.user, i.tier, i.validFrom, i.validTo)).sorted.toSeq
      val batch = graft.queries.Registry.queries("cdc_scd2")(spark, dir)
        .where(!col("is_current"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("tier"),
          r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to")))
        .sorted.toSeq
      assert(streamed === batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("split delivery equals one drain when batches respect per-user order") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      TierEvent(1L, 100L, 1L, "low"), TierEvent(1L, 200L, 2L, "mid"),
      TierEvent(1L, 300L, 3L, "mid"), TierEvent(1L, 400L, 4L, "high"),
      TierEvent(2L, 100L, 5L, "high"))
    val source = MemoryStream[TierEvent]
    val q = StreamScd2.maintain(source.toDS())
      .writeStream.format("memory").queryName("scd2_out2")
      .outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(2)
      source.addData(b1); q.processAllAvailable()
      source.addData(b2); q.processAllAvailable()
      val got = spark.table("scd2_out2").as[TierInterval].collect()
        .map(i => (i.user, i.tier, i.validFrom, i.validTo)).sorted.toSeq
      assert(got === Seq((1L, "low", 100L, 199L), (1L, "mid", 200L, 399L)))
    } finally q.stop()
  }
}
