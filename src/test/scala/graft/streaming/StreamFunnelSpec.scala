package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val W = StreamFunnel.DayUs

  test("advance: strict ordering, window gate, stages fire once") {
    // view at 100; click at 100 is NOT strictly later; click at W+101
    // misses the window; click at 200 advances; purchase chains off t2
    val (out1, c1) = StreamFunnel.advance(
      Seq(("view", 100L), ("click", 100L)), None, W)
    assert(out1 == Seq((1, 100L)) && c1 == FunnelCursor(100L, -1L, -1L))
    val (out2, c2) = StreamFunnel.advance(
      Seq(("click", W + 101L)), Some(c1), W)
    assert(out2.isEmpty && c2.t2 == -1L, "out-of-window click must not advance")
    val (out3, c3) = StreamFunnel.advance(
      Seq(("purchase", 300L), ("click", 200L)), Some(c1), W)
    // sorted fold: click 200 advances first, then purchase 300 chains
    assert(out3 == Seq((2, 200L), (3, 300L)))
    assert(c3 == FunnelCursor(100L, 200L, 300L))
    // nothing fires twice
    val (out4, _) = StreamFunnel.advance(
      Seq(("view", 50L), ("click", 250L), ("purchase", 400L)), Some(c3), W)
    assert(out4.isEmpty, "filled stages must never re-emit")
  }

  test("streaming advances emit across micro-batches, once per stage") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[FunnelEvent]
    val q = StreamFunnel.track(source.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      source.addData(FunnelEvent(7L, "view", 1000L))
      q.processAllAvailable()
      source.addData(FunnelEvent(7L, "click", 2000L),
        FunnelEvent(7L, "purchase", 1500L)) // purchase BEFORE click's t2 → no stage 3
      q.processAllAvailable()
      source.addData(FunnelEvent(7L, "purchase", 2500L))
      q.processAllAvailable()
      val got = spark.table("funnel_out").as[FunnelAdvance].collect()
        .map(a => (a.stage, a.atUs)).sorted.toSeq
      assert(got == Seq((1, 1000L), (2, 2000L), (3, 2500L)), got.toString)
    } finally q.stop()
  }

  test("one-batch history reproduces funnel_window's stages (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.queries.Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").as("userId"), col("event_type").as("step"),
        unix_micros(col("ts")).as("us"))
      .as[FunnelEvent]
    val streamed = StreamFunnel.track(ev)
      .groupBy(col("userId")).agg(max(col("stage")).as("stage_s"))
    val batch = graft.queries.Registry.queries("funnel_window")(spark, dir)
      .select(col("user_id"), col("stage"))
    val joined = batch.join(streamed, col("user_id") === col("userId"), "full_outer")
      .select(col("user_id"), col("userId"), col("stage"), col("stage_s"))
      .collect()
    joined.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1),
        s"user sets must coincide: $r")
      assert(r.getLong(2) == r.getAs[Int]("stage_s").toLong,
        s"stage mismatch for user ${r.getLong(0)}: $r")
    }
    assert(joined.nonEmpty)
  }
}
