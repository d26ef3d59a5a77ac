package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  // --- pure transition function ---

  test("advance folds in event-time order regardless of arrival order") {
    // purchase arrives FIRST in the batch but happens AFTER the click
    val (out, st) = StreamAsOf.advance(Seq(
      FlowEvent(1L, 200L, isClick = false, eventId = 9L),
      FlowEvent(1L, 100L, isClick = true, eventId = 5L)), None)
    assert(out == Seq(AttributedPurchase(1L, 9L, 200L, 5L, 100L, 100L)))
    assert(st.contains(ClickState(100L, 5L)))
  }

  test("advance is strict: an equal-timestamp click does not attribute") {
    val (out, _) = StreamAsOf.advance(Seq(
      FlowEvent(1L, 100L, isClick = true, eventId = 5L),
      FlowEvent(1L, 100L, isClick = false, eventId = 9L)), None)
    assert(out == Seq(AttributedPurchase(1L, 9L, 100L, -1L, -1L, -1L)))
  }

  test("advance keeps the (us, eventId)-max click on ties and across batches") {
    val (_, st1) = StreamAsOf.advance(Seq(
      FlowEvent(1L, 100L, isClick = true, eventId = 5L),
      FlowEvent(1L, 100L, isClick = true, eventId = 8L),
      FlowEvent(1L, 100L, isClick = true, eventId = 3L)), None)
    assert(st1.contains(ClickState(100L, 8L)))
    // an older click in a later batch must NOT regress the state
    val (out, st2) = StreamAsOf.advance(Seq(
      FlowEvent(1L, 50L, isClick = true, eventId = 99L),
      FlowEvent(1L, 150L, isClick = false, eventId = 20L)), st1)
    assert(st2 == st1)
    assert(out == Seq(AttributedPurchase(1L, 20L, 150L, 8L, 100L, 50L)))
  }

  // --- end-to-end: state survives across separate AvailableNow runs ---

  test("click state carries across micro-batch runs through the checkpoint") {
    val in = Files.createTempDirectory("asof-in").toString
    val ckpt = Files.createTempDirectory("asof-ckpt").toString
    val out = Files.createTempDirectory("asof-out").toString
    val schema = StructType(Seq(
      StructField("userId", LongType), StructField("us", LongType),
      StructField("isClick", BooleanType), StructField("eventId", LongType)))

    // memory sinks cannot resume from a checkpoint; a parquet sink can —
    // and resuming is the point of this test (state lives in the ckpt).
    def run(): Unit = {
      val events = spark.readStream.schema(schema).json(in).as[FlowEvent]
      val q = StreamAsOf.enrich(events)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append").format("parquet")
        .option("path", out).start()
      q.awaitTermination()
    }
    def results(): Set[AttributedPurchase] =
      spark.read.parquet(out).as[AttributedPurchase].collect().toSet

    // run 1: user 1 clicks at t=100; user 2 purchases with no click
    Files.writeString(Paths.get(in, "b1.json"), Seq(
      """{"userId":1,"us":100,"isClick":true,"eventId":5}""",
      """{"userId":2,"us":100,"isClick":false,"eventId":6}""").mkString("\n"))
    run()
    assert(results() == Set(AttributedPurchase(2L, 6L, 100L, -1L, -1L, -1L)))

    // run 2: user 1 purchases — attributed to the click from run 1
    Files.writeString(Paths.get(in, "b2.json"), Seq(
      """{"userId":1,"us":300,"isClick":false,"eventId":7}""").mkString("\n"))
    run()
    assert(results() == Set(
      AttributedPurchase(2L, 6L, 100L, -1L, -1L, -1L),
      AttributedPurchase(1L, 7L, 300L, 5L, 100L, 200L)))
  }
}
