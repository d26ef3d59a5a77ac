package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.NdjsonReader

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = StatefulSessions.DefaultGapUs

  // --- pure transition function ---

  test("advance folds events into one session within the gap") {
    val (closed, open) = StatefulSessions.advance(
      Seq(0L, 60000000L, 120000000L), None, Gap)
    assert(closed.isEmpty)
    assert(open.contains(SessionState(0L, 120000000L, 3)))
  }

  test("advance closes a session when the gap is exceeded") {
    val later = Gap + 200000000L
    val (closed, open) = StatefulSessions.advance(
      Seq(0L, 100000000L, later), None, Gap)
    assert(closed == Seq(SessionState(0L, 100000000L, 2)))
    assert(open.contains(SessionState(later, later, 1)))
  }

  test("advance continues an existing state across batches") {
    val st = Some(SessionState(0L, 100000000L, 2))
    val (closed, open) = StatefulSessions.advance(Seq(150000000L), st, Gap)
    assert(closed.isEmpty)
    assert(open.contains(SessionState(0L, 150000000L, 3)))
  }

  test("a late cross-batch event absorbs without regressing the boundary") {
    // state open over [1000s, 2000s]; a 500s event arrives in a later
    // batch: it joins the open session (count up, start extended) and
    // lastUs stays monotone — without the guard the state regressed to
    // lastUs=500s and later emitted a negative-duration session
    val st = Some(SessionState(1000000000L, 2000000000L, 2))
    val (closed, open) = StatefulSessions.advance(Seq(500000000L), st, Gap)
    assert(closed.isEmpty)
    assert(open.contains(SessionState(500000000L, 2000000000L, 3)))
    // and a following in-order event still extends normally
    val (closed2, open2) = StatefulSessions.advance(Seq(2100000000L), open, Gap)
    assert(closed2.isEmpty)
    assert(open2.contains(SessionState(500000000L, 2100000000L, 4)))
  }

  // --- end-to-end through the streaming engine ---

  test("flatMapGroupsWithState closes sessions across micro-batches") {
    val in = Files.createTempDirectory("sess-in").toString
    // alice: two events 1 min apart, then one 2 h later -> first session
    // closes when the third event arrives
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "1.json"),
      Seq(
        """{"_p": "alice", "_n": "a", "_t": "1700000000"}""",
        """{"_p": "alice", "_n": "b", "_t": "1700000060"}""",
        """{"_p": "alice", "_n": "c", "_t": "1700010000"}""",
        """{"_p": "bob",   "_n": "a", "_t": "1700000000"}""").mkString("\n"))

    val events = StreamIngest.readLines(spark, in)
      .transform(NdjsonReader.events)
      .select(col("person"), unix_micros(col("ts")).as("us"))
      .as[SessionEvent]

    val q = StatefulSessions.sessionize(events)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("sessions")
      .start()
    q.awaitTermination()

    val closed = spark.table("sessions").as[ClosedSession].collect()
    // only alice's FIRST session is closed (the open ones are still state)
    assert(closed.toSeq == Seq(
      ClosedSession("alice", 1700000000000000L, 1700000060000000L, 2, 60.0)))
  }
}
