package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate fingerprints within the watermark are suppressed across batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, String)]
    val events = source.toDF().toDF("ts", "person", "name")

    val deduped = StreamDedup.dedup(events, Seq("person", "name"), "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

    try {
      // batch 1: two distinct rows + an in-batch duplicate
      source.addData(
        (ts(1700000000L), "alice", "click"),
        (ts(1700000010L), "bob", "view"),
        (ts(1700000020L), "alice", "click"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)

      // batch 2: cross-batch duplicate (within watermark) + one new row
      source.addData(
        (ts(1700000030L), "alice", "click"),
        (ts(1700000040L), "carol", "purchase"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out")
        .select("person", "name").as[(String, String)].collect().toSet
      assert(spark.table("dedup_out").count() == 3)
      assert(rows == Set(("alice", "click"), ("bob", "view"), ("carol", "purchase")))
    } finally q.stop()
  }
}
