package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("purchases join clicks within the horizon; outside-horizon clicks don't match") {
    implicit val sqlCtx = spark.sqlContext
    val clickSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val buySrc = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val clicks = clickSrc.toDF().toDF("user_id", "ts")
    val buys = buySrc.toDF().toDF("user_id", "ts", "value")

    val joined = StreamJoin.attribute(clicks, buys, "30 minutes", "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("attrib_out")
      .outputMode(OutputMode.Append())
      .start()

    val base = 1700000000L
    try {
      // alice clicks, buys 10 min later (in horizon);
      // bob clicks, buys 2 h later (outside);
      // carol buys with no click at all
      clickSrc.addData((1L, ts(base)), (2L, ts(base)))
      buySrc.addData(
        (1L, ts(base + 600), 9.99),
        (2L, ts(base + 7200), 5.0),
        (3L, ts(base + 300), 3.0))
      q.processAllAvailable()

      val rows = spark.table("attrib_out")
        .select("user_id", "purchase_value").as[(Long, Double)].collect().toSet
      assert(rows == Set((1L, 9.99)), s"got $rows")

      // a late-arriving click inside the horizon joins BOTH buffered
      // purchases — the symmetric hash join matches in either arrival
      // order, which is the whole point of buffering two sides
      clickSrc.addData((1L, ts(base + 500)))
      buySrc.addData((1L, ts(base + 700), 1.5))
      q.processAllAvailable()
      val n = spark.table("attrib_out").count()
      // (click@0, buy@600) + (click@0, buy@700) + (click@500, buy@600)
      // + (click@500, buy@700)
      assert(n == 4, s"expected 4 attribution rows, got $n")
    } finally q.stop()
  }

  test("join state is dropped once the watermark passes the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clickSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val buySrc = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val clicks = clickSrc.toDF().toDF("user_id", "ts")
    val buys = buySrc.toDF().toDF("user_id", "ts", "value")

    val joined = StreamJoin.attribute(clicks, buys, "30 minutes", "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("attrib_state")
      .outputMode(OutputMode.Append())
      .start()

    val base = 1700000000L
    try {
      clickSrc.addData((1L, ts(base)))
      buySrc.addData((9L, ts(base), 0.0)) // advance purchase-side watermark only
      q.processAllAvailable()

      // push both watermarks far past base + horizon + lateness
      clickSrc.addData((8L, ts(base + 10000)))
      buySrc.addData((9L, ts(base + 10000), 0.0))
      q.processAllAvailable()
      clickSrc.addData((8L, ts(base + 20000)))
      buySrc.addData((9L, ts(base + 20000), 0.0))
      q.processAllAvailable()

      val progress = q.lastProgress
      val stateRows = progress.stateOperators.head.numRowsTotal
      // the base-time click must have been evicted; only recent rows remain
      assert(stateRows <= 4, s"state not bounded: $stateRows rows retained")

      // a late purchase that WOULD have matched the evicted click emits
      // nothing — the watermark contract, not a bug
      buySrc.addData((1L, ts(base + 60), 2.0))
      q.processAllAvailable()
      val matched = spark.table("attrib_state")
        .where($"user_id" === 1L).count()
      assert(matched == 0, "evicted click still matched a late purchase")
    } finally q.stop()
  }
}
