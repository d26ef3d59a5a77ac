package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamStreaksSpec extends SparkSpec {
  import spark.implicits._

  test("advance: extends, breaks, dedups days, keeps earliest longest on ties") {
    val (u1, s1) = StreamStreaks.advance(Seq(10L, 11L, 11L, 12L), None)
    assert(u1.map(u => (u.day, u.curStreak)) == Seq((10L, 1L), (11L, 2L), (12L, 3L)))
    assert(s1.contains(StreakState(12L, 10L, 3L, 3L, 10L, 3L, 1L)))
    // a gap starts streak 2; a same-length later streak must NOT steal longest
    val (u2, s2) = StreamStreaks.advance(Seq(20L, 21L, 22L), s1)
    assert(u2.last.longestStart === 10L && u2.last.longestStreak === 3L)
    assert(s2.contains(StreakState(22L, 20L, 3L, 3L, 10L, 6L, 2L)))
    // a strictly longer streak replaces it
    val (u3, s3) = StreamStreaks.advance(Seq(23L), s2)
    assert(u3.head.longestStreak === 4L && u3.head.longestStart === 20L)
    // stale / already-counted days change nothing and emit nothing
    val (u4, s4) = StreamStreaks.advance(Seq(5L, 23L), s3)
    assert(u4.isEmpty && s4 === s3)
  }

  test("one-drain final state reproduces streak_islands (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("user_id").as("user"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[DayEvent]
    val source = MemoryStream[DayEvent]
    val q = StreamStreaks.track(source.toDS())
      .writeStream.format("memory").queryName("streaks_out")
      .outputMode("append").start()
    try {
      source.addData(ev.collect().toSeq)
      q.processAllAvailable()
      val finalByUser = spark.table("streaks_out").as[StreakUpdate].collect()
        .groupBy(_.user).map { case (u, ups) => u -> ups.maxBy(_.day) }
      val batch = graft.queries.Registry.queries("streak_islands")(spark, dir)
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
            r.getAs[Long]("longest_streak"), r.getAs[Long]("longest_start_day"))))
        .toMap
      assert(finalByUser.keySet === batch.keySet)
      finalByUser.foreach { case (u, s) =>
        assert((s.nActiveDays, s.nStreaks, s.longestStreak, s.longestStart)
          === batch(u), s"user=$u")
      }
      assert(finalByUser.nonEmpty)
    } finally q.stop()
  }
}
