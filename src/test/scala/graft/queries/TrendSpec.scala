package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Calendar semantics the oracle mirrors but cannot justify: WoW growth
  * must compare day d to day d−7 (never "7 rows earlier"), and the
  * day-of-week anomaly baseline must pool exactly the same weekdays.
  */
class TrendSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def daily(): Map[(String, Long), Long] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("trend_wow_growth compares calendar day d to d-7 exactly") {
    val counts = daily()
    val rows = Registry.queries("trend_wow_growth")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val prev = (k._1, k._2 - 7L)
      assert(counts(k) === r.getAs[Long]("cnt"))
      assert(counts(prev) === r.getAs[Long]("prev_cnt"), s"row $k")
      assert(r.getAs[Long]("cnt_growth_bp") ===
        math.floor((counts(k) - counts(prev)) * 10000.0 / counts(prev)).toLong)
    }
    // every (type, day) with a day-7 predecessor appears exactly once
    val expected = counts.keys.filter(k => counts.contains((k._1, k._2 - 7L)))
    assert(rows.length === expected.size)
  }

  test("trend_dow_anomaly pools the same-weekday baseline") {
    val counts = daily()
    val rows = Registry.queries("trend_dow_anomaly")(spark, sfDir).collect()
    assert(rows.length === counts.size)
    rows.foreach { r =>
      val (et, day) = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val dow = (day + 4) % 7
      assert(r.getAs[Long]("dow") === dow)
      val pool = counts.filter { case ((t, d), _) => t == et && (d + 4) % 7 == dow }
        .values.toSeq
      val n = pool.size.toDouble
      val mean = pool.sum / n
      val v = (pool.map(c => c.toDouble * c).sum - pool.sum * mean) / n
      val z = if (v <= 0.0) 0.0
        else BigDecimal((counts((et, day)) - mean) / math.sqrt(v))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9, s"($et,$day)")
      assert(r.getAs[Boolean]("anomaly") === (math.abs(z) > 2.0))
    }
  }
}
