package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local sequential-fold recount for the batch ts_cusum query (the
  * streaming twin's parity lives in StreamCusumSpec): the grid fold
  * replayed day by day per type, plus the one-sidedness facts — the
  * statistic never goes negative and an alarm requires accumulated
  * excess above one mean day.
  */
class CusumSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("ts_cusum matches a sequential fold and alarms are one-sided") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = daily.keys.map(_._1).toSeq.distinct.flatMap { et =>
      val ds = daily.keys.filter(_._1 == et).map(_._2)
      val (d0, d1) = (ds.min, ds.max)
      val mu = daily.filter(_._1._1 == et).values.sum * 1000L / (d1 - d0 + 1)
      var s = 0L
      (d0 to d1).map { d =>
        val cnt = daily.getOrElse((et, d), 0L)
        s = math.max(0L, s + cnt * 1000L - (mu + mu / 4L))
        (et, d) -> ((cnt, s, s > mu))
      }
    }.toMap
    val got = Registry.queries("ts_cusum")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("cusum_milli"),
          r.getAs[Boolean]("alarm")))).toMap
    assert(got === expected)
    assert(got.values.forall(_._2 >= 0L))
    assert(got.values.filter(_._3).forall(_._2 > 0L))
  }
}
