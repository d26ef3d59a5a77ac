package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ts_holt's emit-forward weight tables are an algebraic recast of the
  * sequential Holt recurrence — this spec checks the identity BOTH ways:
  * the tables against a direct unit-impulse recurrence run, and the full
  * query against a per-(type, day) sequential recompute from the daily
  * counts. With α = β = 1/2 every intermediate value is a dyadic
  * rational far inside double precision, so the Double recurrence here
  * is EXACT — equality is `===`, not a tolerance.
  */
class HoltSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val H = AnalyticsQueries.HoltHorizon

  /** Run the trailing-horizon recurrence over ys (oldest first). */
  private def holt(ys: Seq[Double]): (Double, Double) =
    ys.foldLeft((0.0, 0.0)) { case ((l, b), y) =>
      val l2 = (y + l + b) / 2.0
      (l2, (l2 - l) / 2.0 + b / 2.0)
    }

  test("weight tables equal the unit-impulse recurrence") {
    val scale = AnalyticsQueries.HoltScale.toDouble
    (0 until H).foreach { k =>
      // impulse at age k: y = 1 processed k steps before the end
      val ys = Seq.tabulate(H)(i => if (i == H - 1 - k) 1.0 else 0.0)
      val (l, b) = holt(ys)
      assert(AnalyticsQueries.holtLevelW(k) === (l * scale).round, s"level k=$k")
      assert(AnalyticsQueries.holtTrendW(k) === (b * scale).round, s"trend k=$k")
    }
    // the structural facts: the newest observation enters with exactly
    // α (level) and αβ (trend); the coupled system's eigenvalues are
    // complex at α = β = 1/2, so BOTH tables oscillate through negative
    // territory (why the readout floors a double quotient instead of
    // using sign-divergent integer div)
    assert(AnalyticsQueries.holtLevelW.head === AnalyticsQueries.HoltScale / 2)
    assert(AnalyticsQueries.holtTrendW.head === AnalyticsQueries.HoltScale / 4)
    assert(AnalyticsQueries.holtLevelW.exists(_ < 0L))
    assert(AnalyticsQueries.holtTrendW.exists(_ < 0L))
  }

  test("ts_holt matches a sequential per-day recompute") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = Registry.queries("ts_holt")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = daily.keys.groupBy(_._1)
    val gridSize = byType.map { case (_, ks) =>
      val ds = ks.map(_._2); (ds.max - ds.min + 1).toInt
    }.sum
    assert(rows.length === gridSize) // one row per grid day, gaps included
    rows.foreach { r =>
      val (et, day) = (r.getAs[String]("event_type"), r.getAs[Long]("day_no"))
      val ys = ((day - H + 1) to day).map(d => daily.getOrElse((et, d), 0L).toDouble)
      val (l, b) = holt(ys)
      assert(r.getAs[Long]("cnt") === daily.getOrElse((et, day), 0L))
      assert(r.getAs[Long]("level_milli") === math.floor(1000.0 * l).toLong, s"($et,$day)")
      assert(r.getAs[Long]("trend_milli") === math.floor(1000.0 * b).toLong, s"($et,$day)")
      assert(r.getAs[Long]("forecast_milli") === math.floor(1000.0 * (l + b)).toLong, s"($et,$day)")
    }
  }
}
