package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics the shared-formulation oracle can't pin: the point-in-time
  * join must keep fact cardinality exactly (disjoint validity intervals →
  * one row per fact) and agree with a local interval replay; the streak
  * query must match a brute-force consecutive-run scan per user.
  */
class Scd2StreakSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("join_scd2_pit preserves fact cardinality and replays locally") {
    val out = Registry.queries("join_scd2_pit")(spark, sfDir).collect()
    val nViews = Tables.events(spark, sfDir)
      .where(col("event_type") === "view").count()
    assert(out.length.toLong === nViews, "left PIT join must not duplicate facts")
    // local replay: tier changes per user from the purchase stream
    val purchases = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[Double]("value")))
    def tier(v: Double) = if (v < 50.0) "low" else if (v < 150.0) "mid" else "high"
    val changes: Map[Long, Seq[(Long, String)]] = purchases.groupBy(_._1).map {
      case (u, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._2)).map(e => (e._3, tier(e._4)))
        val chg = sorted.foldLeft(Vector.empty[(Long, String)]) {
          case (acc, (us, t)) =>
            if (acc.nonEmpty && acc.last._2 == t) acc else acc :+ ((us, t))
        }
        u -> chg
    }
    out.foreach { r =>
      val (u, us, got) = (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[String]("tier"))
      val expected = changes.getOrElse(u, Seq.empty)
        .takeWhile(_._1 <= us).lastOption.map(_._2).getOrElse("none")
      assert(got === expected, s"user=$u us=$us")
    }
  }

  test("streak_islands matches a brute-force consecutive-day scan") {
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val expected = raw.groupBy(_._1).map { case (u, rows) =>
      val days = rows.map(_._2).distinct.sorted.toVector
      val runs = days.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
        if (acc.nonEmpty && acc.last.last == d - 1) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val best = runs.maxBy(r => (r.size, -r.head))
      u -> ((days.size.toLong, runs.size.toLong, best.size.toLong, best.head))
    }
    val got = Registry.queries("streak_islands")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"), r.getAs[Long]("longest_start_day"))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (u, e) => assert(got(u) === e, s"user=$u") }
  }
}
