package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `approx_stats` is registered without an oracle (sketch algorithms differ
  * across engines), so "approximate" must be VERIFIED, not trusted: this
  * pins each sketch to its published error bound against the exact
  * aggregates on the same data.
  *
  *  - `approx_count_distinct` documents rsd = 0.05 (default); assert the
  *    relative error stays within 3x that (the sketch is deterministic for
  *    a given dataset, so this either always holds or the sketch is wrong).
  *  - `approx_percentile` with default accuracy 10000 guarantees rank error
  *    <= 1e-4; assert the approximate median lands inside the exact
  *    [p45, p55] envelope — a 500x looser rank tolerance, so a pass means
  *    the sketch is sane and a fail means it is broken, not unlucky.
  */
class ApproxStatsSpec extends SparkSpec {

  test("approx_stats sketches land within published error bounds (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val approx = graft.SparkEntry.queries("approx_stats")(spark, dir)
    val exact = Tables.events(spark, dir).groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_users"),
      expr("percentile(value, 0.45)").as("p45"),
      expr("percentile(value, 0.55)").as("p55"))

    val rows = approx.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val au = r.getAs[Long]("approx_users").toDouble
      val eu = r.getAs[Long]("exact_users").toDouble
      val relErr = math.abs(au - eu) / eu
      assert(relErr <= 0.15, // 3 x rsd 0.05
        f"$et: approx_users=$au%.0f exact=$eu%.0f relErr=$relErr%.4f > 0.15")

      val p50 = r.getAs[Double]("approx_p50")
      val (lo, hi) = (r.getAs[Double]("p45"), r.getAs[Double]("p55"))
      assert(p50 >= lo && p50 <= hi,
        f"$et: approx_p50=$p50%.4f outside exact rank envelope [$lo%.4f, $hi%.4f]")
    }
  }
}
