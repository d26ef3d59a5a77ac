package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `rolling_active_hll` has no oracle (DataSketches HLL internals are
  * engine-specific), so the approximation is pinned here against the
  * EXACT day-pair-collapse counts from `rolling_active_users`: default
  * lgConfigK=12 documents rsd ≈ 1.6%, so a 5% (~3σ) envelope either
  * always holds on this fixed dataset or the sketch path is wired wrong.
  */
class RollingHllSpec extends SparkSpec {

  test("sketch DAU/WAU land within 5% of exact counts (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val est = graft.SparkEntry.queries("rolling_active_hll")(spark, dir)
    val exact = graft.SparkEntry.queries("rolling_active_users")(spark, dir)
      .select(col("day_no"), col("dau"), col("wau"))
    val joined = est.join(exact, "day_no").collect()
    assert(joined.nonEmpty)
    // same day coverage on both paths
    assert(joined.length == exact.count(),
      "sketch path dropped or invented days")
    joined.foreach { r =>
      val day = r.getAs[Long]("day_no")
      val (dEst, dEx) = (r.getAs[Long]("dau_est").toDouble,
        r.getAs[Long]("dau").toDouble)
      val (wEst, wEx) = (r.getAs[Long]("wau_est").toDouble,
        r.getAs[Long]("wau").toDouble)
      assert(math.abs(dEst - dEx) / dEx <= 0.05,
        f"day $day: dau_est=$dEst%.0f exact=$dEx%.0f off by ${math.abs(dEst - dEx) / dEx}%.4f")
      assert(math.abs(wEst - wEx) / wEx <= 0.05,
        f"day $day: wau_est=$wEst%.0f exact=$wEx%.0f off by ${math.abs(wEst - wEx) / wEx}%.4f")
    }
  }
}
