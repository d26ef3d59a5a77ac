package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local Kaplan–Meier recount for survival_km, replicating the declared
  * censoring rule (last event within 2 days of the corpus max) and the
  * per-step micro-nat quantization; plus the structural facts: the curve
  * is non-increasing and starts at or below 1.0, and censored users are
  * never counted as deaths.
  */
class SurvivalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("survival_km matches a local KM recount") {
    val spans = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
      .groupBy(_._1).map { case (u, ds) =>
        u -> (ds.map(_._2).min, ds.map(_._2).max)
      }
    val mx = spans.values.map(_._2).max
    val byT = spans.values
      .map { case (d0, d1) => (d1 - d0, if (d1 >= mx - 2) 1L else 0L) }
      .groupBy(_._1).map { case (t, vs) =>
        t -> ((vs.size.toLong, vs.map(_._2).sum))
      }
    val ts = byT.keys.toSeq.sorted
    var atRisk = byT.values.map(_._1).sum
    var cum = 0L
    var dead = false
    val expected = ts.map { t =>
      val (n, nc) = byT(t)
      val nd = n - nc
      if (nd >= atRisk) dead = true
      else if (nd > 0)
        cum += math.round(math.log((atRisk - nd).toDouble / atRisk.toDouble) * 1e6)
      val surv = if (dead) 0L else math.round(math.exp(cum / 1e6) * 1e6)
      val row = (t, atRisk, nd, nc, surv)
      atRisk -= n
      row
    }
    val got = Registry.queries("survival_km")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_deaths"), r.getAs[Long]("n_censored"),
        r.getAs[Long]("surv_ppm")))
      .sortBy(_._1)
    assert(got === expected)
    // the curve is a survival function: starts ≤ 1, never increases
    assert(got.head._5 <= 1000000L)
    assert(got.sliding(2).forall(w => w(0)._5 >= w(1)._5))
    // censoring is real in this corpus (users active at observation end)
    assert(got.map(_._4).sum > 0L)
  }
}
