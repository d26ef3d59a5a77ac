package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local recounts for the two batch-3 readouts: the trapezoidal PR-AUC
  * sweep (plus its legal range and the anchor convention) and the UCB1
  * bandit state (plus the bandit facts: the bonus shrinks with pulls and
  * the pick is the argmax).
  */
class PrAucBanditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("eval_pr_auc matches a local trapezoid sweep") {
    val scored = EvalQueries.scoredDf(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("pos")))
    val expected = scored.groupBy(_._1).map { case (lang, ds) =>
      val hist = ds.groupBy(_._2).map { case (b, vs) =>
        (b, vs.map(_._3).sum, vs.length.toLong - vs.map(_._3).sum)
      }.toSeq.sortBy(-_._1)
      val p = hist.map(_._2).sum
      val n = hist.map(_._3).sum
      var (cumTp, cumFp) = (0L, 0L)
      var area = 0L
      hist.foreach { case (_, np, nn) =>
        val (pTp, pFp) = (cumTp, cumFp)
        cumTp += np; cumFp += nn
        if (np > 0 && p > 0) {
          val prec = cumTp.toDouble / (cumTp + cumFp).toDouble
          val prev = if (pTp + pFp == 0) 1.0 else pTp.toDouble / (pTp + pFp).toDouble
          area += math.round(np.toDouble / p.toDouble * (prec + prev) / 2.0 * 1e9)
        }
      }
      val (auc, base) =
        if (p == 0 || n == 0) (-1L, -1L)
        else (area, math.round(p.toDouble / (p + n).toDouble * 1e9))
      lang -> ((p, n, auc, base))
    }
    val got = Registry.queries("eval_pr_auc")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Long]("pr_auc_nano"), r.getAs[Long]("baseline_nano")))).toMap
    assert(got === expected)
    got.values.foreach { case (p, n, auc, base) =>
      if (p > 0 && n > 0) {
        // the area is a true fraction; NO base-rate floor is asserted —
        // unlike ROC-AUC's 0.5 anchor, PR-AUC of a weak gate can dip
        // BELOW the base rate (observed here: 0.9432 vs base 0.9437),
        // which is exactly the imbalance sensitivity the metric exists
        // to expose
        assert(auc >= 0L && auc <= 1000000000L)
        assert(base >= 0L && base <= 1000000000L)
      }
    }
  }

  test("eval_ece matches a local binned recount, MCE dominates ECE") {
    val scored = EvalQueries.scoredDf(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("pos")))
    val expected = scored.groupBy(_._1).map { case (lang, ds) =>
      val bins = ds.map { case (_, b, y) =>
        val pm = math.min(math.max((b + 1000L) / 4L, 0L), 1000L)
        (math.min(pm / 100L, 9L), pm, y)
      }.groupBy(_._1).map { case (_, vs) =>
        (vs.length.toLong, vs.map(_._3).sum, vs.map(_._2).sum)
      }
      val n = bins.map(_._1).sum
      val devs = bins.map { case (nb, ob, sp) => (nb, math.abs(sp - 1000 * ob)) }
      lang -> ((n, bins.size.toLong,
        devs.map(_._2).sum * 1000 / n,
        devs.map { case (nb, d) => d * 1000 / nb }.max))
    }
    val got = Registry.queries("eval_ece")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_bins"),
          r.getAs[Long]("ece_ppm"), r.getAs[Long]("mce_ppm")))).toMap
    assert(got === expected)
    // MCE is the max of what ECE weight-averages, so it dominates
    // (up to the two independent div-truncations)
    got.values.foreach { case (_, _, ece, mce) => assert(mce + 1000L >= ece) }
  }

  test("dedup_lsh_scurve is the exact (b=4, r=3) collision curve") {
    val got = Registry.queries("dedup_lsh_scurve")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("s_pct") ->
        ((r.getAs[Long]("collide_ppm"), r.getAs[Long]("bands"),
          r.getAs[Long]("rows_per_band")))).toMap
    assert(got.size === 19)
    got.foreach { case (sPct, (p, b, r)) =>
      assert(b === 4L && r === 3L)
      val s = sPct.toDouble / 100.0
      val exact = math.round((1.0 - math.pow(1.0 - s * s * s, 4)) * 1e6)
      // the engine avoids pow() via exact integer numerators; the libm
      // check here may differ by the last ulp before rounding
      assert(math.abs(p - exact) <= 1L, s"s=$sPct%")
    }
    // an S-curve: monotone increasing, 0-ish at low s, ~1 at high s
    val curve = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(curve.sliding(2).forall(w => w(0) <= w(1)))
    assert(curve.head < 1000L && curve.last > 990000L)
  }

  test("mix_ucb_bandit matches a local UCB1 recount") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"),
        expr("""CAST((size(filter(split(lower(text), '[^a-z]+'),
               t -> t <> '')) >= 20 AND n_chars >= 100) AS LONG)""").as("pass"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("pass")))
    val arms = docs.groupBy(_._1).map { case (src, vs) =>
      (src, vs.length.toLong, vs.map(_._2).sum)
    }.toSeq
    val bigN = arms.map(_._2).sum
    val scored = arms.map { case (src, n, np) =>
      val mean = np * 1000000L / n
      val bonus = math.floor(
        math.sqrt(2.0 * math.log(bigN.toDouble) / n.toDouble) * 1e6).toLong
      (src, n, np, mean, bonus, mean + bonus)
    }
    val expected = scored.sortBy { case (src, _, _, _, _, u) => (-u, src) }
      .zipWithIndex
      .map { case ((src, n, np, m, b, u), i) =>
        src -> ((n, np, m, b, u, i + 1L))
      }.toMap
    val got = Registry.queries("mix_ucb_bandit")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pass"),
          r.getAs[Long]("mean_ppm"), r.getAs[Long]("bonus_ppm"),
          r.getAs[Long]("ucb_ppm"), r.getAs[Long]("rk")))).toMap
    assert(got === expected)
    // bandit facts: rk 1 is the argmax; equal-pull arms share the bonus
    val top = got.values.find(_._6 == 1L).get
    assert(got.values.forall(v => v._5 <= top._5))
    val byPulls = got.values.groupBy(_._1).values
    byPulls.foreach(vs => assert(vs.map(_._4).toSet.size == 1))
  }
}
