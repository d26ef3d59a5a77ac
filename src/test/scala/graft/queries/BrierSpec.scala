package graft.queries

import graft.SparkSpec

/** Local recount for eval_brier_decomp off the scored frame, plus the
  * two facts the decomposition exists for: REL − RES + UNC equals the
  * raw Brier score (exact in rationals; here within the per-bin nano
  * quantization bound), and every component lands in its legal range.
  */
class BrierSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("eval_brier_decomp matches a local recount and the Murphy identity") {
    val scored = EvalQueries.scoredDf(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("pos")))
    val expected = scored.groupBy(_._1).map { case (lang, ds) =>
      val pms = ds.map { case (_, b, y) =>
        (math.min(math.max((b + 1000L) / 4L, 0L), 1000L), y)
      }
      val n = pms.length.toLong
      val nPos = pms.map(_._2).sum
      val bins = pms.groupBy(_._1).map { case (pm, vs) =>
        (pm, vs.length.toLong, vs.map(_._2).sum)
      }
      val bsum = bins.map { case (pm, nk, ok) =>
        ok * (pm - 1000) * (pm - 1000) + (nk - ok) * pm * pm
      }.sum
      val rsum = bins.map { case (pm, nk, ok) =>
        val d = (pm * nk - 1000 * ok).toDouble
        math.round(d * d * 1000.0 / nk.toDouble)
      }.sum
      val obar = nPos.toDouble / n.toDouble
      val ssum = bins.map { case (_, nk, ok) =>
        val d = ok.toDouble / nk.toDouble - obar
        math.round(d * d * nk.toDouble * 1e9)
      }.sum
      lang -> ((n, nPos, bsum * 1000 / n, rsum / n, ssum / n,
        math.round(obar * (1.0 - obar) * 1e9)))
    }
    val got = Registry.queries("eval_brier_decomp")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("brier_nano"), r.getAs[Long]("rel_nano"),
          r.getAs[Long]("res_nano"), r.getAs[Long]("unc_nano")))).toMap
    assert(got === expected)
    got.foreach { case (lang, (n, _, brier, rel, res, unc)) =>
      // Murphy identity within the quantization bound: ≤501 bins each
      // rounded to ±0.5 nano, plus three div-n truncations
      val bound = 501.0 / n.toDouble * 2 + 3
      assert(math.abs((rel - res + unc) - brier).toDouble <= bound + 2,
        s"$lang: $rel - $res + $unc vs $brier")
      // legal ranges: all components in [0, 0.25e9] except brier ≤ 1e9
      assert(brier >= 0L && brier <= 1000000000L)
      assert(rel >= 0L && res >= 0L && unc >= 0L && unc <= 250000000L)
      // resolution can never exceed uncertainty
      assert(res <= unc + 2)
    }
  }
}
