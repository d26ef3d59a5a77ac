package graft.queries

import graft.SparkSpec

/** Cross-checks for the model-evaluation family that the oracle hash gate
  * can't state: the histogram rank-sum AUC must equal the literal
  * all-pairs Mann-Whitney statistic, and the calibration table must
  * account for every scored document exactly once.
  */
class EvalQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("eval_auc_rank equals brute-force all-pairs AUC per lang") {
    val scored = EvalQueries.scoredDf(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("pos")))
    val got = Registry.queries("eval_auc_rank")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("auc_ppm"))
      .toMap
    assert(got.nonEmpty)
    scored.groupBy(_._1).foreach { case (lang, rows) =>
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      val expected =
        if (pos.isEmpty || neg.isEmpty) -1L
        else {
          // num2 = twice the pair-win count, ties at weight 1
          val num2 = (for (p <- pos; n <- neg) yield {
            if (p > n) 2L else if (p == n) 1L else 0L
          }).sum
          math.floor(num2.toDouble * 1000000.0 /
            (2.0 * pos.length * neg.length)).toLong
        }
      assert(got(lang) === expected, s"lang=$lang")
    }
  }

  test("eval_calibration_bins partitions the corpus: counts and positives add up") {
    val scored = EvalQueries.scoredDf(spark, sfDir).collect()
    val bins = Registry.queries("eval_calibration_bins")(spark, sfDir).collect()
    assert(bins.map(_.getAs[Long]("n")).sum === scored.length.toLong)
    assert(bins.map(_.getAs[Long]("n_pos")).sum ===
      scored.count(_.getAs[Long]("pos") == 1L).toLong)
    bins.foreach { b =>
      val (bin, n, np) = (b.getAs[Long]("bin"), b.getAs[Long]("n"),
        b.getAs[Long]("n_pos"))
      assert(bin >= 0L && bin <= 9L)
      assert(np >= 0L && np <= n)
      assert(b.getAs[Long]("pos_rate_ppm") === np * 1000000L / n)
    }
  }

  test("eval_rate_ci: the Wilson interval brackets the rate and tightens with n") {
    val rows = Registry.queries("eval_rate_ci")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, np) = (r.getAs[Long]("n"), r.getAs[Long]("n_pass"))
      val (rate, lo, hi) = (r.getAs[Long]("rate_ppm"),
        r.getAs[Long]("wilson_lo_ppm"), r.getAs[Long]("wilson_hi_ppm"))
      assert(np >= 0L && np <= n)
      assert(lo <= rate && rate <= hi, s"interval [$lo,$hi] must bracket $rate")
      assert(lo >= 0L && hi <= 1000000L, "Wilson bounds stay inside [0,1]")
      // width sanity: a 95% interval over n samples is O(1/√n) — assert
      // the weaker closed-form bound width ≤ 2·(z/(2√n))/(1+z²/n) + 2ppm
      val maxW = 2.0 * (1.96 / (2.0 * math.sqrt(n.toDouble))) /
        (1.0 + 3.8416 / n) * 1e6 + 2
      assert((hi - lo).toDouble <= maxW, s"width ${hi - lo} > $maxW at n=$n")
    }
  }
}
