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
}
