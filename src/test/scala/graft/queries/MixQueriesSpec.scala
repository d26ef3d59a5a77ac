package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the mixture operators that the hash gate can't state:
  * tercile balance/monotonicity for ppl bucketing, and budget arithmetic
  * bounds for the epoch planner.
  */
class MixQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = Registry.queries(name)(spark, sfDir)

  test("quality_ppl_buckets: buckets are monotone in score and roughly tercile-sized") {
    val rows = run("quality_ppl_buckets").collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      // monotone: every head score <= every middle score <= every tail score
      def scores(b: String) =
        rs.filter(_.getAs[String]("bucket") == b).map(_.getAs[Long]("qb"))
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      if (h.nonEmpty && m.nonEmpty) assert(h.max < m.min, s"$lang head/middle overlap")
      if (m.nonEmpty && t.nonEmpty) assert(m.max < t.min, s"$lang middle/tail overlap")
      // provable bounds: head strictly under a third (cum*3 < n below
      // thr1); tail always nonempty (the max bucket satisfies cum = n);
      // head MAY be empty when the boundary bucket swallows the tercile —
      // that's the documented bucket-granular semantic
      assert(3 * h.length <= rs.length, s"$lang head too large")
      assert(t.nonEmpty, s"$lang tail empty")
    }
  }

  test("mix_token_budget: epochs capped at 3.0, planned tokens bounded by cap and target") {
    val rows = run("mix_token_budget").collect()
    assert(rows.length > 1)
    val total = rows.map(_.getAs[Long]("tokens")).sum
    rows.foreach { r =>
      val epochs = r.getAs[Long]("epochs_milli")
      val tokens = r.getAs[Long]("tokens")
      val target = r.getAs[Long]("target")
      val planned = r.getAs[Long]("planned_tokens")
      assert(epochs >= 0L && epochs <= 3000L)
      assert(planned <= 3L * tokens, "cap violated")
      assert(planned <= target, "a source may not exceed its share")
      assert(target == (total / 2) / rows.length)
    }
  }

  test("mix_doremi: weights form a distribution, honor the floor, follow excess order") {
    val rows = run("mix_doremi").collect()
    assert(rows.length > 1)
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    // each ppm weight floors an exact ratio: the total loses < 1 ppm per source
    assert(wsum <= 1000000L && wsum > 1000000L - rows.length,
      s"weights must sum to ~1e6, got $wsum")
    val byExcess = rows.sortBy(_.getAs[Long]("excess_micro"))
    assert(byExcess.map(_.getAs[Long]("weight_ppm")).toSeq ==
      byExcess.map(_.getAs[Long]("weight_ppm")).sorted.toSeq,
      "weights must be monotone in excess loss")
    rows.foreach { r =>
      assert(r.getAs[Long]("nll_micro") > 0L, "NLL is positive by definition")
      assert(r.getAs[Long]("weight_ppm") > 0L, "floor keeps every source alive")
    }
  }

  test("mix_anneal_schedule conserves the 90/10 budget and skews the anneal to quality") {
    val rows = Registry.queries("mix_anneal_schedule")(spark, sfDir).collect()
    assert(rows.length > 1)
    val total = rows.map(_.getAs[Long]("tokens")).sum
    val budget = total / 2
    val p1 = rows.map(_.getAs[Long]("p1_tokens")).sum
    val p2 = rows.map(_.getAs[Long]("p2_tokens")).sum
    // integer div leaves < 1 token of slack per source and phase
    assert(p1 <= budget * 9 / 10 && p1 > budget * 9 / 10 - rows.length)
    assert(p2 <= budget / 10 && p2 > budget / 10 - rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("planned_tokens") ===
        r.getAs[Long]("p1_tokens") + r.getAs[Long]("p2_tokens"))
      assert(r.getAs[Long]("qtokens") <= r.getAs[Long]("tokens"))
    }
    // the anneal phase gives a perfectly-passing source at least its
    // proportional phase-1 share (quality mass >= its token share of
    // quality totals when every doc passes)
    val qtotal = rows.map(_.getAs[Long]("qtokens")).sum
    rows.filter(_.getAs[Long]("pass_ppm") == 1000000L).foreach { r =>
      val tokShare = r.getAs[Long]("tokens").toDouble / total
      val qShare = r.getAs[Long]("qtokens").toDouble / qtotal
      assert(qShare >= tokShare - 1e-9,
        s"all-pass source ${r.getAs[String]("source")} must not lose anneal share")
    }
  }
}
