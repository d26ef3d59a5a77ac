package graft.queries

import graft.SparkSpec

/** Kneser-Ney invariants the hash gate can't state: probabilities are a
  * sub-distribution per context (the unseen-successor mass is exactly
  * what interpolation reserves), and discounting never goes negative.
  */
class KnBigramSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("lm_kn_bigram: per-context seen mass ≤ 1, probabilities sane") {
    val rows = Registry.queries("lm_kn_bigram")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byW1 = rows.groupBy(_.getAs[String]("w1"))
    assert(byW1.size <= 20, "more than the top-20 contexts leaked through")
    byW1.foreach { case (w1, rs) =>
      val mass = rs.map(_.getAs[Long]("p_micro")).sum
      // floors only lose mass, so the seen-successor sum stays under 1.0;
      // it must also be substantial (the discount D=0.75 per seen type is
      // all that's reserved for unseen successors)
      assert(mass <= 1000000L, s"$w1: seen mass $mass exceeds 1.0")
      assert(mass > 200000L, s"$w1: seen mass $mass implausibly small")
      rs.foreach { r =>
        assert(r.getAs[Long]("p_micro") >= 0L)
        assert(r.getAs[Long]("c12") >= 1L)
      }
    }
  }
}
