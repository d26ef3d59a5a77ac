package graft.text

import graft.SparkSpec
import graft.queries.Registry

/** The watermark gate's statistical semantics: every injected green-chain
  * doc must flag at its closed-form z, and the organic false-positive
  * rate must look like a one-sided normal tail, not noise. */
class WatermarkSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("text_watermark_detect flags all injected chains; organic FP rate is a tail") {
    val rows = Registry.queries("text_watermark_detect")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val (inj, organic) = rows.partition(_.getAs[Long]("doc_id") % 41 == 3)
    assert(inj.nonEmpty)
    val expectedZ = math.floor(29.0 / math.sqrt(29.0) * 1e6).toLong
    inj.foreach { r =>
      assert(r.getAs[Long]("n_green") === r.getAs[Long]("n_bigrams"),
        "injected chain must be all-green")
      assert(r.getAs[Long]("n_bigrams") === 29L)
      assert(r.getAs[Long]("z_micro") === expectedZ)
      assert(r.getAs[Boolean]("watermarked"))
    }
    val fp = organic.count(_.getAs[Boolean]("watermarked"))
    assert(fp.toDouble / organic.length < 0.10,
      s"organic false-positive rate $fp/${organic.length} implausibly high")
    organic.foreach { r =>
      assert(r.getAs[Long]("n_green") <= r.getAs[Long]("n_bigrams"))
    }
  }
}
