package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the snapshot drift monitor the oracle hash can't state
  * on its own:
  *
  *  - Jensen-Shannon divergence is bounded: 0 ≤ JSD ≤ ln 2 (exceeding
  *    either end means the contribution math or the quantization broke);
  *  - vocabulary accounting closes: every distinct (lang, token) is
  *    exactly one of shared / born / died;
  *  - the snapshot split partitions token mass: tokens_new + tokens_ref
  *    equals the corpus token count per lang.
  */
class CorpusDriftSpec extends SparkSpec {

  test("JSD within [0, ln 2]; vocabulary and token-mass accounting close (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("corpus_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ln2Nano = math.round(math.log(2.0) * 1e9)
    rows.foreach { r =>
      val jsd = r.getAs[Long]("jsd_nanonat")
      assert(jsd >= 0L && jsd <= ln2Nano,
        s"lang ${r.getAs[String]("lang")}: jsd $jsd outside [0, $ln2Nano]")
    }

    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val exact = docs
      .select(col("lang"), explode(expr("word_ngrams(text, 1, false)")).as("t"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("t")).as("nv"), count(lit(1)).as("nt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet == exact.keySet)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (nv, nt) = exact(lang)
      val vocabSum = r.getAs[Long]("vocab_shared") +
        r.getAs[Long]("vocab_born") + r.getAs[Long]("vocab_died")
      assert(vocabSum == nv, s"lang $lang: vocab $vocabSum != distinct $nv")
      val massSum = r.getAs[Long]("tokens_new") + r.getAs[Long]("tokens_ref")
      assert(massSum == nt, s"lang $lang: token mass $massSum != corpus $nt")
    }
  }
}
