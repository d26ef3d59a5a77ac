package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Local rank recount for corr_spearman: ranks from the same
  * (metric, doc_id) total order, Σd² and the 6Σd² identity recomputed
  * in-memory, plus the structural fact the query exists to surface —
  * length and token count are strongly positively correlated.
  */
class CorrSpearmanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("corr_spearman matches a local rank recount per lang") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(expr("filter(split(text, '\\\\s+'), t -> t <> '')")).cast("long")
          .as("toks"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("toks")))
    val expected = docs.groupBy(_._2).collect {
      case (lang, ds) if ds.length >= 2 =>
        val n = ds.length.toLong
        val r1 = ds.sortBy(d => (d._4, d._1)).zipWithIndex
          .map { case (d, i) => d._1 -> (i + 1L) }.toMap
        val r2 = ds.sortBy(d => (d._3, d._1)).zipWithIndex
          .map { case (d, i) => d._1 -> (i + 1L) }.toMap
        val sd2 = ds.map { d =>
          val diff = r1(d._1) - r2(d._1); diff * diff
        }.sum
        val num = n * (n * n - 1) - 6 * sd2
        val den = n * (n * n - 1)
        lang -> ((n, sd2, num, den,
          math.floor(1000.0 * num.toDouble / den.toDouble).toLong))
    }
    val got = Registry.queries("corr_spearman")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sd2"),
          r.getAs[Long]("rho_num"), r.getAs[Long]("rho_den"),
          r.getAs[Long]("rho_milli")))).toMap
    assert(got === expected)
    // the readout the query exists for: length and token count are
    // strongly positively correlated in every language
    got.values.foreach { case (_, _, _, _, rhoMilli) =>
      assert(rhoMilli > 500L)
    }
  }
}
