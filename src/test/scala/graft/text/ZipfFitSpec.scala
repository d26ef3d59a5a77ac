package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** text_zipf_fit: the micro-quantized moment sums and the closed-form
  * slope/r² must equal an independent local recount from raw text, and
  * the fit must behave like a regression (r² in [0,1], slope negative on
  * a natural-ish frequency spectrum). */
class ZipfFitSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("text_zipf_fit equals a local recount from raw text") {
    val row = Registry.queries("text_zipf_fit")(spark, sfDir).collect() match {
      case Array(r) => r
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    // independent vocabulary from raw text (the oracle's derivation)
    val freq = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .flatMap(r => Option(r.getString(0)).toSeq)
      .flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, ts) => t -> ts.length.toLong }
    val top = freq.toSeq.sortBy { case (t, f) => (-f, t) }.take(500)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log(i + 1.0) * 1e6).toLong,
        math.floor(math.log(f.toDouble) * 1e6).toLong)
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    assert(row.getAs[Long]("n_terms") === n)
    assert(row.getAs[Long]("sx") === sx)
    assert(row.getAs[Long]("sy") === sy)
    val num = n.toDouble * sxy - sx.toDouble * sy
    val den = n.toDouble * sxx - sx.toDouble * sx
    assert(row.getAs[Long]("slope_ppm") ===
      math.floor(num / den * 1e6).toLong)
    assert(row.getAs[Long]("r2_ppm") ===
      math.floor(num * num / (den * (n.toDouble * syy - sy.toDouble * sy))
        * 1e6).toLong)
  }

  test("the fit is regression-shaped: r2 in [0,1], slope negative") {
    val row = Registry.queries("text_zipf_fit")(spark, sfDir).collect().head
    val r2 = row.getAs[Long]("r2_ppm")
    assert(r2 >= 0L && r2 <= 1000000L, s"r2_ppm=$r2")
    // any frequency-ranked spectrum is non-increasing in rank, so the
    // OLS slope of ln(freq) on ln(rank) cannot be positive
    assert(row.getAs[Long]("slope_ppm") <= 0L)
  }
}
