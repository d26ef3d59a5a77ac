package graft.functions

import scala.util.Random

import graft.SparkSpec

/** Sketch-contract checks for the Gram-matrix Aggregator: the cells must
  * be exact under ANY merge tree (they are plain BIGINT sums), and the
  * derived covariance must agree with Spark's own covar_pop.
  */
class GramMatrixSpec extends SparkSpec {

  private val dim = 8
  private def idx(i: Int, j: Int): Int = i * dim - i * (i - 1) / 2 + (j - i)

  private def vecs(seed: Long, n: Int): Seq[Array[Long]] = {
    val rnd = new Random(seed)
    Seq.fill(n)(Array.fill(dim)(rnd.nextInt(2001) - 1000L))
  }

  test("merge of arbitrary splits equals the single-pass fold") {
    val g = new GramMatrix(dim)
    val vs = vecs(7L, 100)
    val whole = vs.foldLeft(g.zero)((b, v) => g.reduce(b, v.toSeq))
    val rnd = new Random(13L)
    // three random partitions, merged in a skewed tree
    val parts = vs.groupBy(_ => rnd.nextInt(3)).values.toSeq
      .map(_.foldLeft(g.zero)((b, v) => g.reduce(b, v.toSeq)))
    val merged = parts.reduce(g.merge)
    assert(merged.n == whole.n)
    assert(merged.sx.toSeq == whole.sx.toSeq)
    assert(merged.sxy.toSeq == whole.sxy.toSeq)
  }

  test("sufficient statistics reproduce covar_pop and the diagonal is a variance") {
    val g = new GramMatrix(dim)
    val vs = vecs(21L, 500)
    val st = vs.foldLeft(g.zero)((b, v) => g.reduce(b, v.toSeq))
    val n = st.n.toDouble
    for (i <- 0 until dim; j <- i until dim) {
      val cov = st.sxy(idx(i, j)) / n - (st.sx(i) / n) * (st.sx(j) / n)
      // direct two-pass covariance
      val mi = vs.map(_(i)).sum / n
      val mj = vs.map(_(j)).sum / n
      val direct = vs.map(v => (v(i) - mi) * (v(j) - mj)).sum / n
      assert(math.abs(cov - direct) < 1e-6 * math.max(1.0, math.abs(direct)),
        s"cell ($i,$j)")
      if (i == j) assert(cov >= -1e-9, s"negative variance at $i")
    }
  }

  test("embed_gram_cov agrees with Spark covar_pop on sampled cells (sf0.001)") {
    import org.apache.spark.sql.functions._
    val dirSf = "/root/testdata/sf0.001"
    val rows = graft.queries.Registry.queries("embed_gram_cov")(spark, dirSf)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
    assert(rows.size == 64 * 65 / 2)
    val q = graft.queries.Tables.embeddings(spark, dirSf).select(expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS e"))
    for ((i, j) <- Seq((0L, 0L), (3L, 17L), (63L, 63L), (5L, 62L))) {
      val exp = q.select(covar_pop(
          expr(s"CAST(e[$i] AS DOUBLE)"), expr(s"CAST(e[$j] AS DOUBLE)"))
          .as("c")).collect().head.getDouble(0)
      val r = rows((i, j))
      val got = r.getAs[Long]("sxy").toDouble / r.getAs[Long]("n") -
        (r.getAs[Long]("sx_i").toDouble / r.getAs[Long]("n")) *
          (r.getAs[Long]("sx_j").toDouble / r.getAs[Long]("n"))
      assert(math.abs(got - exp) < 1e-6 * math.max(1.0, math.abs(exp)),
        s"cell ($i,$j): $got vs $exp")
    }
  }
}
