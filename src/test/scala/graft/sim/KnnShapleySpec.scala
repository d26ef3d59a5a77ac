package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Sequential recount of the exact KNN-Shapley closed form plus its
  * defining axioms (efficiency: values sum to the full-set utility).
  */
class KnnShapleySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 5

  test("mine_knn_shapley equals the sequential telescoping recurrence") {
    val rows = Registry.queries("mine_knn_shapley")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
        ((r.getAs[Long]("rk"), r.getAs[Long]("u"), r.getAs[Long]("phi_nano"))))
      .toMap
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      // the dot_ordered fold: widen-then-accumulate left to right
      var s = 0.0
      var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val queries = vecs.filter(_._1 < 5L)
    val train = vecs.filter(_._1 >= 5L)
    queries.foreach { case (qid, qlabel, qemb) =>
      val qn = dot(qemb, qemb)
      val ranked = train.map { case (id, lbl, emb) =>
        (id, if (lbl == qlabel) 1L else 0L,
          dot(emb, qemb) / math.sqrt(dot(emb, emb) * qn))
      }.sortBy { case (id, _, cos) => (-cos, id) }
      val n = ranked.length
      // per-rank quantized term, then suffix sums — the engine's algebra
      val terms = ranked.zipWithIndex.map { case ((_, u, _), idx) =>
        val rk = idx + 1L
        if (rk == n.toLong)
          BigDecimal(u.toDouble * 1e9 / n)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else {
          val uNext = ranked(idx + 1)._2
          BigDecimal((u - uNext).toDouble * math.min(rk, K.toLong) * 1e9 /
            (K.toDouble * rk))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
      }
      val suffix = terms.scanRight(0L)(_ + _).init
      ranked.zipWithIndex.foreach { case ((id, u, _), idx) =>
        val (rk, gu, phi) = rows((qid, id))
        assert(rk === idx + 1L && gu === u, s"q=$qid id=$id")
        assert(phi === suffix(idx), s"q=$qid id=$id phi")
      }
      // efficiency: Σ φ = U(full set) = (#same-label in top-K)/K. With
      // per-term quantization Σφ = Σ_j j·t_j, so the rounding error
      // accumulates as Σ_j j·ε_j ≤ n²/4 nano — tiny relative to the
      // 10⁹ value scale (≤ 62k nano at n = 495)
      val sumPhi = ranked.map { case (id, _, _) => rows((qid, id))._3 }.sum
      val topKu = ranked.take(K).map(_._2).sum
      val exact = topKu.toDouble * 1e9 / K
      assert(math.abs(sumPhi - exact) <= n.toLong * n / 4,
        s"q=$qid efficiency: $sumPhi vs $exact")
      // a same-label nearest neighbor is always weakly positive; a
      // different-label one weakly negative (KNN-Shapley sign property
      // at rank 1: φ_1 − φ_2 has the sign of u_1 − u_2)
    }
    // the valuation actually separates: some training points hurt
    assert(rows.values.exists(_._3 < 0L) && rows.values.exists(_._3 > 0L))
  }
}
