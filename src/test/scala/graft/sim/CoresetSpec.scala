package graft.sim

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Brute-force cross-checks for the coreset / truncation-eval additions:
  * the distributed greedy k-center must replay the literal sequential
  * greedy exactly (integer distances make this bit-checkable), and the
  * MRL truncation eval's full-dim list must equal an exact local top-3.
  */
class CoresetSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def quantizedVecs(): Map[Long, Array[Long]] =
    Tables.embeddings(spark, sfDir).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding")
          .map(x => math.round(x.toDouble * 1e6)).toArray
    }.toMap

  test("sample_kcenter replays the sequential greedy farthest-point exactly") {
    val vecs = quantizedVecs()
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    var selected = Vector(0L)
    var expected = Vector((1L, 0L, 0L))
    while (selected.size < 5) {
      val (vid, dmin) = vecs.keys.toSeq.filterNot(selected.contains).map { v =>
        v -> selected.map(c => d2(vecs(v), vecs(c))).min
      }.minBy { case (v, d) => (-d, v) } // max distance, tie -> min id
      selected :+= vid
      expected :+= ((selected.size.toLong, vid, dmin))
    }
    val got = Registry.queries("sample_kcenter")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("d2_prev")))
      .sortBy(_._1).toVector
    assert(got === expected)
    // farthest-point distances never increase as coverage grows
    val ds = got.drop(1).map(_._3)
    assert(ds === ds.sorted.reverse)
  }

  test("embed_mrl_recall full-dim list matches exact local top-3; recall bounded") {
    val raw = Tables.embeddings(spark, sfDir).collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray
    }.toMap
    // ordered left fold — the same op sequence as dot_ordered
    def dot(a: Array[Float], b: Array[Float], d: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < d) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val rows = Registry.queries("embed_mrl_recall")(spark, sfDir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val top3 = raw.keys.toSeq.filter(_ != q).map { v =>
        v -> dot(raw(v), raw(q), 64) /
          math.sqrt(dot(raw(v), raw(v), 64) * dot(raw(q), raw(q), 64))
      }.sortBy { case (v, c) => (-c, v) }.take(3).map(_._1)
      assert(r.getAs[String]("ids_full") === top3.mkString(","))
      val overlap = r.getAs[Long]("n_overlap")
      assert(overlap >= 0L && overlap <= 3L)
      assert(r.getAs[Long]("recall_ppm") === overlap * 1000000L / 3L)
      // truncated list has the same shape even when its content differs
      assert(r.getAs[String]("ids_trunc").split(",").length === 3)
    }
  }
}
