package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Brute-force cross-checks for the kNN-graph build, the MRR readout, and
  * the MinHash estimator audit.
  */
class KnnGraphSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sim_knn_graph edges equal the local within-bucket top-3, mutual flag exact") {
    val buckets = SimQueries.lshBuckets(Tables.embeddings(spark, sfDir))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket"))
      .toMap
    val raw = Tables.embeddings(spark, sfDir).collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, b: Long): Double =
      dot(raw(a), raw(b)) / math.sqrt(dot(raw(a), raw(a)) * dot(raw(b), raw(b)))
    val directed: Set[(Long, Long)] = buckets.keys.flatMap { a =>
      val peers = buckets.keys.filter(v => v != a && buckets(v) == buckets(a))
      peers.toSeq.map(v => v -> cos(a, v))
        .sortBy { case (v, c) => (-c, v) }.take(3).map(v => a -> v._1)
    }.toSet
    val expected = directed.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .map { case (u, v) =>
        (u, v, directed.contains((u, v)) && directed.contains((v, u)))
      }
    val got = Registry.queries("sim_knn_graph")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Boolean]("mutual"))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("eval_mrr first ranks match the brute-force label scan") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").toArray)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val got = Registry.queries("eval_mrr")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("first_rank"), r.getAs[Long]("rr_ppm")))).toMap
    assert(got.size === 8)
    vecs.filter(_._1 < 8).foreach { case (q, ql, qe) =>
      val ranked = vecs.filter(_._1 != q).map { case (v, l, e) =>
        (v, l, dot(e, qe) / math.sqrt(dot(e, e) * dot(qe, qe)))
      }.sortBy { case (v, _, c) => (-c, v) }.take(10)
      val fr = ranked.indexWhere(_._2 == ql) match {
        case -1 => -1L
        case i => (i + 1).toLong
      }
      assert(got(q)._1 === fr, s"q=$q")
      assert(got(q)._2 === (if (fr == -1L) 0L else 1000000L / fr), s"q=$q")
    }
  }

  test("dedup_minhash_est: estimator bounded, error is the literal difference") {
    val rows = Registry.queries("dedup_minhash_est")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (agree, est, exact, err) = (r.getAs[Long]("agree"),
        r.getAs[Long]("est_ppm"), r.getAs[Long]("exact_ppm"),
        r.getAs[Long]("err_ppm"))
      assert(agree >= 1L && agree <= 12L,
        "an LSH candidate shares a band, hence at least one hash")
      assert(est === agree * 1000000L / 12L)
      assert(exact >= 0L && exact <= 1000000L)
      assert(err === math.abs(est - exact))
    }
  }
}
