package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exercises eval_ndcg's degenerate-class branch (ADVICE r04): a query
  * whose label no other vector shares has n_rel = 0 and must EMIT its
  * row with ndcg_ppm = -1 — before the round-5 left-join fix the inner
  * join to the relevant-count frame silently dropped it. The stock
  * fixture has no such label, so this spec engineers one. */
class NdcgDegenerateSpec extends SparkSpec {

  test("a query with zero same-label corpus rows emits ndcg_ppm = -1") {
    import spark.implicits._
    val dim = 64
    // 40 vectors, labels 0/1 — except vec 3, whose label 99 is unique
    val rows = (0 until 40).map { i =>
      val emb = Array.tabulate(dim)(j =>
        (math.sin(i * 131 + j * 17) * 0.5).toFloat)
      (i.toLong, emb, if (i == 3) 99 else i % 2)
    }
    val dir = Files.createTempDirectory("ndcg-degen").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = graft.queries.Registry.queries("eval_ndcg")(spark, dir)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_rel"), r.getAs[Long]("ndcg_ppm"))).toMap
    // all 8 query ids (vec_id < 8) present — none dropped
    assert(out.keySet == (0L until 8L).toSet, s"queries missing: $out")
    assert(out(3L) == ((0L, -1L)),
      s"degenerate query should report n_rel=0, ndcg=-1: ${out(3L)}")
    // non-degenerate queries have positive n_rel and a sane ndcg
    (0L until 8L).filter(_ != 3L).foreach { q =>
      assert(out(q)._1 > 0 && out(q)._2 >= 0 && out(q)._2 <= 1000000,
        s"q=$q: ${out(q)}")
    }
  }
}
