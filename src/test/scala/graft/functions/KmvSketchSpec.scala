package graft.functions

import scala.util.Random

import graft.SparkSpec

/** Sketch-contract checks for KMV: distinctness inside the buffer, merge
  * order irrelevance, the (k−1)/θ estimator's error envelope, and the
  * intersection estimate against known overlap.
  */
class KmvSketchSpec extends SparkSpec {

  private val K = 64
  private val Range48 = 1L << 48
  private def g = new KmvSketch(K)

  private def hash48(x: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"kmv$x".getBytes("UTF-8"))
    // first 12 hex digits = first 6 bytes, big-endian
    (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  private def sketch(xs: Seq[Long]): Seq[Long] =
    xs.foldLeft(g.zero)((b, x) => g.reduce(b, hash48(x)))

  private def estimate(ks: Seq[Long]): Long =
    if (ks.size < K) ks.size.toLong
    else (K - 1).toLong * Range48 / ks(K - 1)

  test("buffer holds sorted distinct bottom-k; duplicates never inflate it") {
    val xs = (1L to 200L) ++ (1L to 200L) // every value twice
    val ks = sketch(xs)
    assert(ks.size == K)
    assert(ks == ks.sorted && ks.distinct == ks)
    val expected = (1L to 200L).map(hash48).sorted.take(K)
    assert(ks == expected)
  }

  test("merge of arbitrary splits equals the single-pass sketch") {
    val rnd = new Random(5L)
    val xs = Seq.fill(3000)(rnd.nextLong())
    val whole = sketch(xs)
    val parts = xs.groupBy(_ => rnd.nextInt(5)).values.toSeq.map(sketch)
    assert(parts.reduce(g.merge) == whole)
    assert(parts.reverse.reduce(g.merge) == whole, "merge order must not matter")
  }

  test("estimate lands within 3·rsd of the true distinct count") {
    val rsd = 1.0 / math.sqrt((K - 2).toDouble) // ~12.7% for k=64
    for (n <- Seq(500, 5000, 50000)) {
      val est = estimate(sketch((1L to n.toLong).map(_ * 7919L))).toDouble
      assert(math.abs(est - n) <= 3 * rsd * n,
        s"n=$n est=$est outside 3 rsd (${3 * rsd * n})")
    }
  }

  test("intersection estimate tracks a known 50% overlap") {
    val a = (1L to 4000L)
    val b = (2001L to 6000L) // |a ∩ b| = 2000, |a ∪ b| = 6000
    val (ka, kb) = (sketch(a), sketch(b))
    val u = (ka ++ kb).distinct.sorted.take(K)
    val estU = estimate(u).toDouble
    val m = ka.intersect(kb).count(u.contains)
    val estI = m * estU / K
    assert(math.abs(estU - 6000) <= 0.5 * 6000, s"union est $estU")
    assert(math.abs(estI - 2000) <= 0.5 * 2000, s"intersect est $estI")
  }

  test("sketch_kmv_distinct: type estimates track exact distincts (sf0.01)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = graft.queries.Registry.queries("sketch_kmv_distinct")(spark, dir)
      .where(col("kind") === "type").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("est")).toMap
    val exact = graft.queries.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, d) =>
      val e = rows(t).toDouble
      assert(math.abs(e - d) <= 0.4 * d, s"$t: est $e vs exact $d")
    }
  }
}
