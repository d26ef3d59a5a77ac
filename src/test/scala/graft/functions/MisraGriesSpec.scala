package graft.functions

import scala.util.Random

import graft.SparkSpec

/** The Misra-Gries guarantees in the regime the registered query never
  * enters (capacity ≪ distinct keys, constant eviction), exercised
  * through arbitrary reduce/merge trees like a real shuffle produces:
  *
  *  - buffer never exceeds k entries;
  *  - every key with true count > N/(k+1) is present;
  *  - estimates under-count by at most N/(k+1);
  *  - capacity ≥ distincts ⇒ exact (what makes the query oracle-checkable).
  */
class MisraGriesSpec extends SparkSpec {

  private def zipf(n: Int, nKeys: Int, rnd: Random): Seq[Long] =
    Seq.fill(n) {
      // crude zipf-ish: rank ∝ 1/u, clamped
      val u = math.max(rnd.nextDouble(), 1e-9)
      math.min((1.0 / u).toLong % nKeys, nKeys - 1L)
    }

  /** Fold a stream through reduce, splitting into `parts` random chunks
    * merged pairwise in random order — a shuffle-shaped merge tree. */
  private def summarize(agg: MisraGries, xs: Seq[Long], parts: Int,
      rnd: Random): Map[Long, Long] = {
    val chunks = xs.grouped(math.max(1, xs.size / parts)).toVector
    val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    rnd.shuffle(partials).reduceOption(agg.merge).getOrElse(agg.zero)
  }

  test("k-bounded buffer, heavy hitters present, under-count ≤ N/(k+1)") {
    val rnd = new Random(13)
    val k = 16
    val agg = new MisraGries(k)
    for (trial <- 1 to 10) {
      val xs = zipf(5000, 1000, rnd)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toLong
      val bound = n / (k + 1)
      val sum = summarize(agg, xs, parts = 1 + rnd.nextInt(8), rnd)
      assert(sum.size <= k, s"trial $trial: buffer ${sum.size} > k=$k")
      truth.filter(_._2 > bound).foreach { case (key, c) =>
        assert(sum.contains(key),
          s"trial $trial: heavy hitter $key (count $c > $bound) missing")
      }
      sum.foreach { case (key, est) =>
        val t = truth(key)
        assert(est <= t, s"trial $trial: over-count $key est=$est true=$t")
        assert(t - est <= bound,
          s"trial $trial: $key under-counted by ${t - est} > $bound")
      }
    }
  }

  test("capacity ≥ distincts ⇒ exact counts under any merge tree") {
    val rnd = new Random(29)
    val agg = new MisraGries(64)
    val xs = Seq.fill(3000)(rnd.nextInt(50).toLong)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 7, 16)) {
      assert(summarize(agg, xs, parts, rnd) == truth)
    }
  }
}
