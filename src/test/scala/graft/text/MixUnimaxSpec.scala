package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** mix_unimax's closed form replaces a sequential loop — the one thing the
  * oracle hash gate can NOT establish is that the closed form IS that loop
  * (both engines could agree on a wrong formula). Pin it against the
  * literal UniMax iteration on randomized cap/budget sets, then check the
  * fixture run's waterfilling invariants.
  */
class MixUnimaxSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The literal UniMax loop over ascending caps: every language takes
    * min(cap, remaining div remaining_langs), in order. */
  private def literal(caps: Seq[Long], budget: Long): Seq[Long] = {
    var r = budget
    var m = caps.length
    caps.map { c =>
      val a = math.min(c, r / m)
      r -= a; m -= 1
      a
    }
  }

  /** The query's closed form, replicated exactly (same greatest/floor
    * algebra as the SQL on both engines). */
  private def closed(caps: Seq[Long], budget: Long): Seq[Long] = {
    val k = caps.length
    val cum = caps.scanLeft(0L)(_ + _)
    val rArr = (0 until k).map(i => math.max(budget - cum(i), 0L))
    val fair = (0 until k).map(i => rArr(i) / (k - i))
    (0 until k).find(i => caps(i) > fair(i)) match {
      case None => caps
      case Some(p) =>
        val rp = rArr(p)
        val m = k - p
        (0 until k).map(i => if (i < p) caps(i) else (rp + (i - p)) / m)
    }
  }

  test("closed form equals the literal sequential loop on randomized inputs") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 2000) {
      val k = 1 + rnd.nextInt(8)
      val caps = Seq.fill(k)(rnd.nextInt(101).toLong).sorted
      val budget = rnd.nextLong(math.max(caps.sum * 2, 1L) + 1)
      assert(closed(caps, budget) == literal(caps, budget),
        s"trial=$trial caps=$caps budget=$budget")
    }
    // degenerate shapes the random sweep may miss
    assert(closed(Seq(0L, 0L, 0L), 10L) == literal(Seq(0L, 0L, 0L), 10L))
    assert(closed(Seq(5L), 0L) == literal(Seq(5L), 0L))
    assert(closed(Seq(3L, 3L, 3L), 9L) == literal(Seq(3L, 3L, 3L), 9L))
  }

  test("fixture run: caps honored, budget exhausted iff any language is uncapped") {
    val rows = Registry.queries("mix_unimax")(spark, sfDir).collect()
    assert(rows.length > 1)
    val total = Tables.documents(spark, sfDir)
      .select(sum(expr("size(word_ngrams(text, 1, false))")).cast("long"))
      .collect()(0).getLong(0)
    val budget = rows.head.getAs[Long]("budget")
    assert(budget == total * 3 / 2, "budget is 1.5x corpus tokens")
    rows.foreach { r =>
      val (cap, alloc, tokens) = (r.getAs[Long]("cap"), r.getAs[Long]("alloc"),
        r.getAs[Long]("tokens"))
      assert(alloc >= 0L && alloc <= cap, s"${r.getAs[String]("lang")}: cap violated")
      assert(cap == tokens * 2)
      assert(r.getAs[Long]("epochs_milli") == alloc * 1000 / tokens)
      assert(r.getAs[Long]("epochs_milli") <= 2000L, "epoch cap is 2.0")
    }
    val allocs = rows.map(_.getAs[Long]("alloc"))
    val caps = rows.map(_.getAs[Long]("cap"))
    if (allocs.zip(caps).exists { case (a, c) => a < c })
      assert(allocs.sum == budget, "fair regime must exhaust the budget exactly")
    else assert(allocs.sum <= budget)
    // the fixture is built to exercise BOTH branches (en fair, tail capped)
    assert(allocs.zip(caps).exists { case (a, c) => a == c }, "no capped language")
    assert(allocs.zip(caps).exists { case (a, c) => a < c }, "no fair-regime language")
  }
}
