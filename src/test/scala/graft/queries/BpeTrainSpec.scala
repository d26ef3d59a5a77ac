package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** bpe_train: the distributed merge-learning loop must equal an
  * independent in-memory BPE trainer on the same vocabulary (same
  * tie-break: count desc, then pair text), and iteration must matter —
  * later merges must reflect earlier ones. */
class BpeTrainSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Independent reference trainer over a (word → freq) vocabulary:
    * symbols start as chars; each round counts adjacent pairs weighted
    * by freq (overlapping occurrences all count — the query's declared
    * stance), merges the (count desc, pair asc) winner left-to-right
    * non-overlapping, repeats. */
  private def train(vocab: Map[String, Long], merges: Int): Seq[(Long, String, Long)] = {
    var enc: Map[Vector[String], Long] = vocab.toSeq
      .map { case (w, f) => w.map(_.toString).toVector -> f }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = Seq.newBuilder[(Long, String, Long)]
    for (r <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- enc; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((x, y), c) = counts.toSeq
          .minBy { case ((a, b), n) => (-n, s"$a $b") }
        out += ((r.toLong, s"$x $y", c))
        enc = enc.toSeq.map { case (syms, f) =>
          // STRING-REPLACE merge semantics, simulated in symbol space:
          // the pattern ' x y ' consumes the trailing separator, so the
          // symbol immediately after a merge can never START the next
          // match — in 'a a a a' only the FIRST pair merges ([aa, a, a]);
          // in 'a a a a a' pairs (1,2) and (4,5) merge ([aa, a, aa]).
          // The engines' replace and the oracle agree on this.
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
              b += (x + y)
              if (i + 2 < syms.length) b += syms(i + 2) // cannot open a match
              i += 3
            } else { b += syms(i); i += 1 }
          }
          b.result() -> f
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    out.result()
  }

  test("bpe_train equals the in-memory trainer on the sf0.001 vocabulary") {
    graft.functions.GraftFunctions.register(spark)
    val vocab = Tables.spread(Tables.documents(spark, sfDir).select(col("text")))
      .select(explode(expr("word_ngrams(text, 1, false)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = train(vocab, 10)
    val got = Registry.queries("bpe_train")(spark, sfDir)
      .orderBy("rk").collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[String]("pair"), r.getAs[Long]("cnt")))
      .toSeq
    assert(got == expected,
      s"merge tables diverge:\n  spark: $got\n  local: $expected")
  }

  test("iteration matters: a later merge consumes an earlier one's output") {
    // vocabulary engineered so round 2's winner only exists AFTER round
    // 1's merge: "ab" wins round 1, then the symbol "ab" pairs with "c"
    val vocab = Map("abc" -> 10L, "abd" -> 6L, "cc" -> 1L)
    val merges = train(vocab, 2)
    assert(merges(0)._2 == "a b", s"round 1: ${merges(0)}")
    assert(merges(1)._2 == "ab c", s"round 2 must pair the MERGED symbol: ${merges(1)}")
    assert(merges(1)._3 == 10L)
  }

  test("overlapping pairs all count, merge applies non-overlapping") {
    // "aaa": pairs (a,a) twice in the count, but one merge pass yields
    // ["aa","a"] — the count stance and the replace stance the oracle
    // shares
    val vocab = Map("aaa" -> 1L)
    val m = train(vocab, 2)
    assert(m(0) == (1L, "a a", 2L), s"round 1: ${m(0)}")
    assert(m(1) == (2L, "aa a", 1L), s"round 2: ${m(1)}")
  }
}
