package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** eval_rouge_l: the Spark-side native LCS must equal an independent
  * in-memory DP on the live candidate pairs, and hand-checked sequences
  * pin the kernel's edge behavior. */
class RougeLSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def toks(t: String): Vector[String] =
    Option(t).map(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).take(32).toVector)
      .getOrElse(Vector.empty)

  /** Reference two-row DP (independent of the production kernel). */
  private def lcs(a: Seq[String], b: Seq[String]): Long = {
    val dp = Array.fill(b.length + 1)(0)
    for (x <- a) {
      var prev = 0
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.max(math.max(dp(j), dp(j - 1)),
          if (b(j - 1) == x) prev + 1 else 0)
        prev = cur
      }
    }
    dp(b.length).toLong
  }

  test("lcs_len kernel: hand-checked sequences") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val cases = Seq(
      // (a, b, expected)
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),          // identical
      (Seq("a", "b", "c"), Seq("c", "b", "a"), 1L),          // reversed
      (Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c"), 3L), // gapped
      (Seq("the", "cat", "sat"), Seq("the", "dog", "sat"), 2L), // word-level
      (Seq("a", "a", "b", "a"), Seq("a", "b", "a", "a"), 3L), // repeats
      (Seq.empty[String], Seq("a"), 0L),                      // empty a
      (Seq("a"), Seq.empty[String], 0L))                      // empty b
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("ta", "tb")
      .select(expr("lcs_len(ta, tb)")).collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._3),
      s"kernel disagrees with hand-checked LCS: got $got")
    // and the independent DP agrees with the hand checks too
    assert(cases.map(c => lcs(c._1, c._2)) == cases.map(_._3))
  }

  test("eval_rouge_l matches an independent DP recount on the live pairs") {
    val rows = Registry.queries("eval_rouge_l")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val a = toks(docs(r.getAs[Long]("a")))
      val b = toks(docs(r.getAs[Long]("b")))
      val exp = lcs(a, b)
      assert(r.getAs[Long]("lcs") == exp,
        s"pair (${r.getAs[Long]("a")},${r.getAs[Long]("b")}): " +
          s"got ${r.getAs[Long]("lcs")}, expected $exp")
      assert(r.getAs[Long]("na") == a.length && r.getAs[Long]("nb") == b.length)
      val expPpm = if (b.isEmpty) -1L else exp * 1000000L / b.length
      assert(r.getAs[Long]("rougel_ppm") == expPpm)
      // recall bound: lcs never exceeds either length
      assert(exp <= math.min(a.length, b.length))
    }
  }

  test("lcs_len equals the reference DP on 300 random token arrays") {
    // deterministic scalacheck sampling (seeded — no Math.random in
    // tests); a 6-token alphabet forces heavy repeats, the regime where
    // LCS DP off-by-ones and the oracle's prefix-max reformulation
    // would diverge from the textbook recurrence
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val tokGen = Gen.oneOf("a", "b", "c", "ab", "the", "cat")
    val arrGen = Gen.listOf(tokGen).map(_.take(40))
    def sample(size: Int, seed: Long): List[String] =
      arrGen.apply(Gen.Parameters.default.withSize(size), Seed(seed))
        .getOrElse(Nil)
    val cases = (0 until 300).map(i =>
      (sample(1 + i % 45, i.toLong), sample(1 + (i * 7) % 45, i + 1000L)))
    val got = cases.toDF("ta", "tb")
      .select(expr("lcs_len(ta, tb)")).collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == lcs(a, b), s"a=$a b=$b got=$g")
    }
  }

  test("ROUGE-L penalizes order: shuffled boilerplate scores below rouge-1") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // same bag of words, reversed order: rouge-1 overlap is total, LCS is 1
    val df = Seq((Seq("alpha", "beta", "gamma", "delta"),
      Seq("delta", "gamma", "beta", "alpha"))).toDF("ta", "tb")
    val v = df.select(expr("lcs_len(ta, tb)")).collect()(0).getLong(0)
    assert(v == 1L, s"reversed sequence should have LCS 1, got $v")
  }
}
