package graft.functions

import graft.SparkSpec

/** Pins winnow_fps to the array-SQL formulation it replaces (hash every
  * word-n-gram with md5, slide a w-window, keep each window's min,
  * distinct) — the DuckDB winnowing oracles compute exactly that chain,
  * so this equality carries the hash-match for dedup_winnow_fp and
  * dedup_winnow_pairs. The SQL chain is spelled with the hash array
  * aliased in a SEPARATE projection barrier (a limit(…) subquery would
  * not stop CollapseProject; collect()ing the midpoint does), because
  * inlining it is the ~40× recompute trap the native expression exists
  * to avoid.
  */
class WinnowFpsSpec extends SparkSpec {

  private def slowFps(texts: Seq[String], n: Int, w: Int): Seq[Seq[String]] = {
    import spark.implicits._
    // two-step: materialize the hash arrays first so the reference
    // computation can't be deformed by projection collapse
    val hashed = texts.toDF("text")
      .selectExpr(s"transform(word_ngrams(text, $n, false), g -> md5(g)) AS h")
      .collect().map(_.getSeq[String](0)).toSeq
    hashed.map { h =>
      if (h.length < w) Seq.empty[String]
      else (0 to h.length - w).map(i => h.slice(i, i + w).min).distinct
    }
  }

  test("property: equals the md5/window-min/distinct formulation") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val fragGen = Gen.frequency(
      (6, Gen.alphaChar.map(_.toString)), (2, Gen.const(" ")),
      (1, Gen.numChar.map(_.toString)),
      (1, Gen.oneOf("é", "ß", "中", "😀", "-", ".", "\n")))
    val strGen = Gen.listOf(fragGen).map(_.mkString)
    val texts = (0 until 150).flatMap { i =>
      strGen.apply(Gen.Parameters.default.withSize(1 + i % 80),
        Seed(1000L + i)): Option[String]
    } ++ Seq("", "   ", "a b c d e f g h", "one two three")
    GraftFunctions.register(spark)
    import spark.implicits._
    for ((n, w) <- Seq((4, 4), (2, 3), (1, 2))) {
      val fast = texts.toDF("text")
        .selectExpr(s"winnow_fps(text, $n, $w) AS fps")
        .collect().map(_.getSeq[String](0)).toSeq
      val slow = slowFps(texts, n, w)
      fast.zip(slow).zip(texts).foreach { case ((f, s), t) =>
        assert(f == s, s"n=$n w=$w text=${t.take(60)}")
      }
    }
  }

  test("corpus docs: matches on real document text, including short docs") {
    GraftFunctions.register(spark)
    val texts = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0)).toSeq ++
      Seq("tiny", "four words exactly here")
    import spark.implicits._
    val fast = texts.toDF("text")
      .selectExpr("winnow_fps(text, 4, 4) AS fps")
      .collect().map(_.getSeq[String](0)).toSeq
    assert(fast.zip(slowFps(texts, 4, 4)).forall { case (f, s) => f == s })
    // at least one real doc produces fingerprints
    assert(fast.exists(_.nonEmpty))
  }
}
