package graft.functions

import graft.SparkSpec

/** Pins word_ngrams to the lower→split→filter→transform SQL formulation
  * it replaces — the DuckDB oracles use that formulation, so this
  * equality carries the hash-match for every tokenizing query. */
class WordNgramsSpec extends SparkSpec {

  private def slowSql(n: Int, distinct: Boolean): String = {
    val grams =
      if (n == 1) "toks"
      else {
        val parts = (0 until n).map(j => s"toks[i-1+$j]").mkString(", ")
        s"""CASE WHEN size(toks) < $n THEN array()
            ELSE transform(sequence(1, size(toks) - ${n - 1}),
              i -> concat_ws(' ', $parts)) END"""
      }
    if (distinct) s"array_distinct($grams)" else grams
  }

  test("property: equals the SQL formulation on random unicode strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // mix of letters, separators, digits, accents, and non-BMP; fixed
    // seed so the corpus is reproducible across runs
    val fragGen = Gen.frequency(
      (6, Gen.alphaChar.map(_.toString)), (2, Gen.const(" ")),
      (1, Gen.numChar.map(_.toString)),
      (1, Gen.oneOf("é", "ß", "Ä", "中", "😀", "-", ".", "\n", "\t")))
    val strGen = Gen.listOf(fragGen).map(_.mkString)
    val texts = (0 until 200).flatMap { i =>
      strGen.apply(Gen.Parameters.default.withSize(1 + i % 60),
        Seed(i.toLong)): Option[String]
    }
    GraftFunctions.register(spark)
    import spark.implicits._
    for (n <- Seq(1, 2, 4); distinct <- Seq(true, false)) {
      val rows = texts.toDF("text")
        .selectExpr("text",
          s"word_ngrams(text, $n, $distinct) AS fast",
          "filter(split(lower(text), '[^a-z]+'), t -> t <> '') AS toks")
        .selectExpr("text", "fast", s"${slowSql(n, distinct)} AS slow")
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n distinct=$distinct text=${r.getString(0).take(60)}")
      }
    }
  }

  test("word_ngrams equals the split/transform formulation for n=1,2,3,5") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "", "   ", "a", "ab cd", "The quick brown fox jumps over the lazy dog",
      "repeat repeat repeat repeat repeat tokens",
      "MIXED case And-Punctuation! 123 numbers between42words",
      "éèê unicode Ärger STRASSE", "😀 emoji gap word one two three",
      "x" * 10, "one") ++
      graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("text").collect().map(_.getString(0)).toSeq
    for (n <- Seq(1, 2, 3, 5); distinct <- Seq(true, false)) {
      val rows = texts.toDF("text")
        .selectExpr("text",
          s"word_ngrams(text, $n, $distinct) AS fast",
          "filter(split(lower(text), '[^a-z]+'), t -> t <> '') AS toks")
        .selectExpr("text", "fast", s"${slowSql(n, distinct)} AS slow")
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n distinct=$distinct text=${r.getString(0).take(60)}")
      }
    }
  }
}
