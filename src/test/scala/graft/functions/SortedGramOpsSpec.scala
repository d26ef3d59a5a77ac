package graft.functions

import graft.SparkSpec

/** Pins the sorted-merge verification kernels to the SQL formulations
  * they replace — those formulations are what the DuckDB oracles mirror,
  * so these equalities carry the hash-match for dedup_minhash_est,
  * dedup_ngram_jaccard and eval_bleu. */
class SortedGramOpsSpec extends SparkSpec {

  private lazy val texts: Seq[String] = {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val fragGen = Gen.frequency(
      (6, Gen.alphaChar.map(_.toString)), (2, Gen.const(" ")),
      (1, Gen.numChar.map(_.toString)),
      (1, Gen.oneOf("é", "ß", "Ä", "中", "😀", "-", ".", "\n", "\t")))
    val strGen = Gen.listOf(fragGen).map(_.mkString)
    // include the <5-char whole-text fallback edge and the empty string
    "" +: "ab" +: "abcd" +: (0 until 200).flatMap { i =>
      strGen.apply(Gen.Parameters.default.withSize(1 + i % 80),
        Seed(i.toLong)): Option[String]
    }
  }

  test("char_shingle_hashes = sorted array_distinct(transform(shingles, xxhash64))") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = texts.toDF("text")
      .selectExpr("char_shingle_hashes(text) AS fast",
        """array_sort(array_distinct(transform(
             CASE WHEN length(text) < 5 THEN array(text)
             ELSE transform(sequence(1, length(text) - 4),
               i -> substring(text, i, 5)) END,
             sx -> xxhash64(sx)))) AS slow""")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("word_gram_hash_counts = sorted hash histogram of word_ngrams; tot = gram count") {
    GraftFunctions.register(spark)
    import spark.implicits._
    for (n <- Seq(1, 2, 3)) {
      val rows = texts.toDF("text")
        .selectExpr(s"word_gram_hash_counts(text, $n) AS fast",
          s"array_sort(transform(word_ngrams(text, $n, false), g -> xxhash64(g))) AS hs")
        .selectExpr("fast",
          "array_sort(array_distinct(hs)) AS slow_gh",
          "transform(array_sort(array_distinct(hs)), " +
            "h -> size(filter(hs, x -> x = h))) AS slow_cnt",
          "CAST(size(hs) AS BIGINT) AS slow_tot")
        .collect()
      rows.foreach { r =>
        val fast = r.getStruct(0)
        assert(fast.getSeq[Long](0) == r.getSeq[Long](1), s"gh n=$n: $r")
        assert(fast.getSeq[Long](1).map(_.toLong) ==
          r.getSeq[Int](2).map(_.toLong), s"cnt n=$n: $r")
        assert(fast.getLong(2) == r.getLong(3), s"tot n=$n: $r")
      }
    }
  }

  test("char_gram_hash_counts = sorted hash histogram of the 5-char shingles") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = texts.toDF("text")
      .selectExpr("char_gram_hash_counts(text) AS fast",
        // the SQL formulation: every 5-char window (whole-text fallback
        // under 5 chars), hashed and histogrammed
        """array_sort(transform(
             CASE WHEN length(text) < 5 THEN array(text)
             ELSE transform(sequence(1, length(text) - 4),
                    i -> substring(text, i, 5)) END,
             g -> xxhash64(g))) AS hs""")
      .selectExpr("fast",
        "array_sort(array_distinct(hs)) AS slow_gh",
        "transform(array_sort(array_distinct(hs)), " +
          "h -> size(filter(hs, x -> x = h))) AS slow_cnt",
        "CAST(size(hs) AS BIGINT) AS slow_tot")
      .collect()
    rows.foreach { r =>
      val fast = r.getStruct(0)
      assert(fast.getSeq[Long](0) == r.getSeq[Long](1), s"gh: $r")
      assert(fast.getSeq[Long](1).map(_.toLong) ==
        r.getSeq[Int](2).map(_.toLong), s"cnt: $r")
      assert(fast.getLong(2) == r.getLong(3), s"tot: $r")
    }
  }

  test("chrF2 identities: identical docs score 1000000 ppm, disjoint score 0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("the quick brown fox jumps", "the quick brown fox jumps"),
      ("aaaaaaaaaa", "zzzzzzzzzz"))
      .toDF("x", "y")
      .selectExpr("char_gram_hash_counts(x) AS ga", "char_gram_hash_counts(y) AS gb")
      .selectExpr("sorted_summin(ga.gh, ga.cnt, gb.gh, gb.cnt) AS m",
        "ga.tot AS ta", "gb.tot AS tb")
      .selectExpr("(5 * m * 1000000) div (4 * tb + ta) AS chrf2_ppm")
      .collect().map(_.getLong(0)).toSeq
    assert(df == Seq(1000000L, 0L), s"chrf2=$df")
  }

  test("sorted_intersect_count = size(array_intersect) on sorted distinct arrays") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = texts.zip(texts.drop(1) :+ texts.head).toDF("ta", "tb")
      .selectExpr(
        "sorted_intersect_count(char_shingle_hashes(ta), char_shingle_hashes(tb)) AS fast",
        "CAST(size(array_intersect(char_shingle_hashes(ta), char_shingle_hashes(tb))) AS BIGINT) AS slow")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("sorted_summin = the join+least+sum clipped-match formulation (BLEU m_n)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    for (n <- Seq(1, 2)) {
      val rows = texts.zip(texts.drop(2) ++ texts.take(2)).toDF("ta", "tb")
        .selectExpr(
          s"word_gram_hash_counts(ta, $n) AS ua", s"word_gram_hash_counts(tb, $n) AS ub")
        .selectExpr(
          "sorted_summin(ua.gh, ua.cnt, ub.gh, ub.cnt) AS fast",
          // Σ over a's distinct grams of min(cnt_a, cnt_b-or-0): the old
          // pairs×grams left-join aggregate, as pure array math
          """aggregate(
               zip_with(ua.gh, ua.cnt, (g, c) -> named_struct('g', g, 'c', c)),
               0L,
               (acc, e) -> acc + least(e.c, coalesce(
                 element_at(map_from_arrays(ub.gh, ub.cnt), e.g), 0L))) AS slow""")
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"n=$n: $r"))
    }
  }
}
