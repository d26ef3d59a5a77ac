package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-duplicate evidence for `dedup_substring`: on a synthetic corpus
  * where exactly one 8-word span is shared between known doc pairs, the
  * per-doc stats must flag precisely those docs — with exactly the number
  * of 8-gram windows the shared span produces — and nothing else. This is
  * the property the oracle can't express (the oracle only re-computes; it
  * doesn't know which spans were planted).
  */
class DedupSubstringSpec extends SparkSpec {

  // 16 unique filler words per doc (md5-hex chunks are [a-z0-9]; word_ngrams
  // tokenizes on [a-z]+ runs, so digits act as separators — use alphabetic
  // tag words instead to keep token counts predictable)
  private def words(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag${('a' + i % 26).toChar}zz").mkString(" ")

  test("planted shared spans are found exactly; unique docs stay clean") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"  // 8 words
    val docs = Seq(
      // pair sharing the 8-word span embedded in unique context
      (0L, s"${words("qa", 6)} $shared ${words("qb", 6)}"),
      (1L, s"${words("qc", 6)} $shared ${words("qd", 6)}"),
      // doc with no duplicated span
      (2L, words("qe", 20)),
      // doc too short for any 8-gram
      (3L, "tiny doc only five words here")
    ).toDF("doc_id", "text")

    val out = DedupQueries.substringDupStats(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap

    // docs 0/1: 20 tokens → 13 8-gram windows; only the span itself — the
    // single window fully inside `shared` — is common to both docs
    assert(out(0L) == ((13L, 1L, Some(0.0769))), s"doc0: ${out(0L)}")
    assert(out(1L) == ((13L, 1L, Some(0.0769))), s"doc1: ${out(1L)}")
    // unique doc: windows exist, none duplicated
    assert(out(2L)._1 == 13L && out(2L)._2 == 0L, s"doc2: ${out(2L)}")
    // short doc: no windows at all → null fraction
    assert(out(3L) == ((0L, 0L, None)), s"doc3: ${out(3L)}")
  }

  test("a doc repeating its own span is NOT flagged (per-doc distinct grams)") {
    import spark.implicits._
    val span = "india juliet kilo lima mike november oscar papa"
    val docs = Seq(
      (0L, s"$span $span"),      // self-repeat only
      (1L, words("zu", 20))
    ).toDF("doc_id", "text")
    val out = DedupQueries.substringDupStats(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // within-doc repetition is text_repetition's job; cross-doc df must
    // treat the repeated span as ONE gram from this doc
    assert(out(0L) == 0L, s"self-repeat wrongly flagged: ${out(0L)}")
  }
}
