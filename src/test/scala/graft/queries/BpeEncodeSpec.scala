package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the BPE application semantics `bpe_encode` relies on — the parts
  * the corpus-level oracle hash can't isolate:
  *
  *  - boundary safety: a merged symbol can never be half-matched by a
  *    later merge ("th e" must not satisfy pattern " h e ");
  *  - left-to-right non-overlapping replacement — the rule Java's
  *    `String.replace` and DuckDB's `replace` share, which makes the
  *    engine and the oracle agree bit-for-bit;
  *  - reconstruction: concatenating a word's tokens yields the word, for
  *    every word and any merge list (encoding never loses characters).
  */
class BpeEncodeSpec extends SparkSpec {

  private def encode(words: Seq[String], merges: Seq[String]): Map[String, Seq[String]] = {
    import spark.implicits._
    GraphBpeQueries.bpeApply(words.toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
  }

  test("merges apply in rank order with symbol-boundary safety") {
    val enc = encode(Seq("the", "there", "a"), Seq("th", "he"))
    // "th" wins first; the trailing "h e" pattern must NOT match inside
    // the merged "th" symbol.
    assert(enc("the") === Seq("th", "e"))
    assert(enc("there") === Seq("th", "e", "r", "e"))
    assert(enc("a") === Seq("a"))
  }

  test("replacement is left-to-right non-overlapping (the shared engine rule)") {
    // " h e h e ": the first " h e " consumes the shared middle space, so
    // the second occurrence no longer has a leading delimiter — exactly
    // what both Java and DuckDB replace() do; the oracle replays it.
    val enc = encode(Seq("hehe"), Seq("he"))
    assert(enc("hehe") === Seq("he", "h", "e"))
  }

  test("token concatenation reconstructs every word") {
    val words = Seq("the", "there", "hehe", "thether", "a", "zzz")
    val merges = Seq("th", "he", "er", "zz")
    val enc = encode(words, merges)
    words.foreach { w => assert(enc(w).mkString === w, s"word $w") }
  }

  test("registered query: fertility is at least one token per word") {
    val df = graft.SparkEntry.queries("bpe_encode")(spark, "/root/testdata/sf0.001")
    val bad = df.where(col("fertility_ppm") < 1000000L ||
      col("n_bpe_tokens") > col("n_words") * 32L).count()
    assert(bad === 0L)
    assert(df.count() > 0L)
  }
}
