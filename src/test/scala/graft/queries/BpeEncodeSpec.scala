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

  test("bpe_encode_dropout matches a full local replay and only ever splits") {
    val sfDir = "/root/testdata/sf0.001"
    def md5Hex4(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val wc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), '[^a-z]+'), t -> t <> '')")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("w"), r.getAs[Long]("cnt")))
    val vocab = wc.groupBy(_._2).map { case (w, vs) => w -> vs.map(_._3).sum }
    val merges = vocab.toSeq
      .flatMap { case (w, f) => w.sliding(2).filter(_.length == 2).map(_ -> f) }
      .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).sum }.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(20).map(_._1)
    def seg(w: String, dropout: Boolean): Int = {
      var s = " " + w.map(c => s"$c ").mkString
      merges.foreach { m =>
        val skip = dropout && md5Hex4(s"$w|$m") < 6554L
        if (!skip) s = s.replace(s" ${m(0)} ${m(1)} ", s" $m ")
      }
      s.trim.split(" ").count(_.nonEmpty)
    }
    val expected = wc.groupBy(_._1).map { case (doc, vs) =>
      val nWords = vs.map(_._3).sum
      val nBase = vs.map { case (_, w, c) => c * seg(w, dropout = false) }.sum
      val nDrop = vs.map { case (_, w, c) => c * seg(w, dropout = true) }.sum
      doc -> ((nWords, nBase, nDrop,
        nBase * 1000000L / nWords, nDrop * 1000000L / nWords))
    }
    val got = graft.SparkEntry.queries("bpe_encode_dropout")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Long]("n_drop_tokens"), r.getAs[Long]("fertility_ppm"),
          r.getAs[Long]("drop_fertility_ppm")))).toMap
    assert(got === expected)
    // Dropout splits IN AGGREGATE (the regularization price). Note this
    // is not a per-word invariant: skipping a high-rank merge can free
    // characters for a lower-rank overlapping merge to join MORE pairs
    // ("baba" under merges ab,ba: baseline 3 tokens, ab-dropped 2), so
    // only the corpus total is asserted.
    assert(got.values.map(_._3).sum > got.values.map(_._2).sum)
  }
}
