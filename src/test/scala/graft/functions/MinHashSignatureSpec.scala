package graft.functions

import graft.SparkSpec

/** Pins the native one-pass `minhash_sig` expression to the composable-SQL
  * formulation it replaced (shingle array -> md5 per shingle -> hex-digit
  * base hash -> 12 array_min universal hashes). The DuckDB oracle uses the
  * SQL formulation, so this equality is what keeps the oracle hash-match.
  */
class MinHashSignatureSpec extends SparkSpec {

  /** The original SQL formulation's base-hash array (one md5 per 5-char
    * shingle, first-7-hex-digit integer). */
  private val xsSql: String = {
    val shingles =
      """CASE WHEN length(text) < 5 THEN array(text)
         ELSE transform(sequence(1, length(text) - 4), i -> substring(text, i, 5)) END"""
    val baseHash = (0 until 7).map { i =>
      val pow = 1L << (4 * (6 - i))
      s"(instr('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * ${pow}L"
    }.mkString("(", " + ", ")")
    s"transform(transform($shingles, s -> md5(s)), h -> $baseHash)"
  }

  private val slowSql: String =
    (0 until MinHashSignature.NumHashes).map { j =>
      s"array_min(transform(xs, x -> (${MinHashSignature.A(j)}L * x + " +
        s"${MinHashSignature.B(j)}L) % ${MinHashSignature.P}L))"
    }.mkString("array(", ", ", ")")

  private def check(texts: Seq[String]): Unit = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = texts.toDF("text")
      .selectExpr("text", "minhash_sig(text) AS fast", s"$xsSql AS xs")
      .selectExpr("text", "fast", s"$slowSql AS slow")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"mismatch for text=${r.getString(0).take(60)}")
    }
  }

  test("equals the SQL formulation on edge strings") {
    check(Seq(
      "", "a", "abcd", "abcde", "abcdef",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",
      "exact exact exact exact",
      "éèê ascii and accents mixed in",
      // supplementary-plane chars: one code point = two Java chars; SQL
      // substring counts code points, so the native expression must too
      "a😀b😁cdefg emoji in the stream",
      "😀😁😂😃😄😅",
      "😀ab"))
  }

  test("equals the SQL formulation on the documents corpus (sf0.001)") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    check(texts)
  }

  test("null-safe and usable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT minhash_sig(CAST(NULL AS STRING))").head()
    assert(r.isNullAt(0))
  }
}
