package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins mix_anneal_schedule's DECIMAL(38,0)-promoted allocation
  * arithmetic above the 2^63 product boundary the old BIGINT chain
  * overflowed at (ADVICE r04): corpus-scale totals with a dominant
  * source, checked against exact BigInt arithmetic. */
class MixAnnealOverflowSpec extends SparkSpec {

  test("anneal allocations are exact past the BIGINT product overflow") {
    import spark.implicits._
    // total × tokens ≈ 2.9e36 — far past 2^63 ≈ 9.2e18; the un-promoted
    // (((total div 2) * 9 div 10) * tokens) would overflow (ANSI error)
    val cases = Seq(
      (1200000000000000000L, 2400000000000000000L,
        900000000000000000L, 1100000000000000000L),
      (9000000000L, 20000000000L, 7000000000L, 9000000000L), // the ADVICE corpus
      (17L, 40L, 11L, 13L),
      (0L, 40L, 0L, 13L),
      (40L, 40L, 13L, 0L)) // qtotal = 0 branch
    val got = cases.toDF("tokens", "total", "qtokens", "qtotal")
      .select(col("tokens"), col("total"), col("qtokens"), col("qtotal"),
        expr(MixQueries.P1TokensExpr).as("p1"),
        expr(MixQueries.P2TokensExpr).as("p2"))
      .collect()
    got.foreach { r =>
      val (tokens, total) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)))
      val (qtokens, qtotal) = (BigInt(r.getLong(2)), BigInt(r.getLong(3)))
      val budget1 = total / 2 * 9 / 10
      assert(BigInt(r.getLong(4)) == budget1 * tokens / total, r.toString)
      val expected2 =
        if (qtotal == 0) BigInt(0) else (total / 2 / 10) * qtokens / qtotal
      assert(BigInt(r.getLong(5)) == expected2, r.toString)
    }
  }
}
