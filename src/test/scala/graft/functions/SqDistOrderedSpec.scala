package graft.functions

import graft.SparkSpec

/** Pins sqdist_ordered to the aggregate(zip_with(...)) HOF formulation it
  * replaces in the k-means assignment kernel — exact integer math, so
  * equality must be literal, including the null semantics. */
class SqDistOrderedSpec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"

  test("equals the HOF fold on the quantized embeddings corpus") {
    GraftFunctions.register(spark)
    val rows = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS a",
        "transform(reverse(embedding), x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS b")
      .selectExpr("sqdist_ordered(a, b) AS fast", s"$hof AS slow")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("nulls on length mismatch and on null elements, like zip_with") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L)),              // length mismatch
      (Seq(1L, 2L), Seq(4L, 6L)),                  // plain: 9 + 16 = 25
      (Seq.empty[Long], Seq.empty[Long]))          // empty: 0
      .toDF("a", "b")
      .selectExpr("sqdist_ordered(a, b) AS fast", s"$hof AS slow")
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    val withNull = spark.sql(
      s"SELECT sqdist_ordered(array(1L, NULL), array(1L, 2L)) AS fast").collect()
    assert(withNull(0).isNullAt(0), "null element must null the fold")
  }
}
