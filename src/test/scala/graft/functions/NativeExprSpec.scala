package graft.functions

import graft.SparkSpec

/** Pins simhash16 and dot_ordered to the composable-SQL formulations they
  * replaced — the DuckDB oracles use those formulations, so these
  * equalities carry the hash-match. */
class NativeExprSpec extends SparkSpec {

  private val simhashSlowSql: String = {
    val sums = (1 to 16).map { i =>
      s"""aggregate(hs, 0L, (acc, h) ->
           acc + CASE WHEN (instr('0123456789abcdef', substring(h, $i, 1)) - 1) % 2 = 1
                 THEN 1L ELSE -1L END)"""
    }
    val bits = sums.map(s => s"CASE WHEN ($s) > 0 THEN '1' ELSE '0' END")
    s"""CASE WHEN size(hs) = 0 THEN NULL ELSE ${bits.mkString("concat(", ", ", ")")} END"""
  }

  test("simhash16 equals the md5-parity-sum formulation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val texts = Seq(
      "", "   ", "a", "The quick brown fox",
      "repeat repeat repeat tokens tokens",
      "MIXED case And-Punctuation! 123 numbers",
      "éèê unicode") ++
      graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("text").collect().map(_.getString(0)).toSeq
    val rows = texts.toDF("text")
      .selectExpr("text", "simhash16(text) AS fast",
        "transform(filter(split(lower(text), '[^a-z]+'), t -> t <> ''), t -> md5(t)) AS hs")
      .selectExpr("text", "fast", s"$simhashSlowSql AS slow")
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"mismatch for text=${r.getString(0).take(50)}")
    }
  }

  test("dot_ordered equals the aggregate(zip_with(...)) fold, bit-exactly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val rows = vecs.toDF("a", "b")
      .selectExpr(
        "dot_ordered(a, b) AS fast",
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS slow""")
      .collect()
    rows.foreach { r =>
      // bit-exact, not approximate: same widen-multiply-accumulate order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot_ordered on the embeddings corpus matches, null on length mismatch") {
    GraftFunctions.register(spark)
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb
      .selectExpr(
        "dot_ordered(embedding, embedding) AS fast",
        """aggregate(zip_with(embedding, embedding,
             (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS slow""")
      .where("fast <> slow").count()
    assert(n == 0)
    val r = spark.sql(
      "SELECT dot_ordered(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))")
      .head()
    assert(r.isNullAt(0))
  }

  test("dot_ordered nulls the fold on a null element, like zip_with") {
    GraftFunctions.register(spark)
    // a null slot must null the whole result (the HOF fold's acc + null
    // does), not read garbage and return a number
    val r = spark.sql(
      """SELECT dot_ordered(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
                            array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d,
                aggregate(zip_with(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
                                   array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
                            (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS hof""")
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
