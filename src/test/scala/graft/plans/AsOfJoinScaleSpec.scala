package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale/skew evidence for the native as-of join: the claims the oracle
  * can't check. 400k merged rows with an 80%-hot key exercise the O(1)
  * merge state (a per-key-group buffer would hold ~160k rows for the hot
  * key; the exec never buffers more than one) and the independent
  * expected value is the linear union+window formulation — not the
  * exploding inequality join, which at this row count would materialize
  * ~13B pairs for the hot key alone.
  */
class AsOfJoinScaleSpec extends SparkSpec {
  import spark.implicits._

  test("200k×200k skewed merge (80% hot key) matches the union+window formulation") {
    val n = 200000
    // Deterministic pseudo-random via xxhash64 column expressions — no
    // driver-side RNG, no UDF, ANSI-safe.
    def key(idCol: org.apache.spark.sql.Column, salt: Int) =
      when(pmod(xxhash64(idCol, lit(salt)), lit(10L)) < 8, lit("hot"))
        .otherwise(concat(lit("cold"),
          pmod(xxhash64(idCol, lit(salt + 1)), lit(50L))))
    val left = spark.range(n)
      .select(col("id").as("l_id"), key(col("id"), 1).as("l_key"),
        pmod(xxhash64(col("id"), lit(3)), lit(1000000L)).as("l_t"))
    val right = spark.range(n)
      .select(col("id").as("r_id"), key(col("id"), 7).as("r_key"),
        pmod(xxhash64(col("id"), lit(9)), lit(1000000L)).as("r_t"))

    val native = AsOf.joinBackward(left, right, Seq("l_key"), Seq("r_key"),
        "l_t", "r_t", strict = true, rightTiebreak = Seq("r_id"))
      .select(col("l_id"), col("r_id"))

    // Linear independent expected: union both sides, per-key running
    // IGNORE NULLS last over (t, side, r_id) — left rows sort BEFORE
    // right rows at equal t, so the strictly-preceding frame can never
    // leak an equal-time right row (strict semantics); ties among right
    // rows resolve to the max r_id, the same tiebreak the exec uses.
    val union = left.select(col("l_key").as("k"), col("l_t").as("t"),
        lit(0).as("side"), col("l_id"), lit(null: java.lang.Long).as("rid"))
      .unionByName(right.select(col("r_key").as("k"), col("r_t").as("t"),
        lit(1).as("side"), lit(null: java.lang.Long).as("l_id"),
        col("r_id").as("rid")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = union
      .withColumn("match_rid", last(col("rid"), ignoreNulls = true).over(w))
      .where(col("side") === 0)
      .select(col("l_id"), col("match_rid"))

    val got = native.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val exp = expected.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got.size == n && exp.size == n)
    val diffs = got.keysIterator.filter(k => got(k) != exp(k)).take(5).toList
    assert(diffs.isEmpty, s"first diffs: ${diffs.map(k => (k, got(k), exp(k)))}")
  }
}
