package graft.queries

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: pruned semi-join equals unpruned semi-join") {
    val fact = spark.range(10000).toDF("k")
    val dim = spark.range(100).select(($"id" * 100).as("k"))
    val pruned = BloomPrune.prune(fact, "k", dim, "k", expectedItems = 1000)
    val viaPruned = pruned.join(dim, Seq("k"), "left_semi")
      .as[Long].collect().sorted
    val direct = fact.join(dim, Seq("k"), "left_semi")
      .as[Long].collect().sorted
    assert(viaPruned.toSeq == direct.toSeq)
    assert(direct.length == 100)
  }

  test("prunes the vast majority of non-matching rows") {
    val fact = spark.range(10000).toDF("k")
    val dim = spark.range(100).select(($"id" * 100).as("k"))
    val kept = BloomPrune.prune(fact, "k", dim, "k",
      expectedItems = 1000, fpp = 0.01).count()
    // 100 true matches + ~1% fp of the other 9900
    assert(kept >= 100 && kept < 600, s"kept=$kept")
  }

  test("membership test is a native expression inside codegen, not a UDF") {
    val fact = spark.range(1000).toDF("k")
    val dim = spark.range(10).toDF("k")
    val plan = BloomPrune.prune(fact, "k", dim, "k", expectedItems = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(1500))
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "bloom probe fell out of codegen into a UDF")
    // null keys prune cleanly (UDF guard semantics preserved)
    import org.apache.spark.sql.functions.{col, when}
    val withNulls = spark.range(100)
      .select(when(col("id") % 2 === 0, col("id")).as("k"))
    assert(BloomPrune.prune(withNulls, "k", dim, "k", expectedItems = 100)
      .where(col("k").isNull).count() == 0)
  }

  test("string keys work") {
    val fact = Seq("a", "b", "c", "d").toDF("k")
    val dim = Seq("b", "d").toDF("k")
    val kept = BloomPrune.prune(fact, "k", dim, "k", expectedItems = 10)
      .as[String].collect().toSet
    assert(Set("b", "d").subsetOf(kept))
  }
}
