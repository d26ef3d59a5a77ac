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

  test("pruneAdaptive: fpp floor at small n, graceful degrade, fallback past budget") {
    import org.apache.spark.sql.functions.col
    val fact = spark.range(100).toDF("k")
    val dim = spark.range(0, 100, 2).toDF("k")
    // small n: the floor fpp applies, filter engages, semantics = prune
    val small = BloomPrune.pruneAdaptive(fact, "k", dim, "k", nKeys = 50)
    assert(small.engaged && small.fpp == 0.001)
    val kept = small.df.select(col("k")).as[Long].collect().toSet
    assert((0L until 100L by 2).forall(kept.contains)) // no false negatives
    // over-budget: fpp degrades but the filter still pays (scaled-down
    // 1 KB budget, 5 k keys → ~1.6 bits/key → fpp ~0.46 — same geometry
    // as 256 MB against ~1.3 B keys)
    val mid = BloomPrune.pruneAdaptive(fact, "k", dim, "k", nKeys = 5000L,
      maxFilterBytes = 1024L)
    assert(mid.engaged && mid.fpp > 0.001 && mid.fpp < 0.5, mid.toString)
    // past the crossover (achievable fpp ≥ 0.5) the filter can't pay:
    // the unpruned frame comes back unchanged
    val huge = BloomPrune.pruneAdaptive(fact, "k", dim, "k", nKeys = 20000L,
      maxFilterBytes = 1024L)
    assert(!huge.engaged && (huge.df eq fact))
  }
}
