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

  test("string keys work") {
    val fact = Seq("a", "b", "c", "d").toDF("k")
    val dim = Seq("b", "d").toDF("k")
    val kept = BloomPrune.prune(fact, "k", dim, "k", expectedItems = 10)
      .as[String].collect().toSet
    assert(Set("b", "d").subsetOf(kept))
  }
}
