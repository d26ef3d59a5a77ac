package graft.queries

import graft.SparkSpec

/** The bounded-driver-collect gate (VERDICT r06 task 6): over-cap frames
  * throw instead of materializing, in-cap frames pass through whole. */
class DriverGuardSpec extends SparkSpec {

  test("collectBounded throws past the cap instead of materializing") {
    val df = spark.range(100).toDF("id")
    val e = intercept[IllegalStateException] {
      DriverGuard.collectBounded(df, 10, "test frame")
    }
    assert(e.getMessage.contains("test frame"))
    assert(e.getMessage.contains("10"))
  }

  test("collectBounded returns the full frame when within the cap") {
    val df = spark.range(100).toDF("id")
    val rows = DriverGuard.collectBounded(df, 200, "test frame")
    assert(rows.length === 100)
  }

  test("bpe_train merge budget past the cap fails loudly up front") {
    import spark.implicits._
    val enc = Seq(("ab", 1L, " a b ")).toDF("w", "freq", "s")
    val e = intercept[IllegalArgumentException] {
      GraphBpeQueries.bpeLearnMerges(enc, 5000)
    }
    assert(e.getMessage.contains("4096"))
  }
}
