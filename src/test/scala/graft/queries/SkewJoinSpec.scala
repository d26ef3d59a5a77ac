package graft.queries

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed dataset") {
    // 90% of rows share one hot key — the shape that melts a single reducer
    val big = spark.range(10000)
      .selectExpr("CASE WHEN id % 10 = 0 THEN id ELSE 42 END AS k",
        "id AS payload")
    val small = Seq((42L, "hot"), (0L, "a"), (10L, "b"), (20L, "c"))
      .toDF("k", "name")

    val expected = big.join(small, "k")
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val got = SkewJoin.saltedEquiJoin(big, small, "k", saltBuckets = 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(got == expected)
    assert(got.count(_._1 == 42L) == 9000)
  }
}
