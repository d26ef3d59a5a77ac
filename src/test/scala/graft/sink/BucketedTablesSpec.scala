package graft.sink

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

class BucketedTablesSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key runs with no shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ
    // AQE wraps the plan in AdaptiveSparkPlanExec, which hides children
    // from collect() until executed; disable it for a static plan check
    spark.conf.set("spark.sql.adaptive.enabled", false)
    try {
      val a = spark.range(10000).select($"id".as("k"), ($"id" * 2).as("va"))
      val b = spark.range(10000).select($"id".as("k"), ($"id" * 3).as("vb"))
      BucketedTables.writeBucketed(a, "bt_a", "k", 8)
      BucketedTables.writeBucketed(b, "bt_b", "k", 8)

      val joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, found ${shuffles.size} exchanges")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.conf.set("spark.sql.adaptive.enabled", true)
      spark.sql("DROP TABLE IF EXISTS bt_a")
      spark.sql("DROP TABLE IF EXISTS bt_b")
    }
  }
}
