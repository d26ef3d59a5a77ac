package graft.ops

import graft.SparkSpec

class ProgressSpec extends SparkSpec {

  test("listener records action wall time and output rows") {
    val l = Progress.attach(spark)
    try {
      spark.range(1000).selectExpr("id * 2 AS x").collect()
      // listener callbacks are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      var entries = l.report()
      while (entries.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); entries = l.report()
      }
      assert(entries.nonEmpty, "no progress entries recorded")
      val e = entries.head
      assert(e.wallSec > 0)
      assert(e.error.isEmpty)
      assert(l.formatted().head.startsWith("[progress]"))
    } finally Progress.detach(spark, l)
  }
}
