package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("advance: capacity bound holds, exact when k exceeds distincts, state accumulates") {
    // exact regime: 3 distinct keys, k = 8 — never evicts
    val (m1, n1) = StreamHeavyHitters.advance(
      Seq(1L, 1L, 2L, 3L, 1L), (Map.empty, 0L), k = 8)
    assert(m1 == Map(1L -> 3L, 2L -> 1L, 3L -> 1L) && n1 == 5)
    // accumulates across batches through the carried state
    val (m2, n2) = StreamHeavyHitters.advance(Seq(1L, 2L), (m1, n1), k = 8)
    assert(m2(1L) == 4L && m2(2L) == 2L && n2 == 7)
    // eviction regime: map never exceeds k entries
    val zipf = (1 to 400).flatMap(i => Seq.fill(400 / i)(i.toLong))
    val (m3, _) = StreamHeavyHitters.advance(zipf, (Map.empty, 0L), k = 10)
    assert(m3.size <= 10, s"summary overflowed capacity: ${m3.size}")
  }

  test("streaming summary keeps every true heavy hitter within the MG bound") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Int, Long)]
    val k = 16
    val out = StreamHeavyHitters.run(
      source.toDS().map { case (s, key) => HHEvent(s, key) }, k)
    val q = out.writeStream
      .format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update())
      .start()

    // skewed stream split over 2 shards by key parity (hash-disjoint):
    // key 1 is hot in shard 1, key 2 hot in shard 0, plus a long tail
    def shard(key: Long): Int = (key % 2).toInt
    val batch1 = Seq.fill(60)(1L) ++ Seq.fill(40)(2L) ++ (10L to 40L)
    val batch2 = Seq.fill(50)(1L) ++ (41L to 80L)
    try {
      source.addData(batch1.map(key => (shard(key), key)))
      q.processAllAvailable()
      source.addData(batch2.map(key => (shard(key), key)))
      q.processAllAvailable()

      // the memory sink appends every Update round — keep the LAST emission
      // per (shard, key): max nSeen is the final micro-batch for that shard
      val rows = spark.table("hh_out")
        .as[HHEstimate].collect()
        .groupBy(e => (e.shard, e.key))
        .map { case (_, es) => es.maxBy(_.nSeen) }
        .toSeq
      val all = batch1 ++ batch2
      val trueCounts = all.groupBy(identity).map { case (key, xs) => key -> xs.size.toLong }
      val perShardN = all.groupBy(shard).map { case (s, xs) => s -> xs.size.toLong }

      trueCounts.foreach { case (key, true_) =>
        val bound = perShardN(shard(key)) / (k + 1).toLong
        val est = rows.find(e => e.key == key).map(_.est)
        if (true_ > bound)
          assert(est.isDefined, s"true heavy hitter $key (count $true_) missing")
        est.foreach { e =>
          assert(e <= true_, s"key $key over-counted: est $e > true $true_")
          assert(true_ - e <= bound,
            s"key $key under-counts past the bound: est $e, true $true_, bound $bound")
        }
      }
      // the hot keys are present with near-exact counts
      assert(rows.find(_.key == 1L).get.est >= 110 - perShardN(1) / (k + 1))
      assert(rows.find(_.key == 2L).get.est >= 40 - perShardN(0) / (k + 1))
    } finally q.stop()
  }
}
