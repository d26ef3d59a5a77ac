package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.RDDBlockId

import graft.SparkSpec

/** The bounded multi-dir residency contract (VERDICT r07 task 7): a
  * session cycling through corpus dirs must hold at most
  * [[SessionCache.DefaultMaxDirs]] entries per cache, and an evicted
  * entry's localCheckpoint blocks must leave the block manager
  * DETERMINISTICALLY (explicit unpersist on eviction — not whenever the
  * GC + ContextCleaner pair gets around to it).
  */
class SessionCacheSpec extends SparkSpec {

  /** The block-manager residency probe: checkpointed-RDD ids of `df`
    * that still own at least one block. */
  private def liveBlocks(df: DataFrame): Int = {
    val rddId = df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      case other => fail(s"expected a checkpointed LogicalRDD, got $other")
    }
    org.apache.spark.SparkEnv.get.blockManager.master.getMatchingBlockIds({
      case RDDBlockId(`rddId`, _) => true
      case _ => false
    }, askStorageEndpoints = true).size
  }

  private def ckpt(seed: Int): DataFrame =
    spark.range(seed * 1000L, seed * 1000L + 100L).toDF("id")
      .localCheckpoint(eager = true)

  test("cap displacement evicts the oldest dir AND frees its blocks") {
    val cache = new SessionCache[DataFrame](Seq(_), maxDirsPerSession = 2)
    val a = cache.getOrBuild(spark, "dirA")(ckpt(1))
    val b = cache.getOrBuild(spark, "dirB")(ckpt(2))
    assert(cache.residentDirs(spark) === 2)
    assert(liveBlocks(a) > 0 && liveBlocks(b) > 0)

    // third dir displaces dirA (oldest-entered), releasing its blocks
    val c = cache.getOrBuild(spark, "dirC")(ckpt(3))
    assert(cache.residentDirs(spark) === 2)
    assert(liveBlocks(a) === 0, "evicted dirA's checkpoint blocks must be gone")
    assert(liveBlocks(b) > 0 && liveBlocks(c) > 0)

    // re-entering a resident dir is a hit, not a rebuild or an eviction
    var rebuilt = false
    val b2 = cache.getOrBuild(spark, "dirB") { rebuilt = true; ckpt(4) }
    assert(!rebuilt && (b2 eq b) && cache.residentDirs(spark) === 2)
  }

  test("remove and invalidate release blocks; put replaces release the old value") {
    val cache = new SessionCache[DataFrame](Seq(_), maxDirsPerSession = 4)
    val a = cache.getOrBuild(spark, "dirA")(ckpt(11))
    cache.remove(spark, "dirA")
    assert(cache.residentDirs(spark) === 0 && liveBlocks(a) === 0)

    val b = cache.getOrBuild(spark, "dirB")(ckpt(12))
    val b2 = ckpt(13)
    cache.put(spark, "dirB", b2) // same-key replace → old value released
    assert(liveBlocks(b) === 0 && liveBlocks(b2) > 0)

    cache.invalidate()
    assert(cache.residentDirs(spark) === 0 && liveBlocks(b2) === 0)
  }

  test("TextArtifacts residency is bounded across corpus dirs (integration)") {
    graft.text.TextArtifacts.invalidate()
    // three distinct dir KEYS over the two real fixtures (a trailing
    // slash is a different cache key for the same data) — the cheapest
    // way to drive the vocab cache past the 2-dir cap
    val v1 = graft.text.TextArtifacts.vocab(spark, "/root/testdata/sf0.001")
    graft.text.TextArtifacts.vocab(spark, "/root/testdata/sf0.01")
    graft.text.TextArtifacts.vocab(spark, "/root/testdata/sf0.001/")
    assert(graft.text.TextArtifacts.residentDirs(spark) === 2)
    assert(liveBlocks(v1) === 0,
      "the displaced corpus dir's vocab checkpoint must leave the block manager")
    graft.text.TextArtifacts.invalidate()
  }
}
