package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the persisted-artifact contract (VERDICT r05 #4): LSH artifacts
  * written as parquet per corpus snapshot, keyed by a corpus fingerprint —
  * a later run over the SAME corpus loads them (no signature pass), and a
  * CHANGED corpus invalidates the key (stale artifacts must never serve a
  * new snapshot).
  */
class ArtifactPersistSpec extends SparkSpec {

  private def writeCorpus(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private val corpusA = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
    (3L, "completely different content about spark catalyst planning"),
    (4L, "another unrelated document body with its own words entirely"))

  // doc 2's near-dup partner is REMOVED and a new near-dup of 3 appears —
  // cluster assignments must change if (and only if) artifacts rebuild
  private val corpusB = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "completely different content about spark catalyst planning"),
    (4L, "completely different content about spark catalyst planningX"))

  test("persist → load round-trip, fingerprint invalidation on corpus change") {
    val corpusDir = Files.createTempDirectory("graft-corpus").toString
    val artDir = Files.createTempDirectory("graft-artifacts").toString
    writeCorpus(corpusDir, corpusA)

    // nothing persisted yet → ensure builds + persists
    assert(!CandidateArtifacts.ensure(spark, corpusDir, artDir),
      "ensure claimed a snapshot hit on an empty artifact dir")
    val clustersA = CandidateArtifacts.clusters(spark, corpusDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(clustersA.find(_._1 == 2L).exists(_._2 == 1L),
      s"planted near-dup pair (1,2) not clustered: $clustersA")

    // same corpus, fresh session-cache state → the snapshot is reused and
    // the seeded frames are parquet-backed (a FileScan, not a LogicalRDD)
    CandidateArtifacts.invalidate()
    assert(CandidateArtifacts.ensure(spark, corpusDir, artDir),
      "unchanged corpus did not reuse the persisted snapshot")
    val loaded = CandidateArtifacts.signatures(spark, corpusDir)
    assert(loaded.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "loaded signatures are not parquet-backed")
    val clustersA2 = CandidateArtifacts.clusters(spark, corpusDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(clustersA2 == clustersA, "loaded clusters diverge from built clusters")

    // corpus changes → key mismatch → rebuild (stale artifacts must not
    // serve: doc 2 no longer exists, and (3,4) is the new cluster)
    CandidateArtifacts.invalidate()
    writeCorpus(corpusDir, corpusB)
    assert(!CandidateArtifacts.ensure(spark, corpusDir, artDir),
      "changed corpus reused a stale snapshot")
    val clustersB = CandidateArtifacts.clusters(spark, corpusDir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!clustersB.exists(_._1 == 2L), s"stale doc 2 survived rebuild: $clustersB")
    assert(clustersB.find(_._1 == 4L).exists(_._2 == 3L),
      s"new near-dup pair (3,4) not clustered: $clustersB")

    // and the REWRITTEN snapshot now serves corpus B
    CandidateArtifacts.invalidate()
    assert(CandidateArtifacts.ensure(spark, corpusDir, artDir),
      "rebuilt snapshot not reused for the new corpus")

    // leave no cross-suite surprises: other suites expect to build their
    // own artifacts for their own dirs
    CandidateArtifacts.invalidate()
  }

  test("an incomplete snapshot (key present, artifact missing) reads as stale") {
    // a half-deleted snapshot must REBUILD, not throw out of loadFrom
    val corpusDir = Files.createTempDirectory("graft-corpus-part").toString
    val artDir = Files.createTempDirectory("graft-artifacts-part").toString
    writeCorpus(corpusDir, corpusA)
    CandidateArtifacts.ensure(spark, corpusDir, artDir)
    // delete one artifact table but leave the key stamped
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$artDir/pairs.parquet"))
    CandidateArtifacts.invalidate()
    assert(!CandidateArtifacts.loadFrom(spark, corpusDir, artDir),
      "incomplete snapshot was loaded")
    assert(!CandidateArtifacts.ensure(spark, corpusDir, artDir),
      "ensure claimed a hit on an incomplete snapshot")
    // the rewritten snapshot is whole again
    CandidateArtifacts.invalidate()
    assert(CandidateArtifacts.ensure(spark, corpusDir, artDir),
      "repaired snapshot not reused")
    CandidateArtifacts.invalidate()
  }

  test("fingerprint is stable across listings and moves with the corpus") {
    val dir = Files.createTempDirectory("graft-corpus-fp").toString
    writeCorpus(dir, corpusA)
    val f1 = CandidateArtifacts.corpusFingerprint(spark, dir)
    val f2 = CandidateArtifacts.corpusFingerprint(spark, dir)
    assert(f1 == f2, "fingerprint not deterministic on an unchanged corpus")
    writeCorpus(dir, corpusB)
    val f3 = CandidateArtifacts.corpusFingerprint(spark, dir)
    assert(f1 != f3, "fingerprint did not change with the corpus")
  }
}
