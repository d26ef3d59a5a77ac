package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.identity.Components

/** Pins the spanning-edge clustering equivalence (CandidateArtifacts.
  * clusters): components over the bucket-min spanning edges must equal
  * components over the full pairwise candidate list — on a corpus with a
  * HOT band (many boilerplate-identical docs), the exact scenario where
  * the pairwise list blows up C(k,2) and the spanning list stays k−1. */
class ClusterSpanningSpec extends SparkSpec {

  test("spanning-edge components = pairwise components, incl. a hot band") {
    import spark.implicits._
    // 60 identical boilerplate docs (one hot bucket), 3 planted near-dup
    // pairs, and unique fillers
    val docs = ((0 until 60).map(i => (i.toLong, "x" * 3 + "the quick brown fox jumps over the lazy dog repeatedly and then some")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
        (200L, "completely different content about spark catalyst planning"),
        (300L, "another unrelated document body with its own words entirely")))
      .toDF("doc_id", "text")

    val sig = DedupQueries.minhashSignatures(docs)
      .localCheckpoint(eager = true)
    val pairwise = DedupQueries.pairsFromSignatures(sig)
    val long = DedupQueries.stackBands(sig)
    val roots = long.groupBy(col("band_hash")).agg(min(col("doc_id")).as("a"))
    val spanning = long.join(roots, "band_hash")
      .where(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b")).distinct()

    // the hot band: pairwise grows quadratically, spanning stays linear
    val np = pairwise.count()
    val ns = spanning.count()
    assert(np >= 60L * 59 / 2, s"hot band did not produce a quadratic pair list: $np")
    assert(ns < 300, s"spanning edges unexpectedly large: $ns")

    val cp = Components.connectedComponents(pairwise, inputDistinct = true)
      .as[(Long, Long)].collect().toMap
    val cs = Components.connectedComponents(spanning, inputDistinct = true)
      .as[(Long, Long)].collect().toMap
    assert(cp == cs, "spanning components diverge from pairwise components")
    // sanity: the hot band is one component, the planted pair another
    assert(cp(59L) == 0L)
    assert(cp(101L) == 100L)
  }

  test("null-text docs never enter the band self-join (no md5('') clique)") {
    // ADVICE r05: if null-text docs were signed, concat_ws would skip the
    // null minhash elements and every such doc would share band md5('') —
    // a quadratic candidate clique on a null-heavy corpus. The pre-signing
    // `text IS NOT NULL` filter in minhashSignaturesFull is the guard;
    // pin it end-to-end through signatures AND pairs.
    import spark.implicits._
    val docs = Seq[(java.lang.Long, String)](
      (1L, null), (2L, null), (3L, null), (4L, null),
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"))
      .toDF("doc_id", "text")
    val sig = DedupQueries.minhashSignaturesFull(docs, spreadInput = false)
    assert(sig.where(col("doc_id") < 10L).count() == 0,
      "null-text docs received signatures")
    val pairs = DedupQueries.pairsFromSignatures(sig.localCheckpoint(eager = true))
      .as[(Long, Long)].collect().toSet
    assert(!pairs.exists { case (a, b) => a < 10L || b < 10L },
      s"null-text docs formed candidate pairs: $pairs")
    assert(pairs.contains((10L, 11L)), "the planted near-dup pair vanished")
  }
}
