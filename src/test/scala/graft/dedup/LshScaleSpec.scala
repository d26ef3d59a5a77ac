package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale evidence for the LSH dedup pipeline, in the spirit of the
  * ComponentsSpec power-law harness: on a synthetic corpus with PLANTED
  * near-duplicates, the candidate-pair count must track the planted-dup
  * count (linear in corpus size), never the corpus square — that is the
  * whole value of banding at 100 TB — and banding must actually surface
  * the planted pairs (recall), not vacuously return nothing.
  *
  * The corpus is fully deterministic (md5-derived "text", no RNG): base
  * docs are 96 random-looking hex chars; each planted dup shares its
  * base's first 92 chars (shingle Jaccard ≈ 0.9, so ≥1 of the 4 bands
  * collides with high probability); distinct base docs share almost no
  * 5-char shingles, so cross-base band collisions are rare.
  */
class LshScaleSpec extends SparkSpec {

  /** nBase base docs + nBase/10 planted near-dups of the first nBase/10. */
  private def corpus(nBase: Long): DataFrame = {
    def block(tag: String) = md5(concat(lit(tag), col("id").cast("string")))
    val base = spark.range(nBase).select(col("id").as("doc_id"),
      concat(block("a"), block("b"), block("c")).as("text"))
    val dups = spark.range(nBase / 10).select((col("id") + nBase).as("doc_id"),
      concat(block("a"), block("b"),
        substring(block("c"), 1, 28), substring(block("t"), 1, 4)).as("text"))
    base.union(dups)
  }

  private def run(nBase: Long): (Long, Long) = {
    val got = DedupQueries.minhashCandidatePairs(corpus(nBase))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until nBase / 10).map(i => (i, i + nBase)).toSet
    ((got & planted).size.toLong, got.size.toLong)
  }

  test("candidate pairs scale with planted dups, not corpus²; planted pairs found") {
    val (found1, total1) = run(3000)
    val (found2, total2) = run(6000)
    info(s"n=3000: $found1/300 planted found, $total1 total pairs")
    info(s"n=6000: $found2/600 planted found, $total2 total pairs")

    // recall: banding must surface the planted near-dups
    assert(found1 >= 240, s"recall at n=3000: $found1/300 < 0.8")
    assert(found2 >= 480, s"recall at n=6000: $found2/600 < 0.8")

    // precision: cross-base collisions must stay marginal — the candidate
    // list is the planted pairs plus noise, never a block square
    assert(total1 <= 450, s"n=3000 produced $total1 pairs for 300 planted")
    assert(total2 <= 900, s"n=6000 produced $total2 pairs for 600 planted")

    // linearity: doubling the corpus (and dups) at most ~doubles the pair
    // list; a quadratic blow-up would quadruple it
    assert(total2 <= 3 * total1,
      s"pair count superlinear: $total1 -> $total2 on 2x corpus")
  }

  /** The round-10 decade-3 guard: on a DEGENERATE corpus (one template
    * class — every doc shares its bands), uncapped candidates are
    * C(k, 2); with the bucket cap the hot band drops out of the pair
    * list entirely while the CLUSTER path still links the class. */
  test("maxBucket drops degenerate bands; default stays exact; clusters unaffected") {
    val k = 60L
    // one boilerplate class: identical text → identical signature/bands
    val degenerate = spark.range(k).select(col("id").as("doc_id"),
      lit("the exact same boilerplate paragraph repeated verbatim " * 3)
        .as("text"))
    val sig = DedupQueries.minhashSignaturesFull(degenerate)
      .localCheckpoint(eager = true)
    val uncapped = DedupQueries.pairsFromSignatures(sig).count()
    assert(uncapped == k * (k - 1) / 2,
      s"identical docs must produce C(k,2) uncapped pairs, got $uncapped")
    val capped = DedupQueries.pairsFromSignatures(sig, maxBucket = Some(20))
      .count()
    assert(capped == 0L,
      s"the degenerate band survived the cap: $capped pairs")
    // explicit None = textually identical path
    assert(DedupQueries.pairsFromSignatures(sig, None).count() == uncapped)
    // a healthy corpus is untouched by a cap wider than its buckets
    val healthy = DedupQueries.minhashSignaturesFull(corpus(1000))
      .localCheckpoint(eager = true)
    assert(DedupQueries.pairsFromSignatures(healthy, Some(50)).count() ==
      DedupQueries.pairsFromSignatures(healthy).count(),
      "cap altered a corpus with no degenerate buckets")
  }

  /** The DEFAULT cap (r11): `dedup_minhash_est`'s verify stage now runs
    * capped at [[DedupQueries.DefaultMaxBucket]] by default — on the
    * driver's real corpora the cap must be a no-op (widest measured
    * bucket: 18 at sf0.01, 100 at sf0.1 — both well under 256), and the
    * `lsh_band_stats` readout must agree that nothing is over-cap. */
  test("DefaultMaxBucket is a no-op on the real test corpus; lsh_band_stats sees no over-cap mass") {
    val sfDir = "/root/testdata/sf0.001"
    val sig = CandidateArtifacts.signatures(spark, sfDir)
    val uncapped = DedupQueries.pairsFromSignatures(sig).count()
    val capped = DedupQueries.pairsFromSignatures(sig,
      Some(DedupQueries.DefaultMaxBucket)).count()
    assert(capped == uncapped,
      s"default cap dropped pairs on a healthy corpus: $capped != $uncapped")
    val stats = graft.queries.Registry.queries("lsh_band_stats")(spark, sfDir)
      .collect()
    assert(stats.nonEmpty)
    assert(stats.forall(!_.getAs[Boolean]("over_cap")),
      "healthy corpus reported over-cap band buckets")
    // the histogram's pair bill folds back to the uncapped pair BOUND
    // (≥ distinct pairs: a pair colliding in two bands is counted twice)
    val bound = stats.map(_.getAs[Long]("pairs_bound")).sum
    assert(bound >= uncapped, s"pairs_bound $bound < distinct pairs $uncapped")
    // and on the degenerate class the default cap collapses the bill
    val k = 400L
    val degenerate = spark.range(k).select(col("id").as("doc_id"),
      lit("the exact same boilerplate paragraph repeated verbatim " * 3)
        .as("text"))
    val dsig = DedupQueries.minhashSignaturesFull(degenerate)
      .localCheckpoint(eager = true)
    assert(DedupQueries.pairsFromSignatures(dsig,
      Some(DedupQueries.DefaultMaxBucket)).count() == 0L,
      "a 400-wide degenerate bucket survived the default cap")
  }
}
