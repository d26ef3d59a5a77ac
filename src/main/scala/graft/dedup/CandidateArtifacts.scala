package graft.dedup

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Session-scoped MinHash signature + LSH candidate-pair artifacts,
  * computed ONCE per (session, corpus dir) and shared by every query in
  * the LSH verification family (`dedup_minhash`, `dedup_minhash_pairs`,
  * `dedup_ngram_jaccard`, `dedup_minhash_est`, `dedup_clusters` and the
  * cluster-derived family, `dedup_incremental`, `contamination_fuzzy`,
  * `text_edit_distance`, `eval_bleu`, `dedup_multimodal_clusters`).
  *
  * Rationale (VERDICT r04 #1): a real pipeline computes the signature
  * table and the candidate list once and fans verification out from that
  * artifact; recomputing the shingle+minhash pass per downstream query
  * was the single biggest bench mass (~11 s across the family at sf0.1).
  * At 100 TB this is not a micro-optimization — the signature pass is a
  * full-corpus scan, and the candidate list is the contract boundary
  * between "generate" and every "verify" stage.
  *
  * Mechanics: both frames are eager `localCheckpoint`s — materialized
  * RDDs that live for the session, so each consuming query's plan reads a
  * `LogicalRDD` scan instead of re-running `minhash_sig` over the corpus.
  * The signature frame keeps BOTH the raw 12-slot `mh` array (needed by
  * the estimator audit) and the 4 band hashes; it is ~24 bytes + 4 md5
  * strings per document — negligible next to the corpus. The pair list is
  * the LSH output itself. In a multi-tenant production deployment the
  * same artifacts would be persisted parquet (the `dedup_incremental`
  * lake-side band table is exactly that shape); session-local checkpoints
  * are the single-job equivalent.
  *
  * Cache keyed by (SparkSession, dir): a fresh session (tests) or a
  * different corpus never sees a stale artifact; checkpointed RDDs die
  * with their session.
  */
object CandidateArtifacts {

  private val cache =
    mutable.Map.empty[(SparkSession, String), (DataFrame, DataFrame)]
  @volatile private var builds = 0

  /** How many times the signature/pair artifact has been built this JVM —
    * pinned by PlanSpec: running the whole family must build it once. */
  def buildCount: Int = builds

  /** (doc_id, mh, band0..bandN) — checkpointed signatures. */
  def signatures(s: SparkSession, dir: String): DataFrame = get(s, dir)._1

  /** (a, b) distinct candidate pairs, a < b — checkpointed LSH output. */
  def pairs(s: SparkSession, dir: String): DataFrame = get(s, dir)._2

  /** Drop all cached artifacts (tests that restart sessions). */
  def invalidate(): Unit = synchronized { cache.clear() }

  private def get(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    synchronized {
      // drop entries whose session has been stopped (tests that restart
      // sessions): their checkpointed RDDs died with the session, and
      // keeping the key would pin the stopped session on the heap for
      // the JVM lifetime. Live-session entries are bounded by the number
      // of corpus dirs (3 in the harness).
      cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      cache.getOrElseUpdate((s, dir), {
        builds += 1
        val docs = Tables.documents(s, dir)
        val sigs = DedupQueries.minhashSignaturesFull(docs)
          .localCheckpoint(eager = true)
        // both self-join sides read the SAME materialized RDD — the
        // shingle+minhash pass runs exactly once per session+corpus
        val prs = DedupQueries.pairsFromSignatures(sigs)
          .localCheckpoint(eager = true)
        (sigs, prs)
      })
    }
}
