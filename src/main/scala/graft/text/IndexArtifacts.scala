package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** The servable retrieval index — the artifact the `index_inverted` /
  * `index_incremental` family BUILDS, promoted to the session/parquet
  * artifact lifecycle ([[TextArtifacts]] discipline) so the serve side
  * (`text_bm25_served`) can answer queries WITHOUT touching the corpus
  * (VERDICT r09 task 2: close retrieval's build→serve loop the way the
  * ANN family's was closed by `sim_graph_search`).
  *
  *  - [[postings]] — `(term, block, df, cf, postings)` over the FULL
  *    vocabulary: per (term, 100-doc block) delta-encoded `delta:tf`
  *    posting strings plus global df/cf stats — the Lucene skip-block
  *    layout `index_inverted` demonstrates on its top-20 slice. At
  *    100 TB this lands term-range-partitioned parquet; a term lookup is
  *    then partition pruning, exactly like the ANN bucket layout.
  *  - [[norms]] — `(doc_id, dl)`: the per-document token length the BM25
  *    length normalization needs — Lucene's norms file. Built from the
  *    corpus AT BUILD TIME (it must count zero-token docs too, which the
  *    word-count pairs can't see), read from the artifact at serve time.
  *
  * Scale shape of the build: postings assembly is the one exchange the
  * (doc, token, cnt) artifact already pays, re-keyed on (term, block);
  * the vocab-sized df/cf stats join is a shuffled equi-join on term —
  * NEVER a broadcast (the vocabulary grows with the corpus). Block
  * grouping bounds every collect_list at ≤ 100 entries, stop-words
  * included.
  */
object IndexArtifacts {

  /** Documents per posting block (the `index_inverted` layout). */
  private[text] val BlockSize = 100L

  private val postCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val normsCache = new graft.queries.SessionCache[DataFrame](Seq(_))

  /** Full-vocabulary block postings, checkpointed once per
    * (session, corpus). */
  def postings(s: SparkSession, dir: String): DataFrame =
    postCache.getOrBuild(s, dir) {
      graft.functions.GraftFunctions.register(s)
      val tf = TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("term"), col("cnt").as("tf"))
      val stats = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      tf.join(stats, "term")
        .withColumn("block", expr(s"doc_id div $BlockSize"))
        .groupBy(col("term"), col("df"), col("cf"), col("block"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
        .select(col("term"), col("block"), col("df"), col("cf"),
          size(col("ps")).cast("long").as("df_block"),
          expr("aggregate(ps, CAST(0 AS BIGINT), (acc, p) -> acc + p.tf)")
            .as("cf_block"),
          expr(s"""array_join(transform(ps, (p, i) -> concat(
                     CAST(p.doc_id - IF(i = 0, block * $BlockSize,
                       element_at(ps, i).doc_id) AS STRING),
                     ':', CAST(p.tf AS STRING))), ' ')""").as("postings"))
        .localCheckpoint(eager = true)
    }

  /** (doc_id, dl) — BM25's length-normalization sidecar; includes
    * zero-token documents (dl = 0). */
  def norms(s: SparkSession, dir: String): DataFrame =
    normsCache.getOrBuild(s, dir) {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(expr(TextQueries.tokenizeExpr)).cast("long").as("dl"))
        .localCheckpoint(eager = true)
    }

  /** Drop all cached artifacts (tests that restart sessions). */
  def invalidate(): Unit = { postCache.invalidate(); normsCache.invalidate() }

  // ---------------------------------------------------------------------
  // Parquet persistence — the TextArtifacts contract: the index lands
  // once per corpus snapshot, stamped with the documents fingerprint.
  // ---------------------------------------------------------------------

  private def fingerprint(s: SparkSession, corpusDir: String): String =
    graft.queries.TableFingerprint.of(s, s"$corpusDir/documents.parquet")

  def persistTo(s: SparkSession, corpusDir: String, artifactDir: String): Unit =
    graft.queries.ArtifactStore.writeSnapshot(s, artifactDir,
      fingerprint(s, corpusDir),
      Seq("postings" -> postings(s, corpusDir),
        "norms" -> norms(s, corpusDir)))

  def loadFrom(s: SparkSession, corpusDir: String, artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      fingerprint(s, corpusDir), Seq("postings", "norms")) match {
      case Some(m) =>
        postCache.put(s, corpusDir, m("postings"))
        normsCache.put(s, corpusDir, m("norms"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def ensure(s: SparkSession, corpusDir: String, artifactDir: String): Boolean = {
    val hit = loadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      // a stale snapshot must not satisfy the session cache either
      postCache.remove(s, corpusDir); normsCache.remove(s, corpusDir)
      persistTo(s, corpusDir, artifactDir)
    }
    hit
  }
}
