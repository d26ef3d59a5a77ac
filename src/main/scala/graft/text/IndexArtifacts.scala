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
  private[graft] val BlockSize = 100L

  private val postCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val normsCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val mergedCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val sweptCache = new graft.queries.SessionCache[DataFrame](Seq(_))
  private val sweptNormsCache = new graft.queries.SessionCache[DataFrame](Seq(_))

  /** ENCODE: (doc_id, term, tf) rows → the canonical posting-row schema
    * `(term, block, df, cf, df_block, cf_block, postings)` — the one
    * layout every segment in the index family shares ([[postings]], the
    * lake segment, and [[mergedPostings]]'s fold all call this, so the
    * block math can never drift between build paths). Scale shape: one
    * shuffled stats aggregate on term (vocab grows with the corpus —
    * never broadcast) and one (term, block) group whose collect_list is
    * bounded at ≤ [[BlockSize]] entries, stop-words included. */
  private[graft] def encodeBlocks(tf: DataFrame): DataFrame = {
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
  }

  /** DECODE: posting rows → one row per (term, doc) —
    * `(term, block, df, cf, pos, doc_id, tf)`; the running-sum window
    * rebuilds doc_ids from `block·BlockSize + Σdelta`, partitioned per
    * (term, block) so each window is ≤ [[BlockSize]] rows. Shared by the
    * serve path (query-term slices), the delete sweep, and the merge
    * fold (touched-term slices). */
  private[graft] def decodeBlocks(post: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    post
      .select(col("term"), col("df"), col("cf"), col("block"),
        posexplode(split(col("postings"), " ")).as(Seq("pos", "pair")))
      .select(col("term"), col("df"), col("cf"), col("block"), col("pos"),
        expr("CAST(element_at(split(pair, ':'), 1) AS BIGINT)").as("delta"),
        expr("CAST(element_at(split(pair, ':'), 2) AS BIGINT)").as("tf"))
      .withColumn("doc_id", col("block") * lit(BlockSize)
        + sum(col("delta")).over(Window.partitionBy(col("term"), col("block"))
          .orderBy(col("pos"))))
      .drop("delta")
  }

  /** Full-vocabulary block postings, checkpointed once per
    * (session, corpus). */
  def postings(s: SparkSession, dir: String): DataFrame =
    postCache.getOrBuild(s, dir) {
      graft.functions.GraftFunctions.register(s)
      encodeBlocks(TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("term"), col("cnt").as("tf")))
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

  /** The md5-byte threshold selecting the ~10% erasure batch and the
    * ~20% ingest batch (the ANN family's NewVecByte / dedup's
    * incremental-split conventions, reused verbatim). */
  private[text] val DelDocByte = 26
  private[text] val BatchDocByte = 51

  /** Deterministic, oracle-reproducible doc-level erasure kill-list
    * (`sim_graph_delete`'s `delPredSql` shape on `doc_id`): ~10% of docs
    * via `md5('del:' || doc_id)` first byte < [[DelDocByte]] — the
    * `del:` salt keeps it independent of the lake/batch ingest split, so
    * a doc can be both newly merged and subsequently erased. */
  private[text] def delPredSql(cast: String): String =
    s"(${graft.queries.PortableHash.md5Byte(s"concat('del:', CAST(doc_id AS $cast))")}) < $DelDocByte"

  /** The kill-list frame — derived from the NORMS sidecar, not the
    * corpus: the delete path must run index-side only (a real erasure
    * batch arrives as ids; norms is the index's own doc table), and
    * PlanSpec pins no documents scan through it. */
  def docTombstones(s: SparkSession, dir: String): DataFrame =
    norms(s, dir).where(expr(delPredSql("STRING"))).select(col("doc_id"))

  /** MERGED SEGMENTS — the artifact the build→incremental→merge→serve
    * loop closes on (VERDICT r10 task 2): the standing LAKE segment
    * (docs with md5 byte ≥ [[BatchDocByte]] — `index_incremental`'s
    * split) folded with the ingest batch's postings, Lucene
    * segment-merge style. Only terms the batch TOUCHES are decoded and
    * re-encoded over lake ∪ batch; untouched lake rows pass through
    * byte-identical — and since an untouched term by definition has no
    * batch docs, the union is LOGICALLY ≡ [[postings]] over the full
    * corpus (IndexQueriesSpec pins the equality row-for-row, and
    * `text_bm25_merged_served` serves from it against `text_bm25`'s
    * oracle verbatim: serve-after-merge ≡ rebuild, hash-checked).
    *
    * Scale shape: the fold decodes only touched terms' lake postings
    * (left_semi on the batch vocabulary — at production scale a
    * term-range-partitioned read → partition pruning), the re-encode
    * pays one (term, block) group bounded at ≤ BlockSize, and the
    * pass-through side is a left_anti projection that never decodes.
    * Work ∝ touched terms' postings, never the lake vocabulary. */
  def mergedPostings(s: SparkSession, dir: String): DataFrame =
    mergedCache.getOrBuild(s, dir) {
      graft.functions.GraftFunctions.register(s)
      val bkt = graft.queries.PortableHash.md5Byte("CAST(doc_id AS STRING)")
      val tf = TextArtifacts.wordCounts(s, dir)
        .withColumn("bucket", expr(bkt).cast("long"))
        .select(col("doc_id"), col("bucket"),
          col("token").as("term"), col("cnt").as("tf"))
      // the standing lake segment: encoded once over lake docs only —
      // the frame a production store would already hold as parquet
      val lake = encodeBlocks(tf.where(col("bucket") >= BatchDocByte)
        .select(col("doc_id"), col("term"), col("tf")))
        .localCheckpoint(eager = true)
      val batchTf = tf.where(col("bucket") < BatchDocByte)
        .select(col("doc_id"), col("term"), col("tf"))
      val touched = batchTf.select(col("term")).distinct()
      // fold: decode ONLY touched lake postings, union the batch rows,
      // re-encode — the merge never re-reads the corpus for lake docs
      val foldedTf = decodeBlocks(lake.join(touched, Seq("term"), "left_semi"))
        .select(col("doc_id"), col("term"), col("tf"))
        .unionByName(batchTf)
      val out = lake.join(touched, Seq("term"), "left_anti")
        .unionByName(encodeBlocks(foldedTf))
        .localCheckpoint(eager = true)
      graft.identity.Components.unpersistCheckpoint(lake)
      out
    }

  /** SWEPT SEGMENTS — the erasure twin of [[mergedPostings]], closing
    * "sweep output is what serve reads" the way merged closed it for
    * ingest (r11): [[postings]] with the [[docTombstones]] kill-list
    * PHYSICALLY applied — the index a store serves after the
    * compaction that follows a delete batch, so the serve path needs
    * no kill-list at query time. Logically ≡ the index built over the
    * surviving corpus (IndexQueriesSpec pins the row-for-row equality;
    * `text_bm25_swept_served` hash-matches the rebuilt-without-deleted
    * oracle off it).
    *
    * Three row classes, Lucene live-docs sweep style:
    *  1. terms with no deleted doc — pass through byte-identical,
    *     never decoded;
    *  2. touched terms' clean blocks — postings string untouched,
    *     df/cf stats re-stamped to reflect the term's removals;
    *  3. touched (term, block) pairs — re-delta-encoded over the
    *     survivors; fully-emptied blocks drop, as in a rebuild.
    *
    * Scale shape: one corpus-linear decode pass finds the touched
    * keys (the cost any segment merge pays — there is no forward
    * index), the kill-list joins shuffled (corpus-proportional, never
    * broadcast), and the rewrite itself groups only touched blocks at
    * ≤ BlockSize rows per collect. */
  def sweptPostings(s: SparkSession, dir: String): DataFrame =
    sweptCache.getOrBuild(s, dir) {
      graft.functions.GraftFunctions.register(s)
      val post = postings(s, dir)
      val tomb = docTombstones(s, dir)
      // the one corpus-linear decode pass, checkpointed so BOTH readers
      // (the deleted-rows frame and the survivor re-encode below) pay it
      // once (ADVICE r11: only `deleted` was checkpointed, so the swept
      // branch re-ran the full posexplode + window a second time)
      val dec = decodeBlocks(post).localCheckpoint(eager = true)
      val deleted = dec.join(tomb, "doc_id")
        .localCheckpoint(eager = true) // feeds keys + stats
      val touchedT = deleted.select(col("term")).distinct()
      val touchedTB = deleted.select(col("term"), col("block")).distinct()
      val rem = deleted.groupBy(col("term"))
        .agg(count(lit(1)).as("df_removed"), sum(col("tf")).as("cf_removed"))
      val untouchedTerms = post.join(touchedT, Seq("term"), "left_anti")
      val cleanBlocks = post.join(touchedT, Seq("term"), "left_semi")
        .join(touchedTB, Seq("term", "block"), "left_anti")
        .join(rem, "term")
        .select(col("term"), col("block"),
          (col("df") - col("df_removed")).as("df"),
          (col("cf") - col("cf_removed")).as("cf"),
          col("df_block"), col("cf_block"), col("postings"))
      val swept = dec.join(touchedTB, Seq("term", "block"), "left_semi")
        .join(tomb, Seq("doc_id"), "left_anti")
        .groupBy(col("term"), col("df"), col("cf"), col("block"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
        .join(rem, "term")
        .select(col("term"), col("block"),
          (col("df") - col("df_removed")).as("df"),
          (col("cf") - col("cf_removed")).as("cf"),
          size(col("ps")).cast("long").as("df_block"),
          expr("aggregate(ps, CAST(0 AS BIGINT), (acc, p) -> acc + p.tf)")
            .as("cf_block"),
          expr(s"""array_join(transform(ps, (p, i) -> concat(
                     CAST(p.doc_id - IF(i = 0, block * $BlockSize,
                       element_at(ps, i).doc_id) AS STRING),
                     ':', CAST(p.tf AS STRING))), ' ')""").as("postings"))
      val out = untouchedTerms.unionByName(cleanBlocks).unionByName(swept)
        .localCheckpoint(eager = true)
      graft.identity.Components.unpersistCheckpoint(dec)
      graft.identity.Components.unpersistCheckpoint(deleted)
      out
    }

  /** The norms sidecar with the kill-list applied — [[sweptPostings]]'s
    * doc-stats twin (dl of every SURVIVING doc; corpus stats off this
    * frame reflect the erasure exactly as a rebuild would). */
  def sweptNorms(s: SparkSession, dir: String): DataFrame =
    sweptNormsCache.getOrBuild(s, dir) {
      norms(s, dir).join(docTombstones(s, dir), Seq("doc_id"), "left_anti")
        .localCheckpoint(eager = true)
    }

  /** Drop all cached artifacts (tests that restart sessions). */
  def invalidate(): Unit = {
    postCache.invalidate(); normsCache.invalidate(); mergedCache.invalidate()
    sweptCache.invalidate(); sweptNormsCache.invalidate()
  }

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
        "norms" -> norms(s, corpusDir),
        "merged" -> mergedPostings(s, corpusDir),
        "swept" -> sweptPostings(s, corpusDir),
        "swept_norms" -> sweptNorms(s, corpusDir)))

  def loadFrom(s: SparkSession, corpusDir: String, artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      fingerprint(s, corpusDir),
      Seq("postings", "norms", "merged", "swept", "swept_norms")) match {
      case Some(m) =>
        postCache.put(s, corpusDir, m("postings"))
        normsCache.put(s, corpusDir, m("norms"))
        mergedCache.put(s, corpusDir, m("merged"))
        sweptCache.put(s, corpusDir, m("swept"))
        sweptNormsCache.put(s, corpusDir, m("swept_norms"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def ensure(s: SparkSession, corpusDir: String, artifactDir: String): Boolean = {
    val hit = loadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      // a stale snapshot must not satisfy the session cache either
      postCache.remove(s, corpusDir); normsCache.remove(s, corpusDir)
      mergedCache.remove(s, corpusDir)
      sweptCache.remove(s, corpusDir); sweptNormsCache.remove(s, corpusDir)
      persistTo(s, corpusDir, artifactDir)
    }
    hit
  }
}
