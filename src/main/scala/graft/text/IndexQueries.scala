package graft.text

import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Retrieval-index construction — the operator family that turns a curated
  * corpus into a servable sparse index (the build side of text_bm25's
  * scoring): inverted-index posting lists with block-local delta
  * compression, the Lucene/block-max shape.
  */
object IndexQueries {

  /** Documents per posting block. Real indexes use 128-entry skip blocks;
    * 100 keeps the sf0.01 fixture at a readable 5 blocks. */
  private val BlockSize = 100L

  /** Inverted-index build: for the top-20 terms by document frequency,
    * emit per (term, doc-block) posting rows — block-local delta-encoded
    * `offset:tf` strings plus block and global df/cf statistics.
    *
    * Scale shape: the (term, doc_id, tf) pre-aggregate map-side combines
    * within-doc repeats before its one exchange (the checkpoint-the-
    * pre-aggregate lesson); term selection is a bounded TakeOrdered, never
    * a vocab-wide rank window; and posting assembly groups on
    * (term, doc_id div BlockSize) — so no collect is ever corpus-sized,
    * even for stop-words whose full posting list IS the corpus. That
    * blocking is exactly the Lucene skip-block layout, and the
    * `delta:tf` payload is the standard varint-compression input; a
    * consumer reconstructs doc_ids by a running sum from block*BlockSize.
    * InvertedIndexSpec pins the round-trip.
    */
  private val indexInverted = Q(
    "index_inverted",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // the session-shared (doc, token, cnt) checkpoint: stats + postings
      val tf = graft.text.TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("term"), col("cnt").as("tf"))
      val top = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
        .orderBy(col("df").desc, col("term")).limit(20)
      tf.join(broadcast(top), "term")
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
    },
    Some(s"""WITH tok AS (
               SELECT doc_id, unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS term
               FROM documents),
             tf AS (
               SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY term, doc_id),
             top AS (
               SELECT term, CAST(count(*) AS BIGINT) AS df,
                      CAST(sum(tf) AS BIGINT) AS cf
               FROM tf GROUP BY term
               ORDER BY df DESC, term LIMIT 20),
             pb AS (
               SELECT t.term, s.df, s.cf, t.doc_id // $BlockSize AS block,
                 t.doc_id, t.tf,
                 t.doc_id - coalesce(
                   lag(t.doc_id) OVER (PARTITION BY t.term, t.doc_id // $BlockSize
                     ORDER BY t.doc_id),
                   (t.doc_id // $BlockSize) * $BlockSize) AS delta
               FROM tf t JOIN top s USING (term))
             SELECT term, block, df, cf,
               CAST(count(*) AS BIGINT) AS df_block,
               CAST(sum(tf) AS BIGINT) AS cf_block,
               string_agg(CAST(delta AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                 ' ' ORDER BY doc_id) AS postings
             FROM pb GROUP BY term, block, df, cf"""))

  /** Incremental index maintenance — the retrieval twin of
    * dedup_incremental / sim_ivf_incremental (same md5-byte batch split:
    * bucket < 51 ≈ 20% is the incoming crawl, the rest is the standing
    * lake index): for every term the BATCH touches, the delta-encoded
    * batch postings to append plus lake-vs-batch df/cf stats and a
    * new-term flag — the ingest readout an index maintainer appends and
    * monitors.
    *
    * Scale shape: batch work scales with the batch — the postings
    * assembly and stats group only batch rows, and the lake side joins in
    * keyed by the BATCH's terms (at production scale that side is a
    * stored term-stats lookup, not a recompute; here it derives from the
    * same one checkpointed tokenize pass). Output is bounded by the batch
    * vocabulary.
    */
  private val indexIncremental = Q(
    "index_incremental",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val bkt =
        """(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1)"""
      // bucket is a pure function of doc_id — derive it ON the shared
      // (doc, token, cnt) artifact instead of re-tokenizing per bucket
      val tf = graft.text.TextArtifacts.wordCounts(s, dir)
        .withColumn("bucket", expr(bkt).cast("long"))
        .select(col("doc_id"), col("bucket"),
          col("token").as("term"), col("cnt").as("tf"))
      val lake = tf.where(col("bucket") >= 51)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df_lake"), sum(col("tf")).as("cf_lake"))
      val batch = tf.where(col("bucket") < 51)
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df_batch"), sum(col("tf")).as("cf_batch"),
          sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
        .select(col("term"), col("df_batch"), col("cf_batch"),
          expr("""array_join(transform(ps, (p, i) -> concat(
                    CAST(p.doc_id - IF(i = 0, CAST(0 AS BIGINT),
                      element_at(ps, i).doc_id) AS STRING),
                    ':', CAST(p.tf AS STRING))), ' ')""").as("postings"))
      batch.join(lake, Seq("term"), "left")
        .select(col("term"), col("df_batch"), col("cf_batch"),
          coalesce(col("df_lake"), lit(0L)).as("df_lake"),
          coalesce(col("cf_lake"), lit(0L)).as("cf_lake"),
          (coalesce(col("df_lake"), lit(0L)) + col("df_batch")).as("df_total"),
          (coalesce(col("df_lake"), lit(0L)) === 0L).as("is_new_term"),
          col("postings"))
    },
    Some {
      val byte =
        """(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"""
      s"""WITH tok AS (
            SELECT doc_id, $byte AS bucket, unnest(list_filter(
              string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS term
            FROM documents),
          tf AS (
            SELECT term, doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY term, doc_id, bucket),
          lake AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df_lake,
              CAST(sum(tf) AS BIGINT) AS cf_lake
            FROM tf WHERE bucket >= 51 GROUP BY term),
          bt AS (
            SELECT term, doc_id, tf,
              doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term
                ORDER BY doc_id), 0) AS delta
            FROM tf WHERE bucket < 51),
          bs AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df_batch,
              CAST(sum(tf) AS BIGINT) AS cf_batch,
              string_agg(CAST(delta AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                ' ' ORDER BY doc_id) AS postings
            FROM bt GROUP BY term)
          SELECT bs.term, bs.df_batch, bs.cf_batch,
            coalesce(lake.df_lake, 0) AS df_lake,
            coalesce(lake.cf_lake, 0) AS cf_lake,
            coalesce(lake.df_lake, 0) + bs.df_batch AS df_total,
            coalesce(lake.df_lake, 0) = 0 AS is_new_term,
            bs.postings
          FROM bs LEFT JOIN lake USING (term)"""
    })

  /** Segment MERGE — the retrieval twin of `sim_graph_compact`, closing
    * the ingest side of the index lifecycle the way `text_bm25_served`
    * closes the serve side: `index_incremental` emits the batch's
    * delta postings; this query FOLDS them into the lake index,
    * re-emitting the full (term, block) posting rows for every term the
    * batch TOUCHED — re-delta-encoded over lake ∪ batch (batch doc_ids
    * interleave into their doc_id-div blocks), with the merged df/cf
    * stats and the lake/batch split carried for the maintainer's audit.
    * This is the Lucene segment-merge shape: untouched terms' postings
    * are never rewritten.
    *
    * Scale shape: everything is keyed by the BATCH's term set — the
    * lake side joins in semi-keyed by touched terms (at production
    * scale a term-range-partitioned postings read → partition pruning),
    * block grouping bounds every collect_list at ≤ 100 entries, and the
    * merged stats are one map-side-combined aggregate over the touched
    * slice. Work ∝ touched terms' postings, never the lake vocabulary.
    */
  private val indexMerge = Q(
    "index_merge",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val bkt =
        """(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1)"""
      val tf = graft.text.TextArtifacts.wordCounts(s, dir)
        .withColumn("bucket", expr(bkt).cast("long"))
        .select(col("doc_id"), col("bucket"),
          col("token").as("term"), col("cnt").as("tf"))
      val touched = tf.where(col("bucket") < 51).select(col("term")).distinct()
      val merged = tf.join(touched, Seq("term"), "left_semi")
      val stats = merged.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          sum(expr("CASE WHEN bucket >= 51 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
            .as("df_lake"),
          sum(expr("CASE WHEN bucket < 51 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
            .as("df_batch"))
      merged
        .withColumn("block", expr(s"doc_id div $BlockSize"))
        .groupBy(col("term"), col("block"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
        .join(stats, "term")
        .select(col("term"), col("block"), col("df"), col("cf"),
          col("df_lake"), col("df_batch"),
          size(col("ps")).cast("long").as("df_block"),
          expr(s"""array_join(transform(ps, (p, i) -> concat(
                     CAST(p.doc_id - IF(i = 0, block * $BlockSize,
                       element_at(ps, i).doc_id) AS STRING),
                     ':', CAST(p.tf AS STRING))), ' ')""").as("postings"))
    },
    Some {
      val byte =
        """(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"""
      s"""WITH tok AS (
            SELECT doc_id, $byte AS bucket, unnest(list_filter(
              string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS term
            FROM documents),
          tf AS (
            SELECT term, doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY term, doc_id, bucket),
          touched AS (
            SELECT DISTINCT term FROM tf WHERE bucket < 51),
          merged AS (
            SELECT tf.* FROM tf JOIN touched USING (term)),
          stats AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df,
              CAST(sum(tf) AS BIGINT) AS cf,
              CAST(sum(CASE WHEN bucket >= 51 THEN 1 ELSE 0 END) AS BIGINT)
                AS df_lake,
              CAST(sum(CASE WHEN bucket < 51 THEN 1 ELSE 0 END) AS BIGINT)
                AS df_batch
            FROM merged GROUP BY term),
          pb AS (
            SELECT term, doc_id, tf, doc_id // $BlockSize AS block,
              doc_id - coalesce(
                lag(doc_id) OVER (PARTITION BY term, doc_id // $BlockSize
                  ORDER BY doc_id),
                (doc_id // $BlockSize) * $BlockSize) AS delta
            FROM merged)
          SELECT pb.term, pb.block, s.df, s.cf, s.df_lake, s.df_batch,
            CAST(count(*) AS BIGINT) AS df_block,
            string_agg(CAST(delta AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
              ' ' ORDER BY doc_id) AS postings
          FROM pb JOIN stats s USING (term)
          GROUP BY pb.term, pb.block, s.df, s.cf, s.df_lake, s.df_batch"""
    })

  /** BM25 SERVED FROM THE INDEX (VERDICT r09 task 2) — the same ranking
    * as `text_bm25`, answered from the [[IndexArtifacts]] postings +
    * norms instead of re-scanning the corpus: the query terms' posting
    * blocks are delta-DECODED (running sum per (term, block) rebuilds
    * doc_ids from `block·100 + Σdelta`), per-(term, doc) tf comes off
    * the decoded pairs, df/cf ride the posting rows, doc length joins in
    * from the norms sidecar, and corpus stats are ONE aggregate over
    * norms. The scoring expression is [[TextQueries.bm25ScoreExpr]]
    * VERBATIM and the oracle is `text_bm25`'s oracle verbatim — served
    * ≡ recomputed, hash-checked.
    *
    * Scale shape: everything after the term filter is bounded by the
    * QUERY's posting lists (|terms| × df rows), decoded with one
    * pos-window per (term, block) — ≤ 100 rows per partition key. The
    * norms join is keyed on doc_id (at production scale a stored,
    * co-partitioned doc-stats table; the posting side is the small one
    * and AQE broadcast-joins it). No tokenization, no documents scan —
    * PlanSpec pins both out of the served plan. */
  /** The ONE BM25 serve body every served variant runs — from a posting
    * frame in the canonical segment layout plus the norms sidecar, with
    * an optional tombstone kill-list honored at serve time:
    *
    *  - query terms' posting blocks delta-DECODE per (term, block) —
    *    ≤ [[BlockSize]] rows per window partition, bounded by the
    *    QUERY's posting lists;
    *  - with tombstones, decoded rows AND norms anti-join the kill-list
    *    (a deleted doc can never score, never reach the top-10) and df
    *    is RECOMPUTED over surviving postings per query term — a
    *    query-bounded aggregate (≤ |terms| rows, broadcast back), so
    *    idf reflects the erasure exactly as a rebuild would;
    *  - corpus stats are one aggregate over (live) norms, and the
    *    scoring expression is [[TextQueries.bm25ScoreExpr]] VERBATIM.
    *
    * Scale shape: the kill-list is corpus-proportional, so its
    * anti-joins are shuffled (never broadcast); everything downstream
    * of the term filter stays query-bounded. */
  private def bm25ServeFrom(post: org.apache.spark.sql.DataFrame,
      norms: org.apache.spark.sql.DataFrame,
      tomb: Option[org.apache.spark.sql.DataFrame]): org.apache.spark.sql.DataFrame = {
    val normsLive = tomb.fold(norms)(t => norms.join(t, Seq("doc_id"), "left_anti"))
    val stats = normsLive.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val dec0 = IndexArtifacts.decodeBlocks(
      post.where(col("term").isin(TextQueries.bm25QueryTerms: _*)))
    val decoded = tomb match {
      case None => dec0
      case Some(t) =>
        val live = dec0.join(t, Seq("doc_id"), "left_anti")
        val dfLive = live.groupBy(col("term")).agg(count(lit(1)).as("df"))
        live.drop("df").join(broadcast(dfLive), "term")
    }
    decoded
      .join(normsLive, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("q", expr(TextQueries.bm25ScoreExpr))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_match"), sum(col("q")).as("sq"))
      .orderBy(col("sq").desc, col("doc_id"))
      .limit(10)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sq").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_match"),
        round(col("sq").cast("double") / 1000000.0, 4).as("bm25"), col("rk"))
  }

  private val textBm25Served = Q(
    "text_bm25_served",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      bm25ServeFrom(IndexArtifacts.postings(s, dir),
        IndexArtifacts.norms(s, dir), None)
    },
    Some(TextQueries.bm25OracleSql))

  /** Serve-after-MERGE (VERDICT r10 task 2) — the same BM25 serve body
    * pointed at [[IndexArtifacts.mergedPostings]]: the lake segment
    * folded with the ingest batch, Lucene segment-merge style. The
    * oracle is `text_bm25`'s full-corpus recompute VERBATIM — so a green
    * hash here IS the proof that serve-after-merge ≡ rebuild over the
    * unioned corpus, closing the build→incremental→merge→serve loop
    * (`index_merge` drew it; this query wires it). */
  private val textBm25MergedServed = Q(
    "text_bm25_merged_served",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      bm25ServeFrom(IndexArtifacts.mergedPostings(s, dir),
        IndexArtifacts.norms(s, dir), None)
    },
    Some(TextQueries.bm25OracleSql))

  /** Serve-time DELETE (VERDICT r10 task 1) — the retrieval twin of
    * `sim_graph_delete`: the ~10% [[IndexArtifacts.docTombstones]]
    * erasure batch is honored AT SERVE TIME without rebuilding the
    * index — a tombstoned doc can never be returned, df/idf and the
    * corpus stats reflect the removals (recomputed query-bounded over
    * survivors), and the oracle recomputes BM25 from the corpus MINUS
    * the deleted docs — served-with-tombstones ≡ rebuilt-without-
    * deleted, hash-checked at sf0.01 and sf0.1. */
  private val textBm25Swept = Q(
    "text_bm25_swept",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      bm25ServeFrom(IndexArtifacts.postings(s, dir),
        IndexArtifacts.norms(s, dir),
        Some(IndexArtifacts.docTombstones(s, dir)))
    },
    Some(TextQueries.bm25OracleSqlOver(
      s"SELECT doc_id, text FROM documents WHERE NOT (${IndexArtifacts.delPredSql("VARCHAR")})")))

  /** Serve from the SWEPT INDEX (r11) — the erasure analogue of
    * `text_bm25_merged_served`, closing "sweep output is what serve
    * reads": [[IndexArtifacts.sweptPostings]] has the kill-list
    * PHYSICALLY applied (the post-compaction store), so this query
    * runs the serve body with NO tombstone work at query time — df/cf
    * ride the swept rows, corpus stats aggregate the swept norms — and
    * still hash-matches the rebuilt-without-deleted oracle
    * (`text_bm25_swept`'s VERBATIM). Together the two queries pin both
    * halves of the erasure path: swept-at-serve-time ≡
    * swept-at-compaction-time ≡ rebuild. */
  private val textBm25SweptServed = Q(
    "text_bm25_swept_served",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      bm25ServeFrom(IndexArtifacts.sweptPostings(s, dir),
        IndexArtifacts.sweptNorms(s, dir), None)
    },
    Some(TextQueries.bm25OracleSqlOver(
      s"SELECT doc_id, text FROM documents WHERE NOT (${IndexArtifacts.delPredSql("VARCHAR")})")))

  /** Index-side delete SWEEP (VERDICT r10 task 1) — the merge-time half
    * of the erasure path, `sim_graph_sweep`'s retrieval twin: physically
    * rewrite every (term, block) posting row a tombstoned doc touches,
    * re-delta-encoded over the survivors, with per-term df/cf stats
    * reflecting the removals — so the swept rows are EXACTLY the rows a
    * rebuild without the deleted docs would emit for those keys
    * (IndexQueriesSpec pins the equality; fully-emptied blocks drop,
    * as in a rebuild). Untouched (term, block) rows are never rewritten
    * — the Lucene live-docs → segment-sweep discipline.
    *
    * Scale shape: the sweep reads the INDEX, not the corpus (tombstones
    * come off the norms sidecar; PlanSpec pins no documents scan). One
    * full decode pass over postings (corpus-linear — the cost any
    * segment merge already pays), with the kill-list shuffled-joined,
    * never broadcast (corpus-proportional); the rewrite itself groups
    * only touched blocks, ≤ BlockSize rows per collect. */
  private val indexDelete = Q(
    "index_delete",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val post = IndexArtifacts.postings(s, dir)
      val tomb = IndexArtifacts.docTombstones(s, dir)
      val dec = IndexArtifacts.decodeBlocks(post)
      val deleted = dec.join(tomb, "doc_id")
      val touchedTB = deleted.select(col("term"), col("block")).distinct()
      val rem = deleted.groupBy(col("term"))
        .agg(count(lit(1)).as("df_removed"), sum(col("tf")).as("cf_removed"))
      val surv = dec.join(touchedTB, Seq("term", "block"), "left_semi")
        .join(tomb, Seq("doc_id"), "left_anti")
      surv
        .groupBy(col("term"), col("df"), col("cf"), col("block"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
        .join(rem, "term")
        .select(col("term"), col("block"),
          (col("df") - col("df_removed")).as("df_after"),
          (col("cf") - col("cf_removed")).as("cf_after"),
          col("df_removed"), col("cf_removed"),
          size(col("ps")).cast("long").as("df_block"),
          expr(s"""array_join(transform(ps, (p, i) -> concat(
                     CAST(p.doc_id - IF(i = 0, block * $BlockSize,
                       element_at(ps, i).doc_id) AS STRING),
                     ':', CAST(p.tf AS STRING))), ' ')""").as("postings"))
    },
    Some(s"""WITH tok AS (
               SELECT doc_id, unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS term
               FROM documents),
             tf AS (
               SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY term, doc_id),
             stats AS (
               SELECT term, CAST(count(*) AS BIGINT) AS df,
                      CAST(sum(tf) AS BIGINT) AS cf
               FROM tf GROUP BY term),
             del AS (
               SELECT doc_id FROM documents
               WHERE ${IndexArtifacts.delPredSql("VARCHAR")}),
             tb AS (
               SELECT term, doc_id, tf, doc_id // $BlockSize AS block FROM tf),
             touched AS (
               SELECT DISTINCT term, block FROM tb JOIN del USING (doc_id)),
             rem AS (
               SELECT term, CAST(count(*) AS BIGINT) AS df_removed,
                      CAST(sum(tf) AS BIGINT) AS cf_removed
               FROM tb JOIN del USING (doc_id) GROUP BY term),
             surv AS (
               SELECT tb.term, tb.block, tb.doc_id, tb.tf,
                 tb.doc_id - coalesce(
                   lag(tb.doc_id) OVER (PARTITION BY tb.term, tb.block
                     ORDER BY tb.doc_id),
                   tb.block * $BlockSize) AS delta
               FROM tb JOIN touched USING (term, block)
               WHERE tb.doc_id NOT IN (SELECT doc_id FROM del))
             SELECT surv.term, surv.block,
               s.df - r.df_removed AS df_after,
               s.cf - r.cf_removed AS cf_after,
               r.df_removed, r.cf_removed,
               CAST(count(*) AS BIGINT) AS df_block,
               string_agg(CAST(delta AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                 ' ' ORDER BY doc_id) AS postings
             FROM surv JOIN stats s USING (term) JOIN rem r USING (term)
             GROUP BY surv.term, surv.block, s.df, s.cf,
               r.df_removed, r.cf_removed"""))

  val all: Seq[Q] = Seq(indexInverted, indexIncremental, indexMerge,
    textBm25Served, textBm25MergedServed, textBm25Swept, textBm25SweptServed,
    indexDelete)
}
