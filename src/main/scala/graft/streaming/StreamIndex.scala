package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.text.IndexArtifacts

/** Streaming index maintenance — the speed layer of `index_incremental`
  * + `index_merge` (VERDICT r10 task 3), completing the batch+speed
  * pairing for the retrieval lifecycle the way [[StreamAttach]] pairs
  * with `sim_graph_incremental`/`sim_graph_compact`: micro-batches of
  * newly crawled documents (doc_id, text) each emit their DELTA
  * postings (the `index_incremental` readout shape — per batch-touched
  * term: df/cf and the delta-encoded batch posting list), and once the
  * pending document count crosses `maxPendingDocs` the trigger gap runs
  * a segment MERGE (the `index_merge` fold, built from the same
  * [[IndexArtifacts.encodeBlocks]]/[[IndexArtifacts.decodeBlocks]] pair
  * the batch operators share — one layout, two execution modes): the
  * served postings become the lake segment with every streamed term
  * re-encoded over lake ∪ pending, untouched terms passing through
  * undecoded.
  *
  * `foreachBatch`, not a stream-native plan: posting assembly needs
  * sort_array/collect_list grouping and the merge needs a join against
  * the standing segment — shapes append-mode streaming cannot run
  * incrementally — while a micro-batch of documents is EXACTLY the
  * bounded ingest batch `index_incremental` is built for (the
  * StreamIngest/StreamAttach discipline). Between merges, arrivals are
  * delta-only — exactly the batch semantics, where appended postings
  * become servable at the next `index_merge`.
  *
  * Scale shape: per-trigger work is batch-bounded (tokenize + one
  * grouped aggregate over batch rows; the delta readout is bounded by
  * the batch vocabulary). Merge cost is the fold — decode touched lake
  * terms (left_semi keyed by the pending vocabulary; partition pruning
  * on a term-range-partitioned store), re-encode with ≤ BlockSize rows
  * per collect — paid once per `maxPendingDocs` documents, never a
  * per-trigger rebuild. State is two checkpointed frames (served
  * segment, pending tf log); superseded checkpoints are released at
  * each merge, so resident state is one serving snapshot regardless of
  * stream length.
  */
object StreamIndex {

  /** Route each micro-batch of `stream` (`doc_id`, `text`) into the
    * index: per-trigger delta postings to `sink`, threshold-triggered
    * segment merges into the served postings.
    *
    * @param lakePostings the standing segment in the canonical
    *                     `(term, block, df, cf, df_block, cf_block,
    *                     postings)` layout (e.g.
    *                     [[IndexArtifacts.encodeBlocks]] over the lake
    *                     corpus), checkpointed or parquet-backed
    * @param maxPendingDocs pending streamed-document threshold that
    *                       triggers a merge after the emitting batch
    * @param sink     per-batch consumer of the delta readout
    *                 (term, df_batch, cf_batch, postings) — append
    *                 semantics, the `index_incremental` contract
    * @param onMerge  maintenance observer: (served postings after the
    *                 fold, merge ordinal) — the hook StreamIndexSpec
    *                 pins stream ≡ batch through
    */
  def index(stream: DataFrame, lakePostings: DataFrame,
      maxPendingDocs: Long)(
      sink: (DataFrame, Long) => Unit,
      onMerge: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    indexCdc(stream.withColumn("op", lit("add")), lakePostings,
      maxPendingDocs)(sink, onMerge)

  /** [[index]] with DELETES in the stream — the speed layer of the full
    * erasure path (`index_delete` / `sweptPostings`), mirroring how
    * `StreamAttach.attachCompacting` pairs with `sim_graph_sweep`:
    * micro-batches carry `(doc_id, text, op)` with op ∈ add | delete.
    * Adds emit their delta postings per trigger exactly like [[index]];
    * deletes accumulate in a pending kill-list (serve-time consumers
    * would anti-join it — the `text_bm25_swept` shape) and are applied
    * PHYSICALLY at the next threshold-triggered merge:
    *
    *  - the merge's rewrite key set is (terms touched by pending adds)
    *    ∪ (terms of any tombstoned doc) — the latter found by the one
    *    full decode pass any segment sweep pays (there is no forward
    *    index; the Lucene live-docs discipline);
    *  - rewritten terms re-encode over (surviving decoded rows ∪
    *    pending adds) — so an add that was deleted before ever being
    *    merged simply never lands;
    *  - untouched terms pass through undecoded with valid stats (no
    *    add and no deleted doc touches them by construction).
    *
    * CDC ordering is LAST-WRITER-WINS per doc_id across the pending
    * window (ADVICE r11): each trigger supersedes any pending state for
    * the doc_ids it touches (a re-add replaces an earlier pending add's
    * rows; a delete drops them), and within one micro-batch — which
    * carries no sequence column — a delete of a doc_id supersedes an
    * add of the same doc_id. Deletes are never cancelled by a later
    * add: the tombstone still has to sweep the doc's LAKE rows at the
    * merge (delete-then-re-add is Lucene's updateDocument — sweep the
    * old version, land the new one). The one documented PRECONDITION:
    * an add of a doc_id already LIVE in the served segment must be
    * preceded (or accompanied) by a delete op — an un-tombstoned
    * re-add would double-count the doc's (doc_id, term) rows. The
    * merge throws on any such collision it can see in the rows it
    * decodes anyway (all of them when any delete is pending; the
    * add-touched term slice otherwise) rather than serving an
    * inflated df.
    *
    * After a merge the served segment is EXACTLY the segment a batch
    * rebuild over (lake − deletes) ∪ last-writer adds would write —
    * StreamIndexSpec pins it row-for-row, including add-then-delete
    * (never lands) and delete-then-re-add (new version lands).
    *
    * SESSION-SCOPED (ADVICE r11): state lives in driver-held frames and
    * `foreachBatch` ignores `batchId`, so the stream must not be run
    * with a recovery `checkpointLocation` — a replayed micro-batch
    * would union its rows into the pending window twice. Restart = cold
    * start from the current lake segment, the [[StreamAttach]]
    * contract. */
  def indexCdc(stream: DataFrame, lakePostings: DataFrame,
      maxPendingDocs: Long)(
      sink: (DataFrame, Long) => Unit,
      onMerge: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    def cp(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
    def release(df: DataFrame): Unit =
      graft.identity.Components.unpersistCheckpoint(df)
    // serving state — mutated only inside foreachBatch (micro-batches
    // of one query run strictly sequentially)
    var served = lakePostings
    var pendingTf: Option[DataFrame] = None
    var pendingDel: Option[DataFrame] = None
    var pendingDocs = 0L
    var merges = 0L
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batchAll: DataFrame, id: Long) =>
        val batch = batchAll.where(col("op") === "add")
        val dels = batchAll.where(col("op") === "delete")
          .select(col("doc_id"))
        // batch tf — the one tokenize pass this trigger pays
        val btf = cp(batch
          .select(col("doc_id"),
            explode(expr(graft.text.TextQueries.tokenizeExpr)).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf")))
        // the index_incremental delta readout: batch-vocab-bounded
        val delta = btf
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df_batch"), sum(col("tf")).as("cf_batch"),
            sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("ps"))
          .select(col("term"), col("df_batch"), col("cf_batch"),
            expr("""array_join(transform(ps, (p, i) -> concat(
                      CAST(p.doc_id - IF(i = 0, CAST(0 AS BIGINT),
                        element_at(ps, i).doc_id) AS STRING),
                      ':', CAST(p.tf AS STRING))), ' ')""").as("postings"))
        sink(delta, id)
        // grow the pending tf log + kill-list, LAST-WRITER-WINS per doc:
        // this trigger's ops supersede any pending rows for the same
        // doc_ids, and within the batch a delete supersedes an add
        val touchedDocs = batchAll.select(col("doc_id")).distinct()
        val btfLive = btf.join(dels, Seq("doc_id"), "left_anti")
        val pt = cp(pendingTf
          .map(_.join(touchedDocs, Seq("doc_id"), "left_anti")
            .unionByName(btfLive))
          .getOrElse(btfLive))
        pendingTf.foreach(release); pendingTf = Some(pt)
        // deletes accumulate unconditionally — a later re-add does NOT
        // cancel the tombstone, which still sweeps the doc's lake rows
        val pd = cp(pendingDel.map(_.unionByName(dels)).getOrElse(dels)
          .distinct())
        pendingDel.foreach(release); pendingDel = Some(pd)
        // deletes count toward the maintenance threshold too — a
        // delete-heavy stream must still trigger its sweeps
        pendingDocs += batch.select(col("doc_id")).distinct().count() +
          dels.count()
        release(btf)
        if (pendingDocs >= maxPendingDocs) {
          merges += 1
          val hasDels = pd.limit(1).count() > 0
          val ptDocs = pt.select(col("doc_id")).distinct()
          def guardCollision(decodedLive: DataFrame): Unit = {
            val hit = decodedLive.join(ptDocs, Seq("doc_id"), "left_semi")
              .select(col("doc_id")).limit(1).collect()
            if (hit.nonEmpty) throw new IllegalStateException(
              s"StreamIndex: add of doc_id ${hit.head.getLong(0)} collides " +
                "with a live lake doc — an update must arrive as delete+add " +
                "(un-tombstoned re-adds would double-count postings)")
          }
          val servedNew = if (!hasDels) {
            // the index_merge fold, verbatim shape: decode ONLY the
            // touched lake terms, union the pending rows, re-encode;
            // untouched lake rows pass through undecoded
            val touched = pt.select(col("term")).distinct()
            val decTouched = cp(IndexArtifacts.decodeBlocks(
                served.join(touched, Seq("term"), "left_semi"))
              .select(col("doc_id"), col("term"), col("tf")))
            guardCollision(decTouched) // best-effort: the slice decoded anyway
            val foldedTf = decTouched
              .unionByName(pt.select(col("doc_id"), col("term"), col("tf")))
            val out = cp(served.join(touched, Seq("term"), "left_anti")
              .unionByName(IndexArtifacts.encodeBlocks(foldedTf)))
            release(decTouched)
            out
          } else {
            // merge + SWEEP (the sweptPostings discipline): one full
            // decode pass finds the tombstoned docs' terms — the cost
            // any segment sweep pays; the rewrite key set is
            // (add-touched terms) ∪ (tombstoned docs' terms), and only
            // those terms re-encode, over lake survivors ∪ pending adds
            // (adds are NOT anti-joined against the kill-list: the
            // pending log is already last-writer-wins, so a pending add
            // postdates any pending delete of the same doc — anti-joining
            // here is what silently lost delete-then-re-add updates)
            val dec = cp(IndexArtifacts.decodeBlocks(served)
              .select(col("doc_id"), col("term"), col("tf")))
            guardCollision(dec.join(pd, Seq("doc_id"), "left_anti"))
            val rewrite = cp(pt.select(col("term"))
              .unionByName(dec.join(pd, "doc_id").select(col("term")))
              .distinct())
            val foldedTf = dec.join(rewrite, Seq("term"), "left_semi")
              .join(pd, Seq("doc_id"), "left_anti")
              .unionByName(pt.select(col("doc_id"), col("term"), col("tf")))
            val out = cp(served.join(rewrite, Seq("term"), "left_anti")
              .unionByName(IndexArtifacts.encodeBlocks(foldedTf)))
            release(dec); release(rewrite)
            out
          }
          // release the superseded snapshot — never the CALLER's lake
          // frame (merge 1 supersedes the argument)
          if (merges > 1) release(served)
          pendingTf.foreach(release); pendingDel.foreach(release)
          served = servedNew; pendingTf = None; pendingDel = None
          pendingDocs = 0L
          onMerge(servedNew, merges)
        }
      }
      .start()
  }
}
