package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming ANN insert — the speed layer of `sim_graph_incremental`
  * (VERDICT r08 task 4), completing the engine's batch+speed pairing
  * for the graph-ANN lifecycle the way `StreamIncremental` pairs with
  * `dedup_incremental`: micro-batches of newly arrived vectors are
  * routed through the session base index exactly like the batch insert
  * (LSH-forest entry from the base bucket table, beam hops over the
  * base adjacency — [[graft.sim.SimQueries.graphSearchFrom]]) and each
  * vector's top-3 attach edges emit append-mode; the next
  * `sim_graph_compact` folds them into the served adjacency.
  *
  * `foreachBatch`, not a stream-native plan: the search body needs
  * rank windows and hop-iterated self-joins against the static index —
  * shapes append-mode streaming cannot run incrementally — while a
  * micro-batch of inserts is EXACTLY the bounded query batch
  * `graphSearchFrom` is built for. Each trigger therefore applies the
  * batch operator VERBATIM (one definition, two execution modes — the
  * StreamIngest discipline), so stream ≡ batch equivalence holds
  * per-batch by construction; StreamAttachSpec pins it end to end
  * against `attachEdges`. State-free: the index frames are built once
  * per snapshot and checkpointed (the baseIndexBuild artifact
  * lifecycle); no streaming state and no per-batch index rebuild —
  * per-trigger cost is the batch twin's marginal insert cost.
  *
  * Scale shape: micro-batches are trigger-bounded, so every batch
  * rides the broadcast-the-queries plan (the
  * [[graft.sim.SimQueries.BroadcastQueryMaxRows]] concern is the
  * UNBOUNDED batch path — a trigger that admits 2 M+ vectors should
  * lower `maxFilesPerTrigger`/`maxOffsetsPerTrigger` instead).
  */
object StreamAttach {

  /** Route each micro-batch of `stream` (`vec_id`, `embedding`) through
    * the base index and hand the scored attach edges
    * (`q_id`, `vec_id`, `cos` rounded to 6, `rk` ≤ 3) to `sink`.
    *
    * @param vecs  base vectors (vec_id, embedding, norm2) — the frame
    *              [[graft.sim.SimQueries.graphSearchFrom]] scores against
    * @param adj   capped base adjacency (a_id, b_id), checkpointed
    * @param codes base bucket-code table (vec_id, bucket, tbl)
    * @param sink  per-batch consumer (out, batchId) — append semantics;
    *              replays after a crash re-emit the same batch (the
    *              at-least-once contract; a keyed sink dedups on
    *              (q_id, vec_id) exactly like the md5hash JDBC sink)
    */
  def attach(stream: DataFrame, vecs: DataFrame, adj: DataFrame,
      codes: DataFrame)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    // The query-side codes MUST be computed with the same plane count the
    // supplied index was built with — a mismatch makes every bucket join
    // empty and silently drops all streamed vectors (ADVICE r09 #1). The
    // index frame is the authority: read the bucket width off one row
    // (each table's code is one char per plane).
    val planes = codes.select(length(col("bucket"))).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException(
        "StreamAttach.attach: empty codes frame — no index to attach to")
    }
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val queries = batch.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"),
          expr("dot_ordered(embedding, embedding)").as("q_norm2"))
        val qcodes = graft.sim.SimQueries.forestCodes(batch, planes)
          .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
        // graphSearchFrom returns an eager checkpoint — bind the raw frame
        // so it can be RELEASED once the sink has consumed this batch
        // (ADVICE r10: releasing a .select projection is a no-op, the
        // checkpoint would otherwise accumulate per trigger for the
        // stream's lifetime).
        val raw = graft.sim.SimQueries.graphSearchFrom(
            vecs, adj, codes, queries, qcodes)
        val out = raw.select(col("q_id"), col("vec_id"),
            round(col("cos"), 6).as("cos"), col("rk"))
        sink(out, id)
        graft.identity.Components.unpersistCheckpoint(raw)
      }
      .start()
  }

  /** [[attach]] with the MAINTENANCE loop wired in (VERDICT r09 task 5)
    * — the full streaming lifecycle a long-running vector store needs:
    * attach edges accumulate per micro-batch, and once the pending
    * attach-edge count crosses `maxAttach`, the trigger gap runs a
    * COMPACTION ([[graft.sim.SimQueries.graphCompact]] over the scored
    * log — the shipped operator, one definition) and re-persists the
    * serving snapshot:
    *
    *  - the served adjacency becomes the compacted fold (deg ≤ 6 over
    *    base ∪ everything inserted so far);
    *  - the inserted vectors' payloads and routing codes join the
    *    serving frames, so POST-compaction batches route over the
    *    compacted adjacency and can attach to PREVIOUSLY STREAMED
    *    vectors (between compactions, new arrivals are attach-only —
    *    exactly the batch operator's semantics, where inserts become
    *    searchable at the next `sim_graph_compact`);
    *  - when `snapshotDir` is set, the compacted adjacency + codes land
    *    as parquet under `snapshotDir/compact_<n>` — the store's
    *    recoverable serving snapshot.
    *
    * State is three checkpointed frames (scored log, codes, vectors) —
    * superseded checkpoints are released at each compaction, so
    * resident state is one serving snapshot regardless of stream
    * length. Compaction cost is the batch fold (one k-bounded reverse
    * aggregate, corpus-linear), paid once per `maxAttach` edges — the
    * amortized maintenance schedule, not a per-trigger rebuild.
    *
    * @param scoredBase the base split's SCORED r1 graph (q_id, vec_id,
    *                   cos) — compaction folds by cosine; the capped
    *                   adjacency alone has forgotten the scores
    * @param maxAttach  pending-attach-edge threshold that triggers a
    *                   compaction after the emitting batch
    * @param onCompact  maintenance observer: (compacted adjacency,
    *                   compaction ordinal) after each sweep — the hook
    *                   StreamAttachSpec pins the degree bound through
    */
  def attachCompacting(stream: DataFrame, vecs: DataFrame, adj: DataFrame,
      codes: DataFrame, scoredBase: DataFrame, maxAttach: Long,
      snapshotDir: Option[String] = None)(
      sink: (DataFrame, Long) => Unit,
      onCompact: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    val planes = codes.select(length(col("bucket"))).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException(
        "StreamAttach.attachCompacting: empty codes frame — no index to attach to")
    }
    def cp(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
    def release(df: DataFrame): Unit =
      graft.identity.Components.unpersistCheckpoint(df)
    // serving state — mutated only inside foreachBatch (micro-batches of
    // one query run strictly sequentially)
    var servedAdj = adj
    var servedCodes = codes
    var servedVecs = vecs
    // the scored log behind the served adjacency, and the attach edges
    // accumulated since the last compaction — graphCompact's two inputs
    var baseLog = cp(scoredBase.select(col("q_id"), col("vec_id"), col("cos")))
    var attachLog: Option[DataFrame] = None
    var pendingVecs: Option[DataFrame] = None
    var pendingCodes: Option[DataFrame] = None
    var pendingAttach = 0L
    var compactions = 0L
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = cp(batch.select(col("vec_id"), col("embedding")))
        val queries = b.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"),
          expr("dot_ordered(embedding, embedding)").as("q_norm2"))
        val qcodes = graft.sim.SimQueries.forestCodes(b, planes)
          .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
        // Bind the RAW graphSearchFrom checkpoint, re-cut the rounded
        // projection, then release the raw frame — releasing a .select
        // projection is a no-op (unpersistCheckpoint matches the
        // LogicalRDD root only), so the old `release(out)` silently
        // leaked one checkpoint per trigger (ADVICE r10).
        val raw = graft.sim.SimQueries.graphSearchFrom(
            servedVecs, servedAdj, servedCodes, queries, qcodes)
        val out = cp(raw.select(col("q_id"), col("vec_id"),
            round(col("cos"), 6).as("cos"), col("rk")))
        release(raw)
        sink(out, id)
        // grow the pending snapshot delta
        val al = cp(attachLog
          .map(_.unionByName(out.select(col("q_id"), col("vec_id"), col("cos"))))
          .getOrElse(out.select(col("q_id"), col("vec_id"), col("cos"))))
        attachLog.foreach(release); attachLog = Some(al)
        val pv = cp(pendingVecs.map(_.unionByName(b)).getOrElse(b))
        pendingVecs.foreach(release); pendingVecs = Some(pv)
        val pc = cp(pendingCodes
          .map(_.unionByName(graft.sim.SimQueries.forestCodes(b, planes)))
          .getOrElse(graft.sim.SimQueries.forestCodes(b, planes)))
        pendingCodes.foreach(release); pendingCodes = Some(pc)
        pendingAttach += out.count()
        // al/pv/pc are their OWN checkpoints now — the per-batch answer
        // and input frames can go immediately.
        release(out); release(b)
        if (pendingAttach >= maxAttach) {
          compactions += 1
          // the shipped maintenance operator, verbatim: fold the attach
          // log into the scored log, reverse slots re-compete at top-3
          val adjNew = cp(graft.sim.SimQueries.graphCompact(baseLog, al))
          val baseNew = cp(baseLog.unionByName(al))
          val vecsNew = cp(servedVecs.unionByName(pv.select(col("vec_id"),
            col("embedding"),
            expr("dot_ordered(embedding, embedding)").as("norm2"))))
          val codesNew = cp(servedCodes.unionByName(pc))
          snapshotDir.foreach { d =>
            adjNew.write.mode("overwrite").parquet(s"$d/compact_$compactions/adj")
            codesNew.write.mode("overwrite").parquet(s"$d/compact_$compactions/codes")
          }
          // release the superseded snapshot — but never the CALLER's base
          // frames (compaction 1 supersedes the arguments)
          if (compactions > 1) { release(servedAdj); release(servedCodes); release(servedVecs) }
          release(baseLog); release(al)
          pendingVecs.foreach(release); pendingCodes.foreach(release)
          servedAdj = adjNew; servedCodes = codesNew; servedVecs = vecsNew
          baseLog = baseNew; attachLog = None
          pendingVecs = None; pendingCodes = None; pendingAttach = 0L
          onCompact(adjNew, compactions)
        }
      }
      .start()
  }
}
