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
        val out = graft.sim.SimQueries.graphSearchFrom(
            vecs, adj, codes, queries, qcodes)
          .select(col("q_id"), col("vec_id"),
            round(col("cos"), 6).as("cos"), col("rk"))
        sink(out, id)
      }
      .start()
  }
}
