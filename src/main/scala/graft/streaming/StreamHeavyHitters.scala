package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One keyed observation for the streaming heavy-hitters summary. */
final case class HHEvent(shard: Int, key: Long)

/** A current frequency estimate emitted after each micro-batch. */
final case class HHEstimate(shard: Int, key: Long, est: Long, nSeen: Long)

/** Streaming heavy hitters — the Misra-Gries summary carried as
  * `flatMapGroupsWithState` state, the continuous twin of the batch
  * `approx_heavy_hitters` query (functions/MisraGries.scala). The
  * dashboard question it answers — "which users/URLs/tokens are hot RIGHT
  * NOW" — can't wait for a batch pass over history, and a streaming
  * `groupBy(key).count()` keeps one state row per DISTINCT key forever
  * (unbounded at web scale). Here state per shard is a k-bounded counter
  * map plus one BIGINT, no matter how many distinct keys stream past —
  * the same bounded-state argument as StreamDedup's watermarked horizon.
  *
  * Sharding: callers key each observation by a HASH of the key (mod
  * #shards), so one key's occurrences all land in one shard and shard
  * summaries stay disjoint — the global answer is the plain union of
  * shard maps, and per-shard guarantees transfer: a key with true count
  * > nSeen(shard)/(k+1) is present, estimates under-count by at most
  * nSeen(shard)/(k+1). Disjointness makes the union EXACTLY the
  * guarantee-preserving mergeable-summaries merge (Agarwal et al.,
  * PODS'12) for the special case of non-overlapping key sets.
  *
  * Each micro-batch folds its rows through the same `reduce` the batch
  * Aggregator uses (one code path for both engines' semantics) and emits
  * the shard's CURRENT top estimates (OutputMode.Update semantics — the
  * sink upserts per (shard, key)).
  */
object StreamHeavyHitters {

  /** Pure per-shard transition — exposed for unit tests: fold a batch of
    * keys into the carried (counters, nSeen) summary. */
  def advance(keys: Seq[Long], state: (Map[Long, Long], Long), k: Int)
      : (Map[Long, Long], Long) = {
    val mg = new graft.functions.MisraGries(k)
    (keys.foldLeft(state._1)(mg.reduce), state._2 + keys.length)
  }

  private implicit val stateEnc: Encoder[(Map[Long, Long], Long)] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]](),
      Encoders.scalaLong)

  /** Continuous heavy-hitters over a stream of (shard, key) observations.
    *
    * @param k counter capacity per shard — memory bound AND error bound
    *          (under-count ≤ nSeen/(k+1))
    */
  def run(events: Dataset[HHEvent], k: Int): Dataset[HHEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.shard)
      .flatMapGroupsWithState[(Map[Long, Long], Long), HHEstimate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard, it, st) =>
          val prev = st.getOption.getOrElse((Map.empty[Long, Long], 0L))
          val next = advance(it.map(_.key).toSeq, prev, k)
          st.update(next)
          next._1.iterator
            .map { case (key, est) => HHEstimate(shard, key, est, next._2) }
            .toSeq.sortBy(e => (-e.est, e.key)).iterator
      }
  }
}
