package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a typed [[Aggregator]] — the
  * bounded-memory heavy-hitters pass: one O(k)-entry map per partition,
  * merged at the exchange, instead of a full `groupBy(key).count()`
  * whose state is proportional to the number of DISTINCT keys (at
  * 100 TB, billions of group states spilling through every executor
  * just to read off the top 10).
  *
  * The classic guarantees (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS'12) survive distributed
  * partial aggregation:
  *
  *  - every key with true count > N/(k+1) is IN the summary;
  *  - each reported estimate is an UNDER-count by at most N/(k+1)
  *    (total decrement debt is bounded regardless of merge order).
  *
  * Both are pinned by MisraGriesSpec against exact counts. Reported
  * estimates depend on partition/merge order (the bound does not), so
  * the query registers rows-only — the spec, not the oracle, is the
  * correctness contract (same pattern as the HLL/approx sketches).
  */
class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], key: Long): Map[Long, Long] =
    m.get(key) match {
      case Some(c) => m.updated(key, c + 1)
      case None if m.size < k => m.updated(key, 1L)
      case None =>
        // decrement-all: drop zeroed counters (one unit of debt per entry)
        m.flatMap { case (x, c) => if (c > 1) Some(x -> (c - 1)) else None }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (x, c)) =>
      m.updated(x, m.getOrElse(x, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // keep the k largest counters, subtract the (k+1)-th value from
      // each survivor — the mergeable-summaries rule that preserves the
      // N/(k+1) under-count bound
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (x, c) => if (c > cut) Some(x -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[Long, Long]): Map[Long, Long] = m

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
