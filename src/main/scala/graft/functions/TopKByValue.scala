package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-key top-k as a typed [[Aggregator]] — the 100 TB
  * replacement for the rank-window idiom
  * `row_number() OVER (PARTITION BY key ORDER BY value DESC) <= k`.
  *
  * The window formulation hash-partitions EVERY row by key and sorts each
  * partition before discarding all but k rows per key — at web scale that
  * is a full shuffle and sort of the corpus to keep a sliver. The
  * Aggregator contract gives partial aggregation instead: `reduce` folds
  * rows into a k-bounded buffer per key per input partition (map-side),
  * `merge` combines buffers at the exchange, so the shuffle carries at
  * most k (value, id) pairs per key per partition and nothing is ever
  * globally sorted. Same TakeOrderedAndProject insight as the global
  * `topk_users` fix, applied per key.
  *
  * Ordering is total — (value DESC, id ASC) — so results are deterministic
  * under ties and both engines agree row-for-row.
  */
class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // buffers stay sorted (value desc, id asc) and never exceed k elements
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && !better(row, buf.last)) buf
    else {
      val i = buf.indexWhere(better(row, _))
      val at = if (i < 0) buf.size else i
      ((buf.take(at) :+ row) ++ buf.drop(at)).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // merge of two sorted runs, truncated at k
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && better(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByValue {
  /** The input encoder `functions.udaf` needs for the (value, id) pair. */
  val inputEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
}
