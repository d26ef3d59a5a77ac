package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) theta sketch as a typed [[Aggregator]]: the
  * buffer is the sorted set of the k smallest DISTINCT hash values seen.
  * Beyond approximate COUNT(DISTINCT) — (k−1)/θ with θ the kth smallest
  * normalized hash — KMV sketches support the set algebra HLL cannot:
  * union (merge two buffers) and intersection estimation (shared hashes
  * below the union's θ), because the buffer retains the actual sample
  * of the hash space below θ.
  *
  * Distinctness lives INSIDE the buffer (insert skips values already
  * present), so the input needs no corpus-wide pre-distinct — the
  * whole point of sketching a 100 TB stream. State is ≤ k longs; reduce
  * is a binary search + insert into a bounded buffer; merge is a sorted
  * distinct merge truncated at k (associative + commutative: both sides
  * hold exact distinct bottom-k sets, and bottom-k of a union depends
  * only on the union). Deterministic by construction — the hash is the
  * caller's (md5-derived here), nothing samples randomly.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.size >= k && h >= buf.last) buf
    else {
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < buf.size && buf(lo) == h) buf // already present
      else ((buf.take(lo) :+ h) ++ buf.drop(lo)).take(k)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && a(i) <= b(j))) {
        if (j < b.size && a(i) == b(j)) j += 1 // shared value counts once
        out += a(i); i += 1; n += 1
      } else { out += b(j); j += 1; n += 1 }
    }
    out.result()
  }

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {
  val inputEncoder: Encoder[Long] = Encoders.scalaLong
}
