package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Gram-matrix state: row count, per-dimension sums, and the
  * upper triangle of Σ x·xᵀ in row-major order — the X^T X sufficient
  * statistics every second-moment computation (covariance / correlation
  * matrix, PCA, least squares) starts from. All cells are exact BIGINT
  * over integer-quantized inputs, so accumulation order cannot change a
  * bit.
  */
case class GramState(n: Long, sx: Array[Long], sxy: Array[Long])

/** One-pass distributed Gram / covariance accumulation as a typed
  * [[Aggregator]] over integer-quantized embedding vectors.
  *
  * The naive formulation — explode each vector into (i, x_i), self-join
  * on the row id to form (i, j) pairs, groupBy (i, j) — shuffles
  * dim²/2 rows PER VECTOR (2080 at dim 64): a corpus-sized exchange
  * inflated 2000×. The Aggregator contract instead folds every vector
  * into a dim-bounded buffer (n, Σx, upper(Σx·xᵀ)) ≈ 17 KB at dim 64,
  * map-side; the shuffle then carries ONE buffer per input partition
  * regardless of corpus size, and `merge` is cell-wise BIGINT addition
  * (associative + commutative, any merge tree). This is the moment-sketch
  * shape: state bounded by the MODEL dimension, never the data.
  *
  * Upper-triangle indexing (0-based, row-major): cell (i, j), j ≥ i,
  * lives at `i*dim - i*(i-1)/2 + (j-i)`.
  */
class GramMatrix(dim: Int)
    extends Aggregator[Seq[Long], GramState, GramState] {

  private val cells = dim * (dim + 1) / 2

  override def zero: GramState =
    GramState(0L, new Array[Long](dim), new Array[Long](cells))

  override def reduce(b: GramState, x: Seq[Long]): GramState = {
    require(x.length == dim, s"expected dim $dim, got ${x.length}")
    val v = x.toArray
    var i = 0
    var k = 0
    while (i < dim) {
      b.sx(i) += v(i)
      var j = i
      while (j < dim) {
        b.sxy(k) += v(i) * v(j)
        j += 1
        k += 1
      }
      i += 1
    }
    GramState(b.n + 1L, b.sx, b.sxy)
  }

  override def merge(a: GramState, b: GramState): GramState = {
    var i = 0
    while (i < dim) { a.sx(i) += b.sx(i); i += 1 }
    var k = 0
    while (k < cells) { a.sxy(k) += b.sxy(k); k += 1 }
    GramState(a.n + b.n, a.sx, a.sxy)
  }

  override def finish(r: GramState): GramState = r

  override def bufferEncoder: Encoder[GramState] = ExpressionEncoder[GramState]()
  override def outputEncoder: Encoder[GramState] = ExpressionEncoder[GramState]()
}
