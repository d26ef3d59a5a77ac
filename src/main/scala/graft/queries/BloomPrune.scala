package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the scale pattern for a fact⋈dim join
  * where the dim side is too large to broadcast as a hash relation but
  * its KEY SET compresses into a few MB of bloom bits.
  *
  * `dim.stat.bloomFilter` builds the filter distributed (one aggregate,
  * partial filters OR-merged); the bits broadcast to every executor and
  * the fact side drops non-matching rows BEFORE its shuffle — at 100 TB
  * that's the difference between shuffling the full fact table and
  * shuffling only the ~matching fraction. False positives just pass
  * through to the real join (which stays correct); there are no false
  * negatives, pinned by the semi-join equivalence spec.
  *
  * Spark's own runtime row-level filtering does this automatically for
  * some shapes; this utility makes it explicit and composable (e.g.
  * prune events by the identity-edge key set before the canonical-id
  * resolve join).
  */
object BloomPrune {

  /** Filter `fact` to rows whose `factKey` might appear in `dim.dimKey`.
    *
    * The membership test is the native `bloom_might_contain` expression
    * (graft.functions.BloomMightContain): the serialized filter bits ride
    * the plan as a BINARY literal, deserialize once per executor, and the
    * per-row probe stays inside whole-stage codegen — no Scala UDF
    * breaking the codegen span on the fact table's hot path.
    *
    * @param expectedItems sizing for the filter (overestimate is safe)
    * @param fpp target false-positive rate — tune bits vs pass-through
    */
  def prune(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
            expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    fact.schema(factKey).dataType match {
      case LongType | IntegerType | StringType => ()
      case dt => throw new IllegalArgumentException(
        s"bloom prune supports long/int/string keys, got ${dt.catalogString}")
    }
    val bf: BloomFilter = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bits = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    graft.functions.GraftFunctions.register(fact.sparkSession)
    fact.where(call_function("bloom_might_contain", lit(bits), col(factKey)))
  }

  /** Result of [[pruneAdaptive]]: the (possibly) pruned frame plus what
    * was decided — benches and logs read this instead of guessing. */
  final case class AdaptivePrune(df: DataFrame, engaged: Boolean,
      fpp: Double, filterBytes: Long)

  /** Budget-sized bloom prune: instead of a fixed fpp (whose bits grow
    * linearly with the key count until the broadcast stops being viable —
    * the old hard cutoff), size the filter to a byte BUDGET and let the
    * false-positive rate degrade as keys grow.
    *
    * Optimal bloom geometry: bits = -n·ln(fpp)/ln²2, so a budget of B
    * bytes over n keys buys fpp = exp(-(8B/n)·ln²2). The prune still pays
    * enormously at fpp 0.1 (kills 90% of the probe-side shuffle); only
    * when the achievable fpp passes `uselessFpp` (the filter passes most
    * rows through anyway) does the caller get the unpruned frame back —
    * with 256 MB that crossover sits at ~1.5 B keys, not the old 50 M.
    * Below `minFpp` the budget is not spent: bits are capped at what
    * `minFpp` needs (no point paying broadcast bytes for fpp 1e-12 when
    * the exact join downstream eats false positives anyway).
    *
    * The build stays distributed (`stat.bloomFilter` tree-aggregates
    * partial filters); the driver holds one budget-bounded bit array
    * transiently, and the broadcast is the same budget-bounded literal.
    */
  def pruneAdaptive(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, nKeys: Long,
      maxFilterBytes: Long = 256L << 20,
      minFpp: Double = 0.001,
      uselessFpp: Double = 0.5): AdaptivePrune = {
    val n = math.max(nKeys, 1L)
    val ln2sq = math.log(2) * math.log(2)
    val achievable = math.exp(-(maxFilterBytes * 8.0 / n) * ln2sq)
    val fpp = math.max(achievable, minFpp)
    if (fpp >= uselessFpp)
      AdaptivePrune(fact, engaged = false, fpp = fpp, filterBytes = 0L)
    else {
      val bits = math.ceil(-n * math.log(fpp) / ln2sq).toLong
      AdaptivePrune(prune(fact, factKey, dim, dimKey, n, fpp),
        engaged = true, fpp = fpp, filterBytes = bits / 8)
    }
  }
}
