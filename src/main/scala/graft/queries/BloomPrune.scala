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
}
