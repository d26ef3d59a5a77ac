package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries

/** Streaming counterpart of `dedup_incremental`: flag each document of an
  * incoming STREAM that might LSH-collide with the existing (static)
  * corpus — the "quarantine today's crawl against the lake" gate, running
  * continuously.
  *
  * State-free by construction: the corpus band table is compressed into a
  * bloom filter ONCE at query start (a batch aggregate over the static
  * side; Spark's fixed-seed BloomFilter, so results are deterministic),
  * and the per-row probe is the native `bloom_might_contain` expression —
  * pure column math that runs in append mode with no streaming state, no
  * stream-static rescans per micro-batch, and no shuffle of the stream.
  * False positives (rate = `fpp`) route extra docs to the downstream
  * exact verifier — the generate-then-verify contract the batch dedup
  * family already uses; false negatives cannot occur (no bloom false
  * negatives, pinned by StreamIncrementalSpec).
  */
object StreamIncremental {

  import graft.functions.MinHashSignature.{NumHashes, BandSize}

  /** @param stream      streaming frame with `doc_id`, `text`
    * @param corpusBands static frame with a `band_hash` column (e.g.
    *                    `stackBands(minhashSignatures(corpus))`)
    */
  def flagAgainstCorpus(stream: DataFrame, corpusBands: DataFrame,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = corpusBands.stat.bloomFilter("band_hash", expectedItems, fpp)
    val bits = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    graft.functions.GraftFunctions.register(stream.sparkSession)
    val sig = DedupQueries.minhashSignatures(stream, spreadInput = false)
    // ONE filter literal + ONE probe expression instance: the per-band
    // OR-of-probes shape embedded the multi-MB serialized filter once PER
    // BAND in the plan (4x task-binary weight) and deserialized it once
    // per expression instance per executor. exists() over the stacked
    // band array probes the same four hashes against a single literal;
    // the lambda runs interpreted, but it is 4 membership tests per row
    // against work that is dominated by the minhash pass anyway.
    val bandArr = array((0 until NumHashes / BandSize).map(b => col(s"band$b")): _*)
    val bitsLit = lit(bits)
    val flagged = sig.select(col("doc_id"),
      exists(bandArr, h => call_function("bloom_might_contain", bitsLit, h))
        .cast("long").as("maybe_dup"))
    // null-text docs carry no signature (minhashSignatures filters them
    // before signing) but must still EXIT the gate: the batch twin
    // (dedup_incremental) emits is_dup = 0 for them via its left join,
    // and a doc that silently vanishes here is neither quarantined nor
    // passed. Union keeps the query state-free (a stream-stream join
    // back onto the input would need watermark state).
    val nullText = stream.where(col("text").isNull)
      .select(col("doc_id"), lit(0L).as("maybe_dup"))
    flagged.unionByName(nullText)
  }
}
