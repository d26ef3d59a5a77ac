package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Streaming corpus-drift monitor — the continuous twin of the batch
  * `corpus_drift` query: per event-time window, the Jensen-Shannon
  * divergence of the window's unigram distribution against a FIXED
  * reference model, emitted as the window closes. The production
  * question is "did today's crawl shift away from the lake" answered
  * WHILE the crawl lands, not in tomorrow's batch pass.
  *
  * Bounded state, the streaming requirement: any token outside the
  * reference vocabulary collapses to one OOV bucket BEFORE the
  * aggregation, so the per-window count map holds at most |vocab|+1
  * counters no matter what streams past. The map is carried by the
  * Misra-Gries typed Aggregator at capacity |vocab|+1 — capacity ≥
  * distinct keys means it never evicts and never cuts on merge, so the
  * summary is EXACT (the same exactness-at-capacity argument that lets
  * batch `approx_heavy_hitters` keep a hash-match oracle). One
  * watermarked windowed aggregation in append mode; the JSD itself is
  * pure column HOF math over the emitted map and the reference literal
  * (bounded: vocabulary-sized arrays), quantized per token to integer
  * nano-nats exactly like the batch query.
  *
  * `drift` works identically on a batch frame (`withWatermark` is a
  * no-op outside streaming; `window()` groups the same) — one
  * definition for both engines, the StreamCurate contract, pinned by
  * StreamDriftSpec's stream ≡ batch case.
  */
object StreamDrift {

  /** OOV bucket key — outside xxhash64's practical output range for any
    * real token (a collision would need a token hashing to exactly
    * Long.MinValue; the reference build would surface it). */
  val OovKey: Long = Long.MinValue

  /** Fit the reference model on a batch frame: the top-`vocabSize`
    * tokens by count (ties on hash — deterministic), as hash → count.
    * Driver-bounded by construction: `vocabSize` rows collect, the
    * corpus never does. */
  def referenceModel(docs: DataFrame, vocabSize: Int): Map[Long, Long] = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(explode(expr("word_ngrams(text, 1, false)")).as("token"))
      .select(xxhash64(col("token")).as("th"))
      .groupBy(col("th")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("th")).limit(vocabSize)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Per-window JSD of the stream's unigram distribution vs `ref`.
    *
    * @param docs     (ts: timestamp, text: string) — streaming or batch
    * @param ref      fixed reference model from [[referenceModel]]
    * @param windowDur event-time window, e.g. "1 hour"
    * @param lateness max out-of-order delay; bounds window state
    */
  def drift(docs: DataFrame, ref: Map[Long, Long],
            windowDur: String = "1 hour",
            lateness: String = "10 minutes"): DataFrame = {
    require(ref.nonEmpty, "reference model is empty")
    // OovKey (Long.MinValue) is the out-of-vocab sentinel: a reference
    // token hashing exactly there would duplicate the key in `pairs` and
    // the JSD would double-count it — astronomically unlikely (one
    // specific xxhash64 value) but checked, not assumed
    require(!ref.contains(OovKey),
      "reference model contains the OOV sentinel key; rebuild with a different vocab")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val refMap = typedLit(ref)
    val pairs = (ref.toSeq :+ (OovKey -> 0L)).sortBy(_._1)
    val mg = udaf(new graft.functions.MisraGries(ref.size + 1), Encoders.scalaLong)
    val hist = docs
      .withWatermark("ts", lateness)
      .select(col("ts"), explode(expr("word_ngrams(text, 1, false)")).as("token"))
      .withColumn("th",
        when(map_contains_key(refMap, xxhash64(col("token"))),
          xxhash64(col("token"))).otherwise(lit(OovKey)))
      .groupBy(window(col("ts"), windowDur))
      .agg(mg(col("th")).as("hist"))
    hist
      .withColumn("refk", typedLit(pairs.map(_._1)))
      .withColumn("refc", typedLit(pairs.map(_._2)))
      .withColumn("rtot", lit(ref.values.sum))
      .withColumn("wtot", expr(
        "aggregate(map_values(hist), 0L, (acc, x) -> acc + x)"))
      .withColumn("jsd_nanonat", expr(
        """aggregate(
             zip_with(refk, refc, (k, rc) ->
               CAST(round((
                 CASE WHEN NOT map_contains_key(hist, k) OR hist[k] = 0 THEN 0.0
                 ELSE 0.5 * (CAST(hist[k] AS DOUBLE) / CAST(wtot AS DOUBLE)) *
                   ln((CAST(hist[k] AS DOUBLE) / CAST(wtot AS DOUBLE)) /
                      ((CAST(hist[k] AS DOUBLE) / CAST(wtot AS DOUBLE) +
                        CAST(rc AS DOUBLE) / CAST(rtot AS DOUBLE)) / 2.0)) END +
                 CASE WHEN rc = 0 THEN 0.0
                 ELSE 0.5 * (CAST(rc AS DOUBLE) / CAST(rtot AS DOUBLE)) *
                   ln((CAST(rc AS DOUBLE) / CAST(rtot AS DOUBLE)) /
                      ((CASE WHEN map_contains_key(hist, k)
                         THEN CAST(hist[k] AS DOUBLE) ELSE 0.0 END / CAST(wtot AS DOUBLE) +
                        CAST(rc AS DOUBLE) / CAST(rtot AS DOUBLE)) / 2.0)) END
               ) * 1000000000.0, 0) AS BIGINT)),
             0L, (acc, x) -> acc + x)"""))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("wtot").as("n_tokens"),
        when(map_contains_key(col("hist"), lit(OovKey)),
          element_at(col("hist"), lit(OovKey))).otherwise(lit(0L)).as("n_oov"),
        col("jsd_nanonat"))
  }
}
