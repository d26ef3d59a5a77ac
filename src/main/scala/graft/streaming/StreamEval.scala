package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming model-quality monitor — the continuous twin of the batch
  * `eval_langid_confusion` query: per event-time window, the (true,
  * predicted) confusion cells of the langid gate, emitted as the window
  * closes. The production question is "did the classifier's accuracy
  * fall on today's crawl" answered WHILE the crawl lands — model
  * monitoring as a streaming query, the same shape every deployed
  * pipeline gate (quality, code-detect, PII) is watched with.
  *
  * Bounded state by construction: both axes of the confusion matrix are
  * CLASS-valued (5 langid outcomes), so a window holds ≤ 25 counter
  * cells no matter how many documents stream past — the same
  * bounded-before-aggregation argument as StreamDrift's OOV collapse,
  * with no sketch needed. One watermarked windowed count in append
  * mode; prediction is pure per-row codegen math riding the stream.
  *
  * `confusion` works identically on a batch frame (`withWatermark` is a
  * no-op outside streaming; `window()` groups the same) — one
  * definition for both engines, pinned by StreamEvalSpec's
  * stream ≡ batch case.
  */
object StreamEval {

  /** Marker-count langid prediction — the `text_langid` scoring chain
    * (graft.text.TextQueries) applied per row: occurrences of each
    * language's marker token by exact integer length arithmetic, argmax
    * through the fixed en > de > es > fr priority ladder. */
  def predictions(docs: DataFrame): DataFrame =
    graft.text.LangId.withScores(docs)
      .withColumn("lang_pred", graft.text.LangId.ladder)
      .drop("s_en", "s_de", "s_es", "s_fr")

  /** Per-window confusion cells for the langid gate.
    *
    * @param docs     (ts: timestamp, lang: string, text: string) —
    *                 streaming or batch; `lang` is the labeled truth
    * @param windowDur event-time window, e.g. "1 hour"
    * @param lateness max out-of-order delay; bounds window state
    */
  def confusion(docs: DataFrame,
                windowDur: String = "1 hour",
                lateness: String = "10 minutes"): DataFrame =
    predictions(docs)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur), col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("lang"), col("lang_pred"), col("n"),
        (col("lang") === col("lang_pred")).as("correct"))
}
