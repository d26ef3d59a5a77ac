package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The marker-count langid model — ONE definition for every consumer.
  *
  * `text_langid` is the oracle-checked batch definition; the streaming
  * twins (StreamEval's confusion monitor, StreamCurate's gate) and the
  * corpus-clean English gate apply the SAME scoring chain. Before this
  * object the score/ladder exprs were copy-pasted in four places — a
  * threshold or tie-rule tweak in one silently broke the pinned
  * stream ≡ batch equivalence of the others.
  *
  * Scoring: occurrences of each language's marker token by exact integer
  * length arithmetic ((len − len(without marker)) / marker_len — no
  * regex counting, no doubles); prediction is the argmax through the
  * fixed en > de > es > fr priority ladder, 'und' when no marker hits.
  */
object LangId {

  def score(marker: String): Column =
    ((length(col("text")) - length(regexp_replace(col("text"), marker, ""))) /
      marker.length).cast("long")

  /** Adds the s_en / s_de / s_es / s_fr marker-score columns. */
  def withScores(df: DataFrame): DataFrame =
    df.withColumn("s_en", score(" the "))
      .withColumn("s_de", score(" der "))
      .withColumn("s_es", score(" el "))
      .withColumn("s_fr", score(" le "))

  /** Fixed-priority argmax over the s_* columns added by [[withScores]]. */
  def ladder: Column =
    when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
      col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
      .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
        col("s_de") > 0, "de")
      .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
      .when(col("s_fr") > 0, "fr")
      .otherwise("und")
}
