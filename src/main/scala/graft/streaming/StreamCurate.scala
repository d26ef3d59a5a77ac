package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming corpus curation: the quality-gate → language-ID → PII-scrub
  * chain running continuously over a document stream — "clean today's
  * crawl as it lands" instead of batch-recleaning the lake.
  *
  * The transform is ONE definition shared by batch and streaming (the
  * same contract the ingest path keeps for events): every step is pure
  * per-row column math — native `word_ngrams` token counts, marker-count
  * language-ID, `regexp_replace` redaction — so it runs in append mode
  * with NO streaming state, no watermark, and no shuffle; the only
  * streaming machinery is the checkpointed file source
  * (`Trigger.AvailableNow` = the cron drain). StreamCurateSpec pins
  * stream ≡ batch output equality and checkpoint-resume idempotence.
  */
object StreamCurate {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Per-row curation: works identically on a batch or streaming frame. */
  def curate(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    graft.text.LangId.withScores(
      df.withColumn("n_tokens",
        size(expr("word_ngrams(text, 1, false)")).cast("long")))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") >= 20 && length(col("text")) >= 100).as("quality_ok"),
        graft.text.LangId.ladder.as("lang_pred"),
        regexp_replace(
          regexp_replace(col("text"), "[a-z0-9]+@[a-z.]+[a-z]", "<EMAIL>"),
          "[+]1-555-[0-9]{4}", "<PHONE>").as("scrubbed"))
  }

  /** Drain `srcDir` (parquet document files) through the curation chain
    * into `outDir`, keeping only quality-passing rows; the checkpoint
    * carries the processed-file watermark across restarts.
    */
  def curateAvailableNow(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    curate(spark.readStream.schema(docSchema).parquet(srcDir))
      .where(col("quality_ok"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
}
