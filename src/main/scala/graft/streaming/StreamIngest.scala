package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ingest.NdjsonReader

/** T1-T4 — the reference's cron-driven incremental micro-batch pipeline as
  * Structured Streaming:
  *
  *  - lock file + cron  → `Trigger.AvailableNow` (one-shot drain) or
  *    `ProcessingTime` (continuous cadence); Spark owns concurrency
  *  - `var/last-read-file` watermark → the checkpoint dir (exactly-once
  *    file-source progress, crash-safe — the reference's rollback dance
  *    `/root/reference/src/KissmetricsToDatabase.php:742-745` disappears)
  *  - in-order file processing → `latestFirst=false` (default) file source
  *  - per-file transaction → `foreachBatch` writer (batch = atomic unit)
  *
  * All row-level logic is shared with the batch path (NdjsonReader.events):
  * one transform definition, two execution modes.
  */
object StreamIngest {

  /** Checkpointed NDJSON file source over a revisions directory. */
  def readLines(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .format("text")
      .option("pathGlobFilter", "*.json")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.load(dir)
      .toDF("line")
      .withColumn("file", input_file_name())
      .withColumn("file_no", NdjsonReader.fileNo(col("file")))
      .filter(length(trim(col("line"))) > 0)
  }

  /** Typed event stream (same columns as the batch reader). */
  def readEvents(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame =
    NdjsonReader.events(readLines(spark, dir, maxFilesPerTrigger))

  /** Drain-everything-then-stop ingest into parquet — the reference's
    * whole `process-files` command. Restart with the same checkpoint only
    * processes new files (O3).
    *
    * The built-in parquet STREAMING sink, not a foreachBatch append: the
    * sink's `_spark_metadata` commit log records each batch's files
    * atomically with the checkpoint, so a crash between data write and
    * checkpoint commit replays the batch into the SAME file set —
    * exactly-once landed rows. A blind `mode("append")` in foreachBatch
    * would duplicate the replayed batch; the JDBC-shaped variant of this
    * pipeline gets the same guarantee from the md5hash-idempotent sink
    * instead (`StreamPipeline.drain`).
    */
  def ingestAvailableNow(spark: SparkSession, inDir: String, outDir: String,
                         checkpointDir: String): StreamingQuery =
    readEvents(spark, inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Event-time windowed counts with a late-data watermark — the gap the
    * reference never had (SURVEY.md §2 "not present" row). 10-min tumbling
    * windows per event name, 30-min lateness bound.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("n_not_null").as("name"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("name"), col("cnt"))

  def runWindowedCounts(events: DataFrame, outDir: String,
                        checkpointDir: String): StreamingQuery =
    windowedCounts(events)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .start()
}
