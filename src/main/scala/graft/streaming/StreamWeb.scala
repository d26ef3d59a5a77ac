package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.text.WebQueries

/** Streaming crawl-side curation: URL canonicalization → blocklist gate →
  * HTML extraction → boilerplate gate, running continuously over fetched
  * pages as they land — the stream twin of [[graft.WebPipeline]] under
  * the StreamCurate discipline: ONE transform definition shared by batch
  * and streaming, every stage pure per-row column math or a
  * stream-static BROADCAST join (the blocklist is a static frame — Spark
  * plans stream-static joins stateless, so there is no watermark and no
  * state store anywhere in this chain).
  *
  * Page-level URL dedup is deliberately NOT here: a streaming distinct
  * carries unbounded state; the production chain runs this stage's output
  * through [[StreamDedup]]'s watermarked `dropDuplicatesWithinWatermark`
  * keyed on `url_norm` — bounded state, the same answer inside the
  * watermark horizon.
  */
object StreamWeb {

  val pageSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("raw", StringType),
    StructField("html", StringType)))

  /** Per-row curation chain: works identically on a batch or streaming
    * frame (the transforms are the oracle-checked WebQueries stages). */
  def curate(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val blocked = WebQueries.blockedHosts.toDF("host")
    val gated = WebQueries.normalizeUrls(df)
      .join(broadcast(blocked), Seq("host"), "left_anti")
    WebQueries.gateBoilerplate(gated)
  }

  /** Drain `srcDir` (parquet page files) through the curation chain into
    * `outDir`; the checkpoint carries the processed-file watermark. */
  def curateAvailableNow(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    curate(spark.readStream.schema(pageSchema).parquet(srcDir))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
}
