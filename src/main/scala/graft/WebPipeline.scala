package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.text.WebQueries

/** End-to-end crawl-side curation — the stage a data team runs BEFORE
  * [[CurationPipeline]]'s text passes, composed from the oracle-checked
  * web operators as one main:
  *
  *   fetched pages (url + html) → URL canonicalization
  *                              → domain blocklist gate (broadcast anti-join)
  *                              → page-level dedup on the canonical URL
  *                                (tracking params / fragments / host case
  *                                can no longer split one page into many)
  *                              → HTML main-content extraction
  *                              → boilerplate gate (link density + length)
  *
  * Output is the (url_norm, domain, content) frame CurationPipeline-style
  * text curation starts from. Every stage is per-row column math or a
  * broadcast anti-join — at 100 TB nothing shuffles except the URL-dedup
  * aggregate, which ships (url_norm, doc_id) pairs, never page bytes.
  * The fetched frame derives url/html deterministically from the corpus
  * (the WebQueries injection discipline), so the whole run is
  * reproducible; WebPipelineSpec pins gate completeness, dedup
  * idempotence, and stage monotonicity.
  */
object WebPipeline {

  final case class Counts(
      fetched: Long, allowed: Long, urlDeduped: Long, extracted: Long)

  /** The deterministic "fetched page" frame: one row per crawl record
    * with its raw URL and raw HTML. To exercise the URL-dedup stage, every
    * doc_id ≡ 0 (mod 10) page is fetched a second time under a
    * tracking-param variant of the same URL — the crawl-frontier
    * duplicate the canonicalizer exists to collapse. */
  def fetched(spark: SparkSession, srcDir: String): DataFrame = {
    val base = Tables.documents(spark, srcDir)
      .withColumn("raw", expr(WebQueries.rawUrlSql("doc_id", "source")))
      .withColumn("html", expr(WebQueries.htmlSql("STRING")))
    val refetch = base.where(col("doc_id") % 10 === 0)
      .withColumn("raw", concat(col("raw"), lit("&utm_campaign=refetch")))
    base.unionAll(refetch)
  }

  /** The curated crawl frame: canonicalized, gated, deduped, extracted. */
  def curated(spark: SparkSession, srcDir: String): DataFrame = {
    import spark.implicits._
    val blocked = WebQueries.blockedHosts.toDF("host")
    val normalized = WebQueries.normalizeUrls(fetched(spark, srcDir))
    val allowed = normalized.join(broadcast(blocked), Seq("host"), "left_anti")
    // page-level dedup: one fetch survives per canonical URL (min doc_id,
    // deterministic); the aggregate ships (url_norm, doc_id) only
    val canonical = allowed
      .groupBy(col("url_norm"))
      .agg(min(col("doc_id")).as("doc_id"))
    val pages = canonical
      .join(allowed.select(col("doc_id"), col("host"), col("domain"),
        col("html")).dropDuplicates("doc_id"), "doc_id")
    WebQueries.gateBoilerplate(pages)
  }

  /** Run the pipeline, write parquet partitioned by domain-hash shard,
    * return per-stage counts for the run report. */
  def run(spark: SparkSession, srcDir: String, outDir: String): Counts = {
    import spark.implicits._
    val f = fetched(spark, srcDir)
    val blocked = WebQueries.blockedHosts.toDF("host")
    val allowed = WebQueries.normalizeUrls(f)
      .join(broadcast(blocked), Seq("host"), "left_anti")
    val urlDeduped = allowed.select(col("url_norm")).distinct().count()
    val out = curated(spark, srcDir)
      .withColumn("shard", expr(
        """CAST((instr('0123456789abcdef',
             substr(md5(url_norm), 32, 1)) - 1) % 8 AS BIGINT)"""))
      .localCheckpoint(eager = true) // one pass feeds write + count
    out.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    Counts(f.count(), allowed.count(), urlDeduped, out.count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WebPipeline <srcDir> <outDir>")
    val spark = SparkSession.builder()
      .appName("graft-web-curation")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val c = run(spark, args(0), args(1))
      println(s"""{"fetched":${c.fetched},"allowed":${c.allowed},""" +
        s""""url_deduped":${c.urlDeduped},"extracted":${c.extracted}}""")
    } finally spark.stop()
  }
}
