package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables
import graft.text.WebQueries

/** End-to-end invariants for the crawl-side pipeline: the canonicalizer
  * must collapse the injected refetch duplicates, the blocklist gate must
  * be complete, stages must be monotone, and a rerun must be bit-stable.
  */
class WebPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("refetch duplicates collapse onto one canonical URL") {
    val c = WebPipeline.curated(spark, sfDir)
    // every surviving page has a unique canonical URL
    assert(c.groupBy(col("url_norm")).count().where(col("count") > 1).count() == 0)
    // the refetched pages (doc_id % 10 == 0, unblocked) survive exactly once
    val refetchSurvivors = c.where(col("doc_id") % 10 === 0).count()
    val refetchEligible = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 10 === 0)
      .where(not(concat(lit("news."), col("source"), lit(".example.com"))
        .isin(WebQueries.blockedHosts: _*)))
      .count()
    assert(refetchSurvivors <= refetchEligible)
    assert(refetchSurvivors > 0, "canonicalizer dropped all refetched pages")
  }

  test("blocklist gate is complete and stages are monotone") {
    val c = WebPipeline.curated(spark, sfDir).localCheckpoint(true)
    val hosts = c.select(col("host")).distinct().collect().map(_.getString(0))
    WebQueries.blockedHosts.foreach { h =>
      assert(!hosts.contains(h), s"blocked host $h survived the gate") }
    val fetched = WebPipeline.fetched(spark, sfDir).count()
    assert(c.count() <= fetched)
    // extraction gate works: no surviving page keeps tags or nav boilerplate
    assert(c.where(col("content").contains("<")).count() == 0)
    assert(c.where(col("content").contains("Home")).count() == 0)
    assert(c.where(col("content_len") < 100).count() == 0)
    assert(c.where(col("link_density_ppm") > 300000).count() == 0)
  }

  test("rerun is deterministic (same rows, same content hashes)") {
    def fingerprint() = WebPipeline.curated(spark, sfDir)
      .agg(count(lit(1)), bit_xor(xxhash64(col("doc_id"), col("url_norm"),
        md5(col("content"))))).collect()(0).toSeq
    assert(fingerprint() == fingerprint())
  }
}
