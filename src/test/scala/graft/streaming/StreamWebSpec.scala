package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class StreamWebSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("stream web curation equals the batch transform; resume adds nothing") {
    val in = tmp("web-in")
    val out = tmp("web-out")
    val ckpt = tmp("web-ckpt")

    // stage the deterministic "fetched pages" frame as the incoming crawl
    val pages = graft.WebPipeline.fetched(spark, "/root/testdata/sf0.001")
      .select("doc_id", "raw", "html")
    pages.write.parquet(in + "/crawl1")

    StreamWeb.curateAvailableNow(spark, in + "/crawl1", out, ckpt)
      .awaitTermination()

    val streamed = spark.read.parquet(out)
      .select("doc_id", "url_norm", "domain", "content")
      .collect().map(_.toSeq).toSet
    val batch = StreamWeb.curate(pages)
      .select("doc_id", "url_norm", "domain", "content")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "stream output diverged from the batch transform")
    assert(streamed.nonEmpty, "gates rejected everything")
    // blocklist gate held in the streaming plan too
    assert(!streamed.exists(_.toString.contains("src3.example.com")))

    // NB: refetch duplicates share (doc_id, url_norm, content), so the SET
    // above collapses them — resume idempotence compares raw row counts
    val afterFirstDrain = spark.read.parquet(out).count()
    StreamWeb.curateAvailableNow(spark, in + "/crawl1", out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() == afterFirstDrain,
      "checkpoint resume reprocessed already-drained files")
  }
}
