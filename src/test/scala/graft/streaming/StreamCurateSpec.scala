package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamCurateSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("stream curation equals the batch transform; checkpoint resume adds nothing") {
    val in = tmp("curate-in")
    val out = tmp("curate-out")
    val ckpt = tmp("curate-ckpt")

    // stage the real corpus as the "incoming crawl"
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(in + "/batch1")

    StreamCurate.curateAvailableNow(spark, in + "/batch1", out, ckpt)
      .awaitTermination()

    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_tokens", "lang_pred", "scrubbed")
      .collect().map(_.toSeq).toSet
    val batch = StreamCurate.curate(docs).where(col("quality_ok"))
      .select("doc_id", "n_tokens", "lang_pred", "scrubbed")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "stream output diverged from the batch transform")
    assert(streamed.nonEmpty, "quality gate rejected everything")

    // restart with nothing new: the checkpoint's processed-file watermark
    // must keep the output exactly as it was
    StreamCurate.curateAvailableNow(spark, in + "/batch1", out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() == streamed.size,
      "checkpoint resume reprocessed already-drained files")
  }
}
