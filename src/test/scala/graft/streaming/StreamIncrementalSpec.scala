package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.dedup.DedupQueries
import graft.queries.Tables

class StreamIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("streamed docs flag every true LSH collision with the static corpus") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val corpus = docs.where(col("doc_id") % 5 =!= 0)
    val incoming = docs.where(col("doc_id") % 5 === 0)
    val corpusBands =
      DedupQueries.stackBands(DedupQueries.minhashSignatures(corpus))

    val source = MemoryStream[(Long, String)]
    val out = StreamIncremental.flagAgainstCorpus(
      source.toDF().toDF("doc_id", "text"), corpusBands)
    val q = out.writeStream
      .format("memory").queryName("stream_incr")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val batch = incoming.as[(Long, String)].collect()
      source.addData(batch.toIndexedSeq: _*)
      q.processAllAvailable()

      val flagged = spark.table("stream_incr")
        .where(col("maybe_dup") === 1)
        .select("doc_id").as[Long].collect().toSet
      val exact = DedupQueries.stackBands(DedupQueries.minhashSignatures(incoming))
        .join(corpusBands.select("band_hash"), "band_hash")
        .select("doc_id").distinct().as[Long].collect().toSet

      assert(spark.table("stream_incr").count() == batch.length)
      // bloom guarantee: no false negatives — every true collision flagged
      assert(exact.subsetOf(flagged),
        s"missed true dups: ${(exact -- flagged).take(5)}")
      // false positives bounded by fpp (deterministic fixed-seed filter;
      // generous ceiling so the pin is about the guarantee, not luck)
      val fp = flagged -- exact
      assert(fp.size <= math.max(2, batch.length / 10),
        s"false-positive flood: ${fp.size} of ${batch.length}")
    } finally q.stop()
  }
}
