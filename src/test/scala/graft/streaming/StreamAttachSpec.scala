package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.sim.SimQueries

/** Stream ≡ batch equivalence for the ANN-insert speed layer: the
  * md5-selected delta batch of the sf corpus, streamed in two
  * micro-batches through [[StreamAttach]] against the SAME base index
  * the batch twin serves, must emit exactly
  * `SimQueries.attachEdges`' rows — per-query search is independent,
  * so batch boundaries must never show in the answer.
  */
class StreamAttachSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Byte(s: String): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    "0123456789abcdef".indexOf(h(0)) * 16 + "0123456789abcdef".indexOf(h(1))
  }

  test("streamed micro-batches emit exactly the batch twin's attach edges") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    SimQueries.descentInvalidate()

    // the batch twin's answer + the session base index it was served by
    val expected = SimQueries.attachEdges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"), r.getAs[Long]("rk"))).toSet
    assert(expected.nonEmpty)
    val (_, adj, codes) = SimQueries.baseIndexBuild(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val newPred = expr(
      s"(${graft.queries.PortableHash.md5Byte("CAST(vec_id AS STRING)")}) < 26")
    val vecs = emb.where(not(newPred))
      .select(col("vec_id"), col("embedding"),
        expr("dot_ordered(embedding, embedding)").as("norm2"))

    // the delta batch arrives as TWO micro-batches (split by parity)
    val delta = emb.where(newPred)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    assert(delta.length >= 2, "fixture too small for a two-batch split")
    val (b1, b2) = delta.partition(_._1 % 2 == 0)

    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, Long)]
    val source = MemoryStream[(Long, Seq[Float])]
    val q = StreamAttach.attach(
      source.toDF().toDF("vec_id", "embedding"), vecs, adj, codes) {
      (out, _) =>
        out.collect().foreach(r => got.add((r.getAs[Long]("q_id"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("cos"),
          r.getAs[Long]("rk"))))
    }
    try {
      source.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      val afterB1 = got.size()
      source.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      // both batches contributed (append mode, no cross-batch rescans)
      assert(afterB1 > 0 && got.size() > afterB1)

      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet === expected,
        "streamed attach edges diverge from the batch twin")
      // membership sanity: edges go delta → base
      got.asScala.foreach { case (qid, vid, _, rk) =>
        assert(md5Byte(qid.toString) < 26, s"$qid not a delta vector")
        assert(md5Byte(vid.toString) >= 26, s"$vid not a base vector")
        assert(rk >= 1 && rk <= 3)
      }
    } finally q.stop()
  }
}
