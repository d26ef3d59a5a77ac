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

  /** Streamed grow→compact→grow (VERDICT r09 task 5): an attach-edge
    * threshold triggers the shipped graphCompact between micro-batches,
    * the serving snapshot re-persists, and POST-compaction batches
    * route over the compacted adjacency — provably, because batch 3's
    * vectors are near-duplicates of batch 1's and can only be answered
    * WITH batch-1 ids once those folded in. The degree bound holds at
    * every compaction.
    */
  test("attachCompacting: threshold-triggered compaction, deg ≤ 6, post-compaction routing") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(19)
    def vec(center: Array[Double], noise: Double): Seq[Float] =
      center.map(x => (x + noise * rnd.nextGaussian()).toFloat).toSeq
    val centers = Array.fill(30)(Array.fill(64)(rnd.nextGaussian()))
    val baseRows = (0 until 240).map(i => (i.toLong, vec(centers(i % 30), 0.3)))
    val b1 = (0 until 10).map(i => (1000L + i, vec(centers(0), 0.25)))
    val b2 = (0 until 10).map(i => (2000L + i, vec(centers(1), 0.25)))
    // batch 3 = near-duplicates of batch 1: their true nearest neighbors
    // ARE the batch-1 twins (cos ≈ 1), answerable only post-compaction
    val b3 = b1.map { case (id, e) =>
      (id + 2000L, e.map(x => x + 1e-4f * rnd.nextGaussian().toFloat)) }

    import spark.implicits._
    val base = baseRows.toDF("vec_id", "embedding")
      .localCheckpoint(eager = true)
    val r1 = SimQueries.knnDescentTopK(
      SimQueries.knnDescentCandidates(SimQueries.knnDescentSeed(base)), base)
      .localCheckpoint(eager = true)
    val adj = SimQueries.cappedUnd(r1).localCheckpoint(eager = true)
    val codes = SimQueries.forestCodes(base).localCheckpoint(eager = true)
    val vecs = base.select(col("vec_id"), col("embedding"),
      expr("dot_ordered(embedding, embedding)").as("norm2"))
      .localCheckpoint(eager = true)

    val perBatch = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
    val degAtCompact = scala.collection.mutable.ArrayBuffer.empty[Long]
    val snapDir = java.nio.file.Files.createTempDirectory("graft-attach-snap").toString
    val source = MemoryStream[(Long, Seq[Float])]
    // batches 1+2 emit ~60 attach edges ≥ the 40 threshold → exactly one
    // compaction fires between batch 2 and batch 3
    val q = StreamAttach.attachCompacting(
      source.toDF().toDF("vec_id", "embedding"), vecs, adj, codes, r1,
      maxAttach = 40L, snapshotDir = Some(snapDir))(
      sink = (out, id) => perBatch(id) = out.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet,
      onCompact = (adjNew, _) => degAtCompact +=
        adjNew.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
          .agg(max(col("deg"))).collect()(0).getLong(0))
    try {
      source.addData(b1: _*); q.processAllAvailable()
      assert(degAtCompact.isEmpty, "compaction fired below the threshold")
      source.addData(b2: _*); q.processAllAvailable()
      assert(degAtCompact.size == 1, "batch 2 should have crossed the threshold")
      source.addData(b3: _*); q.processAllAvailable()
      assert(degAtCompact.size == 1, "batch 3 alone re-crossed the threshold")

      // serving degree bound holds at the compaction point
      assert(degAtCompact.forall(_ <= 6L), s"deg after compact: $degAtCompact")
      // PRE-compaction batches attach only to the base index
      (perBatch(0) ++ perBatch(1)).foreach { case (_, v) =>
        assert(v < 240L, s"pre-compaction batch answered with streamed id $v")
      }
      // POST-compaction: the near-duplicate batch must find its batch-1
      // twins — only reachable through the re-persisted snapshot
      val b3hits = perBatch(2)
      assert(b3hits.nonEmpty)
      val twinHits = b3hits.count { case (q3, v) => v == q3 - 2000L }
      assert(twinHits >= 8,
        s"only $twinHits/10 near-duplicates found their streamed twin post-compaction")
      // the recoverable snapshot landed
      assert(new java.io.File(s"$snapDir/compact_1/adj").exists(),
        "compaction did not re-persist the serving snapshot")
    } finally q.stop()
  }
}
