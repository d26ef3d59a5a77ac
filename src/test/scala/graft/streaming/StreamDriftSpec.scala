package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("reference model is the bounded top-V by count") {
    val ref = StreamDrift.referenceModel(Seq("aa aa bb", "aa cc").toDF("text"), 2)
    assert(ref.size == 2)
    assert(ref.values.toSeq.sorted == Seq(1L, 3L)) // aa:3 + one of bb/cc
  }

  test("per-window JSD: zero on matching distribution, positive on shift; stream ≡ batch") {
    // reference distribution: aa 2/3, bb 1/3
    val ref = StreamDrift.referenceModel(Seq("aa aa bb").toDF("text"), 10)
    assert(ref.size == 2)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamDrift.drift(source.toDF().toDF("ts", "text"), ref,
      windowDur = "10 minutes", lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      // window [10:00, 10:10): exactly the reference mixture → JSD must be 0
      source.addData((ts(1), "aa aa bb"), (ts(2), "aa aa bb"))
      // window [10:20, 10:30): skewed toward bb, plus an OOV token
      source.addData((ts(21), "bb bb bb zz"))
      // sentinel far ahead — the watermark passes both windows, they emit
      source.addData((ts(59), "aa"))
      q.processAllAvailable()

      val rows = spark.table("drift_out").orderBy("window_start").collect()
      assert(rows.length == 2, s"expected 2 closed windows, got ${rows.length}")
      val (w1, w2) = (rows(0), rows(1))
      assert(w1.getAs[Long]("n_tokens") == 6L)
      assert(w1.getAs[Long]("n_oov") == 0L)
      assert(w1.getAs[Long]("jsd_nanonat") == 0L,
        s"matching distribution must score 0, got ${w1.getAs[Long]("jsd_nanonat")}")
      assert(w2.getAs[Long]("n_tokens") == 4L)
      assert(w2.getAs[Long]("n_oov") == 1L)
      assert(w2.getAs[Long]("jsd_nanonat") > 0L, "shifted window must score > 0")

      // one definition, both engines: the same rows through the same
      // function as a BATCH frame yield identical windows
      val batch = StreamDrift.drift(
        Seq((ts(1), "aa aa bb"), (ts(2), "aa aa bb"), (ts(21), "bb bb bb zz"))
          .toDF("ts", "text"),
        ref, "10 minutes", "5 minutes").orderBy("window_start").collect()
      assert(batch.length == 2)
      assert(batch(0).getAs[Long]("jsd_nanonat") == w1.getAs[Long]("jsd_nanonat"))
      assert(batch(1).getAs[Long]("jsd_nanonat") == w2.getAs[Long]("jsd_nanonat"))
    } finally q.stop()
  }

  test("OOV collapsing bounds the histogram no matter the stream vocabulary") {
    val ref = StreamDrift.referenceModel(Seq("aa bb").toDF("text"), 2)
    val docs = (1 to 100).map(i => (ts(1), s"tok$i")).toDF("ts", "text")
    val r = StreamDrift.drift(docs, ref, "10 minutes").collect()
    assert(r.length == 1)
    // 100 distinct unknown tokens → ONE bucket; state is |vocab|+1, not 100
    assert(r(0).getAs[Long]("n_oov") == 100L)
    assert(r(0).getAs[Long]("n_tokens") == 100L)
  }
}
