package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamEvalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  test("per-window confusion cells close with the watermark; stream ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String, String)]
    val out = StreamEval.confusion(source.toDF().toDF("ts", "lang", "text"),
      windowDur = "10 minutes", lateness = "5 minutes")
    val q = out.writeStream.format("memory").queryName("eval_out")
      .outputMode("append").start()
    val rows1 = Seq(
      (ts(1), "en", "x the cat the y"),   // en predicted en — correct
      (ts(2), "de", "x der hund der y"),  // de predicted de — correct
      (ts(3), "de", "x the zug the y"))   // de predicted en — miss
    val rows2 = Seq(
      (ts(21), "fr", "x le chat y"),      // fr predicted fr — correct
      (ts(22), "es", "no markers here"))  // es predicted und — miss
    try {
      source.addData(rows1: _*)
      source.addData(rows2: _*)
      source.addData((ts(59), "en", " the ")) // sentinel closes both windows
      q.processAllAvailable()

      val got = spark.table("eval_out")
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[String]("lang"), r.getAs[String]("lang_pred"),
          r.getAs[Long]("n"), r.getAs[Boolean]("correct"))).toSet
      val w1 = ts(0); val w2 = ts(20)
      assert(got == Set(
        (w1, "en", "en", 1L, true),
        (w1, "de", "de", 1L, true),
        (w1, "de", "en", 1L, false),
        (w2, "fr", "fr", 1L, true),
        (w2, "es", "und", 1L, false)), got.toString)

      // one definition, both engines: the same rows as a BATCH frame
      val batch = StreamEval.confusion(
        (rows1 ++ rows2).toDF("ts", "lang", "text"),
        "10 minutes", "5 minutes")
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[String]("lang"), r.getAs[String]("lang_pred"),
          r.getAs[Long]("n"), r.getAs[Boolean]("correct"))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("confusion state is class-bounded: many docs, few cells") {
    val docs = (1 to 200).map(i =>
      (ts(1), if (i % 2 == 0) "en" else "de", "x the y the z"))
      .toDF("ts", "lang", "text")
    val r = StreamEval.confusion(docs, "10 minutes").collect()
    // 200 documents collapse to exactly 2 confusion cells
    assert(r.length == 2)
    assert(r.map(_.getAs[Long]("n")).sum == 200L)
  }

  test("prediction matches the batch text_langid query on the corpus") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.Registry.queries("text_langid")(spark, dir)
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val here = StreamEval.predictions(
      graft.queries.Tables.documents(spark, dir))
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(here == batch, "StreamEval.predictions diverged from text_langid")
  }
}
