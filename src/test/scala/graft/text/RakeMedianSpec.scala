package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Brute-force twins for the round-6 RAKE keyword extractor and the
  * rolling exact-median window.
  */
class RakeMedianSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val Stop = Set("the", "a", "of", "and", "to")

  test("text_rake_keywords: full per-doc recount of phrases, scores, and ranks") {
    val rows = Registry.queries("text_rake_keywords")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("phrase"),
        r.getAs[Long]("n_occ"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("rk")))
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse(""))
    // candidate phrases: maximal stopword-free runs, length <= 4
    def phrases(text: String): Seq[Seq[String]] = {
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
      val runs = Seq.newBuilder[Seq[String]]
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (Stop(t)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) runs += cur
      runs.result().filter(_.length <= 4)
    }
    val allPhrases = docs.flatMap { case (id, t) => phrases(t).map(id -> _) }
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val degree = scala.collection.mutable.Map.empty[String, Long]
    allPhrases.foreach { case (_, ws) =>
      ws.foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1L
        degree(w) = degree.getOrElse(w, 0L) + ws.length.toLong
      }
    }
    def q(w: String): Long = degree(w) * 1000000L / freq(w)
    val expected = allPhrases
      .groupBy { case (id, ws) => (id, ws.mkString(" ")) }
      .map { case ((id, p), occ) =>
        (id, p, occ.length.toLong, occ.head._2.map(q).sum)
      }.toSeq
      .groupBy(_._1)
      .flatMap { case (_, ps) =>
        ps.sortBy { case (_, p, _, sc) => (-sc, p) }.take(3).zipWithIndex
          .map { case ((id, p, n, sc), i) => (id, p, n, sc, i + 1L) }
      }.toSet
    assert(rows.toSet === expected)
  }

  test("window_rolling_median: per-user trailing-7-row recount") {
    val rows = Registry.queries("window_rolling_median")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_win"), r.getAs[Long]("med_cents"),
          r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents")))).toMap
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .where(col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[Long]("vc")))
    ev.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4)
        val sorted = frame.sorted
        val expectMed = sorted((frame.length + 1) / 2 - 1)
        val got = rows(ordered(i)._3)
        assert(got === ((frame.length.toLong, expectMed,
          frame.min, frame.max)), s"event ${ordered(i)._3}")
      }
    }
  }
}
