package graft.queries

import graft.SparkSpec

/** Brute-force twins: Gini/top-decile from a literal all-pairs recompute,
  * and VAD segments re-derived from the sibling windowed-energy query. */
class ConcentrationVadSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("events_concentration matches all-pairs Gini and a sorted decile walk") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("user_id")).count()
      .collect().map(_.getAs[Long]("count"))
    val n = counts.length.toLong
    val total = counts.sum
    val giniNum = (for (a <- counts; b <- counts) yield math.abs(a - b)).sum
    val q = n / 10
    val topdEvents = counts.sorted.reverse.take(q.toInt).sum
    val r = Registry.queries("events_concentration")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_users") === n)
    assert(r.getAs[Long]("total_events") === total)
    assert(r.getAs[Long]("gini_num") === giniNum)
    assert(r.getAs[Long]("gini_den") === 2 * n * total)
    assert(r.getAs[Long]("topd_users") === q)
    assert(r.getAs[Long]("topd_events") === topdEvents)
    assert(r.getAs[Long]("topd_share_ppm") === topdEvents * 1000000L / total)
    // a top decile can never hold less than its proportional share
    assert(r.getAs[Long]("topd_share_ppm") >= 100000L * q * 10 / n)
  }

  test("multimodal_vad_segments agrees with runs over the windowed-energy output") {
    val flags = Registry.queries("multimodal_audio_energy")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("win"),
        r.getAs[Boolean]("active")))
      .groupBy(_._1)
      .map { case (d, ws) => d -> ws.sortBy(_._2).map(_._3).toSeq }
    val got = Registry.queries("multimodal_vad_segments")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_segments"),
          r.getAs[Long]("longest_segment")))).toMap
    assert(got.keySet === flags.keySet)
    flags.foreach { case (d, act) =>
      val runs = act.foldLeft(Vector.empty[Long]) { (acc, a) =>
        if (!a) acc :+ 0L
        else if (acc.isEmpty || acc.last == 0L) acc :+ 1L
        else acc.init :+ (acc.last + 1L)
      }.filter(_ > 0L)
      assert(got(d) === ((act.count(identity).toLong, runs.size.toLong,
        if (runs.isEmpty) 0L else runs.max)), s"doc=$d")
    }
  }
}
