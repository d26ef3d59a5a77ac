package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the round-6 analytics/mining additions: the
  * integer-exact EWMA, the seeded-Laplace DP release, and best-of-n
  * rejection sampling.
  */
class AnalyticsR6Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("ts_ewma: independent trailing-window recount with the closed-form weights") {
    val rows = Registry.queries("ts_ewma")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("ewma_milli")))).toMap
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_no"))
      .groupBy(col("event_type"), col("day_no"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        r.getAs[Long]("cnt")).toMap
    val w = (0 to 11).map(k =>
      math.pow(3, k).toLong * math.pow(4, 11 - k).toLong)
    val norm = w.sum
    assert(norm === (math.pow(4, 12).toLong - math.pow(3, 12).toLong))
    // the output grid is min..max day per type, inclusive and gap-free
    daily.keys.groupBy(_._1).foreach { case (t, ks) =>
      val (d0, d1) = (ks.map(_._2).min, ks.map(_._2).max)
      (d0 to d1).foreach { d =>
        val (cnt, ewma) = rows((t, d))
        assert(cnt === daily.getOrElse((t, d), 0L))
        val sw = (0 to 11).map { k =>
          daily.getOrElse((t, d - k), 0L) * w(k)
        }.sum
        assert(ewma === 1000L * sw / norm, s"($t, $d)")
      }
    }
    // every output row is on some grid (no rows outside min..max)
    assert(rows.size ===
      daily.keys.groupBy(_._1).map { case (_, ks) =>
        (ks.map(_._2).max - ks.map(_._2).min + 1L)
      }.sum)
  }

  test("privacy_dp_counts: suppression gate + seeded inverse-CDF noise recount") {
    val rows = Registry.queries("privacy_dp_counts")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        r.getAs[Long]("noisy_count")).toMap
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_no"))
      .groupBy(col("event_type"), col("day_no"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        r.getAs[Long]("c")).toMap
    // exactly the cells with true count >= 10 are released
    assert(rows.keySet === cells.filter(_._2 >= 10L).keySet)
    var sumAbsNoise = 0.0
    rows.foreach { case ((t, d), noisy) =>
      val c = cells((t, d))
      val u16 = java.lang.Long.parseLong(md5Hex(s"$t|$d").take(4), 16)
      val u2 = (u16 + 0.5) / 65536.0 - 0.5
      val noise = -20.0 * (if (u2 >= 0) 1.0 else -1.0) *
        math.log(1.0 - 2.0 * math.abs(u2))
      val noiseInt = BigDecimal(noise)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(noisy === c + noiseInt, s"cell ($t, $d)")
      sumAbsNoise += math.abs(noiseInt.toDouble)
    }
    // Laplace(b): E|noise| = b = 20; over the released cells the mean
    // must be in a generous band (the seeding preserves the shape)
    val meanAbs = sumAbsNoise / rows.size
    assert(meanAbs > 5.0 && meanAbs < 60.0, s"mean |noise| = $meanAbs")
  }

  test("resample_interpolate: exact linear recount; gaps actually exercised") {
    val rows = Registry.queries("resample_interpolate")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        ((r.getAs[Boolean]("interpolated"), r.getAs[Long]("val_milli")))).toMap
    assert(rows.nonEmpty)
    assert(rows.values.count(_._1) > 10, "sparse series must have gaps")
    val daily = Tables.events(spark, sfDir)
      .where(col("user_id") % 199L === 0L &&
        col("value").isNotNull && col("value") >= 0.0)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_no"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      .groupBy(col("event_type"), col("day_no"))
      .agg(sum(col("vc")).as("c")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_no")) ->
        r.getAs[Long]("c")).toMap
    daily.keys.groupBy(_._1).foreach { case (t, ks) =>
      val known = ks.map(_._2).toSeq.sorted
      (known.min to known.max).foreach { d =>
        val (interp, got) = rows((t, d))
        daily.get((t, d)) match {
          case Some(c) =>
            assert(!interp && got === c * 1000L, s"known ($t, $d)")
          case None =>
            val pd = known.filter(_ < d).max
            val nd = known.filter(_ > d).min
            val (pc, nc) = (daily((t, pd)), daily((t, nd)))
            val exp = (pc * (nd - d) + nc * (d - pd)) * 1000L / (nd - pd)
            assert(interp && got === exp, s"gap ($t, $d)")
        }
      }
    }
  }

  test("mine_rejection_sampling: per-bundle best-of-n recount") {
    val rows = Registry.queries("mine_rejection_sampling")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("prompt_id") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pass"),
          r.getAs[Long]("chosen_doc_id"), r.getAs[Long]("chosen_score"))))
      .toMap
    assert(rows.nonEmpty)
    val T = 1400000L
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map { r =>
        val text = Option(r.getAs[String]("text")).getOrElse("")
        val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        val lex = if (toks.isEmpty) 0L
          else 1000000L * toks.distinct.length / toks.length
        val nChars = r.getAs[Long]("n_chars")
        val alpha = if (nChars == 0L) 0L
          else 1000000L * text.count(c =>
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) / nChars
        (r.getAs[Long]("doc_id"), lex + alpha)
      }
    val expected = docs.groupBy(_._1 / 8).flatMap { case (p, ds) =>
      val pass = ds.filter(_._2 >= T)
      if (pass.isEmpty) None
      else {
        val best = pass.minBy { case (id, sc) => (-sc, id) }
        Some(p -> ((ds.length.toLong, pass.length.toLong, best._1, best._2)))
      }
    }
    assert(rows === expected)
    // selectivity is real on this corpus: some bundles reject members,
    // and acceptance is strictly between 0 and 1 at the doc level
    val (nTot, nPass) = (rows.values.map(_._1).sum, rows.values.map(_._2).sum)
    assert(nPass < nTot)
    rows.values.foreach { case (n, np, _, sc) =>
      assert(np >= 1L && np <= n && sc >= T)
    }
  }
}
