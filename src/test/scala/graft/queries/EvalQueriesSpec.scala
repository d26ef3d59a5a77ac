package graft.queries

import graft.SparkSpec

/** Cross-checks for the model-evaluation family that the oracle hash gate
  * can't state: the histogram rank-sum AUC must equal the literal
  * all-pairs Mann-Whitney statistic, and the calibration table must
  * account for every scored document exactly once.
  */
class EvalQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("eval_auc_rank equals brute-force all-pairs AUC per lang") {
    val scored = EvalQueries.scoredDf(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket"),
        r.getAs[Long]("pos")))
    val got = Registry.queries("eval_auc_rank")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("auc_ppm"))
      .toMap
    assert(got.nonEmpty)
    scored.groupBy(_._1).foreach { case (lang, rows) =>
      val pos = rows.filter(_._3 == 1L).map(_._2)
      val neg = rows.filter(_._3 == 0L).map(_._2)
      val expected =
        if (pos.isEmpty || neg.isEmpty) -1L
        else {
          // num2 = twice the pair-win count, ties at weight 1
          val num2 = (for (p <- pos; n <- neg) yield {
            if (p > n) 2L else if (p == n) 1L else 0L
          }).sum
          math.floor(num2.toDouble * 1000000.0 /
            (2.0 * pos.length * neg.length)).toLong
        }
      assert(got(lang) === expected, s"lang=$lang")
    }
  }

  test("eval_calibration_bins partitions the corpus: counts and positives add up") {
    val scored = EvalQueries.scoredDf(spark, sfDir).collect()
    val bins = Registry.queries("eval_calibration_bins")(spark, sfDir).collect()
    assert(bins.map(_.getAs[Long]("n")).sum === scored.length.toLong)
    assert(bins.map(_.getAs[Long]("n_pos")).sum ===
      scored.count(_.getAs[Long]("pos") == 1L).toLong)
    bins.foreach { b =>
      val (bin, n, np) = (b.getAs[Long]("bin"), b.getAs[Long]("n"),
        b.getAs[Long]("n_pos"))
      assert(bin >= 0L && bin <= 9L)
      assert(np >= 0L && np <= n)
      assert(b.getAs[Long]("pos_rate_ppm") === np * 1000000L / n)
    }
  }

  test("eval_rate_ci: the Wilson interval brackets the rate and tightens with n") {
    val rows = Registry.queries("eval_rate_ci")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, np) = (r.getAs[Long]("n"), r.getAs[Long]("n_pass"))
      val (rate, lo, hi) = (r.getAs[Long]("rate_ppm"),
        r.getAs[Long]("wilson_lo_ppm"), r.getAs[Long]("wilson_hi_ppm"))
      assert(np >= 0L && np <= n)
      assert(lo <= rate && rate <= hi, s"interval [$lo,$hi] must bracket $rate")
      assert(lo >= 0L && hi <= 1000000L, "Wilson bounds stay inside [0,1]")
      // width sanity: a 95% interval over n samples is O(1/√n) — assert
      // the weaker closed-form bound width ≤ 2·(z/(2√n))/(1+z²/n) + 2ppm
      val maxW = 2.0 * (1.96 / (2.0 * math.sqrt(n.toDouble))) /
        (1.0 + 3.8416 / n) * 1e6 + 2
      assert((hi - lo).toDouble <= maxW, s"width ${hi - lo} > $maxW at n=$n")
    }
  }

  test("eval_pass_at_k equals an exact BigInt-binomial recount per bundle") {
    import org.apache.spark.sql.functions._
    // independent labels: the rule gate recomputed from raw text locally
    val labels = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map { r =>
        val nTok = Option(r.getAs[String]("text"))
          .map(_.toLowerCase.split("[^a-z]+").count(_.nonEmpty)).getOrElse(0)
        r.getAs[Long]("doc_id") ->
          (nTok >= 20 && r.getAs[Long]("n_chars") >= 100L)
      }
    def binom(m: Long, k: Long): BigInt =
      if (k > m) BigInt(0)
      else (0L until k).map(i => BigInt(m - i)).product /
        (1L to k).map(BigInt(_)).product
    val expected = labels.groupBy { case (id, _) => id / 50 }.flatMap {
      case (task, docs) =>
        val n = docs.length.toLong
        val np = docs.count(_._2).toLong
        Seq(1L, 5L, 10L).map { k =>
          val ppm =
            if (n < k) -1L
            else if (n - np < k) 1000000L
            else 1000000L - (binom(n - np, k) * 1000000 / binom(n, k)).toLong
          (task, k) -> (n, np, ppm)
        }
    }
    val got = Registry.queries("eval_pass_at_k")(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("task_id"), r.getAs[Long]("k"))
      val (n, np, ppm) = expected(key)
      assert(r.getAs[Long]("n") === n, s"$key n")
      assert(r.getAs[Long]("n_pass") === np, s"$key n_pass")
      assert(r.getAs[Long]("pass_ppm") === ppm, s"$key pass_ppm")
    }
    // monotonicity: for a fixed bundle with n ≥ 10, pass@1 ≤ pass@5 ≤ pass@10
    got.groupBy(_.getAs[Long]("task_id")).values
      .filter(_.forall(_.getAs[Long]("n") >= 10L)).foreach { rows =>
        val byK = rows.map(r => r.getAs[Long]("k") ->
          r.getAs[Long]("pass_ppm")).toMap
        assert(byK(1L) <= byK(5L) && byK(5L) <= byK(10L))
      }
  }

  test("eval_token_f1 equals a local bag-of-words recount on the live pairs") {
    import org.apache.spark.sql.functions._
    val rows = Registry.queries("eval_token_f1")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("text")))
      .toMap
    def bag(t: Option[String]): Map[String, Long] = t
      .map(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong })
      .getOrElse(Map.empty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (ba, bb) = (bag(docs(a)), bag(docs(b)))
      val m = ba.keysIterator
        .map(w => math.min(ba(w), bb.getOrElse(w, 0L))).sum
      val (ta, tb) = (ba.values.sum, bb.values.sum)
      assert(ta > 0 && tb > 0, s"($a,$b) empty side must have been dropped")
      assert(r.getAs[Long]("m") === m, s"($a,$b) m")
      assert(r.getAs[Long]("f1_ppm") === 2 * m * 1000000L / (ta + tb),
        s"($a,$b) f1")
      // F1 lies between precision and recall (harmonic-mean identity)
      val (p, rec) = (r.getAs[Long]("prec_ppm"), r.getAs[Long]("rec_ppm"))
      val f1 = r.getAs[Long]("f1_ppm")
      assert(f1 <= math.max(p, rec) + 1 && f1 >= math.min(p, rec) - 1)
    }
  }

  test("eval_distinct_n equals a local n-gram recount per (lang, n)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map(r => r.getAs[String]("lang") -> Option(r.getAs[String]("text")))
    def grams(t: Option[String], n: Int): Seq[String] = {
      val toks = t.map(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val expected = (for {
      n <- Seq(1, 2)
      (lang, rows) <- docs.groupBy(_._1)
    } yield {
      val all = rows.toSeq.flatMap { case (_, t) => grams(t, n) }
      (lang, n.toLong) -> (all.distinct.length.toLong, all.length.toLong)
    }).filter(_._2._2 > 0).toMap
    val got = Registry.queries("eval_distinct_n")(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[Long]("n"))
      val (d, t) = expected(key)
      assert(r.getAs[Long]("distinct_grams") === d, s"$key distinct")
      assert(r.getAs[Long]("total_grams") === t, s"$key total")
      assert(r.getAs[Long]("distinct_ppm") === d * 1000000L / t, s"$key ppm")
    }
  }

  test("eval_elo_bt: matrix rebuilt from raw docs, strengths re-solved, invariants hold") {
    import org.apache.spark.sql.functions._
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars")))
    // replay the pairing: md5 bucket, md5-shuffled rank, adjacent ranks play
    val matches = docs
      .groupBy { case (id, _, _) =>
        val h = md5hex(id.toString)
        "0123456789abcdef".indexOf(h(0)) * 16 + "0123456789abcdef".indexOf(h(1))
      }
      .values.flatMap { members =>
        members.toSeq
          .sortBy { case (id, _, _) => (md5hex(s"pair$id"), id) }
          .grouped(2).collect { case Seq(x, y) =>
            // winner: higher n_chars, tie -> lower doc_id
            val Seq(l, w) = Seq(x, y).sortBy(d => (d._3, -d._1))
            (w._2, l._2)
          }.filter { case (a, b) => a != b }
      }.toSeq
    val srcs = docs.map(_._2).distinct.sorted
    val realw = matches.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val mat = for (i <- srcs; j <- srcs if i != j) yield {
      val w = 1L + realw.getOrElse((i, j), 0L)
      val n = w + 1L + realw.getOrElse((j, i), 0L)
      (i, j, w, n)
    }
    val p = EvalQueries.btSolve(mat)
    val got = Registry.queries("eval_elo_bt")(spark, sfDir).collect()
    assert(got.length === srcs.length)
    got.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("p_ppm") === p(s), s"$s strength")
      assert(r.getAs[Long]("wins") ===
        matches.count(_._1 == s).toLong, s"$s wins")
      assert(r.getAs[Long]("games") ===
        matches.count(m => m._1 == s || m._2 == s).toLong, s"$s games")
    }
    // each match contributes one win and two game slots
    assert(got.map(_.getAs[Long]("wins")).sum === matches.length.toLong)
    assert(got.map(_.getAs[Long]("games")).sum === 2L * matches.length)
    // renormalization keeps sum(p) within a floor-loss of k * 1e6
    val psum = got.map(_.getAs[Long]("p_ppm")).sum
    assert(psum <= srcs.length * 1000000L &&
      psum > srcs.length * 1000000L - srcs.length, s"psum=$psum")
    assert(got.forall(_.getAs[Long]("p_ppm") > 0L))
  }

  test("eval_agreement: 2x2 cells, McNemar chi2, and Cohen's kappa recount") {
    import org.apache.spark.sql.functions._
    val rows = Registry.queries("eval_agreement")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("c"), r.getAs[Long]("d"),
          r.getAs[Long]("mcnemar_chi2_milli"), r.getAs[Long]("kappa_ppm"))))
      .toMap
    assert(rows.nonEmpty)
    def md5(sIn: String): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(sIn.getBytes("UTF-8"))
    def wMilli(term: String): Long = {
      val h = md5(term)
      val hex = "0123456789abcdef"
      val b0 = hex.indexOf(Character.forDigit((h(0) >> 4) & 0xF, 16)).toLong
      val b1 = hex.indexOf(Character.forDigit(h(0) & 0xF, 16)).toLong
      (b0 * 16 + b1) * 2654435761L % 2001L - 1000L
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map { r =>
        val toks = Option(r.getAs[String]("text")).getOrElse("")
          .toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
        val ka = toks.size >= 20 && r.getAs[Long]("n_chars") >= 100
        val kb = toks.map(wMilli).sum > 0L
        (r.getAs[String]("lang"), ka, kb, toks.nonEmpty)
      }
      .filter(_._4) // zero-token docs emit no judged row on either engine
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val n = ds.length.toLong
      val a = ds.count(x => x._2 && x._3).toLong
      val b = ds.count(x => x._2 && !x._3).toLong
      val c = ds.count(x => !x._2 && x._3).toLong
      val d = ds.count(x => !x._2 && !x._3).toLong
      val chi2 = if (b + c == 0) -1L else (b - c) * (b - c) * 1000L / (b + c)
      val pe = ((a + b) * (a + c) + (c + d) * (b + d)).toDouble
      val den = n.toDouble * n - pe
      val kappa = if (den == 0.0) -1L
        else math.floor((n.toDouble * (a + d) - pe) * 1e6 / den).toLong
      assert(rows(lang) === ((n, a, b, c, d, chi2, kappa)), s"lang=$lang")
    }
    // the sign-safe kappa path is exercised: worse-than-chance agreement
    // exists on this corpus
    assert(rows.values.exists(_._7 < 0L))
  }

  test("eval_bootstrap_ci: seeded-Poisson replica recount for one language") {
    import org.apache.spark.sql.functions._
    val rows = Registry.queries("eval_bootstrap_ci")(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pass"),
          r.getAs[Long]("rate_ppm"), r.getAs[Long]("n_reps"),
          r.getAs[Long]("boot_lo_ppm"), r.getAs[Long]("boot_hi_ppm")))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (n, np, rate, nReps, lo, hi) =>
      assert(nReps === 200L)
      assert(rate === np * 1000000L / n)
      assert(lo <= hi)
      // the 95% band must bracket the point estimate on any real stratum
      assert(lo <= rate && rate <= hi, s"band [$lo, $hi] misses $rate")
    }
    // full recount of one language's replicas from the seeds
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val thresholds = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183)
    def pois(u: Double): Long = {
      val k = thresholds.indexWhere(u < _)
      if (k < 0) 6L else k.toLong
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map { r =>
        val toks = Option(r.getAs[String]("text")).getOrElse("")
          .toLowerCase.split("[^a-z]+").count(_.nonEmpty)
        (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
          if (toks >= 20 && r.getAs[Long]("n_chars") >= 100) 1L else 0L)
      }
    val lang = docs.map(_._2).distinct.sorted.head
    val mine = docs.filter(_._2 == lang)
    val rates = (0 until 200).flatMap { r =>
      var (nw, sw) = (0L, 0L)
      mine.foreach { case (id, _, x) =>
        val u16 = java.lang.Long.parseLong(md5Hex(s"$id|$r").take(4), 16)
        val w = pois((u16 + 0.5) / 65536.0)
        nw += w; sw += w * x
      }
      if (nw > 0L) Some(sw * 1000000L / nw) else None
    }.sorted
    val (_, _, _, _, lo, hi) = rows(lang)
    assert(lo === rates(4) && hi === rates(195),
      s"recount band (${rates(4)}, ${rates(195)}) vs ($lo, $hi)")
    // the weight population is Poisson(1)-shaped: mean weight ~ 1
    val allW = for (r <- 0 until 50; (id, _, _) <- mine) yield
      pois((java.lang.Long.parseLong(md5Hex(s"$id|$r").take(4), 16) + 0.5)
        / 65536.0)
    val meanW = allW.sum.toDouble / allW.size
    assert(meanW > 0.9 && meanW < 1.1, s"mean Poisson weight $meanW")
  }
}
