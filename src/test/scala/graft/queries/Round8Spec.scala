package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent in-core recounts for the round-8 additions: personalized
  * PageRank (exact integer replay of the two damped spreads), the
  * l-diversity release gate, the sign-flip permutation test (seed replay
  * + exact p), and the Heaps fit (bigram growth recount + closed-form
  * OLS).
  */
class Round8Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The PortableHash.md5Byte convention: first two hex digits as 0..255. */
  private def md5Byte(s: String): Int = {
    val h = md5Hex(s)
    "0123456789abcdef".indexOf(h(0)) * 16 + "0123456789abcdef".indexOf(h(1))
  }

  test("graph_ppr: exact integer replay of the two damped spreads") {
    val got = Registry.queries("graph_ppr")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("is_seed"), r.getAs[Long]("ppr_nano")))).toMap
    assert(got.nonEmpty)
    val edges = graft.identity.GraphArtifacts.und(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val seeds = deg.keySet.filter(n => md5Byte(n.toString) < 32)
    val mass0 = deg.keys.map(n =>
      n -> (if (seeds(n)) 1000000000L else 0L)).toMap
    def spread(r: Map[Long, Long]): Map[Long, Long] = {
      val c = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        val m = r.getOrElse(s, 0L)
        if (m > 0) c(d) += m / deg(s)
      }
      deg.keys.map { n =>
        val seed = if (seeds(n)) 1L else 0L
        n -> (seed * 15000000000L + 85L * c(n)) / 100L
      }.toMap
    }
    val r2 = spread(spread(mass0))
    val expected = r2.filter(_._2 > 0)
    assert(got.keySet === expected.keySet)
    expected.foreach { case (n, m) =>
      assert(got(n) === ((if (seeds(n)) 1L else 0L, m)), s"node $n")
    }
    // seeds always survive (restart mass is unconditional)
    assert(seeds.forall(got.contains))
    // a reached non-seed carries pure walk mass (no teleport term)
    assert(got.exists { case (n, (s, _)) => s == 0L && !seeds(n) })
  }

  test("privacy_l_diversity: in-core recount of classes and thresholds") {
    val got = Registry.queries("privacy_l_diversity")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("l") ->
        ((r.getAs[Long]("classes_below"), r.getAs[Long]("rows_below"),
          r.getAs[Long]("rows_below_ppm"), r.getAs[Long]("min_distinct"))))
      .toMap
    assert(got.keySet === Set(2L, 3L, 5L))
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .collect()
      .map(r => (r.getAs[Number]("c_nationkey").longValue(),
        math.floor(r.getAs[Double]("c_acctbal") + 1000.0).toLong / 100L,
        r.getAs[String]("c_mktsegment")))
    val classes = rows.groupBy(r => (r._1, r._2)).values
      .map(g => (g.size.toLong, g.map(_._3).distinct.size.toLong)).toSeq
    val nRows = classes.map(_._1).sum
    Seq(2L, 3L, 5L).foreach { l =>
      val below = classes.filter(_._2 < l)
      val (cb, rb) = (below.size.toLong, below.map(_._1).sum)
      assert(got(l) === ((cb, rb, rb * 1000000L / nRows,
        classes.map(_._2).min)), s"l=$l")
    }
  }

  test("eval_permutation_test: seed replay reproduces n_extreme and p exactly") {
    val row = Registry.queries("eval_permutation_test")(spark, sfDir)
      .collect().head
    // per-doc d from the same tokenizer the query uses (the pairing under
    // test IS the engine's); the permutation machinery is replayed in-core
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (lit(5L) * size(expr("word_ngrams(text, 1, false)")).cast("long")
          - col("n_chars")).as("d"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("d")))
    val obs = d.map(_._2).sum
    assert(row.getAs[Long]("n") === d.length.toLong)
    assert(row.getAs[Long]("d_sum") === obs)
    val extreme = (0 until 200).count { r =>
      val ps = d.map { case (id, di) =>
        if (md5Byte(s"$id|$r") % 2 == 0) di else -di
      }.sum
      math.abs(ps) >= math.abs(obs)
    }
    assert(row.getAs[Long]("n_extreme") === extreme.toLong)
    assert(row.getAs[Long]("p_ppm") === (extreme + 1L) * 1000000L / 201L)
    assert(row.getAs[Long]("n_perm") === 200L)
  }

  test("ab_fdr_bh: re-randomization p replay + in-core BH sweep") {
    val got = Registry.queries("ab_fdr_bh")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("d_obs"), r.getAs[Long]("p_ppm"), r.getAs[Long]("rk"),
          r.getAs[Long]("bh_thresh_ppm"), r.getAs[Boolean]("rejected"))))
      .toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vq"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("vq")))
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val cells = ev.groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    def x(u: Long, t: String): Long = cells.getOrElse((u, t), 0L)
    val sgn = users.map(u => u -> (if (md5Byte(u.toString) % 2 == 0) 1L else -1L)).toMap
    val pvals = types.map { t =>
      val dObs = users.map(u => sgn(u) * x(u, t)).sum
      val extreme = (0 until 200).count { r =>
        val coins = users.map(u =>
          u -> (if (md5Byte(s"$u|$r") % 2 == 0) 1L else -1L)).toMap
        math.abs(users.map(u => coins(u) * x(u, t)).sum) >= math.abs(dObs)
      }
      (t, dObs, extreme + 0L, (extreme + 1L) * 1000000L / 201L)
    }
    val m = types.length.toLong
    val ranked = pvals.sortBy(p => (p._4, p._1)).zipWithIndex
      .map { case ((t, d, ne, p), i) => (t, d, ne, p, i + 1L) }
    // exact-rational BH decision by integer cross-multiplication
    // (ADVICE r08 #2): (n_extreme+1)·10⁶·m ≤ rk·α_ppm·(B+1); the
    // floored p_ppm is display-only.
    val kMax = ranked.filter { case (_, _, ne, _, rk) =>
        (ne + 1L) * 1000000L * m <= rk * 50000L * 201L }
      .map(_._5).maxOption.getOrElse(0L)
    ranked.foreach { case (t, d, _, p, rk) =>
      assert(got(t) === ((d, p, rk, rk * 50000L / m, rk <= kMax)), s"type $t")
    }
    // BH rejections are a PREFIX of the p-ascending order (the sweep's
    // defining shape — a rejected rank above an accepted one is a bug)
    val rejRanks = got.values.filter(_._5).map(_._3)
    assert(rejRanks.isEmpty || rejRanks.toSeq.sorted == (1L to rejRanks.max))
  }

  test("corpus_funnel: in-core gate replay, monotone stages, exact drops") {
    val got = Registry.queries("corpus_funnel")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("stage") ->
        ((r.getAs[String]("stage_name"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("dropped_docs"),
          r.getAs[Long]("drop_ppm")))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .collect().map { r =>
      val text = r.getAs[String]("text")
      val nTok = text.toLowerCase.split("[^a-z]+").count(_.nonEmpty).toLong
      (r.getAs[Long]("doc_id"), md5Hex(text), nTok,
        r.getAs[Long]("n_chars") >= 100, nTok >= 20,
        Set("en", "es", "de", "fr")(r.getAs[String]("lang")))
    }
    val clean = docs.filter(d => d._4 && d._5 && d._6)
    val keepIds = clean.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val stages = Seq[(String, ((Long, String, Long, Boolean, Boolean, Boolean)) => Boolean)](
      "raw" -> (_ => true), "length" -> (_._4),
      "tokens" -> (d => d._4 && d._5), "langid" -> (d => d._4 && d._5 && d._6),
      "dedup" -> (d => d._4 && d._5 && d._6 && keepIds(d._1)))
    var prev = -1L
    stages.zipWithIndex.foreach { case ((name, pred), k) =>
      val surv = docs.filter(pred)
      val (nd, nt) = (surv.length.toLong, surv.map(_._3).sum)
      val (dropped, ppm) =
        if (k == 0) (0L, 0L)
        else (prev - nd, if (prev == 0) 0L else (prev - nd) * 1000000L / prev)
      assert(got(k.toLong) === ((name, nd, nt, dropped, ppm)), s"stage $name")
      assert(prev == -1L || nd <= prev, "funnel must be monotone")
      prev = nd
    }
  }

  test("text_heaps_fit: bigram growth recount + closed-form OLS") {
    val row = Registry.queries("text_heaps_fit")(spark, sfDir).collect().head
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val (lo, hi) = (docs.map(_._1).min, docs.map(_._1).max)
    def bigrams(text: String): Seq[String] = {
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val byBucket = docs.map { case (id, t) =>
      (math.min(9L, (id - lo) * 10 / (hi - lo + 1)), bigrams(t))
    }
    val tokc = byBucket.groupBy(_._1).view
      .mapValues(_.map(_._2.size.toLong).sum).toMap
    val firstB = byBucket.flatMap { case (b, gs) => gs.map(g => (g, b)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val newt = firstB.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val buckets = tokc.keys.toSeq.sorted
    var (ct, cy) = (0L, 0L)
    val pts = buckets.flatMap { b =>
      ct += tokc(b); cy += newt.getOrElse(b, 0L)
      if (ct > 0 && cy > 0)
        Some((math.floor(math.log(ct.toDouble) * 1e6).toLong,
          math.floor(math.log(cy.toDouble) * 1e6).toLong))
      else None
    }
    val n = pts.size.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    assert(row.getAs[Long]("n_terms") === n)
    assert(row.getAs[Long]("sx") === sx)
    assert(row.getAs[Long]("sy") === sy)
    val slope = math.floor((n.toDouble * sxy - sx.toDouble * sy)
      / (n.toDouble * sxx - sx.toDouble * sx) * 1e6).toLong
    assert(row.getAs[Long]("beta_ppm") === slope)
    // growth exponent of a real corpus is a genuine fraction: 0 < β < 1
    assert(slope > 0 && slope < 1000000L)
  }
}
