package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Full Scala recount of the tokenizer_unigram EM round — seed inventory,
  * Viterbi E-step with the packed tie-break, M-step re-estimation — plus
  * the properties that make it a TOKENIZER (coverage, compression).
  */
class UnigramTokSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("tokenizer_unigram equals a sequential EM-round recount") {
    val rows = Registry.queries("tokenizer_unigram")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"),
        r.getAs[Long]("p_ppm")))
    assert(rows.nonEmpty)
    // vocabulary with corpus frequencies, words <= 20 chars
    val words = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .flatMap(r => Option(r.getAs[String]("text")).getOrElse("")
        .toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, os) => w -> os.length.toLong }
      .filter(_._1.length <= 20)
    // seed counts over all substrings of length <= 4
    val cnt0 = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (j <- 0 until w.length; l <- 1 to 4 if j + l <= w.length)
        cnt0(w.substring(j, j + l)) =
          cnt0.getOrElse(w.substring(j, j + l), 0L) + f
    }
    val top = cnt0.toSeq.sortBy { case (s0, c) => (-c, s0) }.take(300)
    val v = (top ++ cnt0.toSeq.filter(_._1.length == 1)).toMap
    val tot = v.values.sum
    val q = v.map { case (p, c) =>
      p -> BigDecimal(math.log(c.toDouble / tot.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // Viterbi per word with the packed (score, longest-piece) tie-break
    def segment(w: String): Seq[String] = {
      val n = w.length
      val dp = Array.fill(n + 1)(Long.MinValue); dp(0) = 0L
      for (i <- 1 to n) {
        var best = Long.MinValue
        for (j <- math.max(0, i - 4) until i) {
          q.get(w.substring(j, i)).foreach { qq =>
            if (dp(j) != Long.MinValue) best = math.max(best, dp(j) + qq)
          }
        }
        dp(i) = best
      }
      val out = Seq.newBuilder[String]
      var pos = n
      while (pos > 0) {
        var bestPacked = Long.MinValue; var bestJ = -1
        for (j <- math.max(0, pos - 4) until pos) {
          q.get(w.substring(j, pos)).foreach { qq =>
            val packed = (dp(j) + qq + 1000000000L) * 64L + (63L - j)
            if (packed > bestPacked) { bestPacked = packed; bestJ = j }
          }
        }
        out += w.substring(bestJ, pos)
        pos = bestJ
      }
      out.result()
    }
    val m = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      segment(w).foreach(p => m(p) = m.getOrElse(p, 0L) + f)
    }
    val tot1 = m.values.sum
    val expected = m.toSeq.sortBy { case (p, c) => (-c, p) }.take(100)
      .map { case (p, c) => (p, c, c * 1000000L / tot1) }
    assert(rows.toSeq === expected)
    // tokenizer properties: the learned segmentation COMPRESSES — the
    // freq-weighted piece count is well under the char count (otherwise
    // the inventory degenerated to singles)...
    val nPieces = words.map { case (w, f) => segment(w).length * f }.sum
    val nChars = words.map { case (w, f) => w.length.toLong * f }.sum
    assert(nPieces * 2 < nChars, s"pieces=$nPieces chars=$nChars")
    // ...and multi-char pieces carry real mass in the learned table
    assert(rows.count(_._1.length >= 3) > 10)
  }

  // ------------------------------------------------------------------
  // Shared sequential EM machinery for the fixture tests below.
  // ------------------------------------------------------------------
  private def qFrom(v: Map[String, Long]): Map[String, Long] = {
    val tot = v.values.sum
    v.map { case (p, c) =>
      p -> BigDecimal(math.log(c.toDouble / tot.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  private def viterbi(w: String, q: Map[String, Long]): Seq[String] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MinValue); dp(0) = 0L
    for (i <- 1 to n; j <- math.max(0, i - 4) until i)
      q.get(w.substring(j, i)).foreach { qq =>
        if (dp(j) != Long.MinValue) dp(i) = math.max(dp(i), dp(j) + qq)
      }
    val out = Seq.newBuilder[String]
    var pos = n
    while (pos > 0) {
      var bestPacked = Long.MinValue; var bestJ = -1
      for (j <- math.max(0, pos - 4) until pos)
        q.get(w.substring(j, pos)).foreach { qq =>
          val packed = (dp(j) + qq + 1000000000L) * 64L + (63L - j)
          if (packed > bestPacked) { bestPacked = packed; bestJ = j }
        }
      out += w.substring(bestJ, pos); pos = bestJ
    }
    out.result()
  }

  private def emRounds(words: Map[String, Long])
      : (Map[String, Long], Map[String, Long]) = {
    val cnt0 = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (j <- 0 until w.length; l <- 1 to 4 if j + l <= w.length)
        cnt0(w.substring(j, j + l)) =
          cnt0.getOrElse(w.substring(j, j + l), 0L) + f
    }
    val top = cnt0.toSeq.sortBy { case (s0, c) => (-c, s0) }.take(300)
    val q0 = qFrom((top ++ cnt0.toSeq.filter(_._1.length == 1)).toMap)
    def mstep(q: Map[String, Long]): Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        viterbi(w, q).foreach(p => m(p) = m.getOrElse(p, 0L) + f)
      }
      m.toMap
    }
    val m1 = mstep(q0)
    val v2 = m1.filter(_._1.length > 1) ++
      cnt0.keys.filter(_.length == 1)
        .map(c => c -> (m1.getOrElse(c, 0L) + 1L))
    (m1, mstep(qFrom(v2)))
  }

  test("tokenizer_unigram_r2: round 2 is a REAL second round (engineered divergence)") {
    import spark.implicits._
    // a vocabulary where round 1 uses piece "dd" once but the
    // re-estimated model drops it (found by randomized search; the
    // sequential recount below re-derives both rounds from scratch)
    val fixture = Map("add" -> 8L, "dbb" -> 1L, "dbccddd" -> 1L,
      "acadbbca" -> 1L, "adcad" -> 5L)
    val (em1, em2) = emRounds(fixture)
    assert(em1 !== em2, "fixture must diverge between rounds")
    val words = fixture.toSeq.toDF("word", "freq")
    val occ = GraphBpeQueries.uniOcc(words).localCheckpoint(true)
    val m1 = GraphBpeQueries.uniPieces(occ, GraphBpeQueries.uniSeedQ(occ))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val got1 = m1.collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("cnt")).toMap
    assert(got1 === em1)
    val got2 = GraphBpeQueries
      .uniPieces(occ, GraphBpeQueries.uniRound2Q(occ, m1))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt")).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("cnt")).toMap
    assert(got2 === em2)
    assert(got1 !== got2)
  }

  test("packed-argmax underflow guard trips on an inventory past the offset (negative)") {
    import spark.implicits._
    // a piece score of −10⁸ micro-nats × 20-char words reaches −2·10⁹ —
    // past the 10⁹ packing offset, where the % 64 decode would silently
    // return garbage j's on BOTH engines (the mirrored-oracle-blind bug
    // class, VERDICT r07 task 2). uniPieces must refuse to segment.
    val words = Seq(("abab", 3L)).toDF("word", "freq")
    val occ = GraphBpeQueries.uniOcc(words)
    val poisoned = Seq(("a", -100000000L), ("b", -100000000L), ("ab", -5L))
      .toDF("sub", "q")
    val e = intercept[IllegalArgumentException] {
      GraphBpeQueries.uniPieces(occ, poisoned).collect()
    }
    assert(e.getMessage.contains("packed-argmax underflow"))
    // and a healthy inventory (the corpus path's magnitude) passes
    val healthy = Seq(("a", -2000000L), ("b", -2000000L), ("ab", -1000000L))
      .toDF("sub", "q")
    assert(GraphBpeQueries.uniPieces(occ, healthy).count() > 0)
  }

  test("tokenizer_fertility equals a sequential per-lang recount of the trained model") {
    // round-2 (trained) per-word piece counts via the shared sequential EM
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        Option(r.getAs[String]("text")).getOrElse("")))
    val words = corpus
      .flatMap(_._3.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, os) => w -> os.length.toLong }
      .filter(_._1.length <= 20)
    val cnt0 = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (j <- 0 until w.length; l <- 1 to 4 if j + l <= w.length)
        cnt0(w.substring(j, j + l)) =
          cnt0.getOrElse(w.substring(j, j + l), 0L) + f
    }
    val top = cnt0.toSeq.sortBy { case (s0, c) => (-c, s0) }.take(300)
    val q0 = qFrom((top ++ cnt0.toSeq.filter(_._1.length == 1)).toMap)
    val m1 = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      viterbi(w, q0).foreach(p => m1(p) = m1.getOrElse(p, 0L) + f)
    }
    val v2 = m1.toMap.filter(_._1.length > 1) ++
      cnt0.keys.filter(_.length == 1)
        .map(c => c -> (m1.getOrElse(c, 0L) + 1L))
    val q2 = qFrom(v2)
    val piecesPerWord: Map[String, Long] =
      words.keys.map(w => w -> viterbi(w, q2).length.toLong).toMap
    // per-lang fold over the corpus word multiset (words > 20 chars out)
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    corpus.foreach { case (_, lang, text) =>
      text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        .filter(_.length <= 20).foreach { w =>
          val (nw, np) = agg.getOrElse(lang, (0L, 0L))
          agg(lang) = (nw + 1L, np + piecesPerWord(w))
        }
    }
    val expected = agg.map { case (lang, (nw, np)) =>
      (lang, nw, np, if (nw == 0) 0L else np * 1000000L / nw)
    }.toSet
    val got = Registry.queries("tokenizer_fertility")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_pieces"), r.getAs[Long]("fert_ppm"))).toSet
    assert(got === expected)
    // a fertility audit only means something if the model actually
    // compresses: every lang must average under 2.5 pieces per word
    assert(got.forall(_._4 < 2500000L), s"fertility degenerated: $got")
    assert(got.nonEmpty)
  }

  test("uni_round2 snapshot: persist/load round-trip, parquet-backed, answers unchanged") {
    val art = java.nio.file.Files.createTempDirectory("graft-unir2-art").toString
    GraphBpeQueries.uniRound2Invalidate()
    assert(!GraphBpeQueries.uniRound2Ensure(spark, sfDir, art),
      "ensure claimed a hit on an empty artifact dir")
    def fert(): Set[(String, Long, Long, Long)] =
      Registry.queries("tokenizer_fertility")(spark, sfDir).collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_pieces"), r.getAs[Long]("fert_ppm"))).toSet
    val f1 = fert()
    assert(f1.nonEmpty)
    // cold session cache, same corpus → parquet-backed reload, same answer
    GraphBpeQueries.uniRound2Invalidate()
    assert(GraphBpeQueries.uniRound2Ensure(spark, sfDir, art),
      "unchanged corpus did not reuse the persisted trained segmentation")
    assert(GraphBpeQueries.uniRound2Pieces(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("Scan parquet"),
      "loaded segmentation is not parquet-backed")
    assert(fert() === f1)
    GraphBpeQueries.uniRound2Invalidate()
  }

  test("tokenizer_unigram_r2 on the corpus: fixed point reached and verified") {
    val r1 = Registry.queries("tokenizer_unigram")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"))).toSet
    val r2 = Registry.queries("tokenizer_unigram_r2")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt"))).toSet
    // on THIS corpus EM converges after one round — assert the fixed
    // point explicitly (the engineered-divergence case above proves the
    // second round is a real computation, not a passthrough)
    assert(r1 === r2)
  }
}
