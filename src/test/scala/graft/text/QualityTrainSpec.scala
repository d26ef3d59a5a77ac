package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** quality_logreg_train cross-checks: (1) the distributed integer GD
  * reproduces a plain-Scala trainer weight-for-weight; (2) on a corpus
  * where token composition actually predicts the label, the LEARNED
  * vector's ROC-AUC beats the fixed Knuth-scramble vector
  * `quality_logreg` ships with (VERDICT r06 task 2's done-bar).
  */
class QualityTrainSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Bucket(term: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    (d(0).toInt & 0xFF).toLong
  }

  /** Plain-Scala replay of the engine's 3-round exact-integer GD over
    * (doc → bucket counts, label) pairs. */
  private def localTrain(
      feats: Seq[(Map[Long, Long], Long)]): Array[Long] = {
    val totTokens = feats.map(_._1.values.sum).sum
    var w = Array.fill(256)(0L)
    for (_ <- 1 to 3) {
      val grad = scala.collection.mutable.Map.empty[Long, Long]
      feats.foreach { case (bc, y) =>
        val nTok = bc.values.sum
        val zn = bc.map { case (b, c) => w(b.toInt) * c }.sum
        val z = (zn + 10000000000L * nTok) / nTok - 10000000000L
        val p = (math.max(-2000000L, math.min(2000000L, z)) + 2000000L) / 4
        val e = p - 1000000L * y
        bc.foreach { case (b, c) =>
          grad(b) = grad.getOrElse(b, 0L) + e * c
        }
      }
      w = TrainQueries.updateWeights(w, grad.toMap, totTokens)
    }
    w
  }

  /** (bucket counts, label) per doc, engine tokenization. */
  private def collectFeats(dir: String): Seq[(Map[Long, Long], Long)] = {
    val nChars = Tables.documents(spark, dir).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextArtifacts.wordCounts(spark, dir).collect()
      .map(r => (r.getLong(0), md5Bucket(r.getString(1)), r.getLong(2)))
      .groupBy(_._1).toSeq.map { case (doc, rows) =>
        val bc = rows.groupBy(_._2).map { case (b, rs) => b -> rs.map(_._3).sum }
        val nTok = bc.values.sum
        val y = if (nTok >= 20 && nChars(doc) >= 100) 1L else 0L
        (bc, y)
      }
  }

  test("quality_logreg_train equals the in-memory integer trainer at sf0.001") {
    val expected = localTrain(collectFeats(sfDir))
    val got = Registry.queries("quality_logreg_train")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 256)
    (0 until 256).foreach { b =>
      assert(got(b.toLong) === expected(b), s"bucket $b")
    }
    // learning happened: the vector moved off the zero init
    assert(expected.exists(_ != 0L))
  }

  /** Local GD replay that also records each doc's true-class probability
    * path (p under w₀, w₁, w₂) — the dynamics the cartography readout
    * aggregates. */
  private def localDynamics(
      feats: Seq[(Map[Long, Long], Long)]): Map[Long, Seq[Long]] = {
    // re-derive the weight history with the same integer arithmetic
    val totTokens = feats.map(_._1.values.sum).sum
    var w = Array.fill(256)(0L)
    val hist = scala.collection.mutable.ArrayBuffer(w)
    for (_ <- 1 to 3) {
      val grad = scala.collection.mutable.Map.empty[Long, Long]
      feats.foreach { case (bc, y) =>
        val nTok = bc.values.sum
        val zn = bc.map { case (b, c) => w(b.toInt) * c }.sum
        val z = (zn + 10000000000L * nTok) / nTok - 10000000000L
        val p = (math.max(-2000000L, math.min(2000000L, z)) + 2000000L) / 4
        val e = p - 1000000L * y
        bc.foreach { case (b, c) => grad(b) = grad.getOrElse(b, 0L) + e * c }
      }
      w = TrainQueries.updateWeights(w, grad.toMap, totTokens)
      hist += w
    }
    // probability path per doc index under each pre-update checkpoint
    feats.zipWithIndex.map { case ((bc, y), i) =>
      val nTok = bc.values.sum
      val path = hist.dropRight(1).map { wk =>
        val zn = bc.map { case (b, c) => wk(b.toInt) * c }.sum
        val z = (zn + 10000000000L * nTok) / nTok - 10000000000L
        val p = (math.max(-2000000L, math.min(2000000L, z)) + 2000000L) / 4
        if (y == 1L) p else 1000000L - p
      }
      i.toLong -> path.toSeq
    }.toMap
  }

  test("mine_training_dynamics equals the local probability-path recount") {
    // keyed by doc: recompute (conf, var, above_chance) from the local
    // path and compare cell by cell
    val nChars = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats: Seq[(Long, Map[Long, Long], Long)] =
      TextArtifacts.wordCounts(spark, sfDir).collect()
        .map(r => (r.getLong(0), md5Bucket(r.getString(1)), r.getLong(2)))
        .groupBy(_._1).toSeq.map { case (doc, rows) =>
          val bc = rows.groupBy(_._2).map { case (b, rs) => b -> rs.map(_._3).sum }
          val nTok = bc.values.sum
          (doc, bc, if (nTok >= 20 && nChars(doc) >= 100) 1L else 0L)
        }
    val paths = localDynamics(feats.map(f => (f._2, f._3)))
    val expected = feats.zipWithIndex.map { case ((doc, _, _), i) =>
      val ph = paths(i.toLong)
      val sp = ph.sum; val sp2 = ph.map(p => p * p).sum
      doc -> ((sp / 3, (3 * sp2 - sp * sp) / 9, sp > 1500000L))
    }.toMap
    val got = Registry.queries("mine_training_dynamics")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size === expected.size)
    expected.foreach { case (doc, e) =>
      assert(got(doc) === e, s"doc $doc")
    }
    // the trajectory is non-degenerate: some doc moved off p = 500000
    assert(got.values.exists(_._2 > 0L), "all variances zero — no dynamics")
  }

  test("learned weights beat the fixed vector's AUC on a separable fixture") {
    // Fixture: positives (≥20 tokens, ≥100 chars) draw from token set A,
    // negatives (short) from disjoint set B — composition carries the
    // label, the regime a trained gate exists for. The fixed
    // Knuth-scramble weights are label-blind by construction.
    val setA = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val setB = Seq("mike", "november", "oscar", "papa", "quebec", "romeo",
      "sierra", "tango", "uniform", "victor", "whiskey", "xray")
    val rnd = new scala.util.Random(7)
    def doc(tokens: Seq[String], n: Int): String =
      Seq.fill(n)(tokens(rnd.nextInt(tokens.length))).mkString(" ")
    val rows = (0 until 100).map { i =>
      val text = doc(setA, 25 + rnd.nextInt(10)) // ≥ 25·6 chars → positive
      (i.toLong, text, "en", "fix", text.length.toLong)
    } ++ (100 until 200).map { i =>
      val text = doc(setB, 5 + rnd.nextInt(5)) // < 20 tokens → negative
      (i.toLong, text, "en", "fix", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("qtrain_fix").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val learned = Registry.queries("quality_logreg_train")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = (0 until 256)
      .map(b => b.toLong -> (b.toLong * 2654435761L % 2001L - 1000L)).toMap

    val feats = collectFeats(dir)
    def auc(w: Map[Long, Long]): Double = {
      val scored = feats.map { case (bc, y) =>
        val nTok = bc.values.sum
        val z = bc.map { case (b, c) => w(b).toDouble * c }.sum / nTok
        (z, y)
      }
      val pos = scored.filter(_._2 == 1L).map(_._1)
      val neg = scored.filter(_._2 == 0L).map(_._1)
      val num = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      num / (pos.size.toDouble * neg.size)
    }
    val (aLearned, aFixed) = (auc(learned), auc(fixed))
    info(f"AUC learned=$aLearned%.4f fixed=$aFixed%.4f")
    assert(aLearned > aFixed + 0.15,
      f"learned AUC $aLearned%.4f did not beat fixed $aFixed%.4f")
    assert(aLearned > 0.9, f"separable fixture should be near-perfect, got $aLearned%.4f")
  }
}
