package graft.queries

import graft.SparkSpec

/** tokenizer_wordpiece cross-checks: the distributed likelihood-ratio
  * merge loop reproduces a sequential in-memory WordPiece trainer
  * exactly, and the objective observably diverges from BPE's raw-count
  * greedy (the reason the third family member exists).
  */
class WordpieceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Sequential WordPiece trainer over (word, freq) pairs — integer
    * nano-unit scores, (score desc, pair asc) tie-break, space-separated
    * symbol encoding: the engine loop's contract restated in plain
    * Scala. */
  private def localTrain(vocab: Seq[(String, Long)],
      merges: Int): Seq[(Long, String, Long, Long)] = {
    var enc: Seq[(Seq[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString), f) }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    for (r <- 1 to merges) {
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.Map.empty[String, Long]
      enc.foreach { case (syms, f) =>
        syms.foreach(sym => symCnt(sym) = symCnt.getOrElse(sym, 0L) + f)
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); pairCnt(k) = pairCnt.getOrElse(k, 0L) + f
        }
      }
      if (pairCnt.nonEmpty) {
        val scored = pairCnt.toSeq.map { case ((a, b), cnt) =>
          (s"$a $b", cnt, cnt * 1000000000L / (symCnt(a) * symCnt(b)))
        }
        val (pair, cnt, score) =
          scored.minBy { case (p, _, s) => (-s, p) }
        learned += ((r.toLong, pair, cnt, score))
        val Array(a, b) = pair.split(" ")
        enc = enc.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2 // left-to-right non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, f)
        }
      }
    }
    learned.toSeq
  }

  test("tokenizer_wordpiece equals the sequential in-memory trainer at sf0.001") {
    val vocab = graft.text.TextArtifacts.vocab(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = localTrain(vocab, 8)
    val got = Registry.queries("tokenizer_wordpiece")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got === expected)
    assert(got.size === 8)
  }

  test("the likelihood objective diverges from BPE's raw-count greedy") {
    // BPE merges the most FREQUENT pair; WordPiece the pair whose parts
    // are rarest relative to their co-occurrence. Fixture: "st" appears
    // 60 times but s,t are everywhere (score low); "qz" appears 20 times
    // and q,z appear ONLY there (score = 1e9/20, maximal).
    import spark.implicits._
    val vocab = Seq(("stop", 30L), ("best", 30L), ("sats", 25L),
      ("tots", 25L), ("qz", 20L))
    // each loop releases its input checkpoint on exit → fresh frame per call
    def enc() = vocab.toDF("w", "freq")
      .selectExpr("w", "freq",
        "concat(' ', regexp_replace(w, '(.)', '$1 ')) AS s")
      .localCheckpoint(true)
    val wp = GraphBpeQueries.wordpieceLearnMerges(enc(), 1).head
    val bpe = GraphBpeQueries.bpeLearnMerges(enc(), 1).head
    assert(wp._2 === "q z", s"wordpiece picked ${wp._2}")
    assert(bpe._2 === "s t", s"bpe picked ${bpe._2}")
    assert(wp._2 !== bpe._2)
  }
}
