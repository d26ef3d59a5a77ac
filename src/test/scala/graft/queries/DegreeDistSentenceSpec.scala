package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the round-5 additions: the degree-distribution
  * CCDF over the signup graph, the per-language sentence stats, pairwise
  * ROUGE-N recall, and per-doc lexical diversity.
  */
class DegreeDistSentenceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("graph_degree_dist: node mass, CCDF endpoints, and a local recount") {
    val rows = Registry.queries("graph_degree_dist")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("deg"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("ccdf_ppm"))).sortBy(_._1)
    assert(rows.nonEmpty)
    // the frequency table partitions the node set: Σ n_nodes = |V|
    val nNodes = GraphBpeQueries.signupEdges(spark, sfDir)
      .select(col("src")).distinct().count()
    assert(rows.map(_._2).sum === nNodes)
    // CCDF at the smallest degree covers every node exactly
    assert(rows.head._3 === 1000000L)
    // CCDF is monotone nonincreasing in degree
    rows.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._3 >= w(1)._3)
    }
    // local recount of the full distribution from the edge list
    val deg = GraphBpeQueries.signupEdges(spark, sfDir)
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .collect().map(_.getAs[Long]("deg"))
    val expected = deg.groupBy(identity).map { case (d, vs) =>
      d -> vs.length.toLong
    }
    assert(rows.map(t => t._1 -> t._2).toMap === expected)
  }

  test("eval_rouge_n: recall bounds + local clipped recount on a sampled pair") {
    val rows = Registry.queries("eval_rouge_n")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("m1") <= r.getAs[Long]("r1"))
      assert(r.getAs[Long]("rouge1_ppm") >= 0L &&
        r.getAs[Long]("rouge1_ppm") <= 1000000L)
      assert(r.getAs[Long]("rouge2_ppm") >= -1L &&
        r.getAs[Long]("rouge2_ppm") <= 1000000L)
    }
    val texts = Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def tokens(text: String): Seq[String] =
      text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    def counts(ts: Seq[String], n: Int): Map[Seq[String], Long] =
      ts.sliding(n).filter(_.size == n).toSeq.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
    val sample = rows.sortBy(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).head
    val (a, b) = (sample.getAs[Long]("a"), sample.getAs[Long]("b"))
    val (ta, tb) = (tokens(texts(a)), tokens(texts(b)))
    def clippedRef(n: Int): (Long, Long) = {
      val (ca, cb) = (counts(ta, n), counts(tb, n))
      (ca.map { case (g, c) => math.min(c, cb.getOrElse(g, 0L)) }.sum,
        cb.values.sum)
    }
    assert((sample.getAs[Long]("m1"), sample.getAs[Long]("r1")) === clippedRef(1))
    assert((sample.getAs[Long]("m2"), sample.getAs[Long]("r2")) === clippedRef(2))
  }

  test("text_lexical_diversity: per-doc recount on a sample; hapax <= types <= tokens") {
    val rows = Registry.queries("text_lexical_diversity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_types"))
      assert(r.getAs[Long]("n_types") <= r.getAs[Long]("n_tokens"))
    }
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("n_hapax")))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
    val expected = docs.flatMap { r =>
      val toks = r.getAs[String]("text").toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val m = toks.groupBy(identity).map { case (_, v) => v.length.toLong }
        Some(r.getAs[Long]("doc_id") ->
          ((toks.length.toLong, m.size.toLong, m.count(_ == 1L).toLong)))
      }
    }.toMap
    assert(got === expected)
  }

  test("text_sentence_stats: totals agree with a local per-doc recount") {
    val got = Registry.queries("text_sentence_stats")(spark, sfDir)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("toks_per_sent_x100"),
          r.getAs[Long]("sents_per_doc_x100")))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("text")))
    val local = docs.map { case (lang, text) =>
      // the engines' non-whitespace check is the explicit ' \t\n\r' set
      val nSent = text.split("[.!?]+", -1)
        .count(_.exists(c => !" \t\n\r".contains(c))).toLong
      val nTok = text.toLowerCase.split("[^a-z]+", -1).count(_.nonEmpty).toLong
      (lang, nSent, nTok)
    }.filter(_._2 > 0L)
    val expected = local.groupBy(_._1).map { case (lang, vs) =>
      val nDocs = vs.length.toLong
      val nSent = vs.map(_._2).sum
      val nTok = vs.map(_._3).sum
      lang -> ((nDocs, nSent, nTok,
        Math.floorDiv(nTok * 100, nSent), Math.floorDiv(nSent * 100, nDocs)))
    }
    assert(got === expected)
  }
}
