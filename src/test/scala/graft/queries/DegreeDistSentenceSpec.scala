package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the round-5 additions: the degree-distribution
  * CCDF over the signup graph and the per-language sentence stats.
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
      val nSent = text.split("[.!?]+", -1).count(_.trim.nonEmpty).toLong
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
