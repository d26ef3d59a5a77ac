package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the round-6 additions: per-node local clustering
  * coefficients (the triangleClosure corner attribution) and the DSIR
  * importance-weight scorer.
  */
class ClusteringDsirSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("triangleClosure per-node attribution matches brute force on random graphs") {
    import spark.implicits._
    val rnd = new Random(23)
    for (_ <- 1 to 4) {
      val n = 14
      val edges = (for (i <- 0L until n; j <- i + 1 until n
        if rnd.nextDouble() < 0.35) yield (i, j)).toSeq
      val adj = edges.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      // brute force: per node, count adjacent neighbor pairs
      val expected = adj.map { case (v, ns) =>
        v -> ns.toSeq.combinations(2).count {
          case Seq(a, b) => adj(a).contains(b)
          case _         => false
        }.toLong
      }.filter(_._2 > 0L)
      val (_, closed, _) = GraphBpeQueries.triangleClosure(edges.toDF("a", "b"))
      val got = closed
        .select(explode(array(col("u"), col("wu"), col("wv"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("tri"))
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("tri"))
        .toMap
      assert(got === expected)
    }
  }

  test("graph_clustering_coeff: invariants + a local recount of the top row") {
    val rows = Registry.queries("graph_clustering_coeff")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val (deg, tri, bp) = (r.getAs[Long]("deg"), r.getAs[Long]("tri"),
        r.getAs[Long]("cc_bp"))
      assert(deg >= 2L)
      // cc ∈ [0, 1]: a node's triangles are a subset of its wedge pairs
      assert(bp >= 0L && bp <= 10000L)
      assert(2L * tri <= deg * (deg - 1L))
    }
    // ordering is (tri desc, node asc)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (ta, tb) = (a.getAs[Long]("tri"), b.getAs[Long]("tri"))
        assert(ta > tb ||
          (ta == tb && a.getAs[Long]("node") < b.getAs[Long]("node")))
      case _ =>
    }
    // brute-force recount of the top node's triangle count and degree
    // from the co-purchase pair list itself
    val pairs = graft.identity.GraphArtifacts.coPairs(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val adj = pairs.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val top = rows.head
    val node = top.getAs[Long]("node")
    assert(adj(node).size.toLong === top.getAs[Long]("deg"))
    val triRef = adj(node).toSeq.combinations(2).count {
      case Seq(a, b) => adj(a).contains(b)
      case _         => false
    }.toLong
    assert(triRef === top.getAs[Long]("tri"))
  }

  test("quality_dsir: local recount of the hashed-unigram importance weights") {
    val rows = Registry.queries("quality_dsir")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("logw_micro"),
          r.getAs[Boolean]("keep")))).toMap
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        Option(r.getAs[String]("text")).getOrElse("")))
    def toks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 4096L
    }
    val rawCnt = scala.collection.mutable.Map.empty[Long, Long]
    val tgtCnt = scala.collection.mutable.Map.empty[Long, Long]
    docs.foreach { case (_, lang, text) =>
      toks(text).foreach { t =>
        val b = bucket(t)
        rawCnt(b) = rawCnt.getOrElse(b, 0L) + 1L
        if (lang == "en") tgtCnt(b) = tgtCnt.getOrElse(b, 0L) + 1L
      }
    }
    val (tt, rt) = (tgtCnt.values.sum, rawCnt.values.sum)
    def q(b: Long): Long = {
      val x = (math.log((tgtCnt.getOrElse(b, 0L) + 1.0) / (tt + 4096.0))
        - math.log((rawCnt.getOrElse(b, 0L) + 1.0) / (rt + 4096.0))) * 1e6
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    var checked = 0
    docs.foreach { case (id, _, text) =>
      val ts = toks(text)
      if (ts.nonEmpty) {
        val expW = ts.map(t => q(bucket(t))).sum
        val (nTok, w, keep) = rows(id)
        assert(nTok === ts.size.toLong, s"doc $id token count")
        assert(w === expW, s"doc $id logw")
        assert(keep === (expW > 0L))
        checked += 1
      } else assert(!rows.contains(id))
    }
    assert(checked > 10)
    // the en slice must score higher on average than the rest — the
    // method's whole point (target-resembling docs get larger weights)
    val byLang = docs.filter(d => toks(d._3).nonEmpty)
      .groupBy(_._2).map { case (lang, ds) =>
        lang -> ds.map(d => rows(d._1)._2.toDouble / rows(d._1)._1).sum / ds.size
      }
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max)
  }
}
