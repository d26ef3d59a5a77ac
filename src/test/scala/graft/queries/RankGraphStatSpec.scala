package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the rank-stability and graph-health readouts. */
class RankGraphStatSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("eval_kendall_tau matches a local pair count over the top-10") {
    val raw = Tables.embeddings(spark, sfDir).collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray
    }.toMap
    def dot(a: Array[Float], b: Array[Float], d: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < d) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, q: Long, d: Int): Double =
      dot(raw(a), raw(q), d) / math.sqrt(dot(raw(a), raw(a), d) * dot(raw(q), raw(q), d))
    val rows = Registry.queries("eval_kendall_tau")(spark, sfDir).collect()
    val got = rows.map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("concordant"),
          r.getAs[Long]("tau_num"), r.getAs[Long]("tau_den")))).toMap
    val gotRho = rows.map(r => r.getAs[Long]("q_id") ->
      ((r.getAs[Long]("rho_num"), r.getAs[Long]("rho_den")))).toMap
    assert(got.size === 5)
    (0L until 5L).foreach { q =>
      val top = raw.keys.filter(_ != q).toSeq
        .map(v => (v, cos(v, q, 64))).sortBy { case (v, c) => (-c, v) }
        .take(10).map(_._1)
      val rk64 = top.zipWithIndex.toMap
      val rk16 = top.sortBy(v => (-cos(v, q, 16), v)).zipWithIndex.toMap
      val pairs = for {
        i <- top.indices; j <- top.indices if rk64(top(i)) < rk64(top(j))
      } yield if (rk16(top(i)) < rk16(top(j))) 1L else 0L
      val (n, c) = (pairs.size.toLong, pairs.sum)
      assert(got(q) === ((n, c, 2 * c - n, n)), s"q=$q")
      assert(n === 45L)
      val sd2 = top.map(v => { val d = rk64(v) - rk16(v); (d * d).toLong }).sum
      assert(gotRho(q) === ((10L * 99L - 6L * sd2, 10L * 99L)), s"q=$q rho")
    }
  }

  test("graph_assortativity matches a local moment recompute; bipartite graph is disassortative") {
    val fwd = Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("src"),
        (get_json_object(col("props"), "$.k").cast("long") + 1000000L).as("dst"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val und = fwd ++ fwd.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val m = und.length.toLong
    val sUv = und.map { case (u, v) => deg(u) * deg(v) }.sum
    val sU = und.map { case (u, _) => deg(u) }.sum
    val sUu = und.map { case (u, _) => deg(u) * deg(u) }.sum
    val r = Registry.queries("graph_assortativity")(spark, sfDir).collect().head
    assert(r.getAs[Long]("m") === m)
    assert(r.getAs[Long]("s_uv") === sUv)
    assert(r.getAs[Long]("s_u") === sU)
    assert(r.getAs[Long]("s_uu") === sUu)
    val expected = math.floor(
      (m.toDouble * sUv - sU.toDouble * sU) /
        (m.toDouble * sUu - sU.toDouble * sU) * 1e6).toLong
    assert(r.getAs[Long]("assort_micro") === expected)
    // user↔item bipartite graphs are disassortative by construction
    assert(r.getAs[Long]("assort_micro") < 0L)
  }

  test("graph_adamic_adar matches a local wedge recount") {
    val li = Tables.lineitem(spark, sfDir)
      .where(expr("l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND " +
        "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"))
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val pairs = byOrder.flatMap(ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .toSet
    val und = pairs.toSeq.flatMap(p => Seq(p, p.swap))
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val capped = und.filter { case (src, _) => deg(src) <= 128L }
    val scores = capped.groupBy(_._1).values.flatMap { es =>
      val ns = es.map(_._2).sorted
      val z = es.head._1
      val term = math.round(1000000.0 / math.log(deg(z).toDouble))
      for (i <- ns.indices; j <- (i + 1) until ns.length)
        yield ((ns(i), ns(j)), term)
    }.toSeq.groupBy(_._1)
      .map { case (uv, ts) => (uv, ts.length.toLong, ts.map(_._2).sum) }
      .filterNot { case (uv, _, _) => pairs.contains(uv) }
    val expected = scores.toSeq
      .sortBy { case ((u, v), _, aa) => (-aa, u, v) }.take(20)
      .map { case ((u, v), cn, aa) => (u, v, cn, aa) }
    val got = Registry.queries("graph_adamic_adar")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("cn"), r.getAs[Long]("aa_micro")))
    assert(got.toSeq === expected)
    // every shared neighbor has degree ≥ 2, so scores are positive
    assert(got.forall(_._4 > 0L))
  }

  test("graph_hits matches a local integer HITS recompute") {
    val off = graft.identity.GraphArtifacts.Offset
    val fwd = Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("src"),
        (get_json_object(col("props"), "$.k").cast("long") + off).as("dst"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    // h0 ≡ 1 ⇒ a1 = in-degree; each half-step ppm-normalizes by the max
    val a1 = fwd.groupBy(_._2).map { case (v, es) => v -> es.length.toLong }
    val m1 = a1.values.max
    val a1p = a1.map { case (v, a) => v -> a * 1000000L / m1 }
    val h1 = fwd.groupBy(_._1).map { case (u, es) =>
      u -> es.map { case (_, v) => a1p(v) }.sum
    }
    val mh = h1.values.max
    val h1p = h1.map { case (u, h) => u -> h * 1000000L / mh }
    val a2 = fwd.groupBy(_._2).map { case (v, es) =>
      v -> es.map { case (u, _) => h1p(u) }.sum
    }
    val ma = a2.values.max
    val a2p = a2.map { case (v, a) => v -> a * 1000000L / ma }
    def top10(m: Map[Long, Long]): Seq[(Long, Long, Long)] =
      m.toSeq.sortBy { case (n, s) => (-s, n) }.take(10)
        .zipWithIndex.map { case ((n, s), i) => (n, s, i + 1L) }
    val expected =
      top10(h1p).map { case (n, s, rk) => ("hub", n, s, rk) } ++
        top10(a2p).map { case (n, s, rk) => ("auth", n, s, rk) }
    val got = Registry.queries("graph_hits")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("node"),
        r.getAs[Long]("score_ppm"), r.getAs[Long]("rk")))
    assert(got.sortBy(t => (t._1, t._4)) ===
      expected.sortBy(t => (t._1, t._4)))
    // hubs and authorities live in disjoint namespaces
    got.foreach { case (side, node, _, _) =>
      assert((side == "auth") === (node >= off))
    }
  }
}
