package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Brute-force cross-checks for the kNN-graph build, the MRR readout, and
  * the MinHash estimator audit.
  */
class KnnGraphSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sim_knn_graph edges equal the local within-bucket top-3, mutual flag exact") {
    val buckets = SimQueries.lshBuckets(Tables.embeddings(spark, sfDir))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket"))
      .toMap
    val raw = Tables.embeddings(spark, sfDir).collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, b: Long): Double =
      dot(raw(a), raw(b)) / math.sqrt(dot(raw(a), raw(a)) * dot(raw(b), raw(b)))
    val directed: Set[(Long, Long)] = buckets.keys.flatMap { a =>
      val peers = buckets.keys.filter(v => v != a && buckets(v) == buckets(a))
      peers.toSeq.map(v => v -> cos(a, v))
        .sortBy { case (v, c) => (-c, v) }.take(3).map(v => a -> v._1)
    }.toSet
    val expected = directed.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .map { case (u, v) =>
        (u, v, directed.contains((u, v)) && directed.contains((v, u)))
      }
    val got = Registry.queries("sim_knn_graph")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Boolean]("mutual"))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  /** Local replay of the engine's two-table descent round over any
    * embeddings dir: (ids, truth top-3, seed top-3, descent top-3). The
    * seed answer is the top-3 over BOTH tables' in-bucket candidates —
    * the zero-hop baseline the refinement round must beat. */
  private def localDescent(dir: String) = {
    val emb = Tables.embeddings(spark, dir)
    def bucketsOf(firstPlane: Int): Map[Long, String] =
      SimQueries.lshBuckets(emb, 8, firstPlane)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket"))
        .toMap
    val (buckets0, buckets1) = (bucketsOf(0), bucketsOf(8))
    val raw = emb.collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, b: Long): Double =
      dot(raw(a), raw(b)) / math.sqrt(dot(raw(a), raw(a)) * dot(raw(b), raw(b)))
    val ids = raw.keys.toSeq
    def top3(a: Long, pool: Iterable[Long]): Seq[Long] =
      pool.filter(_ != a).toSeq.distinct.map(v => v -> cos(a, v))
        .sortBy { case (v, c) => (-c, v) }.take(3).map(_._1)
    val truth: Map[Long, Set[Long]] =
      ids.map(a => a -> top3(a, ids).toSet).toMap
    // per-table in-bucket top-3 directed lists (the knnSeedDirected twin)
    def seedDir(bk: Map[Long, String]): Map[Long, Seq[Long]] =
      ids.map(a => a -> top3(a, ids.filter(v => bk(v) == bk(a)))).toMap
    val (s0, s1) = (seedDir(buckets0), seedDir(buckets1))
    // zero-hop baseline: best 3 of the two tables' candidates combined
    val seed: Map[Long, Seq[Long]] =
      ids.map(a => a -> top3(a, s0(a) ++ s1(a))).toMap
    // one NN-descent round over the union seed graph
    val undNbrs: Map[Long, Set[Long]] = {
      val directed = ids.flatMap(a => (s0(a) ++ s1(a)).map(a -> _))
      (directed ++ directed.map(_.swap)).groupBy(_._1)
        .map { case (a, es) => a -> es.map(_._2).toSet }
    }
    val descent: Map[Long, Seq[Long]] = ids.map { a =>
      val n1 = undNbrs.getOrElse(a, Set.empty)
      val cands = n1 ++ n1.flatMap(b => undNbrs.getOrElse(b, Set.empty))
      a -> top3(a, cands)
    }.toMap
    (ids, truth, seed, descent, cos _, top3 _)
  }

  /** One capped-reverse descent round (the sim_knn_descent_r2 /
    * knnDescentConverge round body) recounted sequentially over a
    * directed top-3 graph: reverse edges capped at the top-3 in-edges by
    * the ROUNDED round-1 cosine (the engine ranks the reverse side on
    * the 6-place output cos), then one-hop ∪ two-hop re-select. */
  private def localRound2(ids: Seq[Long], g: Map[Long, Seq[Long]],
      cos: (Long, Long) => Double,
      top3: (Long, Iterable[Long]) => Seq[Long]): Map[Long, Seq[Long]] = {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fwd = ids.flatMap(a => g(a).map(v => (a, v, r6(cos(a, v)))))
    val rev = fwd.groupBy(_._2).toSeq.flatMap { case (v, es) =>
      es.sortBy { case (q, _, c) => (-c, q) }.take(3).map(e => (v, e._1))
    }
    val und = (fwd.map { case (a, b, _) => (a, b) } ++ rev).toSet
    val nbrs = und.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    ids.map { a =>
      val n1 = nbrs.getOrElse(a, Set.empty[Long])
      val cands = n1 ++ n1.flatMap(b => nbrs.getOrElse(b, Set.empty[Long]))
      a -> top3(a, cands)
    }.toMap
  }

  private def recallOf(ids: Seq[Long], truth: Map[Long, Set[Long]],
      g: Map[Long, Seq[Long]]): Double = {
    val hit = ids.map(a => (g.getOrElse(a, Nil).toSet & truth(a)).size).sum
    hit.toDouble / ids.map(truth(_).size).sum
  }

  test("sim_knn_descent matches the local NN-descent round exactly") {
    val (_, _, _, descent, _, _) = localDescent(sfDir)
    val got = Registry.queries("sim_knn_descent")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    val expected = descent.toSeq.flatMap { case (a, ns) =>
      ns.zipWithIndex.map { case (v, i) => (a, v, (i + 1).toLong) }
    }
    assert(got.toSet === expected.toSet)
    assert(got.nonEmpty)
  }

  /** Engineered clustered corpus for the descent tests: the sf*
    * embeddings are isotropic noise — no manifold for descent to climb
    * (seed ≈ descent ≈ 2% recall there, both algorithms blind). 16 tight
    * clusters whose spread crosses LSH hyperplanes, so each cluster
    * SPLITS across buckets — the seed sees only the same-bucket fragment
    * of a node's true neighborhood, while one neighbor-of-neighbor hop
    * reconnects the fragments. This is the regime NN-descent exists for
    * (Dong et al., WWW'11 §1). */
  private lazy val clusteredDir: String = {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 16).flatMap { c =>
      val center = Array.fill(64)(rnd.nextGaussian())
      (0 until 30).map { p =>
        val e = center.map(x => (x + 0.45 * rnd.nextGaussian()).toFloat)
        (c * 30L + p, e.toSeq, c)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("knn_descent_fix").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("sim_knn_descent lifts recall@3 over the LSH seed on a clustered corpus") {
    val dir = clusteredDir
    val (ids, truth, seed, descent, _, _) = localDescent(dir)
    val got = Registry.queries("sim_knn_descent")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    val expected = descent.toSeq.flatMap { case (a, ns) =>
      ns.zipWithIndex.map { case (v, i) => (a, v, (i + 1).toLong) }
    }
    assert(got.toSet === expected.toSet)
    val (rSeed, rDescent) = (recallOf(ids, truth, seed), recallOf(ids, truth, descent))
    info(f"recall@3 seed=$rSeed%.4f descent=$rDescent%.4f")
    // pinned floor: one refinement round must add ≥ 5 recall points
    assert(rDescent > rSeed + 0.05,
      f"descent recall $rDescent%.4f did not lift seed $rSeed%.4f")
  }

  test("sim_knn_descent_r2 matches the local capped-reverse second round exactly") {
    val (ids, _, _, descent, cos, top3) = localDescent(sfDir)
    val expected = localRound2(ids, descent, cos, top3).toSeq.flatMap {
      case (a, ns) => ns.zipWithIndex.map { case (v, i) => (a, v, (i + 1).toLong) }
    }
    val got = Registry.queries("sim_knn_descent_r2")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    assert(got.toSet === expected.toSet)
    assert(got.nonEmpty)
  }

  test("knnDescentConverge: clustered corpus converges under the round cap, recall plateaus") {
    val dir = clusteredDir
    val emb = Tables.embeddings(spark, dir)
    val (ids, truth, _, descent1, _, _) = localDescent(dir)
    val (tk, rounds, deltas) = SimQueries.knnDescentConverge(emb)
    info(s"rounds=$rounds deltas=${deltas.mkString(",")}")
    // the clustered manifold is what descent converges ON: the delta
    // criterion must fire before the 5-round cap (genuine convergence,
    // not cap exhaustion), and the final delta is the run's smallest
    assert(rounds < 5, s"expected convergence before the cap, ran $rounds")
    assert(deltas.last < 50000L, s"final delta ${deltas.last} >= eps")
    assert(deltas.last === deltas.min,
      s"final delta should be the run's smallest: $deltas")
    // VERDICT r10 task 7: the iterations-to-converge INTEGER is pinned
    // at this fixed seed/corpus — `sim_knn_descent_converged` is
    // rows-only at the oracle gate (data-dependent rounds), so this is
    // the assertion a convergence regression cannot hide behind. The
    // whole delta trajectory is deterministic (md5-derived corpus,
    // exact integer ppm): a changed value here means the descent
    // algebra changed, not noise.
    assert(rounds === 4, s"convergence count drifted: $rounds != 4")
    assert(deltas === Seq(394625L, 139222L, 67137L, 35335L),
      s"delta trajectory drifted: $deltas")
    // recall plateau: the converged graph is at least as good as the
    // one-round graph (descent refines toward the true kNN graph)
    val got = tk.collect().map(r =>
      r.getAs[Long]("q_id") -> r.getAs[Long]("vec_id"))
      .groupBy(_._1).map { case (a, vs) => a -> vs.map(_._2).toSeq }
    val r1 = recallOf(ids, truth, descent1)
    val rConv = recallOf(ids, truth, got)
    info(f"recall@3 round1=$r1%.4f converged=$rConv%.4f")
    assert(rConv >= r1, f"converged recall $rConv%.4f below round-1 $r1%.4f")
  }

  test("knnDescentConverge accounting: fixed-2-round run reproduces the hash-pinned frames and their delta (sf0.01)") {
    // VERDICT r08 task 8: `sim_knn_descent_converged` is rows-only by
    // design (data-dependent round count), so pin the DRIVER's
    // accounting against the two oracle-green components: a forced
    // 2-round run must end ON the sim_knn_descent_r2 graph, and its
    // final_delta_ppm must be exactly the edge-set delta between the
    // hash-pinned round-1 and round-2 frames.
    val dir01 = "/root/testdata/sf0.01"
    def edges(name: String): Set[(Long, Long)] =
      Registry.queries(name)(spark, dir01).select("q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = edges("sim_knn_descent")
    val r2 = edges("sim_knn_descent_r2")
    val (tk, rounds, deltas) =
      SimQueries.knnDescentConverge(Tables.embeddings(spark, dir01),
        maxRounds = 2, epsPpm = 0L)
    assert(rounds === 2 && deltas.length === 2,
      s"forced 2-round run reported rounds=$rounds deltas=$deltas")
    val tkEdges = tk.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tkEdges === r2, "converge driver's round-2 graph drifted from sim_knn_descent_r2")
    val expectedDelta = (r2 -- r1).size * 1000000L / r2.size
    assert(deltas.last === expectedDelta,
      s"final_delta_ppm ${deltas.last} != recounted $expectedDelta")
  }

  test("eval_mrr first ranks match the brute-force label scan") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").toArray)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val got = Registry.queries("eval_mrr")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("first_rank"), r.getAs[Long]("rr_ppm")))).toMap
    assert(got.size === 8)
    vecs.filter(_._1 < 8).foreach { case (q, ql, qe) =>
      val ranked = vecs.filter(_._1 != q).map { case (v, l, e) =>
        (v, l, dot(e, qe) / math.sqrt(dot(e, e) * dot(qe, qe)))
      }.sortBy { case (v, _, c) => (-c, v) }.take(10)
      val fr = ranked.indexWhere(_._2 == ql) match {
        case -1 => -1L
        case i => (i + 1).toLong
      }
      assert(got(q)._1 === fr, s"q=$q")
      assert(got(q)._2 === (if (fr == -1L) 0L else 1000000L / fr), s"q=$q")
    }
  }

  test("dedup_minhash_est: estimator bounded, error is the literal difference") {
    val rows = Registry.queries("dedup_minhash_est")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (agree, est, exact, err) = (r.getAs[Long]("agree"),
        r.getAs[Long]("est_ppm"), r.getAs[Long]("exact_ppm"),
        r.getAs[Long]("err_ppm"))
      assert(agree >= 1L && agree <= 12L,
        "an LSH candidate shares a band, hence at least one hash")
      assert(est === agree * 1000000L / 12L)
      assert(exact >= 0L && exact <= 1000000L)
      assert(err === math.abs(est - exact))
    }
  }
}
