package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Brute-force cross-checks for the graph-ANN query path
  * (`sim_graph_search`): an exact sequential replay of route-then-walk on
  * the sf corpus, and a recall audit on the engineered clustered corpus
  * (the KnnGraphSpec fixture regime) proving the graph hops lift recall
  * over pure LSH routing.
  */
class GraphSearchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** In-core replay of the whole search: table-0/1 seed, descent round-1
    * graph, capped-reverse adjacency, bucket-routed entry, two beam
    * hops. Returns (final per-query top-3 in rank order, truth top-3,
    * entry-bucket-only top-3) for queries vec_id < 8. `live` models the
    * serve-time tombstone filter of `sim_graph_delete`: the INDEX
    * (seeds, r1, adjacency) is still built over every id, but entry
    * pools, hop candidate pools, queries and truth restrict to live
    * ids. */
  private def localSearch(dir: String, live: Long => Boolean = _ => true) = {
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
    def topK(a: Long, pool: Iterable[Long], k: Int): Seq[Long] =
      pool.filter(_ != a).toSeq.distinct.map(v => v -> cos(a, v))
        .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
    // round-1 descent graph (the KnnGraphSpec localDescent recount)
    def seedDir(bk: Map[Long, String]): Map[Long, Seq[Long]] =
      ids.map(a => a -> topK(a, ids.filter(v => bk(v) == bk(a)), 3)).toMap
    val (s0, s1) = (seedDir(buckets0), seedDir(buckets1))
    val undNbrs: Map[Long, Set[Long]] = {
      val directed = ids.flatMap(a => (s0(a) ++ s1(a)).map(a -> _))
      (directed ++ directed.map(_.swap)).groupBy(_._1)
        .map { case (a, es) => a -> es.map(_._2).toSet }
    }
    val r1: Map[Long, Seq[Long]] = ids.map { a =>
      val n1 = undNbrs.getOrElse(a, Set.empty)
      a -> topK(a, n1 ++ n1.flatMap(b => undNbrs.getOrElse(b, Set.empty)), 3)
    }.toMap
    // capped-reverse adjacency over r1 (rev ranked on the ROUNDED cos —
    // the engine ranks the reverse side on the 6-place output value)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fwd = ids.flatMap(a => r1(a).map(v => (a, v, r6(cos(a, v)))))
    val rev = fwd.groupBy(_._2).toSeq.flatMap { case (v, es) =>
      es.sortBy { case (q, _, c) => (-c, q) }.take(3).map(e => (v, e._1))
    }
    val undEdges: Set[(Long, Long)] =
      (fwd.map { case (a, b, _) => (a, b) } ++ rev).toSet
    val adj: Map[Long, Set[Long]] =
      undEdges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    val queries = ids.filter(q => q < 8 && live(q))
    def bucketPeers(q: Long, bk: Map[Long, String]): Seq[Long] =
      ids.filter(v => v != q && live(v) && bk(v) == bk(q))
    val search: Map[Long, Seq[Long]] = queries.flatMap { q =>
      // LSH-forest routing: one entry per hash table
      val entries = (topK(q, bucketPeers(q, buckets0), 1) ++
        topK(q, bucketPeers(q, buckets1), 1)).distinct
      if (entries.isEmpty) None
      else {
        def hop(beam: Seq[Long], k: Int): Seq[Long] = {
          val cands = (beam ++ beam.flatMap(b =>
            adj.getOrElse(b, Set.empty[Long]))).filter(v => v != q && live(v))
          topK(q, cands, k)
        }
        Some(q -> hop(hop(hop(entries, 4), 4), 3))
      }
    }.toMap
    val truth = queries.map(q => q -> topK(q, ids.filter(live), 3).toSet).toMap
    // zero-hop baseline: the best the two-table ROUTING alone can answer
    val bucketOnly = queries.map { q =>
      q -> topK(q, bucketPeers(q, buckets0) ++ bucketPeers(q, buckets1), 3).toSet
    }.toMap
    (search, truth, bucketOnly)
  }

  private def recallOf(got: Map[Long, Iterable[Long]],
      truth: Map[Long, Set[Long]]): Double = {
    val qs = truth.keys.toSeq
    qs.map(q => (got.getOrElse(q, Nil).toSet & truth(q)).size).sum.toDouble /
      qs.map(truth(_).size).sum
  }

  test("sim_graph_search matches the sequential route-then-walk replay exactly") {
    val (search, _, _) = localSearch(sfDir)
    val got = Registry.queries("sim_graph_search")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    val expected = search.toSeq.flatMap { case (q, ns) =>
      ns.zipWithIndex.map { case (v, i) => (q, v, (i + 1).toLong) }
    }
    assert(got.toSet === expected.toSet)
    assert(got.nonEmpty)
  }

  /** 16 tight clusters split across LSH buckets (the KnnGraphSpec
    * regime): routing alone sees only the query's same-bucket fragment;
    * the two graph hops must reconnect the cluster. */
  private lazy val clusteredDir: String = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 16).flatMap { c =>
      val center = Array.fill(64)(rnd.nextGaussian())
      (0 until 30).map { p =>
        val e = center.map(x => (x + 0.45 * rnd.nextGaussian()).toFloat)
        (c * 30L + p, e.toSeq, c)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graph_search_fix").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Tiny self-contained corpus for the snapshot round-trip (NOT the
    * shared clusteredDir — this test mutates its embeddings table to
    * prove stale-fingerprint invalidation). */
  private def snapshotFixture(seed: Int, n: Int, dir: String): Unit = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    (0 until n).map(i =>
        (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq, 0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("descent snapshot: persist/load round-trip, warm graph identical, stale key rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-descent-fix").toString
    val art = java.nio.file.Files.createTempDirectory("graft-descent-art").toString
    snapshotFixture(seed = 11, n = 60, dir)
    assert(!SimQueries.descentEnsure(spark, dir, art),
      "ensure claimed a hit on an empty artifact dir")
    def graph(): Set[(Long, Long, Long)] =
      SimQueries.descentR1(spark, dir).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("rk"))).toSet
    val g1 = graph()
    assert(g1.nonEmpty)

    // unchanged corpus, cold session cache → parquet-backed reload
    SimQueries.descentInvalidate()
    assert(SimQueries.descentEnsure(spark, dir, art),
      "unchanged corpus did not reuse the persisted snapshot")
    assert(SimQueries.descentR1(spark, dir).queryExecution.executedPlan
      .toString.contains("Scan parquet"), "loaded graph is not parquet-backed")
    assert(graph() === g1)

    // changed embeddings → stale fingerprint → rebuild, new graph shape
    SimQueries.descentInvalidate()
    snapshotFixture(seed = 12, n = 40, dir)
    assert(!SimQueries.descentEnsure(spark, dir, art),
      "changed corpus reused a stale snapshot")
    assert(graph() !== g1)
    SimQueries.descentInvalidate()
  }

  private def md5Byte(s: String): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    "0123456789abcdef".indexOf(h(0)) * 16 + "0123456789abcdef".indexOf(h(1))
  }

  test("sim_graph_incremental: delta/base membership, exact cosines, attach recall") {
    val dir = clusteredDir
    val got = Registry.queries("sim_graph_incremental")(spark, dir).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("cos"), r.getAs[Long]("rk")))
    assert(got.nonEmpty)
    val raw = Tables.embeddings(spark, dir).collect().map { r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray
    }.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def cos(a: Long, b: Long): Double =
      dot(raw(a), raw(b)) / math.sqrt(dot(raw(a), raw(a)) * dot(raw(b), raw(b)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val newIds = raw.keySet.filter(v => md5Byte(v.toString) < 26)
    // membership: attach edges go FROM the delta batch INTO the base
    got.foreach { case (q, v, c, rk) =>
      assert(newIds(q), s"new_id $q not in the delta batch")
      assert(!newIds(v), s"attached $v is not a base vector")
      assert(rk >= 1 && rk <= 3)
      assert(c === r6(cos(q, v)), s"cos($q,$v)")
    }
    // ≤ 3 attach edges per new node, ranked by descending cosine
    got.groupBy(_._1).foreach { case (q, es) =>
      assert(es.length <= 3, s"$q has ${es.length} attach edges")
      val byRk = es.sortBy(_._4).map(e => cos(e._1, e._2))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b }, s"$q ranks")
    }
    // attach quality: recall vs the exact base-side top-3 per new node
    val baseIds = raw.keySet -- newIds
    val truth = got.map(_._1).distinct.map { q =>
      q -> baseIds.filter(_ != q).toSeq.map(v => v -> cos(q, v))
        .sortBy { case (v, c) => (-c, v) }.take(3).map(_._1).toSet
    }.toMap
    val hit = got.count { case (q, v, _, _) => truth(q)(v) }
    val recall = hit.toDouble / (truth.size * 3)
    info(f"attach recall@3 = $recall%.4f over ${truth.size} new vectors")
    assert(recall >= 0.5, f"attach recall floor: $recall%.4f")
  }

  test("sim_graph_incremental: ONE base-index build serves repeated insert batches") {
    val dir = clusteredDir
    SimQueries.descentInvalidate()
    val before = SimQueries.baseIndexBuildCount
    val r1 = Registry.queries("sim_graph_incremental")(spark, dir).collect().toSet
    val r2 = Registry.queries("sim_graph_incremental")(spark, dir).collect().toSet
    assert(SimQueries.baseIndexBuildCount - before <= 1,
      "base index rebuilt across insert batches — the build is charged to ingest")
    assert(r1 === r2)
    assert(r1.nonEmpty)
  }

  test("base-index snapshot: persist/load round-trip, parquet-backed, stale key rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-baseidx-fix").toString
    val art = java.nio.file.Files.createTempDirectory("graft-baseidx-art").toString
    snapshotFixture(seed = 21, n = 80, dir)
    assert(!SimQueries.baseIndexEnsure(spark, dir, art),
      "ensure claimed a hit on an empty artifact dir")
    def attach(): Set[(Long, Long, Long)] =
      Registry.queries("sim_graph_incremental")(spark, dir).collect()
        .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("rk"))).toSet
    val a1 = attach()
    assert(a1.nonEmpty)

    // unchanged corpus, cold session cache → parquet-backed reload, and
    // the insert query's answer is identical off the loaded index
    SimQueries.descentInvalidate()
    assert(SimQueries.baseIndexEnsure(spark, dir, art),
      "unchanged corpus did not reuse the persisted base-index snapshot")
    val (_, adjLoaded, _) = SimQueries.baseIndexBuild(spark, dir)
    assert(adjLoaded.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "loaded base adjacency is not parquet-backed")
    assert(attach() === a1)

    // changed embeddings → stale fingerprint → rebuild
    SimQueries.descentInvalidate()
    snapshotFixture(seed = 22, n = 60, dir)
    assert(!SimQueries.baseIndexEnsure(spark, dir, art),
      "changed corpus reused a stale base-index snapshot")
    SimQueries.descentInvalidate()
  }

  test("graphSearchFrom: shuffled (broadcast-off) fallback returns identical attach edges") {
    val dir = clusteredDir
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val newPred = expr(
      s"(${graft.queries.PortableHash.md5Byte("CAST(vec_id AS STRING)")}) < 26")
    val base = emb.where(not(newPred))
    val newV = emb.where(newPred)
    val r1 = SimQueries.knnDescentTopK(
      SimQueries.knnDescentCandidates(SimQueries.knnDescentSeed(base)), base)
    val adj = SimQueries.cappedUnd(r1).localCheckpoint(eager = true)
    val codes = SimQueries.forestCodes(base).localCheckpoint(eager = true)
    val vecs = base.select(col("vec_id"), col("embedding"),
      expr("dot_ordered(embedding, embedding)").as("norm2"))
    val queries = newV.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      expr("dot_ordered(embedding, embedding)").as("q_norm2"))
    val qcodes = SimQueries.forestCodes(newV)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    def run(bcast: Boolean): Set[(Long, Long, Double, Long)] =
      SimQueries.graphSearchFrom(vecs, adj, codes, queries, qcodes,
          broadcastQueries = bcast)
        .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"),
          col("rk"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    val withB = run(bcast = true)
    val without = run(bcast = false)
    assert(withB.nonEmpty)
    assert(withB === without,
      "the large-batch shuffle fallback diverges from the broadcast plan")
  }

  test("sim_graph_compact: in-core fold replay, deg ≤ 6, delta nodes wired in") {
    val dir = clusteredDir
    val got = Registry.queries("sim_graph_compact")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // replay the FOLD in-core from the engine's own (oracle-green)
    // inputs: base r1 scored graph ∪ attach edges, forward edges kept,
    // reverse side re-competing at top-3 by (rounded cos desc, q_id)
    val (r1df, _, _) = SimQueries.baseIndexBuild(spark, dir)
    val r1 = r1df.collect().map(r => (r.getAs[Long]("q_id"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    val attach = Registry.queries("sim_graph_incremental")(spark, dir)
      .collect().map(r => (r.getAs[Long]("new_id"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    val folded = r1 ++ attach
    val fwd = folded.map(e => (e._1, e._2))
    val rev = folded.groupBy(_._2).toSeq.flatMap { case (v, es) =>
      es.sortBy(e => (-e._3, e._1)).take(3).map(e => (v, e._1))
    }
    assert(got === (fwd ++ rev).toSet)
    // serving degree bound survives the fold
    val degMax = got.groupBy(_._1).map(_._2.size).max
    assert(degMax <= 6, s"post-compaction max degree $degMax")
    // every attached delta node is wired into the compacted adjacency
    // (out-edges at least; in-edges only if it won a reverse slot)
    attach.map(_._1).distinct.foreach { n =>
      assert(got.exists(_._1 == n), s"delta node $n missing from adjacency")
    }
    // NOTE deliberately NOT asserted: directed fan-IN (how many a_id
    // rows point AT a node) is unbounded by design — a hub can sit in
    // arbitrarily many nodes' top-3. Search cost only reads adj BY
    // a_id, so the serving bound is the out-degree asserted above; the
    // reverse CAP guarantees each node's own adjacency list gains at
    // most 3 reverse slots, which the fold replay already pins.
  }

  test("post-compaction search: replay-equivalent, new vectors reachable, recall floor") {
    val dir = clusteredDir
    val emb = Tables.embeddings(spark, dir)
    val adj2 = Registry.queries("sim_graph_compact")(spark, dir)
      .localCheckpoint(eager = true)
    val codes = SimQueries.forestCodes(emb).localCheckpoint(eager = true)
    val got = SimQueries.graphSearch(emb, adj2, codes, col("q_id") < 8)
      .select(col("q_id"), col("vec_id"), col("rk")).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    assert(got.nonEmpty)
    // in-core route-then-walk replay over the engine's OWN compacted
    // adjacency (the fold itself is pinned by the previous test)
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
    def topK(a: Long, pool: Iterable[Long], k: Int): Seq[Long] =
      pool.filter(_ != a).toSeq.distinct.map(v => v -> cos(a, v))
        .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
    val adjMap = adj2.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .groupBy(_._1).map { case (a, es) => a -> es.map(_._2).toSet }
    def bucketsOf(firstPlane: Int): Map[Long, String] =
      SimQueries.lshBuckets(emb, 8, firstPlane).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket")).toMap
    val (b0, b1) = (bucketsOf(0), bucketsOf(8))
    val queries = ids.filter(_ < 8)
    val expected = queries.flatMap { q =>
      val entries = (topK(q, ids.filter(v => b0(v) == b0(q)), 1) ++
        topK(q, ids.filter(v => b1(v) == b1(q)), 1)).distinct
      if (entries.isEmpty) None
      else {
        def hop(beam: Seq[Long], k: Int): Seq[Long] =
          topK(q, (beam ++ beam.flatMap(b =>
            adjMap.getOrElse(b, Set.empty[Long]))).filter(_ != q), k)
        Some(q -> hop(hop(hop(entries, 4), 4), 3))
      }
    }.toMap
    val expectedRows = expected.toSeq.flatMap { case (q, ns) =>
      ns.zipWithIndex.map { case (v, i) => (q, v, (i + 1).toLong) }
    }
    assert(got.toSet === expectedRows.toSet)
    // the compacted index must be able to ANSWER WITH delta vectors
    // (pre-compaction, base-split search could never return them)
    def md5B(v: Long): Int = md5Byte(v.toString)
    val newIds = ids.filter(v => md5B(v) < 26).toSet
    assert(got.exists(g => newIds(g._2)),
      "no delta vector ever surfaces in post-compaction answers")
    // recall floor vs full-corpus truth — search quality survives the fold
    val truth = queries.map(q => q -> topK(q, ids, 3).toSet).toMap
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    val r = recallOf(gotByQ, truth)
    info(f"post-compaction recall@3 = $r%.4f")
    assert(r >= 0.5, f"post-compaction recall floor: $r%.4f")
  }

  test("sim_graph_search on a clustered corpus: beats bucket-only routing, recall floor") {
    val dir = clusteredDir
    val (search, truth, bucketOnly) = localSearch(dir)
    val got = Registry.queries("sim_graph_search")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    val expected = search.toSeq.flatMap { case (q, ns) =>
      ns.zipWithIndex.map { case (v, i) => (q, v, (i + 1).toLong) }
    }
    assert(got.toSet === expected.toSet)
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    val (rSearch, rBucket) = (recallOf(gotByQ, truth), recallOf(bucketOnly, truth))
    info(f"recall@3 search=$rSearch%.4f bucket-only=$rBucket%.4f")
    assert(rSearch > rBucket,
      f"graph hops must add recall over routing alone: $rSearch%.4f vs $rBucket%.4f")
    assert(rSearch >= 0.5, f"clustered-corpus recall floor: $rSearch%.4f")
  }

  /** The `del:`-salted kill-list the engine's [[SimQueries.tombstones]]
    * selects (~10% of ids). */
  private def tombSet(ids: Iterable[Long]): Set[Long] =
    ids.filter(v => md5Byte(s"del:$v") < 26).toSet

  test("sim_graph_delete: tombstones out of every pool, replay-equivalent, never returned") {
    val ids = Tables.embeddings(spark, sfDir).select("vec_id").collect()
      .map(_.getLong(0)).toSeq
    val tomb = tombSet(ids)
    assert(tomb.nonEmpty, "fixture selects no tombstones — test is vacuous")
    val got = Registry.queries("sim_graph_delete")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    assert(got.nonEmpty)
    // deleted-never-returned: neither as an answer nor as a query
    got.foreach { case (q, v, _) =>
      assert(!tomb(q) && !tomb(v), s"tombstoned id served: ($q, $v)")
    }
    // exact sequential replay: index over ALL ids, pools live-only
    val (search, _, _) = localSearch(sfDir, v => !tomb(v))
    val expected = search.toSeq.flatMap { case (q, ns) =>
      ns.zipWithIndex.map { case (v, i) => (q, v, (i + 1).toLong) }
    }
    assert(got.toSet === expected.toSet)
  }

  test("sim_graph_sweep: swept fold replay, no tombstoned endpoints, deg ≤ 6") {
    val dir = clusteredDir
    val got = Registry.queries("sim_graph_sweep")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val ids = Tables.embeddings(spark, dir).select("vec_id").collect()
      .map(_.getLong(0)).toSeq
    val tomb = tombSet(ids)
    assert(tomb.nonEmpty)
    got.foreach { case (a, b) =>
      assert(!tomb(a) && !tomb(b), s"tombstoned endpoint survived sweep: ($a, $b)")
    }
    // in-core fold replay with the sweep applied BEFORE the reverse
    // re-competition — freed reverse slots go to the next-best survivors
    val (r1df, _, _) = SimQueries.baseIndexBuild(spark, dir)
    val r1 = r1df.collect().map(r => (r.getAs[Long]("q_id"),
      r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    val attach = Registry.queries("sim_graph_incremental")(spark, dir)
      .collect().map(r => (r.getAs[Long]("new_id"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    val swept = (r1 ++ attach).filter(e => !tomb(e._1) && !tomb(e._2))
    val fwd = swept.map(e => (e._1, e._2))
    val rev = swept.groupBy(_._2).toSeq.flatMap { case (v, es) =>
      es.sortBy(e => (-e._3, e._1)).take(3).map(e => (v, e._1))
    }
    assert(got === (fwd ++ rev).toSet)
    val degMax = got.groupBy(_._1).map(_._2.size).max
    assert(degMax <= 6, s"post-sweep max degree $degMax")
  }

  test("post-sweep serving: replay-equivalent over the swept graph, recall floor on survivors") {
    val dir = clusteredDir
    val emb = Tables.embeddings(spark, dir)
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSeq
    val tomb = tombSet(ids)
    val liveIds = ids.filterNot(tomb)
    // the post-sweep snapshot a store would re-persist: swept adjacency +
    // codes/vectors re-emitted over the survivors only
    val liveDf = emb.join(SimQueries.tombstones(spark, dir),
      Seq("vec_id"), "left_anti")
    val adj2 = Registry.queries("sim_graph_sweep")(spark, dir)
      .localCheckpoint(eager = true)
    val codes = SimQueries.forestCodes(liveDf).localCheckpoint(eager = true)
    val got = SimQueries.graphSearch(liveDf, adj2, codes, col("q_id") < 8)
      .select(col("q_id"), col("vec_id"), col("rk")).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rk")))
    assert(got.nonEmpty)
    got.foreach { case (q, v, _) =>
      assert(!tomb(q) && !tomb(v), s"tombstone served post-sweep: ($q, $v)")
    }
    // in-core route-then-walk over the engine's OWN swept adjacency
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
    def topK(a: Long, pool: Iterable[Long], k: Int): Seq[Long] =
      pool.filter(_ != a).toSeq.distinct.map(v => v -> cos(a, v))
        .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
    val adjMap = adj2.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .groupBy(_._1).map { case (a, es) => a -> es.map(_._2).toSet }
    def bucketsOf(firstPlane: Int): Map[Long, String] =
      SimQueries.lshBuckets(liveDf, 8, firstPlane).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket")).toMap
    val (b0, b1) = (bucketsOf(0), bucketsOf(8))
    val queries = liveIds.filter(_ < 8)
    val expected = queries.flatMap { q =>
      val entries = (topK(q, liveIds.filter(v => b0(v) == b0(q)), 1) ++
        topK(q, liveIds.filter(v => b1(v) == b1(q)), 1)).distinct
      if (entries.isEmpty) None
      else {
        def hop(beam: Seq[Long], k: Int): Seq[Long] =
          topK(q, (beam ++ beam.flatMap(b =>
            adjMap.getOrElse(b, Set.empty[Long]))).filter(_ != q), k)
        Some(q -> hop(hop(hop(entries, 4), 4), 3))
      }
    }.toMap
    val expectedRows = expected.toSeq.flatMap { case (q, ns) =>
      ns.zipWithIndex.map { case (v, i) => (q, v, (i + 1).toLong) }
    }
    assert(got.toSet === expectedRows.toSet)
    // recall floor on survivors: deletes must not collapse search
    // quality below what ROUTING alone answers (the graph hops must
    // still earn their keep post-sweep), nor below an absolute floor.
    // Granularity note: 8 queries × 3 slots — one miss costs 0.042; the
    // measured value here is 0.4167 on a graph that lost ~10% of its
    // nodes AND their edges (the base split already excluded the ~10%
    // insert batch), so the pre-sweep 0.75 is not the right bar.
    val truth = queries.map(q => q -> topK(q, liveIds, 3).toSet).toMap
    val gotByQ = got.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSeq }
    val r = recallOf(gotByQ, truth)
    val bucketOnly = queries.map { q =>
      q -> topK(q, liveIds.filter(v => b0(v) == b0(q)) ++
        liveIds.filter(v => b1(v) == b1(q)), 3).toSet
    }.toMap
    val rBucket = recallOf(bucketOnly, truth)
    info(f"post-sweep survivor recall@3 = $r%.4f (routing-only $rBucket%.4f)")
    assert(r >= rBucket, f"post-sweep recall $r%.4f fell below routing-only $rBucket%.4f")
    assert(r >= 1.0 / 3, f"post-sweep recall floor: $r%.4f")
  }
}
