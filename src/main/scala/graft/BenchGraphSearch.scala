package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the sim_graph_search READ path that the per-query
  * bench (5k vectors) cannot give: the same clustered multi-million-
  * vector corpus as BenchKnnDescent, through descent-graph build →
  * capped adjacency → the EXACT shipped search body
  * ([[graft.sim.SimQueries.graphSearch]] — one definition, so the probe
  * cannot drift from the query), with the structural scale contract
  * ASSERTED, not assumed:
  *
  *  - adjacency max degree ≤ 6 (3 forward + 3 capped reverse — the
  *    bound that makes every hop's frontier ≤ beam·(1+deg) per query,
  *    CONSTANT in corpus size);
  *  - output ≤ k rows per ANSWERED query, and ≥ 90% of the
  *    stride-selected query population answered;
  *  - recall@3 ≥ 0.5 against the exact brute-force top-3 whenever
  *    planes follow [[graft.sim.SimQueries.planesFor]]'s
  *    in-bucket-~30 law (the shipped sizing contract).
  *
  * Prints ONE JSON line:
  *   {"metric":"graph_search_scale","vectors":n,"planes":p,
  *    "queries":q,"adj_edges":e,"adj_deg_max":d,"build_sec":b,
  *    "search_sec":s,"recall":r,"value":total}
  *
  * Exits non-zero if a structural bound or the recall floor breaks.
  *
  * Usage: graft.BenchGraphSearch [numVectors] [planes] [numQueries]
  *   (default 2,000,000 vectors, planesFor(n) planes, 64 queries)
  */
object BenchGraphSearch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    // default = the planes-per-corpus-size law (in-bucket ~30); the
    // recall floor below is asserted only under the law — an explicit
    // override is a what-if probe, not the shipped sizing.
    val planes = args.drop(1).headOption.map(_.toInt)
      .getOrElse(graft.sim.SimQueries.planesFor(n))
    val nQueries = args.drop(2).headOption.map(_.toLong).getOrElse(64L)
    val nClusters = math.max(n / 100L, 1L)
    // the BenchKnnDescent corpus: hash-derived cluster centers + noise
    val dims = (0 until 64).map { d =>
      val center = s"pmod(xxhash64(vec_id % $nClusters * 64 + $d), 1000) / 500.0 - 1.0"
      val noise = s"pmod(xxhash64(vec_id * 64 + $d + 7777777), 1000) / 4000.0"
      expr(s"CAST($center + $noise AS FLOAT)")
    }
    val emb = spark.range(n).select(col("id").as("vec_id"),
        array(dims: _*).as("embedding"))
      .localCheckpoint(eager = true)

    // index build: round-1 descent graph at the corpus-scaled planes
    val t0 = System.nanoTime()
    val r1 = graft.sim.SimQueries.knnDescentTopK(
      graft.sim.SimQueries.knnDescentCandidates(
        graft.sim.SimQueries.knnDescentSeed(emb, planes)), emb)
      .localCheckpoint(eager = true)
    val adj = graft.sim.SimQueries.cappedUnd(r1)
      .localCheckpoint(eager = true)
    val codes = graft.sim.SimQueries.forestCodes(emb, planes)
      .localCheckpoint(eager = true)
    val adjEdges = adj.count()
    val degMax = adj.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).collect()(0).getLong(0)
    val buildSec = (System.nanoTime() - t0) / 1e9

    // the shipped search body over a spread-out query sample
    val stride = math.max(n / nQueries, 1L)
    val pred = col("q_id") % stride === 0
    val t1 = System.nanoTime()
    val got = graft.sim.SimQueries.graphSearch(emb, adj, codes, pred)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val searchSec = (System.nanoTime() - t1) / 1e9

    // exact ground truth for the same sample
    val truth = graft.sim.SimQueries.bruteForceTopK(emb, pred, 3)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truthByQ = truth.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hit = got.count { case (q, v) => truthByQ.getOrElse(q, Set.empty)(v) }
    val recall = hit.toDouble / math.max(truth.length, 1)

    val qCount = got.map(_._1).distinct.length
    val okDeg = degMax <= 6L
    // ADVICE r08 #3: assert against the INTENDED query population (ids
    // matching the stride predicate), not a count derived from the
    // output itself — ≤ k rows per answered query, and ≥ 90% of the
    // selected queries answered. A bucket-singleton query legitimately
    // drops (no entry point — declared), but silent mass drops must
    // fail the probe.
    val expectedQ = ((n + stride - 1) / stride).toInt
    val okOut = got.groupBy(_._1).valuesIterator.forall(_.length <= 3) &&
      qCount <= expectedQ && qCount * 10 >= expectedQ * 9
    // recall floor under the planes law (VERDICT r08 task 5): measured
    // 0.568 at 2 M/16 planes — 0.5 is the contract. Only asserted when
    // planes follow the law; an explicit override probes other points.
    val lawPlanes = planes == graft.sim.SimQueries.planesFor(n)
    val okRecall = !lawPlanes || recall >= 0.5
    val total = (System.nanoTime() - t0) / 1e9

    println(f"""{"metric":"graph_search_scale","vectors":$n,"planes":$planes,""" +
      f""""queries":$qCount,"queries_expected":$expectedQ,""" +
      f""""adj_edges":$adjEdges,"adj_deg_max":$degMax,""" +
      f""""build_sec":$buildSec%.1f,"search_sec":$searchSec%.1f,""" +
      f""""recall":$recall%.3f,"recall_floor_asserted":$lawPlanes,""" +
      f""""value":$total%.1f}""")
    spark.stop()
    if (!okDeg || !okOut || !okRecall) sys.exit(1)
  }
}
