package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the grow→compact half of the graph-ANN lifecycle
  * (VERDICT r08 task 2 "done" criterion): the clustered synthetic
  * corpus of BenchKnnDescent/BenchGraphSearch, base split indexed once,
  * then N cycles of
  *
  *   1. GROW — attach a delta batch through the served index
  *      ([[graft.sim.SimQueries.graphSearchFrom]], the shipped insert
  *      body: entry routing over the GROWN code table, beam hops over
  *      the COMPACTED adjacency);
  *   2. DELETE + COMPACT — tombstone ~2% of the already-indexed ids,
  *      then fold the attach edges and sweep the kill-list via
  *      [[graft.sim.SimQueries.graphCompact]] (the shipped operator —
  *      one definition, the probe cannot drift), re-emitting the
  *      snapshot (scored log, codes, vectors) over the survivors;
  *
  * with the serving bound ASSERTED after EVERY cycle: compacted
  * adjacency max out-degree ≤ 6 (3 forward + 3 reverse-capped — the
  * bound the search path's beam·(1+deg) cost model rests on; without
  * compaction, repeated inserts would let reverse fan-in accumulate
  * unbounded at the next rebuild). Final recall@3 of the fully-grown
  * index against exact brute force is printed as quality telemetry.
  *
  * Prints ONE JSON line:
  *   {"metric":"graph_compact_scale","vectors":n,"base":b,"cycles":c,
  *    "planes":p,"deg_max_per_cycle":[...],"grow_sec":[...],
  *    "compact_sec":[...],"recall":r,"value":total}
  *
  * Exits non-zero if the degree bound breaks in any cycle.
  *
  * Usage: graft.BenchGraphCompact [numVectors] [cycles] [planes]
  *   (default 500,000 vectors, 4 cycles of 5% each over an 80% base,
  *    planesFor(base) planes)
  */
object BenchGraphCompact {
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
    graft.functions.GraftFunctions.register(spark)
    import graft.sim.SimQueries._

    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val cycles = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val baseN = n * 8 / 10
    val planes = args.drop(2).headOption.map(_.toInt)
      .getOrElse(planesFor(baseN))
    val nClusters = math.max(n / 100L, 1L)
    val dims = (0 until 64).map { d =>
      val center = s"pmod(xxhash64(vec_id % $nClusters * 64 + $d), 1000) / 500.0 - 1.0"
      val noise = s"pmod(xxhash64(vec_id * 64 + $d + 7777777), 1000) / 4000.0"
      expr(s"CAST($center + $noise AS FLOAT)")
    }
    val emb = spark.range(n).select(col("id").as("vec_id"),
        array(dims: _*).as("embedding"))
      .localCheckpoint(eager = true)
    def toVecs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("embedding"),
        expr("dot_ordered(embedding, embedding)").as("norm2"))

    val t0 = System.nanoTime()
    val base = emb.where(col("vec_id") < baseN)
    var g = knnDescentTopK(
        knnDescentCandidates(knnDescentSeed(base, planes)), base)
      .localCheckpoint(eager = true)
    var adj = cappedUnd(g).localCheckpoint(eager = true)
    var codes = forestCodes(base, planes).localCheckpoint(eager = true)
    var vecs = toVecs(base).localCheckpoint(eager = true)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val chunk = math.max((n - baseN) / cycles, 1L)
    val degMaxes = Array.ofDim[Long](cycles)
    val growSec = Array.ofDim[Double](cycles)
    val compactSec = Array.ofDim[Double](cycles)
    // cumulative kill-list (VERDICT r09 task 1: cycles include DELETES):
    // each cycle tombstones ~2% of the already-indexed ids and the
    // compaction sweeps them — post-sweep the adjacency must hold the
    // degree bound AND carry no tombstoned endpoint.
    var tombAll = spark.range(0).select(col("id").as("vec_id"))
      .localCheckpoint(eager = true)
    var deleted = 0L
    var ok = true
    for (c <- 0 until cycles) {
      val lo = baseN + c * chunk
      val hi = if (c == cycles - 1) n else lo + chunk
      val batch = emb.where(col("vec_id") >= lo && col("vec_id") < hi)
      val tG = System.nanoTime()
      val queries = batch.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"),
        expr("dot_ordered(embedding, embedding)").as("q_norm2"))
      val qcodes = forestCodes(batch, planes)
        .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
      // batch-scale insert rides the SHUFFLE plan (the ADVICE r08 #1
      // fallback, exercised here at scale): measured at 100k/6.6k-query
      // cycles, shuffled 6.8 s vs broadcast 12.6 s — the broadcast hints
      // only win when the query side is interactively small.
      val attach = graphSearchFrom(vecs, adj, codes, queries, qcodes,
          broadcastQueries = false)
        .select(col("q_id"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rk"))
        .localCheckpoint(eager = true)
      growSec(c) = (System.nanoTime() - tG) / 1e9

      val tC = System.nanoTime()
      // this cycle's delete batch: ~2% of the ALREADY-indexed ids,
      // xxhash64-selected (deterministic, disjoint from the insert batch)
      val tombC = vecs.select(col("vec_id"))
        .where(expr(s"pmod(xxhash64(vec_id * 31 + $c), 50) = 0"))
        .localCheckpoint(eager = true)
      def sweep(df: org.apache.spark.sql.DataFrame) =
        df.join(tombC, Seq("vec_id"), "left_anti")
      val adjNew = graphCompact(g, attach, Some(tombC))
        .localCheckpoint(eager = true)
      // the re-persisted snapshot drops the tombstones everywhere: the
      // scored log (else the next fold would resurrect swept edges),
      // the routing codes and the vector payloads
      val gNew = sweep(g.select(col("q_id"), col("vec_id"), col("cos"))
          .unionByName(attach.select(col("q_id"), col("vec_id"), col("cos")))
          .join(tombC.select(col("vec_id").as("q_id")), Seq("q_id"), "left_anti"))
        .localCheckpoint(eager = true)
      val codesNew = sweep(codes.union(forestCodes(batch, planes)))
        .localCheckpoint(eager = true)
      val vecsNew = sweep(vecs.union(toVecs(batch)))
        .localCheckpoint(eager = true)
      val tombNew = tombAll.union(tombC).localCheckpoint(eager = true)
      deleted += tombC.count()
      Seq(g, adj, codes, vecs, attach, tombAll)
        .foreach(graft.identity.Components.unpersistCheckpoint)
      g = gNew; adj = adjNew; codes = codesNew; vecs = vecsNew
      tombAll = tombNew
      graft.identity.Components.unpersistCheckpoint(tombC)
      // compact_sec is the FOLD's cost only (the eager checkpoints above
      // already executed it); the degree-bound audit below is assertion
      // work, timed outside the telemetry line (ADVICE r09 #3)
      compactSec(c) = (System.nanoTime() - tC) / 1e9
      degMaxes(c) = adj.groupBy(col("a_id")).agg(count(lit(1)).as("deg"))
        .agg(max(col("deg"))).collect()(0).getLong(0)
      ok &&= degMaxes(c) <= 6L
      // swept means SWEPT: no tombstoned endpoint survives in the
      // served adjacency, on either side
      val ghost = adj.join(tombAll, adj("a_id") === tombAll("vec_id")).count() +
        adj.join(tombAll, adj("b_id") === tombAll("vec_id")).count()
      ok &&= ghost == 0L
      System.err.println(f"# cycle ${c + 1}: +${hi - lo} vectors, " +
        f"deg_max ${degMaxes(c)}, ghosts $ghost, " +
        f"grow ${growSec(c)}%.1fs compact ${compactSec(c)}%.1fs")
    }

    // final serving-quality telemetry: the fully-grown compacted index
    // answers a spread-out query sample over the SURVIVORS (deleted ids
    // are out of corpus and truth alike); exact brute force is truth
    val live = emb.join(tombAll, Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = true)
    val stride = math.max(n / 64L, 1L)
    val pred = col("q_id") % stride === 0
    val got = graphSearch(live, adj, codes, pred)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = bruteForceTopK(live, pred, 3)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truthByQ = truth.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hit = got.count { case (q, v) => truthByQ.getOrElse(q, Set.empty)(v) }
    val recall = hit.toDouble / math.max(truth.length, 1)
    val total = (System.nanoTime() - t0) / 1e9

    def arr(a: Seq[Double]) = a.map(v => f"$v%.1f").mkString("[", ",", "]")
    println(s"""{"metric":"graph_compact_scale","vectors":$n,"base":$baseN,""" +
      s""""cycles":$cycles,"planes":$planes,"deleted":$deleted,""" +
      s""""deg_max_per_cycle":${degMaxes.mkString("[", ",", "]")},""" +
      s""""build_sec":${f"$buildSec%.1f"},"grow_sec":${arr(growSec.toSeq)},""" +
      s""""compact_sec":${arr(compactSec.toSeq)},""" +
      f""""recall":$recall%.3f,"value":$total%.1f}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
