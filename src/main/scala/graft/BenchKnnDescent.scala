package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the sim_knn_descent join shape that the per-query
  * bench (2k vectors) cannot give: a clustered multi-million-vector
  * corpus through seed → candidate fan-out → exact-cosine re-select,
  * with the fan-out COUNTED against its k²-bound, not assumed.
  *
  * The corpus is the regime NN-descent exists for: n/100 clusters whose
  * members share a hash-derived center plus per-point noise, so true
  * neighborhoods straddle LSH buckets. `planes` scales with n
  * (buckets = 2^planes per table) — the knob the Scaladoc declares; at
  * 2 M vectors, 16 planes keeps in-bucket candidate sets ~30.
  *
  * Prints ONE JSON line:
  *   {"metric":"knn_descent_scale","vectors":n,"planes":p,
  *    "seed_edges":e,"cand_pairs":c,"cand_bound":b,"out_rows":r,
  *    "seed_sec":s1,"value":sec}
  *
  * Exits non-zero if the corpus-linearity contract breaks: candidate
  * pairs above the (2·2·k)² + 2·2·k per-node bound (k = 3 per table
  * direction), or output above 3 rows per node.
  *
  * Usage: graft.BenchKnnDescent [numVectors] [planes]
  *   (default 2,000,000 vectors, 16 planes)
  */
object BenchKnnDescent {
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
    val planes = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val nClusters = math.max(n / 100L, 1L)
    // center(cid, d) and noise(id, d) from xxhash64 → uniform in [-1, 1]
    // and [0, 0.25) respectively: deterministic, engine-native, no RNG
    // state. pmod, not % — Spark's % keeps the dividend sign, which
    // would skew the centers negative (ADVICE r07 #2).
    val dims = (0 until 64).map { d =>
      val center = s"pmod(xxhash64(vec_id % $nClusters * 64 + $d), 1000) / 500.0 - 1.0"
      val noise = s"pmod(xxhash64(vec_id * 64 + $d + 7777777), 1000) / 4000.0"
      expr(s"CAST($center + $noise AS FLOAT)")
    }
    val emb = spark.range(n).select(col("id").as("vec_id"),
        array(dims: _*).as("embedding"))
      .localCheckpoint(eager = true)

    val t0 = System.nanoTime()
    val seed = graft.sim.SimQueries.knnDescentSeed(emb, planes)
      .localCheckpoint(eager = true)
    val seedEdges = seed.count()
    val seedSec = (System.nanoTime() - t0) / 1e9

    val cand = graft.sim.SimQueries.knnDescentCandidates(seed)
      .localCheckpoint(eager = true)
    val candPairs = cand.count()
    val outRows = graft.sim.SimQueries.knnDescentTopK(cand, emb)
      .queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9

    // per-node: ≤ 2 tables × k(=3) out-edges → undirected degree ≤ 12;
    // candidates ≤ deg + deg² per node
    val bound = n * (12L + 144L)
    val ok = candPairs <= bound && outRows <= 3L * n

    // Convergence driver at scale (VERDICT r07 task 4): measured rounds
    // + per-round deltas. Post-seed rounds run capped-reverse und (deg
    // ≤ 6), so EVERY round's candidate set is bounded by (6 + 36)·n —
    // the cappedUnd contract; the one-round cand bound above already
    // dominates it, and knnDescentConverge itself caps rounds at 5, so
    // the converge pass inherits the same corpus-linearity tripwire via
    // its own fan-out (a blow-up would OOM/stall loudly, and the delta
    // telemetry below exposes any round whose edge set stops shrinking).
    val tC = System.nanoTime()
    val (tkC, rounds, deltas) = graft.sim.SimQueries.knnDescentConverge(emb, planes)
    val convRows = tkC.queryExecution.toRdd.count()
    val convSec = (System.nanoTime() - tC) / 1e9
    val okConv = convRows <= 3L * n

    println(f"""{"metric":"knn_descent_scale","vectors":$n,"planes":$planes,""" +
      f""""seed_edges":$seedEdges,"cand_pairs":$candPairs,"cand_bound":$bound,""" +
      f""""out_rows":$outRows,"seed_sec":$seedSec%.1f,""" +
      f""""converge_rounds":$rounds,""" +
      s""""converge_deltas_ppm":[${deltas.mkString(",")}],""" +
      f""""converge_rows":$convRows,"converge_sec":$convSec%.1f,""" +
      f""""value":$sec%.1f}""")
    spark.stop()
    if (!ok || !okConv) sys.exit(1)
  }
}
