package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the adaptive bloom-pruned triangle closure that the
  * per-query bench cannot give: a 10 M-edge random graph (the regime
  * ABOVE the old 50 M-edge cutoff's little sibling — large enough that
  * the wedge stream dwarfs the edge list) run end to end, asserting the
  * budget-sized prune ENGAGED instead of silently falling back to the
  * unpruned Σ od² closure join.
  *
  * Prints ONE JSON line:
  *   {"metric":"triangles_scale","edges":N,"pruned":true,"fpp":…,
  *    "filter_mb":…,"n_triangles":…,"n_wedges":…,"value":sec}
  *
  * Exits non-zero if the prune did not engage, or the chosen fpp exceeds
  * 0.01 at this size (10 M keys need ~18 MB at fpp 0.001 — far inside
  * the 256 MB budget, so anything coarser means the sizing math broke).
  *
  * Usage: graft.BenchTriangles [numEdges]   (default 10,000,000)
  */
object BenchTriangles {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nEdges = args.headOption.map(_.toLong).getOrElse(10000000L)
    // uniform random endpoints, avg degree ~10: wedges ≈ 45 per node —
    // a ~45 M-row wedge stream against a 10 M-row edge list, the shape
    // where the prune's kill rate decides the shuffle
    val nNodes = math.max(nEdges / 5, 100L)
    val raw = spark.range(nEdges).select(
      (abs(xxhash64(col("id"))) % nNodes).as("x"),
      (abs(xxhash64(col("id") + 1000000007L)) % nNodes).as("y"))
    val pairs = raw.where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()

    var decision: Option[graft.queries.BloomPrune.AdaptivePrune] = None
    val t0 = System.nanoTime()
    val row = graft.queries.GraphBpeQueries
      .triangleStats(pairs, ap => decision = Some(ap))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    val d = decision.getOrElse(
      sys.error("triangleStats never reached the prune decision"))

    println(s"""{"metric":"triangles_scale","edges":${row.getAs[Long]("n_edges")},""" +
      s""""pruned":${d.engaged},"fpp":${d.fpp},""" +
      s""""filter_mb":${d.filterBytes / 1024 / 1024},""" +
      s""""n_triangles":${row.getAs[Long]("n_triangles")},""" +
      s""""n_wedges":${row.getAs[Long]("n_wedges")},""" +
      s""""value":$secs,"unit":"sec"}""")
    spark.stop()

    if (!d.engaged) { System.err.println("FAIL: prune did not engage"); sys.exit(1) }
    if (d.fpp > 0.01) { System.err.println(s"FAIL: fpp ${d.fpp} too coarse"); sys.exit(1) }
  }
}
