package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the O16 star-iteration connected components that the
  * per-query bench cannot give: a multi-million-edge Zipf graph — one giant
  * hub-anchored component plus a power-law degree tail, the skew shape that
  * breaks naive label propagation — run end to end with per-round live-edge
  * telemetry.
  *
  * Prints ONE JSON line:
  *   {"metric":"cc_skew","edges":N,"rounds":k,"round_edges":[...],
  *    "components":c,"nodes":m,"peak_extra_persisted":p,"value":sec}
  *
  * Exits non-zero if the O(log n) contraction claim fails: rounds > 20 or
  * checkpoint residency above the input+current+in-flight bound.
  *
  * Usage: graft.BenchCC [numEdges]   (default 10,000,000)
  */
object BenchCC {
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
    // node = floor(N^r), r ~ U[0,1): P(node <= x) = log_N(x), density ∝ 1/x
    // — node 1 appears in ~7% of all edges at N=5M (the giant hub)
    val idSpace = math.max(nEdges / 2, 1000L).toDouble
    val edges = spark.range(nEdges).select(
      pow(lit(idSpace), rand(11)).cast("long").as("src"),
      pow(lit(idSpace), rand(12)).cast("long").as("dst"))

    val rounds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var peakExtra = 0
    val before = spark.sparkContext.getPersistentRDDs.size
    val t0 = System.nanoTime()
    // driverFinishEdges=0: force every round distributed — the 1000-executor
    // shape, no driver union-find assist
    val cc = graft.identity.Components.connectedComponents(
      edges, driverFinishEdges = 0L,
      roundListener = (_, e) => {
        rounds += e
        peakExtra = math.max(peakExtra,
          spark.sparkContext.getPersistentRDDs.size - before)
      })
    val agg = cc.agg(count(lit(1)), countDistinct(col("component"))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    val (nodes, comps) = (agg.getLong(0), agg.getLong(1))

    println(s"""{"metric":"cc_skew","edges":$nEdges,"rounds":${rounds.size},""" +
      s""""round_edges":${rounds.mkString("[", ",", "]")},""" +
      s""""components":$comps,"nodes":$nodes,""" +
      s""""peak_extra_persisted":$peakExtra,"value":$secs,"unit":"sec"}""")
    spark.stop()

    if (rounds.size > 20) { System.err.println("FAIL: rounds > 20"); sys.exit(1) }
    if (peakExtra > 3) { System.err.println("FAIL: checkpoint residency > 3"); sys.exit(1) }
  }
}
