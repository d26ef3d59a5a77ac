package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc isolated artifact/query timing probe (local profiling only):
  * `ProbeMain <sfDir> <what> [warmupDir]` where what ∈ {descent,
  * triclosure, base_index}. Warms the JVM on `warmupDir` (default the sf0.001
  * sibling of `sfDir` when it exists, else `sfDir` itself) first, then
  * times the named build over THREE passes with invalidation between
  * them — the Bench cold protocol, minus the surrounding full-registry
  * run (RegistrySpec pins the registered-query count).
  */
object ProbeMain {
  private val Whats = Set("descent", "triclosure", "base_index",
    "base_index_stages")

  def main(args: Array[String]): Unit = {
    // ADVICE r08 #4: validate args and take the warmup dir as an
    // argument instead of a hardcoded fixture path.
    if (args.length < 2 || !Whats(args(1))) {
      System.err.println(
        s"usage: graft.ProbeMain <sfDir> <${Whats.mkString("|")}> [warmupDir]")
      sys.exit(2)
    }
    val dir = args(0); val what = args(1)
    val warmupDir = args.drop(2).headOption.getOrElse {
      val sib = new java.io.File(new java.io.File(dir).getParent, "sf0.001")
      if (sib.isDirectory) sib.toString else dir
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def build(): Unit = what match {
      case "descent" =>
        graft.sim.SimQueries.descentInvalidate()
        graft.sim.SimQueries.descentR1(spark, dir).queryExecution.toRdd.count()
      case "triclosure" =>
        graft.queries.GraphBpeQueries.coClosureInvalidate()
        graft.queries.GraphBpeQueries.coClosure(spark, dir)._1
          .queryExecution.toRdd.count()
      case "base_index" =>
        graft.sim.SimQueries.descentInvalidate()
        val (r1, adj, codes) = graft.sim.SimQueries.baseIndexBuild(spark, dir)
        r1.queryExecution.toRdd.count()
        adj.queryExecution.toRdd.count()
        codes.queryExecution.toRdd.count()
      case "base_index_stages" =>
        graft.sim.SimQueries.descentInvalidate()
        graft.sim.SimQueries.baseIndexStagesProbe(spark, dir)
          .foreach { case (n, t) => println(f"  stage $n $t%.3f s") }
    }
    // JVM warm on the (small) warmup corpus
    what match {
      case "descent" => graft.sim.SimQueries.descentR1(spark, warmupDir)
      case "triclosure" =>
        graft.queries.GraphBpeQueries.coClosure(spark, warmupDir)
      case "base_index" | "base_index_stages" =>
        graft.sim.SimQueries.baseIndexBuild(spark, warmupDir)
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      build()
      println(f"pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
