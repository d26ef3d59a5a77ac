package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc isolated artifact/query timing probe (local profiling only):
  * `ProbeMain <sfDir> <what>` where what ∈ {descent, triclosure}.
  * Warms the JVM on sf0.001 first, then times the named build twice
  * with invalidation between passes — the Bench cold protocol, minus
  * the surrounding 258-query run.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val what = args(1)
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
    }
    // JVM warm on the small corpus
    val smallDir = "/root/testdata/sf0.001"
    what match {
      case "descent" => graft.sim.SimQueries.descentR1(spark, smallDir)
      case "triclosure" => graft.queries.GraphBpeQueries.coClosure(spark, smallDir)
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      build()
      println(f"pass$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
