package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timings for hotspot queries (not registered;
  * run with `runMain graft.DevProfile`). Delete-or-keep freely.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def consume(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // warmup: full query once
    consume(SparkEntry.queries("graph_triangles")(spark, dir))

    for (round <- 1 to 2) {
      println(s"--- round $round (fresh frames) ---")
      val li = queries.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
      val pairs = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
      val p = time("ckpt pairs") { pairs.localCheckpoint(eager = true) }
      val deg = time("ckpt deg") {
        p.select(col("a").as("node"))
          .union(p.select(col("b").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
          .localCheckpoint(eager = true)
      }
      val oriented = time("ckpt oriented") {
        p.join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
          .select(
            when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
              struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
              .otherwise(
                struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
              .as("e"))
          .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
          .localCheckpoint(eager = true)
      }
      val nEdges = time("count edges") { oriented.count() }
      val wedges = oriented.select(col("u"), col("v").as("wu"), col("dv").as("d1"))
        .join(oriented.select(col("u"), col("v").as("wv"), col("dv").as("d2"))
          .hint("shuffle_hash"), "u")
        .where(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("wu") < col("wv")))
        .select(col("wu"), col("wv"),
          xxhash64(col("wu"), col("wv")).as("ek"))
      val closing = oriented
        .select(col("u").as("wu"), col("v").as("wv"),
          xxhash64(col("u"), col("v")).as("ek"))
      val pruned = time("bloom build") {
        queries.BloomPrune.prune(wedges, "ek", closing.select(col("ek")), "ek",
          expectedItems = math.max(nEdges, 1000L), fpp = 0.001)
      }
      val tri = pruned
        .join(closing.hint("shuffle_hash"), Seq("wu", "wv", "ek"))
        .agg(count(lit(1)).as("n_triangles"))
      val totals = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      val out = totals.crossJoin(tri).withColumn("n_edges", lit(nEdges))
      time("wedge join + final") { consume(out) }
    }

    spark.stop()
  }
}
