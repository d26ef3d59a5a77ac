package graft.queries

import scala.util.Random

import graft.SparkSpec

/** What triangle counting MEANS, independent of the lineitem-derived
  * graph the oracle shares: known closed forms on canonical graphs, and
  * the oriented-wedge plan ≡ brute-force triple enumeration on random
  * graphs (where orientation/tie-break bugs would diverge).
  */
class TriangleSpec extends SparkSpec {

  private def stats(pairs: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val r = GraphBpeQueries.triangleStats(df).collect().head
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
  }

  test("closed forms: K4, star, path") {
    // K4: C(4,3) = 4 triangles, 6 edges, 12 wedges
    val k4 = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    assert(stats(k4) == ((4L, 6L, 12L, 4L)))
    // star K1,4: all wedges through the hub, zero triangles
    val star = (1L to 4L).map(i => (0L, i))
    assert(stats(star) == ((5L, 4L, 6L, 0L)))
    // path of 4 nodes: 2 wedges, no triangles
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(stats(path) == ((4L, 3L, 2L, 0L)))
  }

  test("orientation tames hubs: out-degree ≤ √(2m) on a skewed graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // hub 0 touches all 800 nodes (star) + a random sparse remainder —
    // the degree shape where an id-ordered wedge join would explode on
    // the hub (out-degree 800) while degree-ordering keeps it tiny
    val rnd = new Random(5)
    val star = (1L to 800L).map(h => (0L, h))
    val rest = (for (_ <- 1 to 1200) yield {
      val i = 1L + rnd.nextInt(800); val j = 1L + rnd.nextInt(800)
      (math.min(i, j), math.max(i, j))
    }).filter(p => p._1 != p._2).distinct
    val pairs = (star ++ rest).toDF("a", "b")
    val outDeg = GraphBpeQueries.orient(pairs)
      .groupBy(col("u")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).collect().head.getLong(0)
    val m = star.size + rest.size
    val bound = math.ceil(math.sqrt(2.0 * m)).toLong
    assert(outDeg <= bound,
      s"max oriented out-degree $outDeg exceeds √(2m)=$bound on m=$m edges")
  }

  test("random graphs match brute-force triple enumeration") {
    val rnd = new Random(11)
    for (_ <- 1 to 5) {
      val n = 12
      val edges = (for (i <- 0L until n; j <- i + 1 until n
        if rnd.nextDouble() < 0.4) yield (i, j)).toVector
      val adj = edges.toSet
      val brute = (for (i <- 0L until n; j <- i + 1 until n; k <- j + 1 until n
        if adj((i, j)) && adj((j, k)) && adj((i, k))) yield 1).size.toLong
      val (_, e, _, t) = stats(edges)
      assert(e == edges.size.toLong)
      assert(t == brute, s"edges=$edges")
    }
  }
}
