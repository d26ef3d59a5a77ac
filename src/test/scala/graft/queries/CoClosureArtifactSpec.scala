package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Parquet persistence for the co-purchase triangle closure — the warm
  * bench path's fourth family (VERDICT r06 task 4): persist → load
  * round-trip preserves the consumer output, fingerprint invalidation
  * rebuilds on a changed lineitem table. */
class CoClosureArtifactSpec extends SparkSpec {

  private def corpus(items: Seq[(Long, Long)],
      dir: String = Files.createTempDirectory("graft-cc-art").toString): String = {
    import spark.implicits._
    items.toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def triangles(dir: String): (Long, Long) = {
    val r = Registry.queries("graph_triangles")(spark, dir).head()
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_triangles"))
  }

  test("coClosure persist → load round-trip, fingerprint invalidation") {
    // one triangle (7,8,9) plus a dangling edge (7,10)
    val dir = corpus(Seq((100L, 7L), (100L, 8L), (100L, 9L), (200L, 7L),
      (200L, 10L)))
    val art = Files.createTempDirectory("graft-cc-snap").toString
    assert(!GraphBpeQueries.coClosureEnsure(spark, dir, art),
      "ensure claimed a hit on an empty artifact dir")
    val t1 = triangles(dir)
    assert(t1 === ((4L, 1L)), s"stats=$t1")

    // unchanged corpus, cold session caches → parquet-backed reload
    GraphBpeQueries.coClosureInvalidate()
    graft.identity.GraphArtifacts.invalidate()
    assert(GraphBpeQueries.coClosureEnsure(spark, dir, art),
      "unchanged corpus did not reuse the persisted snapshot")
    assert(triangles(dir) === t1)

    // changed lineitem → stale key → rebuild with the new graph
    GraphBpeQueries.coClosureInvalidate()
    graft.identity.GraphArtifacts.invalidate()
    // open wedge 1-2-3: two edges, one wedge, no triangle
    corpus(Seq((300L, 1L), (300L, 2L), (400L, 2L), (400L, 3L)), dir = dir)
    assert(!GraphBpeQueries.coClosureEnsure(spark, dir, art),
      "changed corpus reused a stale snapshot")
    assert(triangles(dir) === ((2L, 0L)))
    GraphBpeQueries.coClosureInvalidate()
    graft.identity.GraphArtifacts.invalidate()
  }
}
