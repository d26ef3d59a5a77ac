package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the BFS distance histogram and the top-paths
  * readout.
  */
class BfsPathSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("graph_bfs_distance equals a sequential BFS over the collected edge list") {
    val rows = Registry.queries("graph_bfs_distance")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    assert(rows.nonEmpty && rows.contains(0L))
    val edges = graft.identity.GraphArtifacts.und(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val adj = edges.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
    val seeds = adj.keys.filter(n =>
      n % 1000L == 0L && n < graft.identity.GraphArtifacts.Offset).toSet
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (k <- 1 to 6) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty[Long]))
        .filterNot(n => dist.contains(n))
      dist = dist ++ next.map(_ -> k.toLong)
      frontier = next
    }
    val expected = dist.values.groupBy(identity)
      .map { case (d, vs) => d -> vs.size.toLong }
    assert(rows === expected)
    // layer 1 exists (seeds have signup aliases) and every seed counted
    assert(rows(0L) === seeds.size.toLong && rows.getOrElse(1L, 0L) > 0L)
  }

  test("events_path_topk equals a local path recount") {
    val rows = Registry.queries("events_path_topk")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions")))
    assert(rows.length === 20)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day_no"),
        unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day_no"),
        r.getAs[Long]("us"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type")))
    val expected = ev.groupBy(e => (e._1, e._2)).map { case (_, es) =>
      es.sortBy(e => (e._3, e._4)).take(5).map(_._5).mkString(">")
    }.toSeq.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(rows.toSeq === expected)
  }
}
