package graft.identity

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the shared signup-edge artifact's semantics (ADVICE r05): the
  * 2^40 namespace offset keeps user and alias node ids provably
  * disjoint, try_cast drops malformed alias keys instead of aborting
  * (ANSI mode), and null endpoints contribute no edge. */
class GraphArtifactsSpec extends SparkSpec {

  private def corpus(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ga").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq[(java.lang.Long, String, String, Timestamp)](
      (1L, "signup", """{"k": "5"}""", ts),
      (1L, "signup", """{"k": "5"}""", ts),           // duplicate edge
      (1000005L, "signup", """{"k": "99"}""", ts),    // the collision probe
      (2L, "signup", """{"k": "oops"}""", ts),        // malformed k → no edge
      (null, "signup", """{"k": "7"}""", ts),         // null user → no edge
      (3L, "signup", null, ts),                       // null props → no edge
      (4L, "click", """{"k": "8"}""", ts))            // wrong event type
      .toDF("user_id", "event_type", "props", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("fwd: distinct, null-free, malformed-k dropped, namespaces disjoint") {
    val dir = corpus()
    val fwd = GraphArtifacts.fwd(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val Off = GraphArtifacts.Offset
    assert(fwd == Set((1L, Off + 5L), (1000005L, Off + 99L)), s"fwd=$fwd")
    // every alias node sits strictly above every credible user id
    assert(fwd.forall { case (u, a) => u < Off && a >= Off })
    val deg = GraphArtifacts.deg(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(deg == Map(1L -> 1L, (Off + 5L) -> 1L,
      1000005L -> 1L, (Off + 99L) -> 1L), s"deg=$deg")
  }

  test("the 10^6-offset collision class stays separated under 2^40") {
    // user 1000005's node id collided with alias k=5's node id
    // (1000000 + 5) under the old decimal offset, silently merging two
    // unrelated identity clusters; with 2^40 they are distinct nodes
    val dir = corpus()
    val comp = Components.connectedComponents(
        GraphArtifacts.fwd(spark, dir), inputDistinct = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp(1L) == comp(GraphArtifacts.Offset + 5L))
    assert(comp(1000005L) == comp(GraphArtifacts.Offset + 99L))
    assert(comp(1L) != comp(1000005L),
      "unrelated clusters merged — the namespace offset collision is back")
  }
}
