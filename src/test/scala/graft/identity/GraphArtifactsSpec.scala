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

  private def corpus(signups: Seq[(java.lang.Long, String)] = Seq(
      (1L, """{"k": "5"}"""), (1L, """{"k": "5"}"""), // duplicate edge
      (1000005L, """{"k": "99"}"""),                  // the collision probe
      (2L, """{"k": "oops"}"""),                      // malformed k → no edge
      (null, """{"k": "7"}"""),                       // null user → no edge
      (3L, null),                                     // null props → no edge
      (5L, """{"k": "-1099511627771"}"""),            // negative k: would land
                                                      //   back in user space
      (6L, """{"k": "9223372036854775807"}"""),       // k near Long.Max: would
                                                      //   overflow + Offset
      (1099511627781L, """{"k": "1"}""")),            // user_id ≥ 2^40: would
                                                      //   collide with aliases
      dir: String = Files.createTempDirectory("graft-ga").toString): String = {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    (signups.map { case (u, p) => (u, "signup", p, ts) } :+
      ((4L: java.lang.Long), "click", """{"k": "8"}""", ts)) // wrong event type
      .toDF("user_id", "event_type", "props", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((100L, 7L), (100L, 8L), (100L, 9L), (200L, 7L), (200L, 9L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("fwd: distinct, null-free, malformed/out-of-range k dropped, namespaces disjoint") {
    val dir = corpus()
    val fwd = GraphArtifacts.fwd(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val Off = GraphArtifacts.Offset
    // the negative-k row (would alias dst back into user-id space), the
    // near-Long.Max k (would abort the ANSI addition), and the
    // over-Offset user_id (would collide with alias node ids) are all
    // range-guarded out — no edge, no crash
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

  test("persist → load round-trip, fingerprint invalidation on corpus change") {
    val dir = corpus()
    val art = Files.createTempDirectory("graft-ga-art").toString
    assert(!GraphArtifacts.ensure(spark, dir, art),
      "ensure claimed a hit on an empty artifact dir")
    def edges(): Set[(Long, Long)] = GraphArtifacts.fwd(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairs(): Set[(Long, Long)] = GraphArtifacts.coPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e1 = edges(); val p1 = pairs()
    assert(p1 == Set((7L, 8L), (7L, 9L), (8L, 9L)), s"coPairs=$p1")

    // unchanged corpus, cold session caches → parquet-backed reload
    GraphArtifacts.invalidate()
    assert(GraphArtifacts.ensure(spark, dir, art),
      "unchanged corpus did not reuse the persisted snapshot")
    assert(GraphArtifacts.fwd(spark, dir).queryExecution.executedPlan
      .toString.contains("Scan parquet"), "loaded fwd is not parquet-backed")
    assert(edges() == e1 && pairs() == p1)

    // changed EVENTS table → stale key → rebuild with the new graph
    GraphArtifacts.invalidate()
    corpus(signups = Seq((42L, """{"k": "1"}""")), dir = dir)
    assert(!GraphArtifacts.ensure(spark, dir, art),
      "changed corpus reused a stale snapshot")
    assert(edges() == Set((42L, GraphArtifacts.Offset + 1L)))
    GraphArtifacts.invalidate()
  }
}
