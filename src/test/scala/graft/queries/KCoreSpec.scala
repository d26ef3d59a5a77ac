package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graph_kcore invariants the oracle can't see: agreement with an
  * in-memory reference peel, the defining degree property, and
  * convergence comfortably under the 8-round cap (the cap is a
  * pathological-chain guard, not a tuning knob — if the corpus ever
  * needs more rounds the non-recursive oracle would silently diverge,
  * so this spec is the tripwire).
  */
class KCoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val K = 10

  /** Reference implementation: repeated peel on collected edges. */
  private def bruteKcore(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    var cur = edges
    var changed = true
    while (changed) {
      val deg = cur.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= K).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != cur.size
      cur = next
    }
    cur.groupBy(_._1).map { case (n, es) => n -> es.size }
  }

  test("graph_kcore matches a brute-force peel and every node has in-core degree >= k") {
    val raw = GraphBpeQueries.signupEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = bruteKcore(raw)

    val rows = graft.SparkEntry.queries("graph_kcore")(spark, dir).collect()
    val got = rows.filter(_.getBoolean(3))
      .map(r => r.getLong(0) -> r.getLong(2).toInt).toMap

    assert(got == expected, s"spark core (${got.size} nodes) != reference (${expected.size})")
    assert(got.nonEmpty, "the sf0.01 10-core must be non-trivial")
    assert(got.valuesIterator.forall(_ >= K), "k-core defining property violated")
    // non-members report their full degree and a zero in-core degree
    assert(rows.length == raw.map(_._1).distinct.size,
      "one output row per graph node, member or not")
    rows.filterNot(_.getBoolean(3)).foreach { r =>
      assert(r.getLong(2) == 0L, "out-of-core node must report core_deg 0")
    }
  }

  test("peel converges well under the oracle's fixed round count") {
    // count reference rounds to fixpoint; the non-recursive oracle chains 8
    val raw = GraphBpeQueries.signupEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    var cur = raw
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = cur.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= K).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != cur.size
      cur = next
      rounds += 1
    }
    assert(rounds <= 5, s"peel took $rounds rounds; the 8-stage oracle needs headroom")
  }
}
