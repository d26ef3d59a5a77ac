package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Modularity identities against a local recompute from the LPA labels
  * the sibling query emits. */
class ModularitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("graph_modularity matches a local recompute over the LPA communities") {
    val labels = Registry.queries("graph_label_propagation")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    // the same shared edge artifact the query consumes (2^40 offset,
    // try_cast, null filter) — the recompute below is still independent
    val fwd = graft.identity.GraphArtifacts.fwd(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val m = fwd.length.toLong
    val eIn = fwd.filter { case (a, b) => labels(a) == labels(b) }
      .groupBy { case (a, _) => labels(a) }.map { case (l, es) => l -> es.length.toLong }
    val deg = (fwd.map(_._1) ++ fwd.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val dSum = deg.toSeq.groupBy { case (n, _) => labels(n) }
      .map { case (l, ds) => l -> ds.map(_._2).sum }
    val rows = Registry.queries("graph_modularity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val qNum = dSum.map { case (l, d) =>
      4L * m * eIn.getOrElse(l, 0L) - d * d
    }.sum
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      assert(r.getAs[Long]("e_in") === eIn.getOrElse(l, 0L), s"label=$l")
      assert(r.getAs[Long]("d_sum") === dSum(l), s"label=$l")
      assert(r.getAs[Long]("q_num") === qNum)
      assert(r.getAs[Long]("q_den") === 4L * m * m)
    }
    // structural identities: internal edges bounded by m, degrees sum to 2m
    assert(rows.map(_.getAs[Long]("e_in")).sum <= m)
    assert(rows.map(_.getAs[Long]("d_sum")).sum === 2L * m)
    // modularity is a proper fraction in [-1/2, 1)
    val q = qNum.toDouble / (4L * m * m)
    assert(q >= -0.5 && q < 1.0, s"q=$q")
  }
}
