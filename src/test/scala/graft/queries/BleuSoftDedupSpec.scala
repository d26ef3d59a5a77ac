package graft.queries

import graft.SparkSpec

/** Semantics checks the shared-formulation oracle can't make: BLEU's
  * clipped counts are recomputed locally for a sampled pair from the raw
  * texts, and dedup_soft's weights must conserve each cluster's unit mass.
  */
class BleuSoftDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  test("eval_bleu clipped counts match a local recompute on a sampled pair") {
    val rows = Registry.queries("eval_bleu")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("m1") <= r.getAs[Long]("t1"))
      assert(r.getAs[Long]("m2") <= r.getAs[Long]("t2"))
      assert(r.getAs[Long]("bp_micro") <= 0L)
      assert(r.getAs[Long]("prec_log_micro") <= 0L)
      assert(r.getAs[Long]("logbleu_micro") ===
        r.getAs[Long]("bp_micro") + r.getAs[Long]("prec_log_micro"))
    }
    val texts = Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def counts(ts: Seq[String], n: Int): Map[Seq[String], Long] =
      ts.sliding(n).filter(_.size == n).toSeq.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
    val sample = rows.sortBy(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).head
    val (a, b) = (sample.getAs[Long]("a"), sample.getAs[Long]("b"))
    val (ta, tb) = (tokens(texts(a)), tokens(texts(b)))
    def clipped(n: Int): (Long, Long) = {
      val (ca, cb) = (counts(ta, n), counts(tb, n))
      (ca.map { case (g, c) => math.min(c, cb.getOrElse(g, 0L)) }.sum,
        ca.values.sum)
    }
    assert((sample.getAs[Long]("m1"), sample.getAs[Long]("t1")) === clipped(1))
    assert((sample.getAs[Long]("m2"), sample.getAs[Long]("t2")) === clipped(2))
  }

  test("dedup_soft conserves unit mass per cluster; canonicals are cluster minima") {
    val rows = Registry.queries("dedup_soft")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (cluster, members) =>
      val size = members.head.getAs[Long]("cluster_size")
      assert(members.length.toLong === size)
      members.foreach { m =>
        val w = m.getAs[Long]("weight_ppm")
        assert(w === 1000000L / size)
        // truncating div loses < size ppm of the cluster's unit mass
        assert(w * size <= 1000000L && w * size > 1000000L - size)
      }
      // exactly one canonical: the min-id member, which is the cluster id
      val canon = members.filter(_.getAs[Boolean]("is_canonical"))
      assert(canon.length === (if (members.exists(
        _.getAs[Long]("doc_id") == cluster)) 1 else 0))
      assert(cluster === members.map(_.getAs[Long]("doc_id")).min)
    }
  }
}
