package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Verifies the "approximate" in approximate-nearest-neighbor the same way
  * ApproxStatsSpec verifies sketches: measure recall against the exact
  * brute-force ranking instead of trusting the bucketing. Everything here
  * is deterministic (fixed corpus, md5-derived hyperplanes), so the floors
  * are pins slightly under the measured values, not statistical hopes.
  *
  * Measured at sf0.01 (500 random vectors, nearest cos ≈ 0.47 — an
  * adversarially hard corpus for sign-LSH, there are no planted
  * neighbors): 8-plane single-bucket probes ~0.4% of the corpus and finds
  * none of the true top-3 (recall 0.00); 6-plane multiprobe probes ~12%
  * for recall 0.23; IVF probe-1 reads its own cell (~10%) for recall 0.20.
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ANN recall@3 vs exact brute force: multiprobe > single-bucket, floors hold") {
    val emb = Tables.embeddings(spark, dir)
    val truth  = pairs(SimQueries.bruteForceTopK(emb, col("q_id") < 20, 3))
    val single = pairs(SimQueries.bucketedTopK(emb, col("q_id") < 20, 3))
    val multi  = pairs(SimQueries.multiprobeTopK(emb, col("q_id") < 20, 3, 6))
    val ivf    = pairs(graft.SparkEntry.queries("sim_ivf_topk")(spark, dir))
    assert(truth.size == 60, s"ground truth should be 20 queries x top-3, got ${truth.size}")

    def recall(got: Set[(Long, Long)]): Double =
      (got & truth).size.toDouble / truth.size

    val (rSingle, rMulti, rIvf) = (recall(single), recall(multi), recall(ivf))
    info(f"recall@3: single-bucket=$rSingle%.2f multiprobe=$rMulti%.2f ivf=$rIvf%.2f")
    assert(rMulti > rSingle,
      f"multiprobe ($rMulti%.2f) must beat single-bucket ($rSingle%.2f)")
    assert(rMulti >= 0.20, f"multiprobe recall floor: $rMulti%.2f < 0.20")
    assert(rIvf >= 0.15, f"ivf recall floor: $rIvf%.2f < 0.15")

    // training the coarse quantizer (k-means cells instead of modulo) is
    // what IVF recall actually buys: measured 0.52 vs 0.20 at equal
    // probe-1 cost — the cells follow the data's directions
    val trained = pairs(graft.SparkEntry.queries("sim_ivf_trained")(spark, dir))
    val rTrained = recall(trained)
    info(f"recall@3: ivf_trained=$rTrained%.2f")
    assert(rTrained > rIvf,
      f"trained quantizer ($rTrained%.2f) must beat modulo cells ($rIvf%.2f)")
    assert(rTrained >= 0.45, f"trained-ivf recall floor: $rTrained%.2f < 0.45")

    // nprobe=2 candidates are a strict superset of probe-1 (each corpus
    // vector lives in exactly one cell), so recall is monotone in nprobe
    val nprobe = pairs(graft.SparkEntry.queries("sim_ivf_nprobe")(spark, dir))
    val rNprobe = recall(nprobe)
    info(f"recall@3: ivf_nprobe2=$rNprobe%.2f")
    assert(rNprobe >= rTrained,
      f"nprobe=2 ($rNprobe%.2f) fell below probe-1 ($rTrained%.2f) — candidate superset broken")
    assert(rNprobe >= 0.60, f"nprobe-2 recall floor: $rNprobe%.2f < 0.60 (measured 0.67)")
  }

  test("filtered ANN: composite-key probe beats post-filtering, floor vs filtered truth") {
    val emb = Tables.embeddings(spark, dir)
    // brute-force FILTERED ground truth: top-3 among same-label vectors
    val vecs = emb.collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").toArray)
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val truth = vecs.filter(_._1 < 20).flatMap { case (q, ql, qe) =>
      vecs.filter { case (v, l, _) => v != q && l == ql }
        .map { case (v, _, e) =>
          (v, dot(e, qe) / math.sqrt(dot(e, e) * dot(qe, qe)))
        }
        .sortBy { case (v, c) => (-c, v) }.take(3)
        .map { case (v, _) => (q, v) }
    }.toSet
    assert(truth.size == 60)

    val filtered = pairs(graft.SparkEntry.queries("sim_ann_filtered")(spark, dir))
    val rFiltered = (filtered & truth).size.toDouble / truth.size

    // the naive alternative: post-filter the UNFILTERED nprobe-2 top-3 —
    // filtered-out vectors displace true same-label neighbors from the
    // top-k before the predicate ever applies, so recall collapses
    val labels = vecs.map(v => v._1 -> v._2).toMap
    val post = pairs(graft.SparkEntry.queries("sim_ivf_nprobe")(spark, dir))
      .filter { case (q, v) => labels(q) == labels(v) }
    val rPost = (post & truth).size.toDouble / truth.size

    info(f"filtered-ANN recall@3: composite-key=$rFiltered%.2f post-filter=$rPost%.2f")
    assert(rFiltered > rPost,
      f"composite-key probe ($rFiltered%.2f) must beat post-filtering ($rPost%.2f)")
    assert(rFiltered >= 0.55, f"filtered-ANN recall floor: $rFiltered%.2f < 0.55")
  }

  test("PQ asymmetric-distance recall@3 vs exact L2 (16x compression)") {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val qf = ClusterQueries.quantized(emb)
    // ground truth in PQ's own metric: exact integer squared-L2 top-3
    val qs = qf.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qe").as("q_qe"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("vec_id"))
    val truth = pairs(qf.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("dist", expr("sqdist_ordered(qe, q_qe)"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3))
    assert(truth.size == 15, s"5 queries x top-3 expected, got ${truth.size}")
    val pq = pairs(graft.SparkEntry.queries("sim_pq_topk")(spark, dir))
    val r = (pq & truth).size.toDouble / truth.size
    info(f"recall@3: pq-adc=$r%.2f (4 subspaces x 8 codes, 4 bytes/vector)")
    assert(r >= 0.2, f"PQ recall floor: $r%.2f < 0.2")

    // IVFADC reads only the query's cell (~1/8 of the corpus) at the
    // same 4-bytes-per-vector cost; residual encoding keeps the shared
    // codebook tight, so the probe cut costs little recall vs full-scan PQ
    val ivfadc = pairs(graft.SparkEntry.queries("sim_ivfadc_topk")(spark, dir))
    val rAdc = (ivfadc & truth).size.toDouble / truth.size
    info(f"recall@3: ivfadc=$rAdc%.2f (cell probe + residual PQ)")
    assert(rAdc >= 0.13, f"IVFADC recall floor: $rAdc%.2f < 0.13")
  }

  test("int8 scalar-quantized search recall@3 vs exact float cosine") {
    // 256 buckets per dim distorts distances far less than PQ's 8 codes
    // per 16-dim subspace, so the floor sits much higher — the
    // compression-vs-recall dial the quantizer family exposes. Measured
    // 0.73, and that includes the metric gap (codes rank by L2, truth by
    // cosine, vectors unnormalized) on top of quantization loss.
    val truth = pairs(SimQueries.bruteForceTopK(
      Tables.embeddings(spark, dir), col("q_id") < 5, 3))
    assert(truth.size == 15)
    val sq = pairs(graft.SparkEntry.queries("sim_sq_topk")(spark, dir))
    val r = (sq & truth).size.toDouble / truth.size
    info(f"recall@3: int8-sq=$r%.2f (64 bytes/vector, integer distances)")
    assert(r >= 0.6, f"int8 scalar-quantized recall floor: $r%.2f < 0.6 (measured 0.73)")
  }

  test("Lloyd loop converges: monotone objective, stops before maxIters") {
    val emb = Tables.embeddings(spark, dir)
    val qf = ClusterQueries.quantized(emb)
    val c0 = qf.where(col("vec_id") < ClusterQueries.K)
      .select(col("vec_id").as("cid"), col("qe").as("ce"))
    val (_, iters, objs) = ClusterQueries.lloydConverge(qf, c0, maxIters = 10)
    info(s"converged after $iters iterations: ${objs.mkString(" -> ")}")
    assert(objs.zip(objs.tail).forall { case (a, b) => b <= a },
      s"objective rose: $objs")
    assert(iters < 10, s"did not converge within 10 iterations: $objs")
  }

  test("Lloyd iteration is monotone: total within-cell distance never rises") {
    val emb = Tables.embeddings(spark, dir)
    val qf = ClusterQueries.quantized(emb)
    val c0 = qf.where(col("vec_id") < ClusterQueries.K)
      .select(col("vec_id").as("cid"), col("qe").as("ce"))
    val a1 = ClusterQueries.assign(qf, c0)
    val a2 = ClusterQueries.assign(qf, ClusterQueries.lloydStep(a1, qf))
    def total(a: org.apache.spark.sql.DataFrame): Long =
      a.agg(sum(col("dist"))).collect()(0).getLong(0)
    val (t1, t2) = (total(a1), total(a2))
    info(s"within-cell squared distance: seed=$t1 after-update=$t2")
    assert(t2 <= t1, s"Lloyd objective rose: $t1 -> $t2")
  }
}
