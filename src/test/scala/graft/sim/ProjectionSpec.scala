package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Geometry checks for the projection operators: the random projection
  * must preserve dot-product SIGN structure (the JL promise at sketch
  * size), and two power-iteration rounds must increase the Rayleigh
  * quotient over the starting direction (the variance-capture promise).
  * The power-iteration output is also cross-checked against an exact
  * local reimplementation of the integer recurrence — an independent
  * witness that the distributed dim-keyed aggregates compute the same
  * matrix-vector products.
  */
class ProjectionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def quantized(): Map[Long, Array[Long]] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray
        r.getLong(0) -> e.map(x => math.floor(x.toDouble * 1000.0).toLong)
      }.toMap

  test("rp_project native expression equals the interpreted HOF formulation") {
    graft.functions.GraftFunctions.register(spark)
    val both = Tables.embeddings(spark, sfDir)
      .withColumn("native", expr("rp_project(embedding)"))
      .withColumn("qe", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"))
      .withColumn("hof", expr(
        """transform(sequence(0, 7), j ->
             aggregate(sequence(0, size(qe) - 1), CAST(0 AS BIGINT),
               (acc, i) -> acc + element_at(qe, i + 1) *
                 (CASE WHEN (CAST(i AS BIGINT) * 2654435761 + j * 40503) % 2 = 0
                       THEN 1 ELSE -1 END)))"""))
    assert(both.where(expr("native <> hof")).count() == 0,
      "native rp_project diverges from the HOF formulation")
  }

  test("embed_rp_project concentrates norms and keeps positive dot correlation") {
    val q = quantized()
    val rp = Registry.queries("embed_rp_project")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Long]("j")).map(_.getAs[Long]("proj"))
      }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    // E‖proj‖² = 8·‖q‖² exactly (±1 signs); the MEAN ratio over all
    // vectors concentrates hard even though single vectors wobble ~50%
    val ratios = q.keys.toSeq.map { id =>
      dot(rp(id), rp(id)).toDouble / (8.0 * dot(q(id), q(id)).toDouble) }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"norm concentration broken: mean=$mean")
    // dot products correlate positively (E[dot_rp] = 8·dot_orig); an
    // 8-dim sketch of near-orthogonal 64-dim data is noisy by design —
    // the corpus is deterministic, so the statistic is a fixed number
    // (measured r≈0.146 at sf0.001); a broken sign hash would give r≈0
    val ids = q.keys.toSeq.sorted.take(30)
    val pairs = for { (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1) }
      yield (dot(q(a), q(b)).toDouble, dot(rp(a), rp(b)).toDouble)
    val (xs, ys) = pairs.unzip
    val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
    val r = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    assert(r >= 0.1, s"dot-product correlation $r below 0.1")
  }

  test("embed_power_pca matches the exact integer recurrence and gains Rayleigh quotient") {
    val q = quantized()
    val dim = q.values.head.length
    // exact local replica of the query's integer iteration
    def round(v: Array[Long]): Array[Long] = {
      val dots = q.map { case (id, qe) =>
        id -> qe.zip(v).map { case (a, b) => a * b }.sum }
      val w = Array.tabulate(dim) { i =>
        q.map { case (id, qe) => dots(id) * qe(i) }.sum }
      val m = w.map(math.abs).max
      w.map(x => math.floor(x.toDouble * 1000.0 / m.toDouble).toLong)
    }
    val v0 = Array.fill(dim)(1000L)
    val v2 = round(round(v0))
    val expected = q.map { case (id, qe) =>
      id -> qe.zip(v2).map { case (a, b) => a * b }.sum }
    val got = Registry.queries("embed_power_pca")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("proj")).toMap
    assert(got == expected, "distributed result differs from exact recurrence")
    // Rayleigh quotient R(v) = Σ (q·v)² / (v·v) must not decrease
    def rayleigh(v: Array[Long]): Double = {
      val num = q.values.map { qe =>
        val d = qe.zip(v).map { case (a, b) => a * b }.sum.toDouble; d * d }.sum
      num / v.map(x => x.toDouble * x).sum
    }
    assert(rayleigh(v2) >= rayleigh(v0) * 0.999,
      s"power iteration lost variance: ${rayleigh(v2)} < ${rayleigh(v0)}")
  }

  test("embed_whiten: standardized cells behave like z-scores") {
    val rows = graft.queries.Registry.queries("embed_whiten")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // milli-z units: bulk within a few sigma, 3-sigma outliers rare
    val outliers = rows.map(_.getAs[Long]("n_outlier3s")).sum
    val cells = rows.length * 64L
    assert(outliers.toDouble / cells < 0.02,
      s"$outliers of $cells cells beyond 3 sigma — standardization is off")
    rows.foreach { r =>
      assert(r.getAs[Long]("z_min") >= -8000L && r.getAs[Long]("z_max") <= 8000L,
        s"z outside 8 sigma for vec ${r.getAs[Long]("vec_id")}")
    }
    // a z-scored population must straddle zero
    assert(rows.exists(_.getAs[Long]("z_min") < 0L))
    assert(rows.exists(_.getAs[Long]("z_max") > 0L))
  }
}
