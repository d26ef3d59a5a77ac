package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local equivalence-class recount for privacy_k_anonymity plus the
  * audit's structural guarantees: exposure is monotone in k, the ppm is
  * a true fraction, and the k = min_class_size boundary behaves (no
  * class is below k = min size... every class is ≥ the reported floor).
  */
class KAnonymitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("privacy_k_anonymity matches a local class recount") {
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal + 1000.0) AS BIGINT) div 100").as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val classes = rows.groupBy(identity).map(_._2.length.toLong).toSeq
    val n = rows.length.toLong
    val expected = Seq(2L, 5L, 10L, 20L).map { k =>
      val below = classes.filter(_ < k)
      k -> ((classes.size.toLong, below.size.toLong, below.sum,
        below.sum * 1000000L / n, classes.min))
    }.toMap
    val got = Registry.queries("privacy_k_anonymity")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("classes_below"),
          r.getAs[Long]("rows_below"), r.getAs[Long]("rows_below_ppm"),
          r.getAs[Long]("min_class_size")))).toMap
    assert(got === expected)
    // exposure is monotone in k; ppm is a fraction; the floor is global
    val byK = got.toSeq.sortBy(_._1).map(_._2)
    assert(byK.sliding(2).forall(w => w(0)._3 <= w(1)._3))
    assert(byK.forall { case (_, _, _, ppm, _) => ppm >= 0L && ppm <= 1000000L })
    assert(classes.forall(_ >= got(2L)._5))
    // the fixture is NOT trivially anonymous — the audit has signal
    assert(got(20L)._3 > 0L)
  }
}
