package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** What int8 scalar quantization MEANS: decoding a code to its bucket
  * midpoint lands within half a bucket width of the original value, per
  * dimension — the bound the 4× compression trades away. (The oracle
  * mirrors the code math; only an independent reconstruction check can
  * catch a shared off-by-one in the bucket mapping.)
  */
class QuantizeSpec extends SparkSpec {

  test("reconstruction error ≤ half a bucket width per dimension (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.queries.Tables.embeddings(spark, dir)
    val got = graft.SparkEntry.queries("embed_quantize_int8")(spark, dir)

    // hex is 64 two-char codes
    got.select(length(col("codes_hex")).as("l"), col("code_min"), col("code_max"))
      .collect().foreach { r =>
        assert(r.getAs[Int]("l") == 128)
        assert(r.getAs[Long]("code_min") >= 0L)
        assert(r.getAs[Long]("code_max") <= 255L)
      }

    // decode each dim's code back to its bucket midpoint and compare
    val stats = emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).cast("double").as("lo"), max(col("v")).cast("double").as("hi"))
      .collect().map(r => (r.getAs[Int]("pos"), (r.getAs[Double]("lo"), r.getAs[Double]("hi"))))
      .toMap
    val orig = emb.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toIndexedSeq).toMap
    val rows = got.select(col("vec_id"), col("codes_hex")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val hex = r.getAs[String]("codes_hex")
      val codes = hex.grouped(2).map(Integer.parseInt(_, 16)).toArray
      val vec = orig(id)
      codes.zipWithIndex.foreach { case (c, i) =>
        val (lo, hi) = stats(i)
        val width = (hi - lo) / 256.0
        val mid = lo + (c + 0.5) * width
        val err = math.abs(vec(i).toDouble - mid)
        // exact-hi values clamp into bucket 255, whose midpoint is half a
        // width below hi — still within the half-width bound
        assert(err <= width / 2 + 1e-12,
          s"vec $id dim $i: v=${vec(i)} code=$c mid=$mid err=$err width=$width")
      }
    }
  }
}
