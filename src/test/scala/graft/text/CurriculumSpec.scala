package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Local recount for curriculum_pacing (ranks, the overflow-safe ppm
  * eligibility, the md5 shuffle key, the final order) plus the
  * structural facts the ordering exists for: positions are a permutation,
  * eligibility is non-decreasing along it, easy docs train first on
  * average, and same-eligibility docs are genuinely shuffled rather than
  * length-sorted.
  */
class CurriculumSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex4(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(2).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("curriculum_pacing matches a local recount") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(expr("filter(split(text, '\\\\s+'), t -> t <> '')")).cast("long")
          .as("toks"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("toks")))
    val n = docs.length.toLong
    val ranked = docs.sortBy { case (id, t) => (t, id) }.zipWithIndex
      .map { case ((id, _), i) =>
        val r = i + 1L
        val qm = r * 1000000L / n
        val e = qm * qm / 1000000L
        (id, r, e, md5Hex4(s"cur|$id"), math.min(e / 50000L, 19L))
      }
    val expected = ranked.sortBy { case (id, _, _, h, st) => (st, h, id) }
      .zipWithIndex
      .map { case ((id, r, e, h, st), i) => id -> ((r, e, h, st, i + 1L)) }
      .toMap
    val got = Registry.queries("curriculum_pacing")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("difficulty_rank"), r.getAs[Long]("eligible_ppm"),
          r.getAs[Long]("shuffle_key"), r.getAs[Long]("stage"),
          r.getAs[Long]("position"))))
      .toMap
    assert(got === expected)
    // permutation + non-decreasing stage along the order
    val byPos = got.values.toSeq.sortBy(_._5)
    assert(byPos.map(_._5) === (1L to n))
    assert(byPos.sliding(2).forall(w => w(0)._4 <= w(1)._4))
    // easy docs train first: bottom difficulty quartile's mean position
    // beats the top quartile's
    val q = (n / 4).toInt
    val pos = got.values.toSeq.sortBy(_._1).map(_._5)
    assert(pos.take(q).sum / q < pos.takeRight(q).sum / q)
    // the within-stage shuffle is real: the order is NOT difficulty-sorted
    assert(byPos.map(_._1) !== (1L to n))
  }
}
