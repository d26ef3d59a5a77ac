package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** Brute-force twins for the round-6 mixture/sampling additions: the
  * pairwise domain-JSD matrix and Efraimidis-Spirakis weighted sampling.
  */
class DomainSimGumbelSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(tok: String): Long =
    java.lang.Long.parseLong(md5Hex(tok).take(4), 16) % 4096L

  test("mix_domain_similarity: bounds, coverage, and a full recount of one pair") {
    val rows = Registry.queries("mix_domain_similarity")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("jsd_nano")).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"),
        Option(r.getAs[String]("text")).getOrElse("")))
    val sources = docs.map(_._1).distinct.sorted
    // one row per unordered source pair, a < b
    assert(rows.size === sources.length * (sources.length - 1) / 2)
    rows.foreach { case ((a, b), jsd) =>
      assert(a < b)
      // JSD in nats ∈ [0, ln 2]; quantization error is ≤ 0.5 nano-nat
      // per bucket over ≤ 4096 buckets
      assert(jsd >= -2048L && jsd <= 693147181L + 2048L, s"($a, $b) = $jsd")
    }
    // recount the lexicographically first pair from raw tokens
    def dist(src: String): Map[Long, Long] =
      docs.filter(_._1 == src)
        .flatMap(_._2.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
        .groupBy(bucket).map { case (b, ts) => b -> ts.length.toLong }
    val (sa, sb) = (sources(0), sources(1))
    val (da, db) = (dist(sa), dist(sb))
    val (ta, tb) = (da.values.sum.toDouble, db.values.sum.toDouble)
    val expected = (da.keySet ++ db.keySet).toSeq.map { bk =>
      val p = da.getOrElse(bk, 0L) / ta
      val q = db.getOrElse(bk, 0L) / tb
      val m = (p + q) / 2.0
      val term = (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
        (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
      BigDecimal(term * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    assert(rows((sa, sb)) === expected)
  }

  test("sample_weighted_gumbel: exact-k ES recount + length bias") {
    val rows = Registry.queries("sample_weighted_gumbel")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("key_micro")))
    assert(rows.length === 50)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
      .filter(_._2 > 0L)
    val keyed = docs.map { case (id, w) =>
      val u16 = java.lang.Long.parseLong(md5Hex(id.toString).take(4), 16)
      val key = math.log((u16 + 0.5) / 65536.0) / w.toDouble * 1e6
      (id, w, BigDecimal(key).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val expected = keyed.sortBy { case (id, _, k) => (-k, id) }.take(50)
    assert(rows.toSeq === expected.toSeq)
    // weighting by n_chars must bias the draw toward longer docs
    val sampleMean = rows.map(_._2).sum.toDouble / rows.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean)
  }
}
