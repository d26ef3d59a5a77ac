package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale evidence for quality_ppl_buckets (the ComponentsSpec discipline:
  * prove the 100× claim on synthetic data the small corpus can't give).
  * The operator's scale argument is that tercile thresholds come from a
  * BOUNDED histogram — so on a 20k-doc Zipf corpus (40× the sf0.001
  * document count, heavy-tailed token distribution like a real crawl) the
  * histogram must stay tiny while the tercile bounds hold exactly.
  */
class PplScaleSpec extends SparkSpec {

  test("ppl terciles on 20k Zipf docs: bounded histogram, provable tercile bounds") {
    import spark.implicits._
    // Zipf-ish corpus: token t drawn with p ∝ 1/rank via the inverse-CDF
    // trick on a deterministic hash; doc length 20-120 tokens; 2 langs.
    val nDocs = 20000
    val docs = spark.range(nDocs.toLong).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 3 === 0, "aa").otherwise("bb"))
      .withColumn("len", (xxhash64(col("doc_id")) % 101 + 120) % 101 + 20)
      .withColumn("text", expr(
        """array_join(transform(sequence(1, CAST(len AS INT)), i ->
             concat('w', CAST(CAST(pow(1000.0,
               (abs(xxhash64(doc_id * 1000 + i)) % 1000000) / 1000000.0)
               AS BIGINT) AS STRING))), ' ')"""))
      .withColumn("source", lit("syn"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("ppl-scale").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Registry.queries("quality_ppl_buckets")(spark, dir)
      .localCheckpoint(true)

    // the scale claim: the threshold histogram is bounded — distinct
    // 0.1-nat buckets per lang stays O(score range), not O(corpus)
    val histSizes = out.groupBy(col("lang"))
      .agg(countDistinct(col("qb")).as("nb")).collect()
    histSizes.foreach { r =>
      assert(r.getAs[Long]("nb") <= 200L,
        s"${r.getString(0)}: histogram grew to ${r.getAs[Long]("nb")} buckets")
    }

    // provable tercile bounds (cum*3 < n below thr1, < 2n below thr2)
    val byLang = out.collect().groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val n = rs.length
      val head = rs.count(_.getAs[String]("bucket") == "head")
      val headMid = rs.count(r => r.getAs[String]("bucket") != "tail")
      assert(3 * head <= n, s"$lang: head $head exceeds n/3 of $n")
      assert(3 * headMid <= 2 * n + 3, s"$lang: head+middle $headMid exceeds 2n/3")
      assert(rs.exists(_.getAs[String]("bucket") == "tail"), s"$lang: empty tail")
      assert(n > 6000, s"$lang unexpectedly small: $n")
    }
  }
}
