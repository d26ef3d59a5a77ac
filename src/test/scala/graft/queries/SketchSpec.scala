package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-operator guarantees beyond the hash gate: the CMS ≥-true-count
  * bound, cell-wise mergeability (the property that makes per-shard
  * sketches combinable), and fuzzy-decontamination sanity.
  */
class SketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = Registry.queries(name)(spark, sfDir)

  test("sketch_countmin: estimates dominate true counts, within the CMS bound") {
    val rows = run("sketch_countmin").collect()
    assert(rows.length == 10)
    val totalTokens = {
      graft.functions.GraftFunctions.register(spark)
      Tables.documents(spark, sfDir)
        .select(explode(expr("word_ngrams(text, 1, false)")).as("t"))
        .count()
    }
    rows.foreach { r =>
      val (t, e) = (r.getAs[Long]("true_cnt"), r.getAs[Long]("est"))
      assert(e >= t, s"CMS under-counted ${r.getAs[String]("token")}: $e < $t")
      // standard CMS error: overcount ≤ e·N/width with prob 1-1/2^depth;
      // assert the generous deterministic 3·N/256 envelope
      assert(e - t <= 3L * totalTokens / 256L,
        s"overcount ${e - t} beyond 3N/w for N=$totalTokens")
    }
  }

  test("sketch_countmin cells merge: sketch(half1) + sketch(half2) = sketch(all)") {
    graft.functions.GraftFunctions.register(spark)
    def cells(where: org.apache.spark.sql.Column) =
      Tables.documents(spark, sfDir).where(where)
        .select(explode(expr("word_ngrams(text, 1, false)")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .select(col("token"), col("cnt"), explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("bucket", expr(
          """(instr('0123456789abcdef', substr(md5(concat('cms', CAST(j AS STRING),
                '_', token)), 1, 1)) - 1) * 16 +
             (instr('0123456789abcdef', substr(md5(concat('cms', CAST(j AS STRING),
                '_', token)), 2, 1)) - 1)""").cast("long"))
        .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cell"))
    val merged = cells(col("doc_id") % 2 === 0)
      .unionAll(cells(col("doc_id") % 2 =!= 0))
      .groupBy(col("j"), col("bucket")).agg(sum(col("cell")).as("cell"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = cells(lit(true))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full, "cell-wise merge diverges from the full sketch")
  }

  test("contamination_fuzzy: hits are non-benchmark docs with sane band counts") {
    val benchIds = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(100)
      .collect().map(_.getLong(0)).toSet
    val rows = run("contamination_fuzzy").collect()
    assert(rows.nonEmpty, "no fuzzy contamination at this SF (expected some)")
    rows.foreach { r =>
      assert(!benchIds.contains(r.getAs[Long]("doc_id")),
        "a benchmark doc flagged itself")
      val nb = r.getAs[Long]("n_bands_hit")
      assert(nb >= 1L && nb <= 4L, s"band count $nb outside [1, 4]")
      assert(r.getAs[Long]("n_bench_neighbors") >= 1L)
    }
  }
}
