package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stages shrink monotonically; output is split/shard-partitioned and rereadable") {
    val out = Files.createTempDirectory("curation-out").toString
    val c = CurationPipeline.run(spark, dir, out, shards = 4)
    info(s"raw=${c.raw} cleaned=${c.cleaned} exact=${c.exactDeduped} near=${c.nearDeduped}")
    assert(c.raw >= c.cleaned && c.cleaned >= c.exactDeduped &&
      c.exactDeduped >= c.nearDeduped, s"stage counts not monotone: $c")
    assert(c.nearDeduped > 0, "pipeline rejected everything")

    val back = spark.read.parquet(out)
    assert(back.count() == c.nearDeduped)
    // partition pruning works on the layout
    assert(back.where(col("split") === "train").count() > 0)
    assert(back.select(col("shard")).distinct().count() <= 4)
  }

  test("no near-dup candidate pair straddles splits; rerun is deterministic") {
    val curated = CurationPipeline.curated(spark, dir, shards = 4)
      .localCheckpoint(eager = true)
    val pairs = graft.dedup.DedupQueries.minhashCandidatePairs(
      graft.queries.Tables.documents(spark, dir))
    val straddling = pairs
      .join(curated.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(curated.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .where(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle splits")

    val again = CurationPipeline.curated(spark, dir, shards = 4)
    assert(curated.select("doc_id", "split", "shard").collect().toSet ==
      again.select("doc_id", "split", "shard").collect().toSet,
      "rerun diverged — the pipeline must be deterministic")
  }
}
