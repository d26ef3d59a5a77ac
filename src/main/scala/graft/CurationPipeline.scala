package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries
import graft.queries.Tables

/** End-to-end training-corpus curation — the engine's operator families
  * composed into the pipeline a data team actually runs, as one main:
  *
  *   raw docs → per-row clean (quality gate, language-ID, PII scrub)
  *            → exact dedup (md5 text fingerprint, first doc wins)
  *            → near-dup pruning (LSH → connected components, keep the
  *              minimum doc_id of each cluster)
  *            → leakage-safe train/val/test split (split is a function
  *              of the near-dup CLUSTER, so near-duplicates can never
  *              straddle train and test)
  *            → deterministic shard assignment
  *            → parquet partitioned by (split, shard)
  *
  * Every stage is a plain DataFrame transform on the operators the
  * query surface already oracle-checks; nothing here collects to the
  * driver, every decision is a deterministic hash — the whole run is
  * reproducible across clusters and restarts. CurationPipelineSpec pins
  * stage monotonicity, split-leakage safety, and rerun determinism.
  */
object CurationPipeline {

  final case class Counts(
      raw: Long, cleaned: Long, exactDeduped: Long, nearDeduped: Long)

  private def md5Byte(c: String): String =
    s"""(instr('0123456789abcdef', substr(md5(CAST($c AS STRING)), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5(CAST($c AS STRING)), 2, 1)) - 1)"""

  /** The curated frame: cleaned, deduped, split, sharded. */
  def curated(spark: SparkSession, srcDir: String, shards: Int = 16): DataFrame = {
    val docs = Tables.documents(spark, srcDir)

    // per-row clean — the same transform the streaming path runs
    val cleaned = graft.streaming.StreamCurate.curate(docs)
      .where(col("quality_ok"))
      .select(col("doc_id"), col("scrubbed"), col("n_tokens"))

    // exact dedup: md5 fingerprint of the scrubbed text, minimum doc_id
    // survives — a partial-aggregated groupBy, no window
    val exact = cleaned
      .withColumn("fp", md5(col("scrubbed")))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

    // near-dup pruning: keep each LSH/CC cluster's minimum surviving doc
    val clusters = DedupQueries.clusterAssignments(spark, srcDir)
    val kept = exact.join(clusters, "doc_id")
      .groupBy(col("cluster")).agg(min(col("doc_id")).as("doc_id"))

    // leakage-safe split (cluster-keyed) + deterministic shard
    kept
      .withColumn("bucket", expr(md5Byte("cluster")).cast("long"))
      .withColumn("split",
        when(col("bucket") < 205, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test"))
      .withColumn("shard", expr(
        s"""CAST((instr('0123456789abcdef',
              substr(md5(CAST(doc_id AS STRING)), 32, 1)) - 1) % $shards
            AS BIGINT)"""))
      .join(cleaned, "doc_id")
      .select(col("doc_id"), col("cluster"), col("split"), col("shard"),
        col("n_tokens"), col("scrubbed"))
  }

  /** Run the pipeline, write parquet partitioned by (split, shard),
    * return per-stage counts for the run report.
    *
    * @param artifactDir when set, the LSH artifacts (signatures /
    *   candidate pairs / clusters) are loaded from this directory if its
    *   snapshot key matches the current corpus fingerprint, and rebuilt +
    *   persisted there otherwise — the production pattern: dedup
    *   artifacts land once per corpus snapshot and every downstream run
    *   (and every other consumer) reads them instead of re-running the
    *   signature pass (ArtifactPersistSpec pins reuse and stale-key
    *   invalidation). */
  def run(spark: SparkSession, srcDir: String, outDir: String,
      shards: Int = 16, artifactDir: Option[String] = None): Counts = {
    artifactDir.foreach { ad =>
      val reused = graft.dedup.CandidateArtifacts.ensure(spark, srcDir, ad)
      // '# ' prefix, not bare JSON: the run report below must stay the
      // only parseable JSON line on stdout (the Bench.scala discipline)
      println(s"# artifact_snapshot $ad reused=$reused")
    }
    val docs = Tables.documents(spark, srcDir)
    val cleaned = graft.streaming.StreamCurate.curate(docs)
      .where(col("quality_ok"))
    val exactCount = cleaned
      .withColumn("fp", md5(col("scrubbed")))
      .select(col("fp")).distinct().count()
    val out = curated(spark, srcDir, shards)
      .localCheckpoint(eager = true) // one pipeline pass feeds write + count
    out.write.mode("overwrite").partitionBy("split", "shard").parquet(outDir)
    Counts(docs.count(), cleaned.count(), exactCount, out.count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CurationPipeline <srcDir> <outDir> [shards] [artifactDir]")
    val spark = SparkSession.builder()
      .appName("graft-curation")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val c = run(spark, args(0), args(1),
        if (args.length > 2) args(2).toInt else 16,
        if (args.length > 3) Some(args(3)) else None)
      println(s"""{"raw":${c.raw},"cleaned":${c.cleaned},""" +
        s""""exact_deduped":${c.exactDeduped},"near_deduped":${c.nearDeduped}}""")
    } finally spark.stop()
  }
}
