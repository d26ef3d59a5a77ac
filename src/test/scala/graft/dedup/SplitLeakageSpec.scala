package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** The property that justifies split_leakage_safe's existence: no LSH
  * candidate pair (near-duplicate documents) may straddle two splits —
  * that is exactly the train→eval contamination a per-doc hash split
  * allows. */
class SplitLeakageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("near-dup pairs land in the same split; all three splits populated") {
    val assign = graft.SparkEntry.queries("split_leakage_safe")(spark, dir)
      .cache()
    val pairs = DedupQueries.minhashCandidatePairs(Tables.documents(spark, dir))
    val straddling = pairs
      .join(assign.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(assign.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .where(col("sa") =!= col("sb"))
    assert(straddling.count() == 0, "a near-dup pair straddles two splits")

    // the bucket thresholds target 80/10/10 over CLUSTERS; document mass
    // follows whole clusters (this corpus has a 360-doc giant component,
    // so doc-level proportions are intentionally NOT asserted — that
    // skew is exactly what doc-level splits would leak across)
    val sizes = assign.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("train", "val", "test"), sizes.toString)
    val clusterSplits = assign.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("n")).where(col("n") > 1).count()
    assert(clusterSplits == 0, "a cluster maps to more than one split")
    assign.unpersist()
  }
}
