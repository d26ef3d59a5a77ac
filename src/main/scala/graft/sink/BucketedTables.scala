package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed-table support — the shuffle-elimination tool for repeated
  * large-x-large joins (the reference re-joins `tb_event` to `tb_identity`
  * on every run; at 100 TB that join's shuffle IS the job). Writing both
  * sides bucketed by the join key lets every subsequent join run
  * shuffle-free: Spark aligns bucket i of one table with bucket i of the
  * other, so the plan contains SortMergeJoin with NO Exchange on either
  * side (asserted in BucketedTablesSpec).
  */
object BucketedTables {

  /** Persist as a bucketed managed table (bucketBy requires saveAsTable —
    * plain parquet paths carry no bucket metadata).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
