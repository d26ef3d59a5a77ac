package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading for the driver corpus (TESTDATA.md).
  *
  * All tables are parquet; `events.ts` is written as parquet TIMESTAMP(NANOS)
  * which Spark cannot natively map — we read it leniently
  * (`spark.sql.legacy.parquet.nanosAsLong`) and normalize to TimestampType
  * (microsecond, floor-truncated) so the rest of the engine sees a standard
  * Spark timestamp. DuckDB's `CAST(ts AS TIMESTAMP)` applies the same
  * truncation, which keeps oracle comparisons exact.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Round-robin-repartition `df` up to the session's default parallelism
    * when its scan has fewer partitions than cores. Small single-file
    * inputs (the bench corpus) otherwise run CPU-heavy projections —
    * shingling, minhashing, embedding math — on ONE core. At production
    * scale the source has far more partitions than cores, the condition is
    * false, and no shuffle is added. Project to the needed columns BEFORE
    * calling this so the exchange ships only what the query reads.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-level, runtime-settable; required before the first read of a
    // TIMESTAMP(NANOS) parquet footer or the scan fails to resolve.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanosAsLong mode: ns since epoch -> microsecond timestamp.
        // INTEGER division (`div`), not floor(ts / 1000): `/` on longs is
        // DOUBLE division, and epoch-nanos (~1.7e18) exceed the 53-bit
        // mantissa — some timestamps came out 1 us off vs DuckDB's exact
        // `epoch_ns // 1000`.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // µs TIMESTAMP(isAdjustedToUTC=false) parquet reads as
        // TIMESTAMP_NTZ; the engine standardizes on session-timezone
        // TimestampType (sessions pin UTC, so the cast is
        // instant-preserving and DuckDB's naive read agrees).
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
