package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timings for hotspot queries (not registered;
  * run with `runMain graft.DevProfile`). Delete-or-keep freely.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def consume(df: DataFrame): Long = df.queryExecution.toRdd.count()

    consume(SparkEntry.queries("dedup_minhash_est")(spark, dir)) // warm

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val docs = queries.Tables.documents(spark, dir)
        .where(col("text").isNotNull).select("doc_id", "text")
      val sigs = time("sigs ckpt") {
        queries.Tables.spread(docs)
          .select(col("doc_id"), expr("minhash_sig(text)").as("mh"))
          .localCheckpoint(eager = true)
      }
      import graft.functions.MinHashSignature.{NumHashes, BandSize}
      val bandCols = (0 until NumHashes / BandSize).map { bd =>
        val cols = (0 until BandSize)
          .map(r => element_at(col("mh"), bd * BandSize + r + 1))
        md5(concat_ws("_", cols: _*)).as(s"band$bd")
      }
      val long = graft.dedup.DedupQueries.stackBands(
        sigs.select(col("doc_id") +: bandCols: _*))
      val pairs = time("pairs ckpt") {
        long.select(col("band_hash"), col("doc_id").as("a"))
          .join(long.select(col("band_hash"), col("doc_id").as("b")), "band_hash")
          .where(col("a") < col("b"))
          .select(col("a"), col("b")).distinct()
          .localCheckpoint(eager = true)
      }
      println(s"  pairs=${pairs.count()}")
      val candDocs = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b"))).distinct()
      val sh = time("shingle-set ckpt") {
        queries.Tables.spread(docs.join(candDocs, Seq("doc_id"), "left_semi"))
          .select(col("doc_id"),
            expr("""array_distinct(transform(
                      CASE WHEN length(text) < 5 THEN array(text)
                      ELSE transform(sequence(1, length(text) - 4),
                        i -> substring(text, i, 5)) END,
                      sx -> xxhash64(sx)))""").as("sh"))
          .withColumn("n", size(col("sh")).cast("long"))
          .localCheckpoint(eager = true)
      }
      println(s"  candDocs=${sh.count()}")
      val out = pairs
        .join(sigs.select(col("doc_id").as("a"), col("mh").as("ma")), "a")
        .join(sigs.select(col("doc_id").as("b"), col("mh").as("mb")), "b")
        .join(sh.select(col("doc_id").as("a"), col("sh").as("sa"),
          col("n").as("na")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh").as("sb"),
          col("n").as("nb")), "b")
        .select(col("a"), col("b"),
          expr("CAST(size(filter(zip_with(ma, mb, (x, y) -> x = y), v -> v)) AS BIGINT)")
            .as("agree"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
          col("na"), col("nb"))
      time("verify joins") { consume(out) }
    }
    spark.stop()
  }
}
