package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.identity.Components

/** Continuous incremental identity maintenance — the reference's actual
  * job (`process-files` keeps `tb_identity` current as alias events
  * arrive), with the semantics its G2 implementation got wrong: when a new
  * edge bridges two existing clusters, BOTH collapse
  * (`/root/reference/src/Operations/FileImporter.php:104-130` resolves
  * against a single LIMIT-1 match and misses the merge).
  *
  * Per micro-batch: new (person, alias) edges ∪ previous assignments →
  * closure (Components.mergeIncremental) → rewrite the assignments store.
  * Assignments are themselves edges (node — canonical), so the union's
  * closure is exact and the per-batch cost scales with the delta graph's
  * diameter, not history size. The store is double-buffered (write new
  * generation, then swap) so readers never see a half-written table.
  */
object IdentityStream {

  /** Current assignments (alias_id, canonical_id), empty if none yet. */
  def readAssignments(spark: SparkSession, storeDir: String): DataFrame = {
    val cur = s"$storeDir/current"
    if (Files.exists(Paths.get(cur)))
      spark.read.parquet(cur)
    else {
      import spark.implicits._
      Seq.empty[(String, String)].toDF("alias_id", "canonical_id")
    }
  }

  /** Fold one batch of alias edges into the store. Exposed for direct
    * testing and for batch callers (Pipeline incremental mode). */
  def mergeBatch(spark: SparkSession, storeDir: String, edges: DataFrame): Unit = {
    val newEdges = edges
      .filter(col("person").isNotNull && col("alias").isNotNull &&
        col("alias") =!= "" && col("person") =!= "")
      .select(col("person"), col("alias"))
      .distinct()
    if (!newEdges.isEmpty) {
      val existing = readAssignments(spark, storeDir)
        .select(col("alias_id").as("person"), col("canonical_id").as("alias"))
      val merged = Components
        .connectedComponentsString(existing.union(newEdges))
        .withColumnRenamed("id", "alias_id")
      val next = s"$storeDir/next"
      val cur = s"$storeDir/current"
      merged.write.mode(SaveMode.Overwrite).parquet(next)
      // swap generations; readers see old or new, never partial
      val curPath = Paths.get(cur)
      if (Files.exists(curPath)) {
        val old = Paths.get(s"$storeDir/old")
        if (Files.exists(old)) deleteRecursively(old)
        Files.move(curPath, old)
      }
      Files.move(Paths.get(next), curPath)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))
  }

  /** Streaming driver: drain the revisions directory, folding each batch's
    * alias edges into the assignments store. */
  def run(spark: SparkSession, inDir: String, storeDir: String,
          checkpointDir: String): StreamingQuery =
    StreamIngest.readEvents(spark, inDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, storeDir, batch)
      }
      .start()
}
