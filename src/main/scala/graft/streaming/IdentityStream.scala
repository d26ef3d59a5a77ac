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
  * closure (Components.connectedComponentsString with the collision-free
  * dictionary — the string-id analog of Components.mergeIncremental's
  * union-then-close pattern) → write a NEW generation directory
  * → atomically repoint a MANIFEST file at it. Assignments are themselves
  * edges (node — canonical), so the union's closure is exact and the
  * per-batch cost scales with the delta graph's diameter, not history size.
  *
  * The manifest is the single source of truth for the live generation:
  * readers resolve MANIFEST → `gen-<n>/`, and the manifest swap is one
  * atomic file move, so there is no window where the store "does not
  * exist" (the flaw of moving data directories around). Data directories
  * are immutable once written; the previous generation is retained one
  * cycle so in-flight readers finish, older ones are garbage-collected.
  * The store uses local-filesystem atomic moves (java.nio); for HDFS/S3 a
  * production deployment would swap the same manifest via the FileSystem
  * API's atomic rename / conditional put.
  */
object IdentityStream {

  private def manifest(storeDir: String) = Paths.get(storeDir, "MANIFEST")

  /** Live generation directory name (e.g. "gen-3"), if any. */
  private def liveGen(storeDir: String): Option[String] = {
    val m = manifest(storeDir)
    if (Files.exists(m)) Some(Files.readString(m).trim).filter(_.nonEmpty)
    else None
  }

  /** Current assignments (alias_id, canonical_id), empty if none yet. */
  def readAssignments(spark: SparkSession, storeDir: String): DataFrame =
    liveGen(storeDir) match {
      case Some(gen) => spark.read.parquet(s"$storeDir/$gen")
      case None =>
        import spark.implicits._
        Seq.empty[(String, String)].toDF("alias_id", "canonical_id")
    }

  /** Fold one batch of alias edges into the store. Exposed for direct
    * testing and for batch callers (Pipeline incremental mode). */
  def mergeBatch(spark: SparkSession, storeDir: String, edges: DataFrame): Unit = {
    // checkpoint the delta ONCE: the isEmpty probe and the closure's
    // union otherwise each re-run the filter+distinct (a shuffle) over
    // the incoming batch
    val newEdges = edges
      .filter(col("person").isNotNull && col("alias").isNotNull &&
        col("alias") =!= "" && col("person") =!= "")
      .select(col("person"), col("alias"))
      .distinct()
      .localCheckpoint(eager = true)
    try {
    if (!newEdges.isEmpty) {
      val prev = liveGen(storeDir)
      val existing = readAssignments(spark, storeDir)
        .select(col("alias_id").as("person"), col("canonical_id").as("alias"))
      // collisionFree: this store IS identity resolution, and assignments
      // feed back as edges into every later batch — a silent xxhash64
      // over-merge would be PERMANENT in the store (the refreshIdentity
      // policy; hash ids only engage above driverFinishEdges, exactly
      // where the continuously-growing store ends up)
      val merged = Components
        .connectedComponentsString(existing.union(newEdges),
          collisionFree = true)
        .withColumnRenamed("id", "alias_id")
      val n = prev.map(_.stripPrefix("gen-").toLong + 1).getOrElse(0L)
      val gen = s"gen-$n"
      merged.write.mode(SaveMode.Overwrite).parquet(s"$storeDir/$gen")
      // atomic pointer swap: write-aside then one atomic move
      Files.createDirectories(Paths.get(storeDir))
      val tmp = Paths.get(storeDir, "MANIFEST.tmp")
      Files.writeString(tmp, gen)
      Files.move(tmp, manifest(storeDir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // GC generations older than the one we just superseded (kept one
      // cycle for in-flight readers)
      import scala.jdk.CollectionConverters._
      val keep = Set(gen) ++ prev
      // Files.list is an open directory stream — close it or leak an FD
      val ls = Files.list(Paths.get(storeDir))
      val stale =
        try ls.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("gen-") &&
            !keep(p.getFileName.toString))
          .toList
        finally ls.close()
      stale.foreach(deleteRecursively)
    }
    } finally Components.unpersistCheckpoint(newEdges)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val w = Files.walk(p)
    val files = try w.iterator().asScala.toSeq.reverse finally w.close()
    files.foreach(f => Files.deleteIfExists(f))
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
