package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** O10 — the reference's post-load `VACUUM FULL`
  * (`/root/reference/src/KissmetricsToDatabase.php:642-649`), recast for a
  * parquet lake: small-file compaction. Incremental `append` runs (the
  * Pipeline, the streaming sink) accumulate one file per partition per
  * batch; at 100 TB that is millions of files and listing/footer overhead
  * dominates scans. Compaction rewrites a directory into
  * ceil(bytes / targetBytes) files.
  */
object Maintenance {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  // Files.list/walk return open directory streams — drain them under
  // try/finally or every call leaks a directory FD.
  private def listDir(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private def walkFiles(p: Path): List[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private def dirSize(p: Path): Long =
    walkFiles(p)
      .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
      .map(Files.size).sum

  private def parquetFileCount(p: Path): Int =
    walkFiles(p)
      .count(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))

  /** Hive-style partition columns of a parquet directory, outermost first:
    * the chain of `name=value` subdirectory levels. A dataset written with
    * `partitionBy("event_date")` yields `event_date=2024-01-01/...` dirs;
    * compaction must re-apply that layout or partition pruning is lost.
    */
  def detectPartitionColumns(dir: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur = Paths.get(dir)
    var descend = true
    while (descend) {
      val sub = listDir(cur)
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      sub.headOption match {
        case Some(p) =>
          out += p.getFileName.toString.split("=", 2)(0)
          cur = p
        case None => descend = false
      }
    }
    out.toSeq
  }

  /** Rewrite `dir` into ~targetBytes parquet files (write-aside then atomic
    * directory swap — readers either see the old or the new layout, never
    * a partial one). Hive partition layout (e.g. the Pipeline's
    * `event_date=...` dirs) is detected and preserved, so partition pruning
    * survives compaction. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = DefaultTargetBytes): (Int, Int) = {
    val path = Paths.get(dir)
    val before = parquetFileCount(path)
    val parts = math.max(1, math.ceil(dirSize(path).toDouble / targetBytes).toInt)
    val partCols = detectPartitionColumns(dir)

    val tmp = dir.stripSuffix("/") + ".compacting"
    val old = dir.stripSuffix("/") + ".old"
    val df = spark.read.parquet(dir)
    val writer =
      if (partCols.isEmpty) df.repartition(parts).write
      else df
        // co-locate rows of a partition, ~targetBytes output files within it
        .repartition(parts, partCols.map(org.apache.spark.sql.functions.col): _*)
        .write.partitionBy(partCols: _*)
    writer.mode("overwrite").parquet(tmp)

    Files.move(path, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the displaced generation
    walkFiles(Paths.get(old)).reverse.foreach(f => Files.deleteIfExists(f))

    (before, parquetFileCount(path))
  }
}
