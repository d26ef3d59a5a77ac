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

  private def dirSize(p: Path): Long =
    Files.walk(p).iterator().asScala
      .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
      .map(Files.size).sum

  private def parquetFileCount(p: Path): Int =
    Files.walk(p).iterator().asScala
      .count(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))

  /** Rewrite `dir` into ~targetBytes parquet files (write-aside then atomic
    * directory swap — readers either see the old or the new layout, never
    * a partial one). Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = DefaultTargetBytes): (Int, Int) = {
    val path = Paths.get(dir)
    val before = parquetFileCount(path)
    val parts = math.max(1, math.ceil(dirSize(path).toDouble / targetBytes).toInt)

    val tmp = dir.stripSuffix("/") + ".compacting"
    val old = dir.stripSuffix("/") + ".old"
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(tmp)

    Files.move(path, Paths.get(old), StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), path, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup of the displaced generation
    Files.walk(Paths.get(old)).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))

    (before, parquetFileCount(path))
  }
}
