package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared parquet-snapshot I/O for the three artifact families
  * ([[graft.dedup.CandidateArtifacts]], [[graft.identity.GraphArtifacts]],
  * [[graft.text.TextArtifacts]]): write the artifact frames plus a
  * fingerprint key file, and load them back ONLY when the key matches
  * the current corpus fingerprint AND every artifact table actually
  * exists — a half-written or half-deleted snapshot (key present,
  * parquet missing) reads as stale and rebuilds instead of throwing out
  * of the load path. Write order is artifacts-then-key, so a crash
  * mid-persist leaves no key and the next run rebuilds.
  *
  * The session-cache memoization stays per-family (each has its own
  * build-count semantics pinned by PlanSpec); only the snapshot
  * contract is shared.
  */
object ArtifactStore {

  private val KeyFile = "_corpus_key"

  private def fs(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Write each named frame as `artifactDir/<name>.parquet`, then stamp
    * the key file with `fingerprint` (key last — crash-safe). */
  def writeSnapshot(s: SparkSession, artifactDir: String, fingerprint: String,
      frames: Seq[(String, DataFrame)]): Unit = {
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$artifactDir/$name.parquet")
    }
    val key = new org.apache.hadoop.fs.Path(s"$artifactDir/$KeyFile")
    val out = fs(s, key).create(key, true)
    try out.write(fingerprint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The named frames, parquet-backed, iff the stored key equals
    * `fingerprint` and every `<name>.parquet` exists; None means the
    * caller rebuilds (missing key, stale key, or incomplete snapshot). */
  def loadSnapshot(s: SparkSession, artifactDir: String, fingerprint: String,
      names: Seq[String]): Option[Map[String, DataFrame]] = {
    val key = new org.apache.hadoop.fs.Path(s"$artifactDir/$KeyFile")
    if (!fs(s, key).exists(key)) return None
    val in = fs(s, key).open(key)
    val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    if (stored != fingerprint) return None
    val paths = names.map(n => n -> s"$artifactDir/$n.parquet")
    if (!paths.forall { case (_, p) =>
        fs(s, new org.apache.hadoop.fs.Path(p))
          .exists(new org.apache.hadoop.fs.Path(p)) }) return None
    Some(paths.map { case (n, p) => n -> s.read.parquet(p) }.toMap)
  }
}
