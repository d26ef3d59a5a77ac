package graft.queries

import org.apache.spark.sql.SparkSession

/** Deterministic fingerprint of one parquet table's files: order-independent
  * xor-fold of a hash over (file name, length, modification time), via the
  * Hadoop FileSystem API so local dirs and object stores behave alike. Any
  * rewrite changes file names (Spark writes fresh UUID part files) or at
  * minimum lengths/mtimes, so a matching key can only mean an unchanged
  * snapshot; content hashing would cost the full read that persisted
  * artifacts exist to avoid. Shared by [[graft.dedup.CandidateArtifacts]]
  * and [[graft.identity.GraphArtifacts]] snapshot keys. */
object TableFingerprint {

  def of(s: SparkSession, tablePath: String): String = {
    val path = new org.apache.hadoop.fs.Path(tablePath)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var acc = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val h = scala.util.hashing.MurmurHash3.stringHash(
        s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      // order-independent fold: listFiles order is fs-dependent
      acc ^= (h.toLong << 32) | (java.lang.Integer.rotateLeft(h, 13).toLong & 0xffffffffL)
      n += 1
    }
    f"$n%d-$acc%016x"
  }
}
