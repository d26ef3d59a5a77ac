package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-scoped Hadoop `FileSystem` under a NON-`file:` scheme
  * (`graftfs://`) — the O1 demonstrator (VERDICT r08 task 7): ingest is
  * declared scheme-agnostic (read the object store directly instead of
  * the reference's bucket-sync copy,
  * `/root/reference/src/Operations/SyncBucket.php:36-45`), and this
  * wrapper proves the claim without an object store in the sandbox:
  * resolution goes through `fs.graftfs.impl` exactly the way
  * `fs.s3a.impl` would, so any hardcoded `java.nio` / default-scheme
  * assumption in the ingest path fails the spec. Instantiated
  * reflectively by Hadoop — must stay top-level with a no-arg
  * constructor. */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
