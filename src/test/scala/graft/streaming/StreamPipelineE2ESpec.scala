package graft.streaming

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** The exactly-once contract of the full streaming pipeline, proved
  * across a FORCED crash-and-restart: a crash is injected after a
  * batch's idempotent JDBC write commits but before the checkpoint
  * records the batch, so the restart REPLAYS that batch — the md5hash
  * anti-join must insert zero rows for it, and the warehouse must end
  * exactly at the batch path's distinct-fingerprint count (the
  * reference's watermark-rollback semantics,
  * `/root/reference/src/KissmetricsToDatabase.php:742-745`). */
object StreamPipelineE2ESpec {
  val url = "jdbc:derby:memory:graftstreamspec;create=true"
  def connect(): java.sql.Connection = DriverManager.getConnection(url)
}

class StreamPipelineE2ESpec extends SparkSpec {
  import StreamPipelineE2ESpec._

  test("exactly-once rows across an injected crash + checkpoint restart") {
    val base = Files.createTempDirectory("stream-e2e")
    val in = base.resolve("in"); Files.createDirectory(in)
    graft.BenchData.writeCorpus(in, rows = 8000, files = 8)
    val ckpt = base.resolve("ckpt").toString

    val expected = graft.ingest.NdjsonReader
      .readEvents(spark, in.toString, None)
      .dropDuplicates("md5hash").count()
    assert(expected > 7000, s"corpus unexpectedly small: $expected")

    // run 1: 2 files per trigger → 4 batches; crash after batch 1's sink
    // write (rows of batches 0 and 1 are in Derby; checkpoint knows only
    // batch 0 completed)
    val r1 = StreamPipeline.drain(spark, in.toString, ckpt, "tb_e2e",
      connect _, maxFilesPerTrigger = 2, dedupHorizon = "45 days",
      crashAfterBatch = Some(1L))
    assert(r1.failure.isDefined, "injected crash did not fire")
    assert(r1.inserted > 0, "no rows landed before the crash")

    // restart from the same checkpoint: batch 1 REPLAYS; its rows are
    // already in the warehouse, so the idempotent sink inserts 0 for it
    val r2 = StreamPipeline.drain(spark, in.toString, ckpt, "tb_e2e",
      connect _, maxFilesPerTrigger = 2, dedupHorizon = "45 days")
    assert(r2.failure.isEmpty, s"restart failed: ${r2.failure}")

    val landed = {
      val c = connect()
      try {
        val rs = c.createStatement()
          .executeQuery("""SELECT COUNT(*) FROM "tb_e2e"""")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    info(s"inserted run1=${r1.inserted} run2=${r2.inserted} landed=$landed expected=$expected")
    assert(landed == expected,
      s"warehouse $landed != batch distinct-fingerprint count $expected")
    assert(r1.inserted + r2.inserted == expected,
      s"replay re-inserted rows (${r1.inserted} + ${r2.inserted} != $expected)")

    // post-drain identity refresh off the warehouse: closure present and
    // keyed like the batch path's
    val n = StreamPipeline.refreshIdentity(spark, url, "tb_e2e",
      "tb_identity_e2e", connect _)
    assert(n > 0, "identity closure empty after drain")
  }
}
