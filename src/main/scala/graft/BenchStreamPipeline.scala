package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/** End-to-end Structured Streaming twin of BenchPipeline — the
  * checkpoint/rollback contract at bench scale: 500 k reference-shaped
  * NDJSON rows through ingest → watermarked dedup → idempotent JDBC
  * (embedded Derby), with a FORCED mid-run crash injected after a
  * batch's sink write but before its checkpoint commit, then a restart
  * from the same checkpoint. Exactly-once means: the replayed batch
  * inserts nothing, and the final warehouse row count equals the batch
  * path's distinct-fingerprint count.
  *
  * Prints ONE JSON line:
  *   {"metric":"stream_pipeline_rows_per_sec","rows":N,"inserted_run1":a,
  *    "inserted_run2":b,"expected":e,"identity_rows":i,"value":rps}
  *
  * Exits non-zero if run1 did not crash, the restart re-inserted replayed
  * rows (a + b != e), or the warehouse count diverges.
  *
  * Usage: SPARK_GRAFT_ROWS=500000 runMain graft.BenchStreamPipeline
  */
object BenchStreamPipeline {
  val url = "jdbc:derby:memory:graftstream;create=true"
  def connect(): java.sql.Connection = DriverManager.getConnection(url)

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "500000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Files.createTempDirectory("graft-bench-stream")
    val in = base.resolve("in"); Files.createDirectory(in)
    BenchData.writeCorpus(in, rows, 32)
    val ckpt = base.resolve("ckpt").toString
    graft.sink.SinkGauge.reset()

    // batch-path ground truth: distinct fingerprints the stream must land
    val expected = graft.ingest.NdjsonReader
      .readEvents(spark, in.toString, None)
      .dropDuplicates("md5hash").count()

    val t0 = System.nanoTime()
    // run 1: 8 files/trigger → 4 batches; crash injected after batch 1's
    // sink write commits but before its checkpoint commit
    val r1 = graft.streaming.StreamPipeline.drain(spark, in.toString, ckpt,
      "tb_event_stream", connect _, maxFilesPerTrigger = 8,
      dedupHorizon = "45 days", crashAfterBatch = Some(1L))
    val crashed = r1.failure.isDefined
    val ins1 = r1.inserted
    // restart from the same checkpoint: batch 1 replays (its rows are
    // already in Derby), the idempotent sink inserts 0 for it, the
    // remaining batches drain
    val r2 = graft.streaming.StreamPipeline.drain(spark, in.toString, ckpt,
      "tb_event_stream", connect _, maxFilesPerTrigger = 8, dedupHorizon = "45 days")
    r2.failure.foreach(e => throw e)
    val ins2 = r2.inserted
    val sec = (System.nanoTime() - t0) / 1e9

    val landed = {
      val c = connect()
      try {
        val rs = c.createStatement()
          .executeQuery("""SELECT COUNT(*) FROM "tb_event_stream"""")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    val nIdentity = graft.streaming.StreamPipeline.refreshIdentity(
      spark, url, "tb_event_stream", "tb_identity_stream", connect _)

    // the streaming drain's sink fan-out, MEASURED (VERDICT r05 #7): how
    // many per-partition writer connections were in flight at once
    val peakWriters = graft.sink.SinkGauge.peakWriters

    // Sink fan-out contrast: the same batched transactional writer
    // against the same embedded warehouse, 1 writer connection vs one
    // per partition — quantifies what the partition-parallel sink buys
    // over the reference's single-process INSERT loop
    // (/root/reference/src/Operations/FileImporter.php:74-90).
    def sinkRps(parts: Int, table: String): Double = {
      import org.apache.spark.sql.functions._
      val n = math.max(rows / 2, 1)
      val df = spark.range(n.toLong)
        .select(col("id"), md5(col("id").cast("string")).as("md5hash"),
          concat(lit("payload-"), col("id")).as("body"))
        .repartition(parts)
        .localCheckpoint(eager = true) // time the WRITE, not the generate
      val t0 = System.nanoTime()
      graft.sink.JdbcSink.writeEvolving(df, table, connect _, maxVarchar = 4000)
      val s = (System.nanoTime() - t0) / 1e9
      graft.identity.Components.unpersistCheckpoint(df)
      n / s
    }
    val rps1 = sinkRps(1, "tb_sink_p1")
    val rpsN = sinkRps(cpus.toInt, "tb_sink_pn")

    println(f"""{"metric":"stream_pipeline_rows_per_sec","value":${landed / sec}%.0f,""" +
      s""""rows":$landed,"expected":$expected,"inserted_run1":$ins1,""" +
      s""""inserted_run2":$ins2,"crashed_run1":$crashed,""" +
      s""""identity_rows":$nIdentity,"sec":${math.round(sec * 100) / 100.0},""" +
      s""""sink_peak_writers":$peakWriters,""" +
      f""""sink_rps_p1":$rps1%.0f,"sink_rps_p$cpus":$rpsN%.0f}""")
    spark.stop()

    if (!crashed) { System.err.println("FAIL: injected crash did not fire"); sys.exit(1) }
    if (landed != expected) {
      System.err.println(s"FAIL: warehouse $landed != expected $expected"); sys.exit(1)
    }
    if (ins1 + ins2 != expected) {
      System.err.println(s"FAIL: replay re-inserted rows ($ins1 + $ins2 != $expected)")
      sys.exit(1)
    }
    if (nIdentity == 0) { System.err.println("FAIL: empty identity closure"); sys.exit(1) }
    // only meaningful when the runtime CAN overlap writers: local[1]
    // executes partitions sequentially and would fail spuriously
    if (cpus.toInt > 1 && peakWriters <= 1) {
      System.err.println(s"FAIL: sink never fanned out (peak writers $peakWriters)")
      sys.exit(1)
    }
  }
}
