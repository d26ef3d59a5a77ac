package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The reference's full `process-files` loop as ONE Structured Streaming
  * pipeline: checkpointed NDJSON file source → typed events (lenient
  * parse + repair, shared with batch) → watermarked in-stream dedup →
  * idempotent JDBC load, with the identity closure refreshed from the
  * warehouse after the drain.
  *
  * Exactly-once is a CONTRACT COMPOSITION, matching the reference's
  * watermark-rollback semantics
  * (`/root/reference/src/Commands/ProcessFilesCommand.php:64-69`,
  * `/root/reference/src/KissmetricsToDatabase.php:742-745`):
  *
  *  - the checkpoint gives at-least-once batch replay (a crash between
  *    sink write and checkpoint commit replays the batch — the rollback);
  *  - `JdbcSink.writeIdempotent` (md5hash anti-join inside the database)
  *    makes the replayed write a no-op — at-least-once × idempotent sink
  *    = exactly-once rows in `tb_event`.
  *
  * `crashAfterBatch` injects exactly that crash for proof: the batch's
  * rows are IN the warehouse but the checkpoint never learns the batch
  * completed, so a restart replays it. BenchStreamPipeline drives this at
  * 500 k rows; StreamPipelineE2ESpec asserts the row counts.
  */
object StreamPipeline {

  /** Outcome of one drain attempt: rows the idempotent sink actually
    * inserted (counted even when the attempt crashed mid-run) and the
    * failure, if any. */
  final case class DrainResult(inserted: Long, failure: Option[Throwable])

  /** One AvailableNow drain attempt (start → await). A `crashAfterBatch`
    * attempt throws AFTER the sink write of that batch commits, BEFORE
    * the checkpoint records it — the exact crash window the rollback
    * contract covers.
    */
  def drain(spark: SparkSession, inDir: String, checkpointDir: String,
      table: String, connect: () => java.sql.Connection,
      maxFilesPerTrigger: Int, dedupHorizon: String,
      crashAfterBatch: Option[Long] = None,
      maxVarchar: Int = 4000): DrainResult = {
    val inserted = new AtomicLong(0L)
    val events = StreamIngest.readEvents(spark, inDir, Some(maxFilesPerTrigger))
    // null-ts rows (lenient parse leaves ts null for missing/malformed
    // time fields) must NOT enter the watermarked dedup — their event
    // time would read as always-late and the rows would silently vanish
    // while the batch path loads them. They bypass the stateful dedup;
    // exactly-once still holds for them through the idempotent sink's
    // md5hash anti-join (which covers cross-batch replays for ALL rows).
    val withTs = events.where(org.apache.spark.sql.functions.col("ts").isNotNull)
    val noTs = events.where(org.apache.spark.sql.functions.col("ts").isNull)
    val q = withTs
      // in-stream dedup: the reader's md5hash fingerprint, state bounded
      // by the watermark horizon (StreamDedup semantics, key pre-computed).
      // `dedupHorizon` is deliberately REQUIRED (no default): it must
      // exceed the source's EVENT-TIME disorder — the file source orders
      // by modification time, and a file whose events sit more than the
      // horizon behind the watermark is dropped as late (observed: with a
      // 10-minute default, same-millisecond mod-time ties reordered the
      // bench corpus's files under load and silently dropped a whole
      // 1998-row batch against its 23-day event-time span). Forcing the
      // caller to size it makes that a decision, not an accident.
      .withWatermark("ts", dedupHorizon)
      .dropDuplicatesWithinWatermark("md5hash")
      .unionByName(noTs)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // props lands as JSON text (the sink's generic toString for maps
        // is not parseable back; JSON is — refreshIdentity reads it with
        // from_json to rebuild the email-update edges)
        val jsonProps = batch.withColumn("props",
          org.apache.spark.sql.functions.to_json(
            org.apache.spark.sql.functions.col("props")))
        inserted.addAndGet(graft.sink.JdbcSink.writeIdempotent(
          jsonProps.dropDuplicates("md5hash"), table, connect,
          maxVarchar = maxVarchar))
        if (crashAfterBatch.contains(batchId))
          throw new RuntimeException(
            s"injected crash after sink write of batch $batchId")
        ()
      }
      .start()
    try { q.awaitTermination(); DrainResult(inserted.get(), None) }
    catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
      DrainResult(inserted.get(), Some(e)) }
  }

  /** Refresh the identity closure from the loaded warehouse events — the
    * post-drain step of the reference loop (closure REWRITES assignments
    * when a bridge merges clusters, so it is a snapshot, not an append).
    * Returns the closure size. */
  def refreshIdentity(spark: SparkSession, jdbcUrl: String, eventsTable: String,
      identityTable: String, connect: () => java.sql.Connection): Long = {
    val events = spark.read.format("jdbc")
      .option("url", jdbcUrl)
      .option("dbtable", s"\"$eventsTable\"")
      .load()
      .withColumn("props", org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
    val edges = graft.identity.IdentityEdges.fromEvents(events)
    // collisionFree: this IS identity resolution — the case the flag was
    // built for (a silent xxhash64 over-merge here corrupts every
    // downstream join of tb_identity); the zipWithIndex dictionary costs
    // one extra pass over the distinct ids
    val closure = graft.identity.Components.connectedComponentsString(edges,
      collisionFree = true)
      .withColumnRenamed("id", "alias")
      .withColumnRenamed("canonical_id", "id")
      .localCheckpoint(eager = true)
    graft.Pipeline.truncateIfExists(connect, identityTable)
    graft.sink.JdbcSink.writeEvolving(closure, identityTable, connect,
      maxVarchar = 4000)
    closure.count()
  }
}
