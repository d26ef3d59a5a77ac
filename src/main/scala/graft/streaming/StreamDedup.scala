package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup — the reference's `md5hash` idempotency contract
  * (A4/T2: re-delivered rows must not re-insert,
  * `/root/reference/src/KissmetricsToDatabase.php:293,656-672`) done with
  * watermarked state instead of a unique index on the warehouse:
  *
  *  - `dropDuplicatesWithinWatermark` keeps one row per fingerprint and
  *    EXPIRES state once the event-time watermark passes, so state size is
  *    bounded by (dedup horizon × arrival rate), not by history — the
  *    property that makes this run forever at production scale. A plain
  *    streaming `dropDuplicates` would grow state without bound.
  *  - The fingerprint is the same md5-of-values hash the batch path
  *    computes (EventTransforms.fingerprint analog), so batch backfill and
  *    the stream agree on identity.
  */
object StreamDedup {

  /** Deduplicate a streaming events frame by fingerprint within
    * `delayThreshold` of event time.
    *
    * @param events streaming frame with an event-time column `ts`
    * @param fingerprintCols columns hashed into the dedup key
    * @param delayThreshold how late a duplicate may arrive and still be
    *                       suppressed (also bounds the state retention).
    *                       REQUIRED, no default (the StreamPipeline.drain
    *                       rule): it must exceed the source's event-time
    *                       disorder — a file source's mod-time ties can
    *                       reorder whole files, and rows landing below
    *                       the watermark are silently DROPPED as late,
    *                       not deduped. Sizing it is a caller decision.
    */
  def dedup(events: DataFrame, fingerprintCols: Seq[String],
            delayThreshold: String): DataFrame =
    events
      .withColumn("md5hash",
        md5(concat_ws("", fingerprintCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)))
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("md5hash")
}
