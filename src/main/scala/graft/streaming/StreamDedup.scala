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
      // the ONE fingerprint definition (EventTransforms O15): md5 over
      // unseparated concatenated values, reference fidelity — which also
      // means the REFERENCE's collision class is inherited deliberately:
      // ("x","yz") and ("xy","z") fingerprint identically, as they do in
      // the warehouse the batch path backfills. Batch and stream must
      // agree on identity byte-for-byte or replayed rows re-insert;
      // callers needing boundary-safe keys dedup on a to_json/struct
      // column upstream instead.
      .withColumn("md5hash", graft.transform.EventTransforms.fingerprint(
        fingerprintCols.map(c => coalesce(col(c).cast("string"), lit("")))))
      .withWatermark("ts", delayThreshold)
      .dropDuplicatesWithinWatermark("md5hash")
}
