package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Sanitize

/** Row-level event derivations from the reference pipeline, re-expressed as
  * codegen-friendly Spark column expressions (no UDFs — every transform here
  * stays inside whole-stage codegen):
  *
  *  - O11 key sanitization   (`/root/reference/helpers.php:28-35`)
  *  - O12 `_n_not_null`      (`/root/reference/src/Operations/ProcessFile.php:40`)
  *  - O13 empty→NULL         (`/root/reference/src/KissmetricsToDatabase.php:284-286`)
  *  - O14 epoch→timestamp    (`/root/reference/src/KissmetricsToDatabase.php:289-291`)
  *  - O15 md5 row fingerprint (`/root/reference/src/KissmetricsToDatabase.php:293`)
  *  - O16' load-date stamp   (`/root/reference/src/Operations/FileImporter.php:82-84`)
  *
  * Fingerprint semantics divergence (documented, SURVEY.md §7.4): the reference
  * hashes values in key-*insertion* order, which is ill-defined on a columnar
  * engine; we define fingerprint = md5 over values in explicit column-list
  * order, NULL ≍ empty string (concat_ws skips nulls).
  */
object EventTransforms {

  /** O12: coalesce-to-empty, the LIKE-filterable twin of a nullable name col. */
  def notNull(c: Column): Column = coalesce(c, lit(""))

  /** O13: empty-string → NULL normalization. */
  def emptyToNull(c: Column): Column = when(trim(c) === "", lit(null)).otherwise(c)

  /** O14: unix epoch seconds → timestamp (session TZ = UTC everywhere). */
  def epochToTs(c: Column): Column = to_timestamp(from_unixtime(c))

  /** O15: deterministic row fingerprint over an explicit column list.
    * md5 for reference fidelity; prefer [[fingerprint64]] in 100 TB paths. */
  def fingerprint(cols: Seq[Column]): Column = md5(concat_ws("", cols: _*))

  /** Cheap 64-bit fingerprint for scale paths (shuffle keys, dedup). */
  def fingerprint64(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** O16': load-date stamp. Excluded from oracle-compared queries (non-deterministic). */
  def withLoadDate(df: DataFrame, colName: String = "created_at"): DataFrame =
    df.withColumn(colName, current_date())

  /** O11: sanitize all column names; metadata-only, zero execution cost. */
  def sanitizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(Sanitize.key): _*)
}
