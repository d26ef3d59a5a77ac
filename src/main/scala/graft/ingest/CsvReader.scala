package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV source mirroring the reference prototype's reader (O5: semicolon
  * delimiter, first row = header, `/root/reference/teste.php:28-43`) on
  * Spark's native CSV datasource — header handling, delimiter, whitespace
  * trim and permissive corrupt-line capture are scan options, so schema
  * pruning and filter pushdown apply as with any FileScan.
  */
object CsvReader {

  val CorruptColumn = "_corrupt_record"

  /** Read a `;`-separated, headered CSV directory/file. Malformed lines
    * land in [[CorruptColumn]] instead of failing the scan (the engine's
    * lenient-ingest policy, same as the NDJSON path).
    *
    * @param schema explicit schema (recommended at scale: skips the
    *               inference pass over the data); None = infer.
    */
  def read(spark: SparkSession, path: String, sep: String = ";",
           schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", true)
      .option("sep", sep)
      .option("ignoreLeadingWhiteSpace", true)
      .option("ignoreTrailingWhiteSpace", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
    schema match {
      case Some(s) =>
        base.schema(s.add(CorruptColumn, "string")).csv(path)
      case None =>
        base.option("inferSchema", true).csv(path)
    }
  }

  /** Reader plus the reference's row treatment: sanitized column names and
    * empty-string-to-NULL normalization (O11/O13). */
  def readNormalized(spark: SparkSession, path: String, sep: String = ";",
                     schema: Option[StructType] = None): DataFrame = {
    val raw = read(spark, path, sep, schema)
    val renamed = raw.toDF(raw.columns.toIndexedSeq.map(graft.model.Sanitize.key): _*)
    renamed.columns.filter(_ != CorruptColumn).foldLeft(renamed) { (df, c) =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          df.withColumn(c, when(col(c) === "", lit(null)).otherwise(col(c)))
        case _ => df
      }
    }
  }
}
