package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

/** O5 CSV scan: `;` delimiter, header row, trim, lenient corrupt capture,
  * sanitize + empty->NULL normalization (reference `teste.php:28-43`). */
class CsvReaderSpec extends SparkSpec {

  private def write(lines: String*): String = {
    val dir = Files.createTempDirectory("csvspec")
    Files.writeString(dir.resolve("book.csv"), lines.mkString("\n"))
    dir.toString
  }

  test("semicolon csv with header parses; whitespace trimmed") {
    val dir = write(
      "id;full name;nick-names",
      "1; alice ;a|al",
      "2;bob;")
    val df = CsvReader.read(spark, dir)
    assert(df.columns.toSeq == Seq("id", "full name", "nick-names"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "alice")
    assert(rows(1).getString(2) == null) // trailing empty field
  }

  test("readNormalized sanitizes headers and nulls empty strings") {
    val dir = write(
      "id;full name;nick-names",
      "1;alice;a|al",
      "2;;x")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("full name", StringType),
      StructField("nick-names", StringType)))
    val df = CsvReader.readNormalized(spark, dir, schema = Some(schema))
    assert(df.columns.toSeq ==
      Seq("id", "full_name", "nick_names", CsvReader.CorruptColumn))
    val r2 = df.where("id = 2").head()
    assert(r2.getAs[String]("full_name") == null) // '' -> NULL (O13)
    assert(r2.getAs[String]("nick_names") == "x")
  }

  test("malformed row lands in the corrupt column, not an exception") {
    val dir = write(
      "id;v",
      "1;10",
      "not-a-number;oops;extra")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val df = CsvReader.read(spark, dir, schema = Some(schema)).cache()
    assert(df.count() == 2)
    assert(df.where(s"${CsvReader.CorruptColumn} IS NOT NULL").count() == 1)
    assert(df.where("id = 1").head().getLong(1) == 10L)
    df.unpersist()
  }
}
