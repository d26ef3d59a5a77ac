package graft.sink

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JdbcSinkSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("event id", StringType),
    StructField("_t", TimestampType),
    StructField("n", LongType),
    StructField("v", DoubleType)))

  test("createTableSql sanitizes identifiers and maps types") {
    assert(JdbcSink.createTableSql("tb-event", schema) ==
      """CREATE TABLE IF NOT EXISTS "tb_event" ("event_id" VARCHAR(65535), "_t" TIMESTAMP, "n" BIGINT, "v" DOUBLE PRECISION)""")
  }

  test("diffColumns is case- and sanitize-insensitive") {
    val missing = JdbcSink.diffColumns(schema, Seq("EVENT_ID", "_T"))
    assert(missing.map(_.name) == Seq("n", "v"))
    assert(JdbcSink.diffColumns(schema, Seq("event id", "_t", "n", "v")).isEmpty)
  }

  test("alterTableSql emits one ADD COLUMN per new field") {
    val stmts = JdbcSink.alterTableSql("t", Seq(StructField("x y", StringType)))
    assert(stmts == Seq("""ALTER TABLE "t" ADD COLUMN "x_y" VARCHAR(65535)"""))
  }

  test("defaultType overrides the dynamic-column type (DB_DEFAULT_FIELD_TYPE)") {
    // the reference's env knob: discovered columns get this SQL type
    // instead of a sized VARCHAR; typed columns are unaffected
    val sql = JdbcSink.createTableSql("t", schema, defaultType = Some("TEXT"))
    assert(sql ==
      """CREATE TABLE IF NOT EXISTS "t" ("event_id" TEXT, "_t" TIMESTAMP, "n" BIGINT, "v" DOUBLE PRECISION)""")
    val alter = JdbcSink.alterTableSql("t", Seq(StructField("x", StringType)),
      defaultType = Some("CLOB"))
    assert(alter == Seq("""ALTER TABLE "t" ADD COLUMN "x" CLOB"""))
  }

  test("insertSql parameterizes every column") {
    assert(JdbcSink.insertSql("t", schema) ==
      """INSERT INTO "t" ("event_id", "_t", "n", "v") VALUES (?, ?, ?, ?)""")
  }
}
