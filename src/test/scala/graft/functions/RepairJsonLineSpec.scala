package graft.functions

import graft.SparkSpec
import graft.ingest.NdjsonReader

class RepairJsonLineSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    """{"a": "clean"}""",
    """{"a": "say "hi" now"}""",
    """{"p": "C:\Users\x"}""",
    """{"a": "", "b": "y"}""",
    "not json at all")

  test("expression output equals the pure function (codegen path)") {
    GraftFunctions.register(spark)
    val got = cases.toDF("line")
      .selectExpr("repair_json(line) AS r").as[String].collect().toSeq
    assert(got == cases.map(NdjsonReader.repairLine))
  }

  test("usable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT repair_json('{"m": "a "q" b"}') AS r""").as[String].head()
    assert(r == """{"m": "a \"q\" b"}""")
  }

  test("null-safe") {
    GraftFunctions.register(spark)
    val got = Seq[Option[String]](None, Some("{}")).toDF("line")
      .selectExpr("repair_json(line) AS r").as[Option[String]].collect().toSeq
    assert(got == Seq(None, Some("{}")))
  }
}
