package graft.transform

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("notNull coalesces null to empty, keeps values") {
    val df = Seq(Some("x"), None, Some("")).toDF("c")
      .select(EventTransforms.notNull(col("c")).as("r"))
    assert(df.as[String].collect().toSeq == Seq("x", "", ""))
  }

  test("emptyToNull nulls blank strings") {
    val df = Seq("x", "", "  ", "y").toDF("c")
      .select(EventTransforms.emptyToNull(col("c")).as("r"))
    assert(df.as[Option[String]].collect().toSeq ==
      Seq(Some("x"), None, None, Some("y")))
  }

  test("epochToTs converts unix seconds in UTC") {
    val df = Seq(0L, 86400L).toDF("e")
      .select(date_format(EventTransforms.epochToTs(col("e")), "yyyy-MM-dd HH:mm:ss").as("s"))
    assert(df.as[String].collect().toSeq ==
      Seq("1970-01-01 00:00:00", "1970-01-02 00:00:00"))
  }

  test("fingerprint is md5 of concatenated values, null as skip") {
    val df = Seq(("a", "b")).toDF("x", "y")
      .select(EventTransforms.fingerprint(Seq(col("x"), col("y"))).as("h"))
    // md5("ab")
    assert(df.as[String].head() == "187ef4436122d1cc2f40dc2b92f0eba0")
  }

  test("sanitizeColumnNames renames only metadata") {
    val df = Seq((1, 2)).toDF("a-b", "c d")
    val out = EventTransforms.sanitizeColumnNames(df)
    assert(out.columns.toSeq == Seq("a_b", "c_d"))
    assert(out.head() == df.head())
  }
}
