package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

class NdjsonReaderSpec extends SparkSpec {
  import spark.implicits._

  // --- repairLine (pure) ---

  test("repairLine leaves valid JSON untouched") {
    val s = """{"_p": "u1", "_n": "pageview", "_t": "1700000000"}"""
    assert(NdjsonReader.repairLine(s) == s)
  }

  test("repairLine escapes unescaped inner quotes") {
    val dirty = """{"_p": "u1", "msg": "say "hi" now"}"""
    val fixed = NdjsonReader.repairLine(dirty)
    assert(fixed == """{"_p": "u1", "msg": "say \"hi\" now"}""")
  }

  test("repairLine doubles lone backslashes, keeps valid escapes") {
    val dirty = """{"path": "C:\Users\x", "ok": "a\nb"}"""
    val fixed = NdjsonReader.repairLine(dirty)
    assert(fixed == """{"path": "C:\\Users\\x", "ok": "a\nb"}""")
  }

  // --- end-to-end read over real files ---

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("ndjson").toFile
    def put(name: String, lines: String*): Unit =
      Files.writeString(new java.io.File(dir, name).toPath, lines.mkString("\n"))
    put("1.json",
      """{"_p": "alice", "_n": "signup", "_t": "1700000000", "plan-type": "pro"}""",
      "",
      """{"_p": "bob", "_p2": "anon-7", "_n": "", "_t": "1700000100"}""")
    put("2.json",
      """{"_p": "carol", "_n": "note", "_t": "1700000200", "msg": "said "hey""}""",
      """not json at all {{{""")
    put("10.json",
      """{"_p": "dave", "_n": "view", "_t": "1700000300"}""")
    dir.getAbsolutePath
  }

  test("reads, repairs, and types events; skips blanks; flags corrupt") {
    val dir = writeFixture()
    val parsed = NdjsonReader.parsed(NdjsonReader.rawLines(spark, dir))
    assert(parsed.count() == 5) // 5 non-blank lines
    assert(parsed.filter($"corrupt_line".isNotNull).count() == 1)

    val ev = NdjsonReader.events(NdjsonReader.rawLines(spark, dir))
    assert(ev.count() == 4)
    val alice = ev.filter($"person" === "alice").head()
    assert(alice.getAs[Map[String, String]]("props")("plan_type") == "pro")
    assert(alice.getAs[String]("n_not_null") == "signup")
    val bob = ev.filter($"person" === "bob").head()
    assert(bob.getAs[String]("alias") == "anon-7")
    assert(bob.getAs[String]("n_not_null") == "")
    val carol = ev.filter($"person" === "carol").head()
    assert(carol.getAs[Map[String, String]]("props")("msg") == "said \"hey\"")
  }

  test("watermark filter skips files at or below the mark, natural order") {
    val dir = writeFixture()
    val all = NdjsonReader.rawLines(spark, dir)
    assert(all.select("file_no").distinct().as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 10L)) // natural, not lexicographic (10 > 2)
    val after = NdjsonReader.rawLines(spark, dir, watermark = Some(2L))
    assert(after.select("file_no").distinct().as[Long].collect().toSeq == Seq(10L))
  }

  test("natSortKey reproduces PHP natsort ordering (strnatcmp)") {
    import org.apache.spark.sql.functions.col
    // expected orders verified against PHP natsort semantics: numeric runs
    // compare numerically ('img2' < 'img10'), zero-led runs compare
    // left-aligned ('09' < '1', '01' < '1'), digits before letters
    val cases = Seq(
      // the php.net natsort doc example
      Seq("img12.png", "img10.png", "img2.png", "img1.png") ->
        Seq("img1.png", "img2.png", "img10.png", "img12.png"),
      // fractional (leading-zero) rule + digit/alpha/end interleavings
      Seq("10", "9", "2", "1", "09", "02", "01") ->
        Seq("01", "02", "09", "1", "2", "9", "10"),
      Seq("a10", "a2", "a1", "a01", "a0", "a", "b") ->
        Seq("a", "a0", "a01", "a1", "a2", "a10", "b"),
      // separators below '0' keep their bytewise position
      Seq("a.b", "a1b", "a_b") -> Seq("a.b", "a1b", "a_b"),
      // long runs (>= 9 digits) stay numeric
      Seq("f123456789123", "f123456789", "f99") ->
        Seq("f99", "f123456789", "f123456789123"))
    for ((in, want) <- cases) {
      val got = in.toDF("name")
        .select(col("name"), NdjsonReader.natSortKey(col("name")).as("k"))
        .orderBy(col("k"))
        .collect().map(_.getString(0)).toSeq
      assert(got == want, s"input=$in got=$got want=$want")
    }
  }

  test("watermark store only advances forward") {
    val f = Files.createTempDirectory("wm").resolve("last").toString
    assert(WatermarkStore.read(f).isEmpty)
    WatermarkStore.advance(f, 5L)
    assert(WatermarkStore.read(f).contains(5L))
    WatermarkStore.advance(f, 3L)
    assert(WatermarkStore.read(f).contains(5L))
    WatermarkStore.advance(f, 9L)
    assert(WatermarkStore.read(f).contains(9L))
  }

  test("md5hash is stable under key order and sanitization") {
    val a = Seq("""{"b-x": "2", "a": "1"}""").toDF("line")
    val b = Seq("""{"a": "1", "b_x": "2"}""").toDF("line")
    def hash(df: org.apache.spark.sql.DataFrame): String =
      NdjsonReader.events(df
        .withColumn("file", org.apache.spark.sql.functions.lit("f"))
        .withColumn("file_no", org.apache.spark.sql.functions.lit(0L)))
        .select("md5hash").as[String].head()
    assert(hash(a) == hash(b))
  }
}
