package graft

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.Maintenance

object PipelineSpec {
  // separate in-memory Derby DB from JdbcSinkDerbySpec's; static so the
  // connect closure shipped to executors captures nothing else
  def connect(): java.sql.Connection =
    java.sql.DriverManager.getConnection("jdbc:derby:memory:graftpipe;create=true")
}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def put(dir: String, name: String, lines: String*): Unit =
    Files.writeString(Paths.get(dir, name), lines.mkString("\n"))

  test("batch pipeline: ingest, identity closure, watermark advance, delta rerun") {
    val in = Files.createTempDirectory("pipe-in").toString
    val out = Files.createTempDirectory("pipe-out").toString
    val wmf = Files.createTempDirectory("pipe-wm").resolve("last").toString

    put(in, "1.json",
      """{"_p": "anon-1", "_n": "view", "_t": "1700000000"}""",
      """{"_p": "alice", "_p2": "anon-1", "_n": "signup", "_t": "1700000100"}""")
    put(in, "2.json",
      """{"_p": "bob", "_n": "view", "_t": "1700000200"}""")

    val (n1, prevWm1) = Pipeline.run(spark, in, out, Some(wmf))
    assert(n1 == 3 && prevWm1 == -1L)

    val events = spark.read.parquet(s"$out/events")
    assert(events.count() == 3)
    assert(events.columns.contains("event_date"))

    // identity closure: alice <-> anon-1 in one cluster, canonical = min
    val ids = spark.read.parquet(s"$out/identity")
      .select("alias_id", "canonical_id").as[(String, String)].collect().toMap
    assert(ids("alice") == "alice" && ids("anon-1") == "alice")

    // second run: nothing new -> no ingest
    val (n2, prevWm2) = Pipeline.run(spark, in, out, Some(wmf))
    assert(n2 == 0 && prevWm2 == 2L)

    // delta file -> only its rows are appended
    put(in, "3.json",
      """{"_p": "carol", "_n": "view", "_t": "1700000300"}""")
    val (n3, _) = Pipeline.run(spark, in, out, Some(wmf))
    assert(n3 == 1)
    assert(spark.read.parquet(s"$out/events").count() == 4)
    // no alias edges in the delta -> identity table untouched
    val ids3 = spark.read.parquet(s"$out/identity")
      .select("alias_id", "canonical_id").as[(String, String)].collect().toMap
    assert(ids3 == ids)

    // delta with a NEW cluster {dave, anon-9}: prior assignments survive
    put(in, "4.json",
      """{"_p": "dave", "_p2": "anon-9", "_n": "alias", "_t": "1700000400"}""")
    Pipeline.run(spark, in, out, Some(wmf))
    val ids4 = spark.read.parquet(s"$out/identity")
      .select("alias_id", "canonical_id").as[(String, String)].collect().toMap
    assert(ids4("alice") == "alice" && ids4("anon-1") == "alice")
    // canonical = min STRING of the component: "anon-9" < "dave"
    assert(ids4("dave") == "anon-9" && ids4("anon-9") == "anon-9")

    // delta with a BRIDGING edge: the two existing clusters merge
    // (the reference's G2 LIMIT-1 resolve misses this)
    put(in, "5.json",
      """{"_p": "anon-1", "_p2": "anon-9", "_n": "alias", "_t": "1700000500"}""")
    Pipeline.run(spark, in, out, Some(wmf))
    val ids5 = spark.read.parquet(s"$out/identity")
      .select("alias_id", "canonical_id").as[(String, String)].collect().toMap
    assert(ids5.values.toSet == Set("alice"),
      s"bridge must merge both clusters to min id, got $ids5")
    assert(ids5.keySet == Set("alice", "anon-1", "dave", "anon-9"))
  }

  test("'updated email' events fold email edges into the closure") {
    val in = Files.createTempDirectory("pipe-em-in").toString
    val out = Files.createTempDirectory("pipe-em-out").toString
    // the reference's full-rebuild folds (person—new_email) and
    // (new_email—previous_email) edges (KissmetricsToDatabase.php:426-436)
    put(in, "1.json",
      """{"_p": "anon-7", "_p2": "user@x.com", "_n": "alias", "_t": "1700000000"}""",
      """{"_p": "user@x.com", "_n": "updated email", "_t": "1700000100", "new_email": "u2@x.com", "previous_email": "user@x.com"}""")
    Pipeline.run(spark, in, out, None)
    val ids = spark.read.parquet(s"$out/identity")
      .select("alias_id", "canonical_id").as[(String, String)].collect().toMap
    // all four ids collapse to one cluster, canonical = min string
    assert(ids.keySet == Set("anon-7", "user@x.com", "u2@x.com"))
    assert(ids.values.toSet == Set("anon-7"))
  }

  test("jdbc mode loads tb_event and refreshes tb_identity (Derby e2e)") {
    val in = Files.createTempDirectory("pipe-jdbc-in").toString
    val out = Files.createTempDirectory("pipe-jdbc-out").toString
    val wmf = Files.createTempDirectory("pipe-jdbc-wm").resolve("last").toString
    val connect: () => java.sql.Connection = PipelineSpec.connect _

    def query[A](sql: String)(f: java.sql.ResultSet => A): List[A] = {
      val conn = connect()
      try {
        val rs = conn.createStatement().executeQuery(sql)
        try Iterator.continually(rs).takeWhile(_.next()).map(f).toList
        finally rs.close()
      } finally conn.close()
    }

    put(in, "1.json",
      """{"_p": "alice", "_p2": "anon-1", "_n": "alias", "_t": "1700000000"}""",
      """{"_p": "dave", "_p2": "anon-9", "_n": "alias", "_t": "1700000100"}""")
    Pipeline.run(spark, in, out, Some(wmf), Some(connect), jdbcMaxVarchar = 4000)
    assert(query("""SELECT count(*) FROM "tb_event"""")(_.getLong(1)) == List(2L))
    val ids1 = query("""SELECT "alias", "id" FROM "tb_identity"""")(
      r => r.getString(1) -> r.getString(2)).toMap
    assert(ids1("alice") == "alice" && ids1("anon-1") == "alice")
    assert(ids1("dave") == "anon-9")

    // delta bridges the two clusters: events APPEND, identity REFRESHES
    // (stale dave -> anon-9 must not survive)
    put(in, "2.json",
      """{"_p": "anon-1", "_p2": "anon-9", "_n": "alias", "_t": "1700000200"}""")
    Pipeline.run(spark, in, out, Some(wmf), Some(connect), jdbcMaxVarchar = 4000)
    assert(query("""SELECT count(*) FROM "tb_event"""")(_.getLong(1)) == List(3L))
    val ids2 = query("""SELECT "alias", "id" FROM "tb_identity"""")(
      r => r.getString(1) -> r.getString(2)).toMap
    assert(ids2.values.toSet == Set("alice"), s"stale assignments: $ids2")
    assert(ids2.keySet == Set("alice", "anon-1", "dave", "anon-9"))
  }

  test("compaction reduces file count, preserves rows") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    spark.range(1000).repartition(16).write.parquet(dir)
    val before = spark.read.parquet(dir).count()
    val (nBefore, nAfter) = Maintenance.compact(spark, dir)
    assert(nBefore == 16)
    assert(nAfter == 1)
    assert(spark.read.parquet(dir).count() == before)
  }

  test("compaction preserves hive partition layout (pruning survives)") {
    import org.apache.spark.sql.functions.{col, pmod}
    val dir = Files.createTempDirectory("compactp").toString + "/t"
    spark.range(1000)
      .withColumn("event_date", pmod(col("id"), org.apache.spark.sql.functions.lit(3)))
      .repartition(8)
      .write.partitionBy("event_date").parquet(dir)
    assert(Maintenance.detectPartitionColumns(dir) == Seq("event_date"))
    Maintenance.compact(spark, dir)
    // partition dirs still exist -> scans with event_date filters prune
    val partDirs = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("event_date=")).sorted
    assert(partDirs.toSeq == Seq("event_date=0", "event_date=1", "event_date=2"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.columns.contains("event_date"))
    assert(back.filter(col("event_date") === 1).count() == 333)
  }
}
