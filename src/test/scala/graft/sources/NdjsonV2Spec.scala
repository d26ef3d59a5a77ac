package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NdjsonV2Spec extends SparkSpec {

  private def corpus(): String = {
    val dir = Files.createTempDirectory("ndjsonv2").toFile
    dir.deleteOnExit()
    def w(name: String, body: String): Unit =
      Files.writeString(new java.io.File(dir, name).toPath, body)
    w("2.json", """{"_p":"a","_n":"view"}""" + "\n\n" + """{"_p":"b","_n":"click"}""" + "\n")
    w("10.json", """{"_p":"c","_n":"buy"}""" + "\n")
    w("1.json", """{"_p":"d","_n":"view"}""" + "\n")
    w(".hidden.json", """{"_p":"x"}""" + "\n")
    w("notes.txt", "not json\n")
    dir.getAbsolutePath
  }

  test("reads all visible .json files; blank lines skipped, lineage kept") {
    val df = spark.read.format("graft-ndjson").load(corpus())
    val rows = df.collect()
    assert(rows.length == 4, rows.mkString("; "))
    // blank line in 2.json advances line_no but yields no row
    val twos = rows.filter(_.getAs[Long]("file_no") == 2L).map(_.getAs[Long]("line_no"))
    assert(twos.toSet == Set(1L, 3L), twos.mkString(","))
    assert(rows.forall(_.getAs[String]("line").nonEmpty))
  }

  test("one partition per file, in natural order (10 after 2)") {
    val df = spark.read.format("graft-ndjson").load(corpus())
    assert(df.rdd.getNumPartitions == 3)
    // partition order IS natural order: collect preserves partition index
    val fileNos = df.select("file_no").collect().map(_.getLong(0))
    assert(fileNos.toSeq == Seq(1L, 2L, 2L, 10L), fileNos.mkString(","))
  }

  test("watermark filter prunes files at planning time") {
    val df = spark.read.format("graft-ndjson").load(corpus())
      .where(col("file_no") > 2L)
    // only 10.json survives split planning — the incremental-run contract
    assert(df.rdd.getNumPartitions == 1, s"got ${df.rdd.getNumPartitions} splits")
    assert(df.collect().map(_.getAs[Long]("file_no")).toSeq == Seq(10L))
    // pruning is advisory: the residual filter must still be in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan.take(1000))
  }

  test("O1: V2 source + text ingest both read a non-file FileSystem scheme (graftfs://)") {
    spark.sparkContext.hadoopConfiguration.set("fs.graftfs.impl",
      classOf[GraftTestFileSystem].getName)
    val local = corpus()
    val uri = "graftfs://" + local

    // V2 source: same rows as the file:// read, lineage carries the scheme
    val viaScheme = spark.read.format("graft-ndjson").load(uri)
    val rows = viaScheme.collect()
    assert(rows.length == 4, rows.mkString("; "))
    assert(rows.forall(_.getAs[String]("file").startsWith("graftfs:")),
      "file lineage lost the scheme — listing fell back to a default fs")
    def content(df: org.apache.spark.sql.DataFrame) =
      df.select("file_no", "line_no", "line").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(content(viaScheme) ===
      content(spark.read.format("graft-ndjson").load(local)))

    // planning-time watermark pruning works THROUGH the scheme
    val pruned = spark.read.format("graft-ndjson").load(uri)
      .where(col("file_no") > 2L)
    assert(pruned.rdd.getNumPartitions == 1,
      s"got ${pruned.rdd.getNumPartitions} splits")
    assert(pruned.collect().map(_.getAs[Long]("file_no")).toSeq == Seq(10L))

    // the text-source ingest chain (rawLines → events) reads it too
    val ev = graft.ingest.NdjsonReader.events(
      graft.ingest.NdjsonReader.rawLines(spark, s"$uri/*.json"))
    assert(ev.count() == 4)
    assert(ev.where(col("name") === "buy").count() == 1)
  }

  test("feeds the existing parse/repair chain end-to-end") {
    val df = spark.read.format("graft-ndjson").load(corpus())
    val ev = graft.ingest.NdjsonReader.events(df)
    assert(ev.count() == 4)
    assert(ev.where(col("name") === "buy").select("file_no")
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
  }
}
