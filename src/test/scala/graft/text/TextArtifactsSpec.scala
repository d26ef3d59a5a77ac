package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the shared tokenize artifact: counts equal an independent
  * recount, and the persisted-snapshot contract (reuse on an unchanged
  * corpus, rebuild on a stale fingerprint) matches the LSH/graph
  * artifact behavior. */
class TextArtifactsSpec extends SparkSpec {

  private def writeCorpus(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private val corpusA = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "THE Cat! cat?"),       // case folding + punctuation splits
    (3L, ""),                    // zero tokens → no rows
    (4L, "solo"))

  test("wordCounts/vocab equal an independent recount; zero-token docs vanish") {
    val dir = Files.createTempDirectory("graft-ta").toString
    writeCorpus(dir, corpusA)
    val wc = TextArtifacts.wordCounts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = corpusA.flatMap { case (id, t) =>
      t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).map(id -> _)
    }.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(wc == expected, s"wc=$wc expected=$expected")
    assert(!wc.keys.exists(_._1 == 3L), "zero-token doc produced rows")
    val vocab = TextArtifacts.vocab(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab("the") == 3L && vocab("cat") == 3L && vocab("solo") == 1L)
  }

  test("persist → load round-trip, fingerprint invalidation on corpus change") {
    val dir = Files.createTempDirectory("graft-ta-c").toString
    val art = Files.createTempDirectory("graft-ta-art").toString
    writeCorpus(dir, corpusA)
    assert(!TextArtifacts.ensure(spark, dir, art),
      "ensure claimed a hit on an empty artifact dir")
    TextArtifacts.invalidate()
    assert(TextArtifacts.ensure(spark, dir, art),
      "unchanged corpus did not reuse the persisted snapshot")
    assert(TextArtifacts.wordCounts(spark, dir).queryExecution.executedPlan
      .toString.contains("Scan parquet"), "loaded counts are not parquet-backed")
    // corpus changes → stale key → rebuild reflects the new corpus
    TextArtifacts.invalidate()
    writeCorpus(dir, Seq((9L, "brand new words")))
    assert(!TextArtifacts.ensure(spark, dir, art),
      "changed corpus reused a stale snapshot")
    val vocab = TextArtifacts.vocab(spark, dir).collect()
      .map(_.getString(0)).toSet
    assert(vocab == Set("brand", "new", "words"), s"vocab=$vocab")
    TextArtifacts.invalidate()
  }
}
