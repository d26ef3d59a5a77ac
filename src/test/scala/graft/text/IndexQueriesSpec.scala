package graft.text

import graft.SparkSpec
import graft.queries.Registry

/** Oracle-independent invariants for the retrieval-index build and the
  * badwords gate: the posting deltas must ROUND-TRIP to valid in-block
  * doc ids (the property a consumer of the index relies on), block stats
  * must add up to the global term stats, and the badword injection must
  * route every seeded severity class to its declared action.
  */
class IndexQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("index_inverted postings round-trip: deltas decode to sorted in-block ids") {
    val rows = Registry.queries("index_inverted")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val block = r.getAs[Long]("block")
      val dfBlock = r.getAs[Long]("df_block")
      val cfBlock = r.getAs[Long]("cf_block")
      val posts = r.getAs[String]("postings").split(" ").toSeq
        .map { e => val Array(d, tf) = e.split(":"); (d.toLong, tf.toLong) }
      assert(posts.size.toLong === dfBlock)
      assert(posts.map(_._2).sum === cfBlock)
      assert(posts.forall(_._2 >= 1L))
      // running sum from the block base reconstructs strictly-increasing
      // doc ids that stay inside the block
      val ids = posts.map(_._1).scanLeft(block * 100L)(_ + _).tail
      assert(ids == ids.sorted && ids.distinct == ids)
      assert(ids.forall(id => id >= block * 100L && id < (block + 1) * 100L))
    }
  }

  test("index_inverted block stats fold back to the global df/cf per term") {
    val rows = Registry.queries("index_inverted")(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("term")).foreach { case (term, rs) =>
      val df = rs.head.getAs[Long]("df")
      val cf = rs.head.getAs[Long]("cf")
      assert(rs.map(_.getAs[Long]("df_block")).sum === df, s"term=$term")
      assert(rs.map(_.getAs[Long]("cf_block")).sum === cf, s"term=$term")
    }
  }

  test("index_incremental: batch-only postings, stats match a local split recompute") {
    val docs = graft.queries.Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def md5b(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xF) * 16 + (h(0) & 0xF)
    }
    def toks(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val perDoc = docs.map { case (d, t) =>
      (d, md5b(d) < 51, toks(t).groupBy(identity).map { case (w, v) => w -> v.size.toLong })
    }
    def stats(batch: Boolean): Map[String, (Long, Long)] =
      perDoc.filter(_._2 == batch).flatMap { case (_, _, m) => m.toSeq }
        .groupBy(_._1)
        .map { case (w, xs) => w -> ((xs.size.toLong, xs.map(_._2).sum)) }
    val (bs, ls) = (stats(true), stats(false))
    val rows = Registry.queries("index_incremental")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("term")).toSet === bs.keySet,
      "output must cover exactly the batch vocabulary")
    rows.foreach { r =>
      val t = r.getAs[String]("term")
      assert((r.getAs[Long]("df_batch"), r.getAs[Long]("cf_batch")) === bs(t))
      assert((r.getAs[Long]("df_lake"), r.getAs[Long]("cf_lake")) ===
        ls.getOrElse(t, (0L, 0L)))
      assert(r.getAs[Boolean]("is_new_term") === !ls.contains(t))
      // postings decode to strictly-increasing batch doc ids, count = df_batch
      val ids = r.getAs[String]("postings").split(" ")
        .map(_.split(":")(0).toLong).scanLeft(0L)(_ + _).tail
      assert(ids.length.toLong === r.getAs[Long]("df_batch"))
      assert(ids.toSeq == ids.sorted.toSeq && ids.distinct.length == ids.length)
      ids.foreach(id => assert(md5b(id) < 51, s"non-batch doc $id in postings"))
    }
  }

  test("text_badwords routes every injected severity class") {
    val byId = Registry.queries("text_badwords")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 3 (3 % 7 = 3): two xxrated + one nsfwterm -> 3 adult hits -> review
    assert(byId(3L).getAs[Long]("n_adult") === 3L)
    assert(byId(3L).getAs[String]("action") === "review")
    // doc 5 (5 % 11 = 5): casinospin + betmax -> 2 gambling hits -> flag
    assert(byId(5L).getAs[Long]("n_gambling") === 2L)
    assert(byId(5L).getAs[String]("action") === "flag")
    // doc 7 (7 % 13 = 7): slur -> drop regardless of other counts
    assert(byId(7L).getAs[Long]("n_slur") === 1L)
    assert(byId(7L).getAs[String]("action") === "drop")
    // a clean doc keeps
    assert(byId(1L).getAs[Long]("n_bad") === 0L)
    assert(byId(1L).getAs[String]("action") === "keep")
  }

  test("index_merge: touched terms only, lake∪batch postings round-trip, stats fold") {
    def md5b(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xF) * 16 + (h(0) & 0xF)
    }
    val rows = Registry.queries("index_merge")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute the split locally off the raw corpus
    val docs = graft.queries.Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def toks(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val perDoc = docs.map { case (d, t) => (d, md5b(d) < 51, toks(t)) }
    val touched = perDoc.filter(_._2).flatMap(_._3).toSet
    val gotTerms = rows.map(_.getAs[String]("term")).toSet
    assert(gotTerms == touched,
      "merged output must cover exactly the batch-touched terms")
    // per-term: df = lake + batch docs containing it; postings decode to
    // the SORTED doc ids of lake ∪ batch
    val docsByTerm = perDoc.flatMap { case (d, isBatch, ts) =>
      ts.distinct.map(t => (t, d, isBatch)) }.groupBy(_._1)
    rows.groupBy(_.getAs[String]("term")).foreach { case (term, rs) =>
      val want = docsByTerm(term)
      assert(rs.head.getAs[Long]("df") === want.size.toLong, s"df($term)")
      assert(rs.head.getAs[Long]("df_batch") === want.count(_._3).toLong)
      assert(rs.head.getAs[Long]("df_lake") === want.count(!_._3).toLong)
      val decoded = rs.flatMap { r =>
        val block = r.getAs[Long]("block")
        r.getAs[String]("postings").split(" ")
          .map(_.split(":")(0).toLong)
          .scanLeft(block * 100L)(_ + _).tail
      }.sorted
      assert(decoded.toSeq == want.map(_._2).distinct.sorted.toSeq,
        s"postings($term) decode mismatch")
    }
  }

  test("text_bm25_served ≡ text_bm25: the index answers exactly what a corpus recompute answers") {
    def rows(name: String): Seq[(Long, Long, Double, Long)] =
      Registry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_match"),
          r.getAs[Double]("bm25"), r.getAs[Long]("rk"))).toSeq
    val served = rows("text_bm25_served")
    val recomputed = rows("text_bm25")
    assert(served.nonEmpty)
    assert(served.toSet === recomputed.toSet,
      "served-from-postings BM25 diverges from the corpus recompute")
  }

  private def md5DelByte(id: Long): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"del:$id".getBytes("UTF-8"))
    ((h(0) >> 4) & 0xF) * 16 + (h(0) & 0xF)
  }

  test("index_delete: swept rows ≡ a rebuild without the deleted docs, stats reflect removals") {
    def toks(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val docs = graft.queries.Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val deleted = docs.map(_._1).filter(id => md5DelByte(id) < 26).toSet
    assert(deleted.nonEmpty, "fixture has no tombstoned docs — threshold drifted?")
    // local ground truth: (term -> docs/tf), full-corpus stats, touched keys
    val tf = docs.flatMap { case (d, t) =>
      toks(t).groupBy(identity).map { case (w, v) => (w, d, v.size.toLong) } }
    val byTerm = tf.groupBy(_._1)
    val touched = tf.filter(x => deleted(x._2)).map(x => (x._1, x._2 / 100L)).toSet
    val rows = Registry.queries("index_delete")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // output keys = touched (term, block) that still have survivors
    val expectKeys = touched.filter { case (t, b) =>
      byTerm(t).exists(x => !deleted(x._2) && x._2 / 100L == b) }
    assert(rows.map(r => (r.getAs[String]("term"), r.getAs[Long]("block"))).toSet
      === expectKeys, "swept keys ≠ touched-with-survivors keys")
    rows.foreach { r =>
      val t = r.getAs[String]("term"); val b = r.getAs[Long]("block")
      val all = byTerm(t)
      val rem = all.filter(x => deleted(x._2))
      assert(r.getAs[Long]("df_removed") === rem.size.toLong, s"df_removed($t)")
      assert(r.getAs[Long]("cf_removed") === rem.map(_._3).sum, s"cf_removed($t)")
      assert(r.getAs[Long]("df_after") === (all.size - rem.size).toLong)
      assert(r.getAs[Long]("cf_after") === all.map(_._3).sum - rem.map(_._3).sum)
      // the swept postings decode to EXACTLY the surviving doc ids of the
      // block — what a rebuild without the deleted docs would emit
      val want = all.filter(x => !deleted(x._2) && x._2 / 100L == b)
        .map(x => (x._2, x._3)).sortBy(_._1)
      val got = r.getAs[String]("postings").split(" ").map { e =>
        val Array(d, c) = e.split(":"); (d.toLong, c.toLong) }
      val ids = got.map(_._1).scanLeft(b * 100L)(_ + _).tail
      assert(ids.toSeq === want.map(_._1), s"swept postings($t, $b) ids")
      assert(got.map(_._2).toSeq === want.map(_._2), s"swept postings($t, $b) tfs")
      assert(r.getAs[Long]("df_block") === want.size.toLong)
    }
  }

  test("sweptPostings ≡ a rebuild over the surviving corpus; swept serve reads it tombstone-free") {
    import org.apache.spark.sql.functions._
    // ground truth: the index built over documents MINUS the kill-list —
    // same encodeBlocks, corpus pre-filtered
    val tf = graft.queries.Tables.documents(spark, sfDir)
      .where(expr(s"NOT (${IndexArtifacts.delPredSql("STRING")})"))
      .select(col("doc_id"),
        explode(expr(graft.text.TextQueries.tokenizeExpr)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    def keyRows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[String]("term"), r.getAs[Long]("block")) ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"), r.getAs[Long]("df_block"),
          r.getAs[Long]("cf_block"), r.getAs[String]("postings")))
    }.toMap
    val want = keyRows(IndexArtifacts.encodeBlocks(tf))
    val got = keyRows(IndexArtifacts.sweptPostings(spark, sfDir))
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(v === want(k), s"swept row $k diverges from rebuild-without-deleted") }
    // and the two serve paths agree: kill-list-at-serve-time ≡
    // swept-at-compaction-time
    def top(name: String) = Registry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_match"),
        r.getAs[Double]("bm25"), r.getAs[Long]("rk"))).toSet
    assert(top("text_bm25_swept_served") === top("text_bm25_swept"))
  }

  test("text_bm25_swept never returns a tombstoned doc") {
    val rows = Registry.queries("text_bm25_swept")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(md5DelByte(d) >= 26, s"deleted doc $d served from the swept index")
    }
  }

  test("mergedPostings ≡ postings: serve-after-merge reads exactly what a rebuild writes") {
    def keyRows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getAs[String]("term"), r.getAs[Long]("block")) ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"), r.getAs[Long]("df_block"),
          r.getAs[Long]("cf_block"), r.getAs[String]("postings")))
    }.toMap
    val merged = keyRows(IndexArtifacts.mergedPostings(spark, sfDir))
    val rebuilt = keyRows(IndexArtifacts.postings(spark, sfDir))
    assert(merged.keySet === rebuilt.keySet)
    merged.foreach { case (k, v) =>
      assert(v === rebuilt(k), s"merged row $k diverges from rebuild") }
    // and the serve path off the fold equals the corpus recompute
    def top(name: String) = Registry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_match"),
        r.getAs[Double]("bm25"), r.getAs[Long]("rk"))).toSet
    assert(top("text_bm25_merged_served") === top("text_bm25"))
  }

  test("index snapshot: persist/load round-trip, parquet-backed, stale key rebuilds") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-fix").toString
    val art = java.nio.file.Files.createTempDirectory("graft-idx-art").toString
    def fixture(seed: Int, n: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      import spark.implicits._
      (0 until n).map { i =>
        val words = Seq.fill(5 + rnd.nextInt(20))(
          Seq("spark", "dup", "window", "alpha", "beta", "gamma")(rnd.nextInt(6)))
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    fixture(seed = 31, n = 250)
    TextArtifacts.invalidate(); IndexArtifacts.invalidate()
    assert(!IndexArtifacts.ensure(spark, dir, art),
      "ensure claimed a hit on an empty artifact dir")
    def served(): Set[(Long, Long, Double, Long)] =
      Registry.queries("text_bm25_served")(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_match"),
          r.getAs[Double]("bm25"), r.getAs[Long]("rk"))).toSet
    val s1 = served()
    assert(s1.nonEmpty)

    // unchanged corpus, cold session cache → parquet-backed reload, and
    // the served answer is identical off the loaded index
    TextArtifacts.invalidate(); IndexArtifacts.invalidate()
    assert(IndexArtifacts.ensure(spark, dir, art),
      "unchanged corpus did not reuse the persisted index snapshot")
    assert(IndexArtifacts.postings(spark, dir).queryExecution.executedPlan
      .toString.contains("Scan parquet"), "loaded postings are not parquet-backed")
    assert(served() === s1)

    // changed corpus → stale fingerprint → rebuild
    TextArtifacts.invalidate(); IndexArtifacts.invalidate()
    fixture(seed = 32, n = 200)
    assert(!IndexArtifacts.ensure(spark, dir, art),
      "changed corpus reused a stale index snapshot")
    TextArtifacts.invalidate(); IndexArtifacts.invalidate()
  }
}
