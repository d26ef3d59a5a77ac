package graft.text

import graft.SparkSpec
import graft.queries.{Registry, Tables}

/** The content-defined-chunking query vs a local reference chunker, plus
  * the boundary-STABILITY property that is CDC's whole reason to exist:
  * an edit near the head must leave the tail chunks byte-identical.
  */
class CdcChunkSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The query's cut rule: first two md5 hex digits of the trailing
    * 8-char window, mod 32. */
  private def chunk(text: String): Seq[(Int, Int, String)] = {
    val cuts = (8 to text.length).filter { i =>
      val h = md5Hex(text.substring(i - 8, i))
      (Integer.parseInt(h.substring(0, 2), 16)) % 32 == 0
    }
    val bnds = (0 +: cuts) :+ text.length
    val dedup = bnds.distinct
    dedup.sliding(2).filter(_.size == 2).zipWithIndex.map {
      case (Seq(a, b), no) => (a + 1, b - a, md5Hex(text.substring(a, b)))
    }.toSeq
  }

  test("doc_chunking_cdc equals the local reference chunker") {
    val texts = Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = Registry.queries("doc_chunking_cdc")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) =>
        d -> rs.sortBy(_.getAs[Long]("chunk_no"))
          .map(r => (r.getAs[Long]("start").toInt,
            r.getAs[Long]("chunk_len").toInt, r.getAs[String]("chunk_md5")))
          .toSeq
      }
    assert(got.nonEmpty)
    got.foreach { case (d, rs) =>
      assert(rs === chunk(texts(d)), s"doc=$d")
      // chunks tile the document exactly
      assert(rs.map(_._2).sum === texts(d).length)
    }
    // the df column counts the corpus-wide occurrences of each chunk hash
    val all = Registry.queries("doc_chunking_cdc")(spark, sfDir).collect()
    val counts = all.groupBy(_.getAs[String]("chunk_md5"))
      .map { case (h, rs) => h -> rs.length.toLong }
    all.foreach(r =>
      assert(r.getAs[Long]("chunk_df") === counts(r.getAs[String]("chunk_md5"))))
  }

  test("boundary stability: a head edit leaves tail chunks identical") {
    val text = Tables.documents(spark, sfDir).collect()
      .map(_.getAs[String]("text")).maxBy(_.length)
    val edited = "inserted prefix words " + text
    val (orig, after) = (chunk(text).map(_._3), chunk(edited).map(_._3))
    // everything after the first window-width of divergence re-synchronizes:
    // the edited doc's chunk hashes end with a long common suffix
    val common = orig.reverse.zip(after.reverse).takeWhile {
      case (a, b) => a == b
    }.length
    assert(common >= orig.length - 3,
      s"only $common of ${orig.length} tail chunks survived a head edit")
    // fixed-stride chunking by contrast would shift EVERY boundary:
    val strideOrig = text.grouped(32).map(md5Hex).toSeq
    val strideAfter = edited.grouped(32).map(md5Hex).toSeq
    val strideCommon = strideOrig.reverse.zip(strideAfter.reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(strideCommon == 0, "stride chunking should not survive the edit")
  }
}
