package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the crawl-side operators (WebQueries) that the
  * DuckDB hash gate can't articulate: normalization idempotence-ish rules
  * (no fragment, no tracking params, lowercase host, no default port),
  * blocklist completeness, and extraction boilerplate removal.
  */
class WebQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = Registry.queries(name)(spark, sfDir)

  test("web_url_normalize: canonical form drops fragment/utm/port/www and lowercases host") {
    val rows = run("web_url_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val url = r.getAs[String]("url_norm")
      val host = r.getAs[String]("host")
      assert(url.startsWith("https://news.src"), url)
      assert(!url.contains("#"), s"fragment survived: $url")
      assert(!url.contains("utm_"), s"tracking param survived: $url")
      assert(!url.contains(":443"), s"default port survived: $url")
      assert(!host.startsWith("www."), s"www survived: $host")
      assert(host == host.toLowerCase, s"host not lowercased: $host")
      assert(r.getAs[String]("domain") == "example.com")
      assert(r.getAs[Long]("path_depth") == 3L)
    }
    // params are sorted: any id+ref row must render ...?id=N&ref=sidebar
    val withRef = rows.filter(_.getAs[String]("url_norm").contains("ref="))
    assert(withRef.nonEmpty)
    withRef.foreach { r =>
      val q = r.getAs[String]("url_norm").split("\\?")(1)
      assert(q.split("&").toSeq == q.split("&").toSeq.sorted, q)
    }
  }

  test("web_domain_blocklist: blocked hosts are absent, survivors partition the corpus") {
    val out = run("web_domain_blocklist").collect()
    val hosts = out.map(_.getAs[String]("host")).toSet
    Seq("src3", "src7", "src11", "src17").foreach { s =>
      assert(!hosts.contains(s"news.$s.example.com"), s"blocked $s survived")
    }
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val expected = graft.queries.Tables.documents(spark, sfDir)
      .where(not(col("source").isin("src3", "src7", "src11", "src17")))
      .count()
    assert(total == expected, s"survivor docs $total != $expected")
  }

  test("text_html_extract: tags/script/style/nav stripped, entity decoded, density sane") {
    val rows = run("text_html_extract").collect()
    rows.foreach { r =>
      val head = r.getAs[String]("head")
      assert(!head.contains("<"), s"tag survived: $head")
      assert(!head.contains("var t=1"), s"script text survived: $head")
      assert(!head.contains("margin:0"), s"style text survived: $head")
      assert(!head.contains("Home"), s"nav boilerplate survived: $head")
      val d = r.getAs[Long]("link_density_ppm")
      assert(d >= 0L && d <= 1000000L, s"density out of range: $d")
    }
    // every third doc carries the inline content link with an entity —
    // its anchor text ("related & more") must survive extraction decoded
    val linked = run("text_html_extract")
      .where(col("doc_id") % 3 === 0).collect()
    assert(linked.nonEmpty)
    linked.foreach { r =>
      assert(r.getAs[Long]("n_links") == 3L, "nav(2) + inline(1) links")
      assert(r.getAs[Long]("link_chars") > 0L)
    }
  }
}
