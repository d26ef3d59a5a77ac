package graft.text

import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Crawl-side curation operators — the steps between "fetched bytes" and
  * the text passes the engine already runs (quality, dedup, langid):
  *
  *  - URL canonicalization (the dedup key for page-level dedup and the
  *    grouping key for domain stats);
  *  - domain blocklist filtering (the first gate every crawl pipeline
  *    applies — spam/adult/SEO domain lists);
  *  - HTML boilerplate extraction (tag/script/style/nav stripping plus
  *    link-density, the trafilatura/jusText-style main-content step).
  *
  * The synthetic corpus has no URL or HTML columns, so both are DERIVED
  * deterministically from (doc_id, source) inside the query — the same
  * injected-input discipline as text_pii_scrub / text_code_detect: the
  * normalizer and extractor are exercised positively on every row and the
  * DuckDB oracle re-derives identical inputs. Everything here is per-row
  * regex/string column math (codegen'd, no UDF, no shuffle): at 100 TB
  * these ride the scan, which is exactly where crawl filtering must sit —
  * anything that shuffles raw HTML loses before it starts.
  */
object WebQueries {

  /** The deterministic "messy crawl URL" both engines derive: mixed-case
    * scheme/host, optional www, explicit default port, trailing-slash
    * path, tracking params in the query, optional fragment. SQL fragment
    * shared verbatim by the Spark expr and the oracle (both accept `||`
    * and CASE), parameterized only by the id/source column names.
    */
  private[graft] def rawUrlSql(id: String, src: String): String =
    s"""'HTTPS://' ||
        CASE WHEN $id % 2 = 0 THEN 'WWW.' ELSE '' END ||
        'News.' || $src || '.Example.COM' ||
        CASE WHEN $id % 5 = 0 THEN ':443' ELSE '' END ||
        '/Articles/' || CAST($id % 50 AS STRING) || '/view/' ||
        '?id=' || CAST($id AS STRING) ||
        CASE WHEN $id % 3 = 0 THEN '&utm_source=feed&utm_medium=rss' ELSE '' END ||
        CASE WHEN $id % 7 = 0 THEN '&ref=sidebar' ELSE '' END ||
        CASE WHEN $id % 4 = 0 THEN '#Section-2' ELSE '' END"""

  /** DuckDB spells CAST-to-string VARCHAR. */
  private def rawUrlDuck(id: String, src: String): String =
    rawUrlSql(id, src).replace("AS STRING", "AS VARCHAR")

  /** URL canonicalization — the page-dedup key. Rules (the common subset
    * of every crawl normalizer): drop the fragment; lowercase scheme and
    * host; strip a default port and a leading `www.`; drop the path's
    * trailing slash (path CASE is preserved — paths are case-sensitive by
    * spec); drop `utm_*` tracking params and SORT the survivors so
    * param order can't split a page into two keys. Emits the registered
    * domain (last two host labels) and path depth alongside — the keys
    * domain-level stats and per-site caps group on.
    */
  /** Normalization stage on a frame carrying a `raw` URL column: adds
    * url_norm / host / domain / path_depth (drops the intermediates).
    * Shared by the oracle-checked query and [[graft.WebPipeline]]. */
  private[graft] def normalizeUrls(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df
      .withColumn("defrag", regexp_replace(col("raw"), "#.*$", ""))
      .withColumn("host", regexp_replace(
        regexp_replace(
          lower(regexp_extract(col("defrag"), "^[A-Za-z]+://([^/?#]+)", 1)),
          ":[0-9]+$", ""),
        "^www\\.", ""))
      .withColumn("path", regexp_replace(
        regexp_extract(col("defrag"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        "/$", ""))
      .withColumn("qnorm", expr(
        """array_join(sort_array(filter(split(
             regexp_extract(defrag, '[?]([^#]*)$', 1), '&'),
             p -> p <> '' AND NOT startswith(p, 'utm_'))), '&')"""))
      .withColumn("url_norm",
        concat(lit("https://"), col("host"), col("path"),
          when(col("qnorm") =!= "", concat(lit("?"), col("qnorm")))
            .otherwise(lit(""))))
      .withColumn("domain",
        regexp_extract(col("host"), "([a-z0-9-]+\\.[a-z]+)$", 1))
      .withColumn("path_depth",
        expr("CAST(size(filter(split(path, '/'), x -> x <> '')) AS BIGINT)"))
      .drop("defrag", "path", "qnorm")

  private val webUrlNormalize = Q(
    "web_url_normalize",
    (s, dir) =>
      normalizeUrls(
        Tables.documents(s, dir)
          .withColumn("raw", expr(rawUrlSql("doc_id", "source"))))
        .select(col("doc_id"), col("url_norm"), col("host"), col("domain"),
          col("path_depth")),
    Some(s"""WITH raw AS (
               SELECT doc_id, ${rawUrlDuck("doc_id", "source")} AS raw
               FROM documents),
             d AS (
               SELECT doc_id, regexp_replace(raw, '#.*$$', '') AS defrag
               FROM raw),
             parts AS (
               SELECT doc_id, defrag,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(defrag, '^[A-Za-z]+://([^/?#]+)', 1)),
                   ':[0-9]+$$', ''), '^www\\.', '') AS host,
                 regexp_replace(
                   regexp_extract(defrag, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                   '/$$', '') AS path,
                 array_to_string(list_sort(list_filter(
                   string_split(regexp_extract(defrag, '[?]([^#]*)$$', 1), '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS qnorm
               FROM d)
             SELECT doc_id,
               'https://' || host || path ||
                 CASE WHEN qnorm <> '' THEN '?' || qnorm ELSE '' END AS url_norm,
               host,
               regexp_extract(host, '([a-z0-9-]+\\.[a-z]+)$$', 1) AS domain,
               CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
                 AS BIGINT) AS path_depth
             FROM parts"""))

  /** The curated blocklist stand-in (production: ~100k spam/SEO hosts,
    * still broadcast-sized). Shared by the query and [[graft.WebPipeline]]. */
  private[graft] val blockedHosts: Seq[String] = Seq(
    "news.src3.example.com", "news.src7.example.com",
    "news.src11.example.com", "news.src17.example.com")

  /** Domain blocklist filtering — the first crawl gate. The blocklist is
    * a FIXED-SIZE curated list (spam/SEO domains; ~100k rows in
    * production — bounded by curation effort, not by the corpus), so the
    * anti-join is legitimately broadcast: the blocklist ships to every
    * scan task and blocked pages die map-side before anything else runs.
    * Survivors aggregate to per-host counts (partial agg, 20 hosts).
    */
  private val webDomainBlocklist = Q(
    "web_domain_blocklist",
    (s, dir) => {
      import s.implicits._
      val blocked = blockedHosts.toDF("host")
      Tables.documents(s, dir)
        .withColumn("host",
          concat(lit("news."), col("source"), lit(".example.com")))
        .join(broadcast(blocked), Seq("host"), "left_anti")
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    },
    Some("""SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM (SELECT 'news.' || source || '.example.com' AS host, n_chars
                  FROM documents)
            WHERE host NOT IN ('news.src3.example.com', 'news.src7.example.com',
                               'news.src11.example.com', 'news.src17.example.com')
            GROUP BY host"""))

  /** The deterministic HTML page both engines derive: head with title /
    * style / script, a nav link bar (boilerplate), two content paragraphs
    * from the document text, and on every third page an inline content
    * link with an HTML entity. One line, no newlines — `.` never needs
    * DOTALL on either engine.
    */
  private[graft] def htmlSql(cast: String): String =
    s"""'<html><head><title>Doc ' || CAST(doc_id AS $cast) || '</title>' ||
        '<style>p{margin:0;}</style><script>var t=1;</script></head><body>' ||
        '<nav><a href="/">Home</a> <a href="/t/' || source || '">' || source ||
        '</a></nav>' ||
        '<p>' || substr(text, 1, 100) || '</p>' ||
        CASE WHEN doc_id % 3 = 0
             THEN '<p>see <a href="/d/' || CAST(doc_id AS $cast) ||
                  '">related &amp; more</a></p>'
             ELSE '' END ||
        '<p>' || substr(text, 101, 120) || '</p></body></html>'"""

  /** HTML main-content extraction (the trafilatura/jusText step): strip
    * `<style>`/`<script>` blocks, drop the `<nav>` boilerplate, strip
    * remaining tags, decode entities, collapse whitespace — and report
    * link count, anchor-text mass, and link density (anchor chars per
    * million content chars), the signals boilerplate classifiers threshold
    * on. Pure regex column math; the md5 of the full extracted text makes
    * the oracle sensitive to every byte, not just the 80-char preview.
    */
  /** Extraction stage on a frame carrying an `html` column: adds
    * n_links / link_chars / content. Shared by the oracle-checked query
    * and [[graft.WebPipeline]]. */
  /** extractHtml + the boilerplate gate (min content length, max link
    * density) + the curated-page projection — ONE definition shared by
    * the batch WebPipeline and StreamWeb (before this helper the block
    * was copy-pasted byte-for-byte; a threshold tweak in one silently
    * de-synced the other's pinned stream ≡ batch equivalence). */
  private[graft] def gateBoilerplate(pages: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    extractHtml(pages)
      .withColumn("content_len", length(col("content")).cast("long"))
      .withColumn("link_density_ppm", expr(
        """CASE WHEN length(content) = 0 THEN CAST(0 AS BIGINT)
           ELSE (CAST(1000000 AS BIGINT) * link_chars) div length(content)
           END"""))
      .where(col("content_len") >= 100L && col("link_density_ppm") <= 300000L)
      .select(col("doc_id"), col("url_norm"), col("host"), col("domain"),
        col("n_links"), col("link_density_ppm"), col("content_len"),
        col("content"))

  private[graft] def extractHtml(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df
      .withColumn("noscript", regexp_replace(
        regexp_replace(col("html"), "<style[^>]*>.*?</style>", " "),
        "<script[^>]*>.*?</script>", " "))
      .withColumn("n_links",
        regexp_count(col("noscript"), lit("<a ")).cast("long"))
      .withColumn("link_chars", expr(
        """CAST(length(array_join(
             regexp_extract_all(noscript, '<a [^>]*>([^<]*)</a>', 1), ''))
           AS BIGINT)"""))
      .withColumn("content", trim(regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("noscript"), "<nav>.*?</nav>", " "),
            "<[^>]+>", " "),
          "&amp;", "&"),
        " +", " ")))
      .drop("noscript")

  private val textHtmlExtract = Q(
    "text_html_extract",
    (s, dir) =>
      extractHtml(
        Tables.documents(s, dir)
          .withColumn("html", expr(htmlSql("STRING"))))
        .select(col("doc_id"), col("n_links"), col("link_chars"),
          length(col("content")).cast("long").as("content_len"),
          expr("""CASE WHEN length(content) = 0 THEN CAST(0 AS BIGINT)
                  ELSE (CAST(1000000 AS BIGINT) * link_chars) div length(content)
                  END""").as("link_density_ppm"),
          substring(col("content"), 1, 80).as("head"),
          md5(col("content")).as("content_md5")),
    Some(s"""WITH page AS (
               SELECT doc_id, ${htmlSql("VARCHAR")} AS html
               FROM documents),
             ns AS (
               SELECT doc_id,
                 regexp_replace(
                   regexp_replace(html, '<style[^>]*>.*?</style>', ' ', 'g'),
                   '<script[^>]*>.*?</script>', ' ', 'g') AS noscript
               FROM page),
             sig AS (
               SELECT doc_id,
                 CAST(len(regexp_extract_all(noscript, '<a ')) AS BIGINT)
                   AS n_links,
                 CAST(length(array_to_string(
                   regexp_extract_all(noscript, '<a [^>]*>([^<]*)</a>', 1), ''))
                   AS BIGINT) AS link_chars,
                 trim(regexp_replace(
                   replace(
                     regexp_replace(
                       regexp_replace(noscript, '<nav>.*?</nav>', ' ', 'g'),
                       '<[^>]+>', ' ', 'g'),
                     '&amp;', '&'),
                   ' +', ' ', 'g')) AS content
               FROM ns)
             SELECT doc_id, n_links, link_chars,
               CAST(length(content) AS BIGINT) AS content_len,
               CASE WHEN length(content) = 0 THEN CAST(0 AS BIGINT)
                    ELSE (1000000 * link_chars) // length(content) END
                 AS link_density_ppm,
               substr(content, 1, 80) AS head,
               md5(content) AS content_md5
             FROM sig"""))

  /** The curated content-blocklist stand-in (production: the C4 "bad
    * words" list, ~400 terms per language — bounded by curation, not the
    * corpus). Lowercase-alpha terms so the engine tokenizer sees them. */
  private[graft] val badwordCats: Seq[(String, Seq[String])] = Seq(
    "adult" -> Seq("xxrated", "nsfwterm"),
    "gambling" -> Seq("casinospin", "betmax"),
    "slur" -> Seq("slurone"))

  /** C4-style badword content gate: count blocklisted terms per category
    * and route the document (slur → drop outright; repeated adult/gambling
    * hits → human review; a single hit → flag; else keep). The synthetic
    * corpus is clean, so terms are INJECTED deterministically from doc_id
    * (the text_pii_scrub pattern) — every list entry is exercised
    * positively and a silently non-matching term cannot pass the oracle.
    *
    * Scale shape: the list rides the plan as literal arrays inside the
    * filter lambdas — no join, no broadcast exchange, counting is one
    * tokenize pass per row on the scan; the severity routing is pure
    * integer CASE math. At 100 TB this is a map-only stage.
    */
  private val textBadwords = Q(
    "text_badwords",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      def cnt(words: Seq[String]) =
        s"size(filter(toks, t -> array_contains(array(${
          words.map(w => s"'$w'").mkString(", ")}), t)))"
      Tables.documents(s, dir)
        .withColumn("dirty", concat(
          col("text"),
          when(col("doc_id") % 7 === 3, lit(" xxrated nsfwterm xxrated"))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 5, lit(" casinospin betmax"))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 7, lit(" slurone")).otherwise(lit(""))))
        .withColumn("toks", expr("word_ngrams(dirty, 1, false)"))
        .select(col("doc_id"),
          expr(cnt(badwordCats(0)._2)).cast("long").as("n_adult"),
          expr(cnt(badwordCats(1)._2)).cast("long").as("n_gambling"),
          expr(cnt(badwordCats(2)._2)).cast("long").as("n_slur"))
        .withColumn("n_bad", col("n_adult") + col("n_gambling") + col("n_slur"))
        .withColumn("action",
          when(col("n_slur") > 0, lit("drop"))
            .when(col("n_adult") + col("n_gambling") >= 3, lit("review"))
            .when(col("n_adult") + col("n_gambling") > 0, lit("flag"))
            .otherwise(lit("keep")))
    },
    Some {
      def cnt(words: Seq[String]) =
        s"len(list_filter(toks, t -> list_contains([${
          words.map(w => s"'$w'").mkString(", ")}], t)))"
      s"""WITH dirty AS (
            SELECT doc_id, text ||
              CASE WHEN doc_id % 7 = 3 THEN ' xxrated nsfwterm xxrated' ELSE '' END ||
              CASE WHEN doc_id % 11 = 5 THEN ' casinospin betmax' ELSE '' END ||
              CASE WHEN doc_id % 13 = 7 THEN ' slurone' ELSE '' END AS d
            FROM documents),
          t AS (
            SELECT doc_id, list_filter(
              string_split_regex(lower(d), '[^a-z]+'), x -> x <> '') AS toks
            FROM dirty),
          c AS (
            SELECT doc_id,
              CAST(${cnt(badwordCats(0)._2)} AS BIGINT) AS n_adult,
              CAST(${cnt(badwordCats(1)._2)} AS BIGINT) AS n_gambling,
              CAST(${cnt(badwordCats(2)._2)} AS BIGINT) AS n_slur
            FROM t)
          SELECT doc_id, n_adult, n_gambling, n_slur,
            n_adult + n_gambling + n_slur AS n_bad,
            CASE WHEN n_slur > 0 THEN 'drop'
                 WHEN n_adult + n_gambling >= 3 THEN 'review'
                 WHEN n_adult + n_gambling > 0 THEN 'flag'
                 ELSE 'keep' END AS action
          FROM c"""
    })

  val all: Seq[Q] = Seq(webUrlNormalize, webDomainBlocklist, textHtmlExtract,
    textBadwords)
}
