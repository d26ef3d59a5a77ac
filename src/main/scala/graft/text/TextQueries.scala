package graft.text

import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline extensions (language ID, quality scoring, token
  * counting, document fingerprinting). Everything is expressed as
  * codegen-friendly column expressions (no UDFs); all arithmetic is integer
  * or explicitly rounded so the DuckDB oracle hash-matches exactly.
  */
object TextQueries {

  /** Word-token pipeline — the native one-pass expression, bit-identical
    * to `filter(split(lower(text), '[^a-z]+'), t -> t <> '')` (pinned by
    * WordNgramsSpec; the DuckDB oracles keep the SQL formulation). */
  private[graft] val tokenizeExpr = "word_ngrams(text, 1, false)"

  // Global token frequency — the session-shared vocabulary artifact
  // (TextArtifacts: one tokenize+aggregate pass for the whole family).
  private val textTokens = Q(
    "text_tokens",
    (s, dir) =>
      TextArtifacts.vocab(s, dir)
        .select(col("token"), col("freq").as("cnt")),
    Some("""SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
                  FROM documents)
            WHERE token <> '' GROUP BY token"""))

  // Per-document quality scoring: length, token stats, stopword ratio.
  // Ratios are exact rationals in double (int/int) -> identical across
  // engines before rounding.
  private val textQuality = Q(
    "text_quality",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("toks", expr(tokenizeExpr))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_stop", size(expr(
          "filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))")).cast("long"))
        .select(
          col("doc_id"),
          col("n_chars"),
          col("n_tokens"),
          round(col("n_chars").cast("double") / col("n_tokens"), 4).as("chars_per_token"),
          round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
          (col("n_tokens") >= 20 && col("n_chars") >= 100).as("quality_ok"))
    },
    Some("""SELECT doc_id, n_chars, n_tokens,
            round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS chars_per_token,
            round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
            (n_tokens >= 20 AND n_chars >= 100) AS quality_ok
            FROM (SELECT doc_id, n_chars,
                    CAST(len(toks) AS BIGINT) AS n_tokens,
                    CAST(len(list_filter(toks,
                      t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT) AS n_stop
                  FROM (SELECT doc_id, n_chars,
                          list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '') AS toks
                        FROM documents))"""))

  // Language-ID heuristic: count marker-substring occurrences per language
  // (occurrences = (len - len(remove)) / len(marker), exact integer math),
  // argmax with a fixed priority order. The corpus vocabulary is synthetic,
  // so the score ties resolve through the priority chain deterministically.
  private val textLangid = Q(
    "text_langid",
    (s, dir) =>
      // LangId: THE definition (shared with the streaming twins)
      LangId.withScores(Tables.documents(s, dir))
        .select(
          col("doc_id"), col("lang"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
          LangId.ladder.as("lang_pred")),
    Some("""SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
            CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                 WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                 WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                 WHEN s_fr > 0 THEN 'fr'
                 ELSE 'und' END AS lang_pred
            FROM (SELECT doc_id, lang,
                    CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS s_en,
                    CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS BIGINT) AS s_de,
                    CAST((length(text) - length(replace(text, ' el ', ''))) / 4 AS BIGINT) AS s_es,
                    CAST((length(text) - length(replace(text, ' le ', ''))) / 4 AS BIGINT) AS s_fr
                  FROM documents)"""))

  // Classifier evaluation as a query — the confusion matrix + per-class
  // recall/precision readout every pipeline model (langid here; quality
  // and code-detect gates the same way) needs against labeled data. One
  // per-row prediction pass (the text_langid logic), one (true, pred)
  // aggregate, and two CLASS-cardinality marginals joined back broadcast
  // — integer-ppm metrics, no windows, nothing corpus-sized after the
  // first aggregate.
  private val evalLangidConfusion = Q(
    "eval_langid_confusion",
    (s, dir) => {
      val pred = LangId.withScores(Tables.documents(s, dir))
        .select(col("lang"), LangId.ladder.as("lang_pred"))
      val conf = pred.groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
      val truth = conf.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
      val predTot = conf.groupBy(col("lang_pred")).agg(sum(col("n")).as("n_pred"))
      conf.join(broadcast(truth), "lang")
        .join(broadcast(predTot), "lang_pred")
        .select(col("lang"), col("lang_pred"), col("n"), col("n_true"),
          col("n_pred"),
          expr("(n * 1000000) div n_true").as("recall_ppm"),
          expr("(n * 1000000) div n_pred").as("precision_ppm"))
    },
    Some("""WITH pred AS (
              SELECT lang,
                CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
                     WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
                     WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
                     WHEN s_fr > 0 THEN 'fr'
                     ELSE 'und' END AS lang_pred
              FROM (SELECT lang,
                      CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS s_en,
                      CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS BIGINT) AS s_de,
                      CAST((length(text) - length(replace(text, ' el ', ''))) / 4 AS BIGINT) AS s_es,
                      CAST((length(text) - length(replace(text, ' le ', ''))) / 4 AS BIGINT) AS s_fr
                    FROM documents)),
            conf AS (
              SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
              FROM pred GROUP BY lang, lang_pred),
            truth AS (
              SELECT lang, CAST(sum(n) AS BIGINT) AS n_true
              FROM conf GROUP BY lang),
            predt AS (
              SELECT lang_pred, CAST(sum(n) AS BIGINT) AS n_pred
              FROM conf GROUP BY lang_pred)
            SELECT c.lang, c.lang_pred, c.n, t.n_true, p.n_pred,
              (c.n * 1000000) // t.n_true AS recall_ppm,
              (c.n * 1000000) // p.n_pred AS precision_ppm
            FROM conf c JOIN truth t USING (lang)
            JOIN predt p USING (lang_pred)"""))

  // Document fingerprint: min/max md5 over word-3-gram shingles — the
  // rolling-hash fingerprint family; byte-wise string min/max of hex digests
  // is engine-independent.
  private val textFingerprint = Q(
    "text_fingerprint",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("grams",
          expr("transform(word_ngrams(text, 3, false), g -> md5(g))"))
        .select(
          col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          coalesce(array_min(col("grams")), lit("")).as("fp_min"),
          coalesce(array_max(col("grams")), lit("")).as("fp_max"))
    },
    Some("""SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
            coalesce(list_aggregate(grams, 'min'), '') AS fp_min,
            coalesce(list_aggregate(grams, 'max'), '') AS fp_max
            FROM (SELECT doc_id,
                    list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS grams
                  FROM (SELECT doc_id,
                          list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '') AS toks
                        FROM documents))"""))

  // Token counting: whitespace tokens + a BPE-ish regex segmentation
  // (letter runs capped at 4 chars, digit runs, other non-space symbols).
  private val tokenCount = Q(
    "token_count",
    (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(expr("filter(split(text, '\\\\s+'), t -> t <> '')")).cast("long")
          .as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("bpe_tokens")),
    Some("""SELECT doc_id,
            CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT)
              AS ws_tokens,
            CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
              AS bpe_tokens
            FROM documents"""))

  // TF-IDF: top-3 terms per document. Ranking uses the ROUNDED score
  // (then term) so a last-ulp ln() difference between engines cannot flip
  // the order; ties in (tf, df) produce bit-identical scores on both.
  // Scale notes: the document-frequency side is vocabulary-sized (100M+
  // distinct terms at web scale), so it is NOT hint-broadcast — AQE picks
  // the join strategy from the observed size; and the corpus count enters
  // the plan as a one-row cross join, not a driver-side .count() action,
  // so the whole query stays a single job.
  private val textTfidf = Q(
    "text_tfidf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      // the session-shared (doc, token, cnt) artifact IS the tf table
      val tf = TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("term"), col("cnt").as("tf"))
      val df_ = tf.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.join(df_, "term")
        .crossJoin(broadcast(n)) // 1-row total — hint like every sibling site
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs") / col("df")), 6))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("tfidf"), col("rk"))
    },
    Some("""WITH tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(list_filter(
                      string_split_regex(lower(text), '[^a-z]+'),
                      t -> t <> '')) AS term
                    FROM documents)
              GROUP BY doc_id, term),
            df AS (
              SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tf GROUP BY term),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
            SELECT doc_id, term, tf, df, tfidf, rk
            FROM (SELECT doc_id, term, tf, df, tfidf,
                    CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY tfidf DESC, term) AS BIGINT) AS rk
                  FROM (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                          round(tf.tf * ln((SELECT n FROM n) / df.df), 6) AS tfidf
                        FROM tf JOIN df ON tf.term = df.term))
            WHERE rk <= 3"""))

  // Unigram negative-log-likelihood quality score — the KenLM-style
  // "perplexity filter" of production pipelines, with a corpus-fit unigram
  // model standing in for the external LM. Determinism: a per-doc AVERAGE
  // of doubles would be accumulation-order-dependent across engines, so
  // each token's log-prob is quantized per ROW to integer micro-nats
  // (deterministic IEEE ln + half-away round on both engines), the per-doc
  // sum is then exact BIGINT math in any order, and one double division at
  // the end is exact-input. Scale: the frequency side is vocabulary-sized
  // → NOT hint-broadcast (the tfidf rule); the corpus total enters as a
  // one-row cross join, keeping the query a single job.
  private val textUnigramNll = Q(
    "text_unigram_nll",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // session-shared artifacts: the (doc, token, cnt) pairs replace the
      // raw occurrence stream (identical sums — a doc's k copies of a
      // token contribute k·q whether summed as k rows or as cnt × q),
      // and the model side is the shared vocabulary
      val wc = TextArtifacts.wordCounts(s, dir)
      val freq = TextArtifacts.vocab(s, dir)
        .select(col("token"), col("freq").as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("total"))
      wc.select(col("doc_id"), col("token"), col("cnt").as("occ"))
        .join(freq, "token")
        .crossJoin(broadcast(tot))
        .withColumn("q", expr(
          "CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"))
        .groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_tok"), sum(col("occ") * col("q")).as("sq"))
        .select(col("doc_id"), col("n_tok"),
          round(-col("sq").cast("double") /
            (col("n_tok").cast("double") * lit(1000000.0)), 4).as("nll"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(text), '[^a-z]+'),
                t -> t <> '')) AS token
              FROM documents),
            freq AS (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM toks GROUP BY token),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
            scored AS (
              SELECT doc_id,
                CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                  * 1000000.0, 0) AS BIGINT) AS q
              FROM toks JOIN freq USING (token), tot)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
              round(-CAST(sum(q) AS DOUBLE) / (count(*) * 1000000.0), 4) AS nll
            FROM scored GROUP BY doc_id"""))

  // BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed query term set —
  // the sparse-retrieval ranking used to mine training data by relevance.
  // Scale: the IN-list filter on query terms rides the token explode, so
  // every aggregate after it is bounded by |query| × docs-that-match, not
  // the vocabulary; df and corpus stats are then tiny broadcasts (the
  // contamination_check rule: broadcast bounded by the QUERY, never the
  // corpus). Determinism: idf/tf-norm doubles come from identical integer
  // inputs through the textually identical expression tree on both
  // engines, each per-term score is quantized to integer micro-units per
  // ROW, per-doc totals are order-free BIGINT sums, and the top-10 ranks
  // on the BIGINT total (doc_id tiebreak) via orderBy+limit — a
  // TakeOrderedAndProject, not a global single-reducer window.
  /** Per-(term, doc) BM25 contribution (k1=1.2, b=0.75) quantized to
    * integer micro-units — over columns (tf, df, dl, n_docs, sum_dl).
    * SHARED verbatim by `text_bm25` (corpus-recomputed) and
    * `text_bm25_served` (postings-artifact-served): identical integer
    * inputs through the textually identical expression tree is the
    * served ≡ recomputed guarantee. */
  private[text] val bm25ScoreExpr =
    """CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * 2.2)
           / (CAST(tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                              / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           * 1000000.0, 0) AS BIGINT)"""

  /** The fixed demo query-term set both BM25 queries rank against. */
  private[text] val bm25QueryTerms = Seq("spark", "dup", "window")

  /** The BM25 oracle parameterized on its corpus relation — `docsRel`
    * must select (doc_id, text). `text_bm25` / `text_bm25_served` /
    * `text_bm25_merged_served` rank the full `documents`;
    * `text_bm25_swept` ranks `documents` minus the erasure kill-list
    * (the served ≡ recomputed-over-survivors claim). One template so
    * the scoring CTEs can never drift between the four. */
  private[text] def bm25OracleSqlOver(docsRel: String): String =
    s"""WITH src AS ($docsRel),
            dl AS (
              SELECT doc_id, CAST(len(list_filter(
                string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS BIGINT) AS dl
              FROM src),
            stats AS (
              SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(list_filter(
                      string_split_regex(lower(text), '[^a-z]+'),
                      t -> t <> '')) AS term
                    FROM src)
              WHERE term IN ('spark', 'dup', 'window')
              GROUP BY doc_id, term),
            df AS (
              SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                                / (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(tf AS DOUBLE) * 2.2)
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
                   * 1000000.0, 0) AS BIGINT) AS q
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats),
            totals AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_match,
                     CAST(sum(q) AS BIGINT) AS sq
              FROM scored GROUP BY doc_id)
            SELECT doc_id, n_match, round(CAST(sq AS DOUBLE) / 1000000.0, 4) AS bm25,
              CAST(row_number() OVER (ORDER BY sq DESC, doc_id) AS BIGINT) AS rk
            FROM totals ORDER BY sq DESC, doc_id LIMIT 10"""

  /** `text_bm25`'s full DuckDB oracle — also `text_bm25_served`'s and
    * `text_bm25_merged_served`'s oracle VERBATIM: the served queries'
    * correctness claim is exactly "same answer as recomputing from the
    * corpus". */
  private[text] val bm25OracleSql =
    bm25OracleSqlOver("SELECT doc_id, text FROM documents")

  private val textBm25 = Q(
    "text_bm25",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val dl = docs.select(col("doc_id"),
        size(expr(tokenizeExpr)).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      // the IN-list filter rides the shared (doc, token, cnt) artifact —
      // same bounded shape, no per-query tokenize pass
      val tf = TextArtifacts.wordCounts(s, dir)
        .where(col("token").isin(bm25QueryTerms: _*))
        .select(col("doc_id"), col("token").as("term"), col("cnt").as("tf"))
      val df_ = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      tf.join(broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("q", expr(bm25ScoreExpr))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_match"), sum(col("q")).as("sq"))
        .orderBy(col("sq").desc, col("doc_id"))
        .limit(10)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("sq").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("n_match"),
          round(col("sq").cast("double") / 1000000.0, 4).as("bm25"), col("rk"))
    },
    Some(bm25OracleSql))

  // Character-entropy quality signal (Gopher-style symbol statistics):
  // Shannon entropy in nats over the [a-z] letter distribution per doc.
  // H = ln(n) - (Σ n_c·ln(n_c))/n; each letter's n_c·ln(n_c) is quantized
  // per ROW to integer micro-nats so the per-doc sum is order-free BIGINT
  // math (the unigram-NLL rule), and the alphabet bounds the per-doc group
  // at 26 rows — pure scan + bounded agg at any corpus size.
  private val textEntropy = Q(
    "text_entropy",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z]', 0)")).as("ch"))
        .groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("nc"))
        .withColumn("q", expr(
          "CAST(round(CAST(nc AS DOUBLE) * ln(CAST(nc AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"))
        .groupBy(col("doc_id"))
        .agg(sum(col("nc")).as("n_letters"),
          count(lit(1)).as("n_distinct"),
          sum(col("q")).as("sq"))
        .select(col("doc_id"), col("n_letters"), col("n_distinct"),
          round(expr(
            """ln(CAST(n_letters AS DOUBLE))
               - CAST(sq AS DOUBLE) / (CAST(n_letters AS DOUBLE) * 1000000.0)"""), 4)
            .as("entropy")),
    Some("""WITH counts AS (
              SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS nc
              FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]')) AS ch
                    FROM documents)
              GROUP BY doc_id, ch),
            quantized AS (
              SELECT doc_id, nc,
                CAST(round(CAST(nc AS DOUBLE) * ln(CAST(nc AS DOUBLE)) * 1000000.0, 0)
                  AS BIGINT) AS q
              FROM counts)
            SELECT doc_id, n_letters, n_distinct,
              round(ln(CAST(n_letters AS DOUBLE))
                - CAST(sq AS DOUBLE) / (CAST(n_letters AS DOUBLE) * 1000000.0), 4) AS entropy
            FROM (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n_letters,
                    CAST(count(*) AS BIGINT) AS n_distinct,
                    CAST(sum(q) AS BIGINT) AS sq
                  FROM quantized GROUP BY doc_id)"""))

  // Corpus health dashboard: per-(lang, source) doc/token volumes and
  // quality-pass rate with rollup subtotals — the report a curation run
  // ends with. One pass: per-row token count (native word_ngrams) into a
  // partial-aggregated ROLLUP; grouping-null placeholders match the
  // cube_event_day convention.
  private val corpusStats = Q(
    "corpus_stats",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(expr(tokenizeExpr)).cast("long"))
        .withColumn("ok",
          (col("n_tokens") >= 20 && col("n_chars") >= 100).cast("long"))
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
          round(sum(col("ok")).cast("double") / count(lit(1)), 4).as("ok_rate"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("tokens"), col("ok_rate"))
    },
    Some("""SELECT coalesce(lang, 'ALL') AS lang,
              coalesce(source, 'ALL') AS source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS tokens,
              round(CAST(sum(ok) AS DOUBLE) / count(*), 4) AS ok_rate
            FROM (SELECT lang, source, n_tokens,
                    CASE WHEN n_tokens >= 20 AND n_chars >= 100
                         THEN 1 ELSE 0 END AS ok
                  FROM (SELECT lang, source, n_chars,
                          CAST(len(list_filter(
                            string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '')) AS BIGINT) AS n_tokens
                        FROM documents))
            GROUP BY ROLLUP(lang, source)"""))

  // Bigram-LM perplexity proxy — the KenLM-style filter one order up from
  // text_unigram_nll: score each document by the add-one-smoothed
  // conditional bigram likelihood p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V) of a
  // corpus-fit model. Same determinism discipline (per-row quantized ln →
  // order-free BIGINT sums → one division) and same scale shape: both
  // count tables are vocabulary-sized → NOT hint-broadcast; V enters as a
  // one-row cross join; the native word_ngrams expression produces the
  // bigram stream in one codegen'd pass.
  private val textBigramNll = Q(
    "text_bigram_nll",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val bigrams = docs
        .select(col("doc_id"), explode(expr("word_ngrams(text, 2, false)")).as("bg"))
        .withColumn("w1", expr("substring_index(bg, ' ', 1)"))
      val cnt2 = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
      // unigram side = the shared vocabulary artifact (bigrams are this
      // query's own n=2 stream)
      val cnt1 = TextArtifacts.vocab(s, dir)
        .select(col("token"), col("freq").as("c1"))
      val v = cnt1.agg(count(lit(1)).as("v"))
      bigrams
        .join(cnt2, "bg")
        .join(cnt1.withColumnRenamed("token", "w1"), "w1")
        .crossJoin(broadcast(v))
        .withColumn("q", expr(
          """CAST(round(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
                 * 1000000.0, 0) AS BIGINT)"""))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("sq"))
        .select(col("doc_id"), col("n_bigrams"),
          round(-col("sq").cast("double") /
            (col("n_bigrams").cast("double") * lit(1000000.0)), 4).as("nll"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ts
              FROM documents),
            bigrams AS (
              SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1
              FROM (SELECT doc_id, unnest(
                      CASE WHEN len(ts) < 2 THEN []
                      ELSE list_transform(range(1, len(ts)),
                        i -> ts[i] || ' ' || ts[i+1]) END) AS bg
                    FROM toks)),
            cnt2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2
                     FROM bigrams GROUP BY bg),
            cnt1 AS (SELECT token, CAST(count(*) AS BIGINT) AS c1
                     FROM (SELECT unnest(ts) AS token FROM toks)
                     GROUP BY token),
            vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM cnt1),
            scored AS (
              SELECT doc_id,
                CAST(round(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS q
              FROM bigrams
              JOIN cnt2 USING (bg)
              JOIN cnt1 ON cnt1.token = bigrams.w1, vv)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              round(-CAST(sum(q) AS DOUBLE) / (count(*) * 1000000.0), 4) AS nll
            FROM scored GROUP BY doc_id"""))

  // Flesch-Kincaid grade proxy: sentence count from terminal-punctuation
  // runs, syllables from vowel groups — the classic readability quality
  // signal, per-row codegen'd regexp_count math that rides the scan.
  // Determinism: the three counts are exact integers; the FK affine is
  // one identical expression tree over them on both engines, and the
  // output is floor(micro-units) — floor of an identical double is
  // identical (no BigDecimal-vs-binary round-half divergence, the trap
  // quality_logreg hit).
  private val textReadability = Q(
    "text_readability",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("n_words", size(expr(tokenizeExpr)).cast("long"))
        .withColumn("n_sent",
          greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"), lit(1L)))
        .withColumn("n_syl",
          greatest(regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long"),
            col("n_words")))
        .where(col("n_words") > 0L)
        .select(col("doc_id"), col("n_words"), col("n_sent"), col("n_syl"),
          expr("""CAST(floor((0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
                  + 11.8 * (CAST(n_syl AS DOUBLE) / CAST(n_words AS DOUBLE))
                  - 15.59) * 1000000.0) AS BIGINT)""").as("fk_micro"))
    },
    Some("""SELECT doc_id, n_words, n_sent, n_syl,
              CAST(floor((0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE))
                + 11.8 * (CAST(n_syl AS DOUBLE) / CAST(n_words AS DOUBLE))
                - 15.59) * 1000000.0) AS BIGINT) AS fk_micro
            FROM (SELECT doc_id,
                    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                      t -> t <> '')) AS BIGINT) AS n_words,
                    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
                      AS n_sent,
                    greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT),
                      CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                        t -> t <> '')) AS BIGINT)) AS n_syl
                  FROM documents)
            WHERE n_words > 0"""))

  /** Interpolated Kneser-Ney bigram probabilities (D = 0.75) — the
    * LM-smoothing computation an n-gram language model trains with:
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
    *            + (D · N1+(w1,·)/c(w1)) · (N1+(·,w2) / N1+(·,·))
    *
    * Shapes: ONE bigram-type aggregate (checkpointed — it feeds the left
    * totals, the continuation counts, the type total, and the final
    * scoring), left/continuation totals are vocab-sized shuffled
    * aggregates (never hint-broadcast — the tfidf rule), the type total
    * is a one-row cross join, and the output restricts to the top-20
    * left-contexts by count (bounded TakeOrdered, broadcast back into
    * the bigram frame). Probabilities quantize by FLOOR to micro units —
    * KN probabilities are small-denominator rationals, exactly the class
    * where round() hash-diverges on half-boundaries (§7.4.1); the double
    * expression is written with identical association on both engines,
    * all inputs are exact integers < 2^53, so both floors see the same
    * correctly-rounded value. Σ_seen P ≤ 1 (unseen w2 hold the rest of
    * the continuation mass) is pinned by KnBigramSpec.
    */
  private val lmKnBigram = Q(
    "lm_kn_bigram",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val big = Tables.spread(Tables.documents(s, dir).select(col("text")))
        .select(explode(expr("word_ngrams(text, 2, false)")).as("bg"))
        .select(substring_index(col("bg"), " ", 1).as("w1"),
          substring_index(col("bg"), " ", -1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .localCheckpoint(eager = true)
      val left = big.groupBy(col("w1"))
        .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p"))
      val cont = big.groupBy(col("w2")).agg(count(lit(1)).as("nl"))
      val tot = big.agg(count(lit(1)).as("nt"))
      val top = left.orderBy(col("c1").desc, col("w1")).limit(20)
      big.join(broadcast(top), "w1")
        .join(cont, "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("c12"),
          expr("""CAST(floor((greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                    / CAST(c1 AS DOUBLE)
                  + (0.75 * CAST(n1p AS DOUBLE) / CAST(c1 AS DOUBLE))
                    * (CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE)))
                  * 1000000.0) AS BIGINT)""").as("p_micro"))
    },
    Some("""WITH toks AS (
              SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                t -> t <> '') AS toks
              FROM documents),
            big AS (
              SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
              FROM (SELECT split_part(bg, ' ', 1) AS w1,
                      split_part(bg, ' ', 2) AS w2
                    FROM (SELECT unnest(CASE WHEN len(toks) < 2 THEN []
                            ELSE list_transform(range(1, greatest(len(toks), 1)),
                              i -> concat_ws(' ', toks[i], toks[i+1])) END) AS bg
                          FROM toks))
              GROUP BY w1, w2),
            lft AS (
              SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                CAST(count(*) AS BIGINT) AS n1p
              FROM big GROUP BY w1),
            cont AS (
              SELECT w2, CAST(count(*) AS BIGINT) AS nl
              FROM big GROUP BY w2),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM big),
            top AS (
              SELECT w1, c1, n1p FROM lft
              ORDER BY c1 DESC, w1 LIMIT 20)
            SELECT b.w1, b.w2, b.c12,
              CAST(floor((greatest(CAST(b.c12 AS DOUBLE) - 0.75, 0.0)
                    / CAST(t.c1 AS DOUBLE)
                  + (0.75 * CAST(t.n1p AS DOUBLE) / CAST(t.c1 AS DOUBLE))
                    * (CAST(c.nl AS DOUBLE) / CAST(tt.nt AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS p_micro
            FROM big b
            JOIN top t USING (w1)
            JOIN cont c ON c.w2 = b.w2, tot tt"""))

  /** Per-language sentence segmentation stats — the curation readout the
    * Gopher/C4 rule families key off (mean sentence length and
    * sentences-per-doc are their repetition/boilerplate signals). The
    * n_sent > 0 filter drops only EMPTY and punctuation/whitespace-only
    * texts on both engines; a doc with no terminal punctuation at all
    * segments to ONE sentence (the whole text) and is kept. Segmenter:
    * split on terminal-punctuation runs `[.!?]+` (the same regex class
    * on Java regex and RE2), keep segments with any non-whitespace —
    * non-whitespace is checked with an explicit ' \t\n\r' trim set
    * because bare trim() strips only spaces on BOTH engines, which
    * would count a pure-newline segment as a sentence.
    *
    * Scale shape: one per-row segmentation pass riding the scan (no
    * explode — only the two counts leave the row), then one
    * LANG-cardinality aggregate. Ratios are floor-divided integer
    * centi-units; no doubles anywhere.
    */
  private val textSentenceStats = Q(
    "text_sentence_stats",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("n_sent", size(expr(
          "filter(split(text, '[.!?]+'), x -> trim(BOTH ' \\t\\n\\r' FROM x) <> '')"))
          .cast("long"))
        .withColumn("n_tok", size(expr(tokenizeExpr)).cast("long"))
        .where(col("n_sent") > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sent")).as("n_sentences"),
          sum(col("n_tok")).as("n_tokens"))
        .select(col("lang"), col("n_docs"), col("n_sentences"), col("n_tokens"),
          expr("(n_tokens * 100) div n_sentences").as("toks_per_sent_x100"),
          expr("(n_sentences * 100) div n_docs").as("sents_per_doc_x100"))
    },
    Some("""SELECT lang, n_docs, n_sentences, n_tokens,
              (n_tokens * 100) // n_sentences AS toks_per_sent_x100,
              (n_sentences * 100) // n_docs AS sents_per_doc_x100
            FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n_sent) AS BIGINT) AS n_sentences,
                    CAST(sum(n_tok) AS BIGINT) AS n_tokens
                  FROM (SELECT lang,
                          CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
                            x -> trim(x, e' \t\n\r') <> '')) AS BIGINT) AS n_sent,
                          CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '')) AS BIGINT) AS n_tok
                        FROM documents)
                  WHERE n_sent > 0 GROUP BY lang)"""))

  /** Per-document lexical diversity — type-token ratio and hapax share,
    * the boilerplate/template detector in the quality family (machine-
    * generated spinner text has abnormally LOW TTR; keyword-stuffed spam
    * abnormally high): distinct types, hapax legomena (multiplicity-1
    * tokens), both as floor-divided ppm of exact integers.
    *
    * Scale shape: the text_tokens explode with doc_id kept — the
    * (doc, token) aggregate map-side combines within each document's
    * rows, then the per-doc rollup is a second combine-friendly
    * aggregate; nothing wider than (doc, token) ever shuffles. Docs
    * with zero tokens vanish on both engines by construction (explode /
    * unnest of an empty list emits no rows) — the same no-token drop
    * class as text_sentence_stats.
    */
  private val textLexicalDiversity = Q(
    "text_lexical_diversity",
    (s, dir) =>
      TextArtifacts.wordCounts(s, dir)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_types"),
          sum(col("cnt")).as("n_tokens"),
          sum((col("cnt") === 1).cast("long")).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
          expr("(n_types * 1000000) div n_tokens").as("ttr_ppm"),
          expr("(n_hapax * 1000000) div n_types").as("hapax_ppm")),
    Some("""SELECT doc_id, n_tokens, n_types, n_hapax,
              (n_types * 1000000) // n_tokens AS ttr_ppm,
              (n_hapax * 1000000) // n_types AS hapax_ppm
            FROM (SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_types,
                    CAST(sum(cnt) AS BIGINT) AS n_tokens,
                    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_hapax
                  FROM (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS cnt
                        FROM (SELECT doc_id, unnest(string_split_regex(
                                lower(text), '[^a-z]+')) AS token
                              FROM documents)
                        WHERE token <> '' GROUP BY doc_id, token)
                  GROUP BY doc_id)"""))

  /** Zipf-law fit of the frequency spectrum: OLS slope of ln(freq) on
    * ln(rank) over the top 500 vocabulary terms — the corpus-naturalness
    * diagnostic (natural language sits near slope −1; template/boilerplate
    * corpora flatten, OCR noise steepens the tail) read next to
    * corpus_stats before a training mix ships.
    *
    * Scale shape: the vocab artifact folds the corpus once; the top-500
    * cut is sort+limit (TakeOrderedAndProject — per-partition partial
    * top-k, the vocab_topk shape), and the regression runs over ≤ 500
    * rows into a 1-row frame. Determinism: ln(rank) and ln(freq) are
    * floor-quantized to micro-nats FIRST (ln is IEEE-identical on both
    * engines — the text_unigram_nll precedent), so the regression moment
    * sums are EXACT BIGINTs in any aggregation order (max |Σxy| ≈
    * 500·(7e6)·(2e7) ≈ 7e16, inside BIGINT); only the final slope/r²
    * division touches doubles, once, on identical integer inputs
    * (n·Σxy would overflow BIGINT, so each exact sum casts to DOUBLE
    * before the one textually-identical closed-form expression). */
  private val zipfSlopeSql =
    """CAST(floor((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000.0)
        AS BIGINT)"""
  private val zipfR2Sql =
    """CAST(floor((CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          * (CAST(n_terms AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / ((CAST(n_terms AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n_terms AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1000000.0)
        AS BIGINT)"""

  private val textZipfFit = Q(
    "text_zipf_fit",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val top = TextArtifacts.vocab(s, dir)
        .orderBy(col("freq").desc, col("token")).limit(500)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("token"))
      top
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(
          expr("CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000.0) AS BIGINT)")
            .as("x"),
          expr("CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0) AS BIGINT)")
            .as("y"))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n_terms"), col("sx"), col("sy"),
          expr(zipfSlopeSql).as("slope_ppm"),
          expr(zipfR2Sql).as("r2_ppm"))
    },
    Some(s"""SELECT n_terms, sx, sy,
               $zipfSlopeSql AS slope_ppm,
               $zipfR2Sql AS r2_ppm
             FROM (SELECT CAST(count(*) AS BIGINT) AS n_terms,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy
                   FROM (SELECT
                           CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000.0)
                             AS BIGINT) AS x,
                           CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0)
                             AS BIGINT) AS y
                         FROM (SELECT freq, CAST(row_number() OVER (
                                   ORDER BY freq DESC, token) AS BIGINT) AS rk
                               FROM (SELECT token,
                                       CAST(count(*) AS BIGINT) AS freq
                                     FROM (SELECT unnest(string_split_regex(
                                             lower(text), '[^a-z]+')) AS token
                                           FROM documents)
                                     WHERE token <> '' GROUP BY token))
                         WHERE rk <= 500))"""))

  /** Heaps'-law fit of n-gram-type growth — Zipf's companion diagnostic
    * (V(N) ≈ K·N^β): OLS slope of ln(cumulative distinct word-bigram
    * types) on ln(cumulative bigram occurrences) across 10 corpus-prefix
    * checkpoints. A flattening curve (low β) means the corpus has
    * saturated — more data buys repetition, not coverage — the
    * "is another crawl snapshot worth tokenizing" readout; template
    * corpora saturate early, OCR noise never saturates. Bigrams, not
    * unigrams: the unigram vocabulary of a bounded-domain corpus
    * saturates inside the first prefix (measured on this fixture: all
    * 31 unigram types appear in bucket 0, a zero-variance y series),
    * while combination types keep growing — the same reason novelty
    * dedup (text_novelty) keys on n-grams.
    *
    * The cumulative-distinct-at-each-prefix problem is reformulated so
    * NO per-prefix distinct pass exists: a type is new at exactly one
    * prefix (its FIRST occurrence), so cumulative types at bucket b =
    * Σ_{fb ≤ b} count(types first seen in fb) — one type-keyed
    * min-aggregate. Prefix buckets are value-ranges of doc_id (any
    * fixed monotone order serves a growth curve; no global row-number
    * window at corpus scale). The one explode feeds exactly two
    * map-side-combinable aggregates; the cumsums and the regression
    * live on the ≤ 10-row bucket frame. Determinism: the zipf
    * discipline — ln of identical BIGINTs, floor-quantized to
    * micro-nats BEFORE the exact-integer moment sums; one closed-form
    * division at the end (the shared slope/r² fragments, so the two
    * fits cannot drift). A zero-variance series (fully saturated
    * corpus) reads -1 in both outputs instead of dividing by zero —
    * the eval_pr_auc degenerate convention; the guard is exact BIGINT
    * arithmetic (|n·Σxx| ≤ 10·(2·10⁷)² ≈ 4·10¹⁵ at any corpus size,
    * since x and y are micro-nat logs of BIGINT-bounded counts). */
  private val heapsGuardSql =
    "(n_terms * sxx - sx * sx) = 0 OR (n_terms * syy - sy * sy) = 0"
  private val textHeapsFit = Q(
    "text_heaps_fit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val bounds = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      val db = docs.select(col("doc_id"), col("text"))
        .crossJoin(broadcast(bounds)) // 1-row id range
        .select(expr("least(9, (doc_id - lo) * 10 div (hi - lo + 1))").as("bucket"),
          col("text"))
      val grams = db
        .select(col("bucket"), explode(expr("word_ngrams(text, 2, false)")).as("tok"))
        .localCheckpoint(eager = true) // occurrence totals + first-seen pass
      val tokc = grams.groupBy(col("bucket")).agg(count(lit(1)).as("toks"))
      val newt = grams
        .groupBy(col("tok")).agg(min(col("bucket")).as("fb"))
        .groupBy(col("fb")).agg(count(lit(1)).as("newt"))
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pts = tokc.join(newt, col("bucket") === col("fb"), "left")
        .select(col("bucket"), col("toks"),
          coalesce(col("newt"), lit(0L)).as("nw"))
        .select(sum(col("toks")).over(w).as("ct"), sum(col("nw")).over(w).as("cy"))
        .where(col("ct") > 0 && col("cy") > 0)
        .select(
          expr("CAST(floor(ln(CAST(ct AS DOUBLE)) * 1000000.0) AS BIGINT)").as("x"),
          expr("CAST(floor(ln(CAST(cy AS DOUBLE)) * 1000000.0) AS BIGINT)").as("y"))
      pts
        .agg(count(lit(1)).as("n_terms"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n_terms"), col("sx"), col("sy"),
          expr(s"CASE WHEN $heapsGuardSql THEN -1L ELSE $zipfSlopeSql END")
            .as("beta_ppm"),
          expr(s"CASE WHEN $heapsGuardSql THEN -1L ELSE $zipfR2Sql END")
            .as("r2_ppm"))
    },
    Some(s"""WITH bounds AS (
              SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
            db AS (
              SELECT least(9, (doc_id - lo) * 10 // (hi - lo + 1)) AS bucket,
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  t -> t <> '') AS toks
              FROM documents, bounds),
            grams AS (
              SELECT bucket, concat_ws(' ', toks[i], toks[i+1]) AS tok
              FROM db, unnest(range(1, greatest(len(toks), 1))) AS u(i)),
            tokc AS (
              SELECT bucket, CAST(count(*) AS BIGINT) AS toks
              FROM grams GROUP BY bucket),
            newt AS (
              SELECT fb, CAST(count(*) AS BIGINT) AS newt
              FROM (SELECT tok, min(bucket) AS fb
                    FROM grams GROUP BY tok)
              GROUP BY fb),
            cum AS (
              SELECT CAST(sum(tokc.toks) OVER (ORDER BY tokc.bucket
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct,
                CAST(sum(coalesce(newt.newt, 0)) OVER (ORDER BY tokc.bucket
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cy
              FROM tokc LEFT JOIN newt ON newt.fb = tokc.bucket),
            pts AS (
              SELECT CAST(floor(ln(CAST(ct AS DOUBLE)) * 1000000.0) AS BIGINT)
                  AS x,
                CAST(floor(ln(CAST(cy AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
              FROM cum WHERE ct > 0 AND cy > 0),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n_terms,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy
              FROM pts)
            SELECT n_terms, sx, sy,
              CASE WHEN $heapsGuardSql THEN CAST(-1 AS BIGINT)
                   ELSE $zipfSlopeSql END AS beta_ppm,
              CASE WHEN $heapsGuardSql THEN CAST(-1 AS BIGINT)
                   ELSE $zipfR2Sql END AS r2_ppm
            FROM m"""))

  /** RAKE keyword extraction (Rose et al. 2010) — the unsupervised
    * per-document keyword primitive (index terms, topic tags, dedup
    * keys for titles): candidate phrases are maximal stopword-free token
    * runs (length ≤ 4), each word scores degree/frequency over the
    * candidate corpus (degree = Σ lengths of phrases containing the
    * word — co-occurrence-weighted), and a phrase scores the sum of its
    * word scores; top-3 phrases per doc. The phrase segmentation is the
    * gaps-and-islands trick (pos − row_number over non-stop tokens —
    * the streak_islands kernel applied INSIDE documents), so phrase
    * assembly is one doc-keyed aggregate, no self-join, no UDF. Word
    * stats are a vocabulary-sized aggregate (NOT hint-broadcast — the
    * tfidf rule); everything is integer (degree·10⁶ div freq per word,
    * BIGINT phrase sums), and identical phrases in a doc provably carry
    * identical scores (max = the dedup no-op). Per-doc top-3 via one
    * rank window on (score, phrase).
    */
  private val textRakeKeywords = Q(
    "text_rake_keywords",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.register(s)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val phrases = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(expr(tokenizeExpr)))
        .toDF("doc_id", "pos", "tok")
        .where(expr("NOT tok IN ('the', 'a', 'of', 'and', 'to')"))
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("grp"))
        .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("ps"))
        .where(size(col("ps")) <= 4)
        .select(col("doc_id"), col("grp"),
          expr("transform(ps, p -> p.tok)").as("words"),
          expr("array_join(transform(ps, p -> p.tok), ' ')").as("phrase"),
          size(col("ps")).cast("long").as("plen"))
        .localCheckpoint(eager = true) // word stats + occurrence scoring
      val wordQ = phrases
        .select(explode(col("words")).as("tok"), col("plen"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
        .select(col("tok"), expr("degree * 1000000 div freq").as("q"))
      phrases
        .select(col("doc_id"), col("grp"), col("phrase"),
          explode(col("words")).as("tok"))
        .join(wordQ, "tok")
        .groupBy(col("doc_id"), col("grp"), col("phrase"))
        .agg(sum(col("q")).as("occ_score"))
        .groupBy(col("doc_id"), col("phrase"))
        .agg(count(lit(1)).as("n_occ"), max(col("occ_score")).as("score_micro"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score_micro").desc, col("phrase"))).cast("long"))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("phrase"), col("n_occ"),
          col("score_micro"), col("rk"))
    },
    Some("""WITH toks0 AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text),
                '[^a-z]+'), t -> t <> '') AS ts
              FROM documents),
            toks AS (
              SELECT doc_id, pos, ts[pos] AS tok
              FROM (SELECT doc_id, ts,
                      unnest(range(1, len(ts) + 1)) AS pos
                    FROM toks0)),
            nonstop AS (
              SELECT doc_id, pos, tok,
                pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                  AS grp
              FROM toks
              WHERE tok NOT IN ('the', 'a', 'of', 'and', 'to')),
            ph AS (
              SELECT doc_id, grp,
                string_agg(tok, ' ' ORDER BY pos) AS phrase,
                list(tok ORDER BY pos) AS words,
                CAST(count(*) AS BIGINT) AS plen
              FROM nonstop GROUP BY doc_id, grp
              HAVING count(*) <= 4),
            wq AS (
              SELECT tok, CAST(sum(plen) AS BIGINT) * 1000000
                       // CAST(count(*) AS BIGINT) AS q
              FROM (SELECT unnest(words) AS tok, plen FROM ph)
              GROUP BY tok),
            occ AS (
              SELECT p.doc_id, p.grp, p.phrase,
                CAST(sum(wq.q) AS BIGINT) AS occ_score
              FROM (SELECT doc_id, grp, phrase, unnest(words) AS tok FROM ph) p
              JOIN wq ON wq.tok = p.tok
              GROUP BY 1, 2, 3),
            perdoc AS (
              SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS n_occ,
                max(occ_score) AS score_micro
              FROM occ GROUP BY 1, 2)
            SELECT doc_id, phrase, n_occ, score_micro, rk
            FROM (SELECT doc_id, phrase, n_occ, score_micro,
                    CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY score_micro DESC, phrase) AS BIGINT) AS rk
                  FROM perdoc)
            WHERE rk <= 3"""))

  // Spearman rank correlation per lang between document length
  // (n_chars) and whitespace token count — the redundancy check a
  // curation stack runs before treating both as independent quality
  // features (ρ ≈ 1 ⇒ one of them carries no extra signal). Ties are
  // broken by doc_id into a deterministic TOTAL order (the
  // eval_kendall_tau stance — the classic 6Σd² form is exact only on a
  // total order, and an engine-dependent tie order would flip ranks),
  // so every rank, d², and the n(n²−1) − 6Σd² numerator is an exact
  // BIGINT on both engines; the ρ readout floors one double quotient
  // (num can be negative — the ts_holt div-vs-floor rule). Scale: two
  // rank windows = one lang-partitioned sort each; per-lang data at
  // corpus scale makes this the range-partitioned global-sort rank
  // (Spark's window path under AQE), and the n³ BIGINT terms are exact
  // to ~2M docs per lang — past that ANSI overflow fails loudly and the
  // declared path is DECIMAL(38) (the tokenizer_wordpiece stance).
  private val corrSpearman = Q(
    "corr_spearman",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), col("n_chars"),
        size(expr("filter(split(text, '\\\\s+'), t -> t <> '')")).cast("long")
          .as("toks"))
      val r1 = row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("toks"), col("doc_id")))
        .cast("long")
      val r2 = row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id")))
        .cast("long")
      d.select(col("lang"), ((r1 - r2) * (r1 - r2)).as("d2"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("d2")).as("sd2"))
        .where(col("n_docs") >= 2)
        .select(col("lang"), col("n_docs"), col("sd2"),
          expr("n_docs * (n_docs * n_docs - 1) - 6 * sd2").as("rho_num"),
          expr("n_docs * (n_docs * n_docs - 1)").as("rho_den"),
          expr("""CAST(floor(1000.0
                 * CAST(n_docs * (n_docs * n_docs - 1) - 6 * sd2 AS DOUBLE)
                 / CAST(n_docs * (n_docs * n_docs - 1) AS DOUBLE)) AS BIGINT)""")
            .as("rho_milli"))
    },
    Some("""WITH d AS (
              SELECT doc_id, lang, n_chars,
                CAST(len(list_filter(string_split_regex(text, '\s+'),
                  t -> t <> '')) AS BIGINT) AS toks
              FROM documents),
            r AS (
              SELECT lang,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY toks, doc_id) AS BIGINT) AS r1,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY n_chars, doc_id) AS BIGINT) AS r2
              FROM d),
            a AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sd2
              FROM r GROUP BY lang
              HAVING count(*) >= 2)
            SELECT lang, n_docs, sd2,
              CAST(n_docs * (n_docs * n_docs - 1) - 6 * sd2 AS BIGINT) AS rho_num,
              CAST(n_docs * (n_docs * n_docs - 1) AS BIGINT) AS rho_den,
              CAST(floor(1000.0
                * CAST(n_docs * (n_docs * n_docs - 1) - 6 * sd2 AS DOUBLE)
                / CAST(n_docs * (n_docs * n_docs - 1) AS DOUBLE)) AS BIGINT)
                AS rho_milli
            FROM a"""))

  val all: Seq[Q] = Seq(textTokens, textQuality, textLangid, textFingerprint,
    tokenCount, textTfidf, textUnigramNll, textBm25, textEntropy, corpusStats,
    textBigramNll, textReadability, lmKnBigram, evalLangidConfusion,
    textSentenceStats, textLexicalDiversity, textZipfFit, textRakeKeywords,
    corrSpearman, textHeapsFit)
}
