package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation readouts over the documents corpus — the metrics every
  * pipeline gate (quality classifier, langid, dedup verdicts) is judged by
  * before its threshold ships: ROC-AUC and a calibration/reliability table.
  * Companion to `eval_langid_confusion` (TextQueries); the evaluated model
  * here is the `quality_logreg` hashed-unigram scorer and the ground truth
  * is the rule gate (n_tok ≥ 20 AND n_chars ≥ 100 — `text_quality`'s
  * `quality_ok`), so the family needs no external model artifacts.
  *
  * Scale discipline: exact AUC is a rank statistic, and the naive
  * formulation (global rank window over every scored row) is a
  * single-reducer sort of the corpus. Here the score is DEFINED as its
  * milli-logit bucket — ≤ 2001 distinct values by construction — so the
  * rank-sum runs over a BOUNDED per-lang histogram: one corpus aggregate,
  * a window over ≤ 2001 rows per lang, one 4-row readout (the
  * quality_ppl_buckets pattern). Determinism: counts are exact BIGINT in
  * any order; the single double division per lang happens once on
  * identical integer inputs on both engines.
  */
object EvalQueries {

  private val tokenizeExpr = "word_ngrams(text, 1, false)"

  // ---------------------------------------------------------------------
  // Session-shared per-candidate-doc gram tables — eval_bleu, eval_rouge_n
  // and eval_token_f1 each re-ran the same `word_gram_hash_counts` pass
  // over the candidate docs behind their own checkpoint; one frame feeds
  // all three (the wordCounts discipline applied to the overlap family).
  // ---------------------------------------------------------------------

  private val gramCache = new graft.queries.SessionCache[DataFrame](Seq(_))

  /** (doc_id, u, v) — sorted (gram-hash, multiplicity) tables + totals
    * for unigrams and bigrams, one row per candidate doc, built once per
    * (session, corpus). */
  def gramCounts(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    gramCache.getOrBuild(s, dir) {
      graft.functions.GraftFunctions.register(s)
      val pairs = graft.dedup.CandidateArtifacts.pairs(s, dir)
      val candDocs = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b"))).distinct()
      Tables.spread(Tables.documents(s, dir).select("doc_id", "text")
          .join(candDocs, Seq("doc_id"), "left_semi"))
        .select(col("doc_id"),
          expr("word_gram_hash_counts(text, 1)").as("u"),
          expr("word_gram_hash_counts(text, 2)").as("v"))
        .localCheckpoint(eager = true)
    }

  def gramInvalidate(): Unit = gramCache.invalidate()

  private def gramFingerprint(s: org.apache.spark.sql.SparkSession,
      corpusDir: String): String =
    graft.queries.TableFingerprint.of(s, s"$corpusDir/documents.parquet")

  /** Write the gram tables as a parquet snapshot keyed by the documents
    * fingerprint (the artifact-family warm-mode lifecycle). */
  def gramPersistTo(s: org.apache.spark.sql.SparkSession, corpusDir: String,
      artifactDir: String): Unit =
    graft.queries.ArtifactStore.writeSnapshot(s, artifactDir,
      gramFingerprint(s, corpusDir),
      Seq("eval_grams" -> gramCounts(s, corpusDir)))

  /** Seed the session cache from a persisted snapshot whose key matches
    * the CURRENT documents fingerprint; false otherwise. */
  def gramLoadFrom(s: org.apache.spark.sql.SparkSession, corpusDir: String,
      artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      gramFingerprint(s, corpusDir), Seq("eval_grams")) match {
      case Some(m) =>
        gramCache.put(s, corpusDir, m("eval_grams"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def gramEnsure(s: org.apache.spark.sql.SparkSession, corpusDir: String,
      artifactDir: String): Boolean = {
    val hit = gramLoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      gramCache.remove(s, corpusDir)
      gramPersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  /** First two md5 hex digits as 0..255 — same digit math on both engines
    * (the CurationQueries hashing convention). */
  private def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** Per-doc hashed-unigram logit (the quality_logreg score) in micro
    * units, plus the rule label, carried per lang. `bucket` shifts the
    * micro logit non-negative before `div` so truncating and floor
    * division agree on both engines. */
  private val scoredSql =
    s"""SELECT lang,
          (CAST(floor(CAST(sw AS DOUBLE) * 1000.0 / CAST(n_tok AS DOUBLE))
             AS BIGINT) + 1000000) // 1000 AS bucket,
          CASE WHEN n_tok >= 20 AND n_chars >= 100 THEN 1 ELSE 0 END AS pos
        FROM (SELECT doc_id, lang, n_chars,
                CAST(count(*) AS BIGINT) AS n_tok,
                CAST(sum(w_milli) AS BIGINT) AS sw
              FROM (SELECT doc_id, lang, n_chars,
                      CAST(${md5Byte("term")} AS BIGINT) * 2654435761 % 2001
                        - 1000 AS w_milli
                    FROM (SELECT doc_id, lang, n_chars, unnest(list_filter(
                            string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '')) AS term
                          FROM documents))
              GROUP BY doc_id, lang, n_chars)"""

  private[queries] def scoredDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    graft.functions.GraftFunctions.register(s)
    // rides the session word-count artifact (r13): Σ_instances w(term) ≡
    // Σ_distinct cnt·w(term) and n_tok ≡ Σ cnt — exact integer algebra
    // (the mix_doremi rewrite), so the corpus tokenize+explode pass leaves
    // the query and the md5 weight is computed once per DISTINCT (doc,
    // token) instead of per occurrence. Zero-token docs have no wordCounts
    // row and the join is inner — same drop as the old explode.
    graft.text.TextArtifacts.wordCounts(s, dir)
      .withColumn("w_milli",
        expr(s"CAST((${md5Byte("token")}) AS BIGINT) * 2654435761 % 2001 - 1000"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tok"), sum(col("w_milli") * col("cnt")).as("sw"))
      .join(Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
      .select(col("lang"),
        expr("""(CAST(floor(CAST(sw AS DOUBLE) * 1000.0 / CAST(n_tok AS DOUBLE))
                  AS BIGINT) + 1000000) div 1000""").as("bucket"),
        expr("CASE WHEN n_tok >= 20 AND n_chars >= 100 THEN 1 ELSE 0 END")
          .cast("long").as("pos"))
  }

  /** Exact ROC-AUC of the bucketed score per lang via the Mann-Whitney
    * rank-sum: AUC = [Σ_b n_pos_b·(2·cum_neg_below + n_neg_b)] /
    * (2·n_pos·n_neg), ties (same bucket) at half weight. The cumulative
    * window runs over the bounded histogram, never the corpus; num2 stays
    * exact BIGINT, and only the final ppm quantization touches doubles
    * (identical inputs → identical IEEE quotient → identical floor).
    * Degenerate classes (one label absent) report -1, not a 0/0. */
  private val evalAucRank = Q(
    "eval_auc_rank",
    (s, dir) => {
      val hist = scoredDf(s, dir)
        .groupBy(col("lang"), col("bucket"))
        .agg(sum(col("pos")).as("n_pos"),
          (count(lit(1)) - sum(col("pos"))).as("n_neg"))
      val w = Window.partitionBy(col("lang")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      hist
        .withColumn("cum_neg", coalesce(sum(col("n_neg")).over(w), lit(0L)))
        .groupBy(col("lang"))
        .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"),
          sum(col("n_pos") * (lit(2L) * col("cum_neg") + col("n_neg")))
            .as("num2"))
        .select(col("lang"), col("n_pos"), col("n_neg"),
          expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
                  ELSE CAST(floor(CAST(num2 AS DOUBLE) * 1000000.0
                    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
                    AS BIGINT) END""").as("auc_ppm"))
    },
    Some(s"""WITH scored AS ($scoredSql),
             hist AS (
               SELECT lang, bucket,
                 CAST(sum(pos) AS BIGINT) AS n_pos,
                 CAST(count(*) - sum(pos) AS BIGINT) AS n_neg
               FROM scored GROUP BY lang, bucket),
             cum AS (
               SELECT lang, n_pos, n_neg,
                 coalesce(sum(n_neg) OVER (PARTITION BY lang ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_neg
               FROM hist),
             folded AS (
               SELECT lang, CAST(sum(n_pos) AS BIGINT) AS n_pos,
                 CAST(sum(n_neg) AS BIGINT) AS n_neg,
                 CAST(sum(n_pos * (2 * cum_neg + n_neg)) AS BIGINT) AS num2
               FROM cum GROUP BY lang)
             SELECT lang, n_pos, n_neg,
               CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
               ELSE CAST(floor(CAST(num2 AS DOUBLE) * 1000000.0
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
                 AS BIGINT) END AS auc_ppm
             FROM folded"""))

  /** Calibration / reliability table: ten equal-width logit bins (clamped
    * to the score's design range ±1 logit), per (lang, bin) the count,
    * positive rate, and mean score — the monotonicity-and-coverage readout
    * a threshold choice reads. Pure integer output: rates in ppm by
    * integer division, mean micro-logit by floor of one double quotient.
    * Shape: one corpus aggregate into ≤ 40 cells; nothing after it is
    * corpus-sized. */
  private val evalCalibrationBins = Q(
    "eval_calibration_bins",
    (s, dir) =>
      scoredDf(s, dir)
        .withColumn("bin", least(expr("(bucket * 10) div 2001"), lit(9L)))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          sum(col("bucket")).as("sb"))
        .select(col("lang"), col("bin"), col("n"), col("n_pos"),
          expr("(n_pos * 1000000) div n").as("pos_rate_ppm"),
          expr("""CAST(floor(CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                  AS BIGINT)""").as("mean_bucket")),
    Some(s"""WITH scored AS ($scoredSql)
             SELECT lang, bin, n, n_pos,
               (n_pos * 1000000) // n AS pos_rate_ppm,
               CAST(floor(CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                 AS mean_bucket
             FROM (SELECT lang,
                     least((bucket * 10) // 2001, 9) AS bin,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(pos) AS BIGINT) AS n_pos,
                     CAST(sum(bucket) AS BIGINT) AS sb
                   FROM scored GROUP BY 1, 2)"""))

  /** Wilson 95% score interval for a pass rate (the CI a gate's
    * pass-rate dashboards should show instead of ±z√(p(1−p)/n), which
    * collapses at p near 0/1 and small n). One textually identical
    * double expression over exact BIGINT (n, n_pass) on both engines —
    * z² constants folded to literals (z = 1.96: z²=3.8416, z²/2=1.9208,
    * z²/4=0.9604), IEEE sqrt is correctly rounded on both, floor
    * quantizes to ppm. */
  private def wilsonPpm(sign: String): String =
    s"""CAST(floor(((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE)
          + 1.9208 / CAST(n AS DOUBLE)
          $sign 1.96 * sqrt((CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n AS DOUBLE)
            + 0.9604 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
          / (1.0 + 3.8416 / CAST(n AS DOUBLE))) * 1000000.0) AS BIGINT)"""

  /** Per-lang pass rate of the rule gate with its Wilson 95% interval —
    * the uncertainty-aware readout for every threshold dashboard. Shape:
    * one corpus aggregate to ≤ #langs rows; the interval math runs on
    * the tiny result. */
  private val evalRateCi = Q(
    "eval_rate_ci",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // n_tok folds off the doc-length artifact instead of re-tokenizing
      // the corpus (r13); token-free docs have no artifact row → 0
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .join(graft.text.TextArtifacts.docLens(s, dir), Seq("doc_id"), "left")
        .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum((col("n_tok") >= 20 && col("n_chars") >= 100).cast("long"))
            .as("n_pass"))
        .select(col("lang"), col("n"), col("n_pass"),
          expr("(n_pass * 1000000) div n").as("rate_ppm"),
          expr(wilsonPpm("-")).as("wilson_lo_ppm"),
          expr(wilsonPpm("+")).as("wilson_hi_ppm"))
    },
    Some(s"""SELECT lang, n, n_pass,
               (n_pass * 1000000) // n AS rate_ppm,
               ${wilsonPpm("-")} AS wilson_lo_ppm,
               ${wilsonPpm("+")} AS wilson_hi_ppm
             FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN n_tok >= 20 AND n_chars >= 100
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
                   FROM (SELECT lang, n_chars,
                           CAST(len(list_filter(string_split_regex(
                             lower(text), '[^a-z]+'), t -> t <> ''))
                             AS BIGINT) AS n_tok
                         FROM documents)
                   GROUP BY lang)"""))

  /** Pairwise BLEU (Papineni et al. 2002, the BLEU+1 smoothed variant) over
    * the LSH candidate pairs — the text-overlap metric generation evals
    * and self-BLEU diversity audits run, here measuring how close each
    * near-dup candidate (a) is to its reference twin (b): clipped modified
    * 1-/2-gram precisions, the brevity penalty, and the smoothed log-BLEU.
    *
    * Scale shape: the generate-then-verify scaffold again — candidate
    * pairs come first (checkpointed), and the per-doc (n, gram, cnt)
    * pre-aggregate runs ONLY over documents a candidate pair references
    * (one semi-join gates the tokenize pass), so gram-counting cost
    * scales with the near-dup population, not the corpus (perf-neutral on
    * this dup-dense synthetic corpus — 95% of docs are candidates; the
    * clipped-match fan-out of 110k pairs × candidate grams is what the
    * ~4 s at sf0.1 buys). Grams ship as 8-byte xxhash64 keys, not
    * text; the clipped-match join fans out by the candidate list ×
    * candidate grams, never any block². Determinism: counts are exact
    * BIGINT; `ln` is IEEE-identical on both engines (the
    * text_unigram_nll precedent) and is floor-quantized to micro-nats
    * immediately; the brevity penalty is a floor of one double division
    * of the same two integers on both engines.
    */
  private val evalBleu = Q(
    "eval_bleu",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // session-shared checkpointed candidate pairs (CandidateArtifacts)
      // — already materialized for the candidate-doc gate + verify join
      val pairs = graft.dedup.CandidateArtifacts.pairs(s, dir)
      // per candidate doc, ONE native pass per n builds the sorted
      // (gram-hash, multiplicity) table + total gram count; the clipped
      // match m_n then costs a linear merge per pair (sorted_summin)
      // instead of pushing |pairs|×|grams per doc| rows through a join +
      // re-aggregate (the old shape's dominant cost). tot doubles as the
      // reference length r (unigram tot of the b side) — the DOCUMENT-
      // derived length, so a token-free reference still emits its row
      // with r = 0 like the oracle's always-present rl CTE. The frame is
      // the session-shared [[gramCounts]] artifact (r13) — bleu, rouge_n
      // and token_f1 each re-derived it.
      val per = gramCounts(s, dir)
      // the a-side (candidate) stays an INNER semantics on having tokens:
      // a token-free candidate (digits/punctuation-only, t1 = 0) emits no
      // gram rows in the oracle's gc CTE, so its pairs drop on BOTH
      // engines — mirrored here by the t1 > 0 filter (ADVICE r04: this
      // drop is intentional and engine-consistent; documented, not fixed,
      // because BLEU of an empty candidate is undefined)
      pairs
        .join(per.select(col("doc_id").as("a"), col("u").as("ua"),
          col("v").as("va")), "a")
        .join(per.select(col("doc_id").as("b"), col("u").as("ub"),
          col("v").as("vb")), "b")
        .select(col("a"), col("b"),
          expr("sorted_summin(ua.gh, ua.cnt, ub.gh, ub.cnt)").as("m1"),
          col("ua.tot").as("t1"),
          expr("sorted_summin(va.gh, va.cnt, vb.gh, vb.cnt)").as("m2"),
          col("va.tot").as("t2"),
          col("ub.tot").as("r"))
        .where(col("t1") > 0)
        .select(col("a"), col("b"), col("m1"), col("t1"), col("m2"), col("t2"),
          expr("""CAST(floor(least(0.0, 1.0 - CAST(r AS DOUBLE)
                     / CAST(t1 AS DOUBLE)) * 1000000.0) AS BIGINT)""")
            .as("bp_micro"),
          expr("""CAST(floor((ln(CAST(m1 + 1 AS DOUBLE) / CAST(t1 + 1 AS DOUBLE))
                      + ln(CAST(m2 + 1 AS DOUBLE) / CAST(t2 + 1 AS DOUBLE)))
                    / 2.0 * 1000000.0) AS BIGINT)""").as("prec_log_micro"))
        .withColumn("logbleu_micro", col("bp_micro") + col("prec_log_micro"))
    },
    Some(s"""WITH ${graft.dedup.DedupQueries.candPairsOracleCte},
          tok AS (
            SELECT doc_id, list_filter(
              string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
            FROM documents),
          g AS (
            SELECT doc_id, 1 AS n, unnest(toks) AS gram FROM tok
            UNION ALL
            SELECT doc_id, 2 AS n, unnest(
              CASE WHEN len(toks) < 2 THEN []
              ELSE list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1]) END) AS gram
            FROM tok),
          gc AS (
            SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS cnt
            FROM g GROUP BY doc_id, n, gram),
          pv AS (
            SELECT c.a, c.b,
              CAST(sum(CASE WHEN x.n = 1
                THEN least(x.cnt, coalesce(y.cnt, 0)) ELSE 0 END) AS BIGINT) AS m1,
              CAST(sum(CASE WHEN x.n = 1 THEN x.cnt ELSE 0 END) AS BIGINT) AS t1,
              CAST(sum(CASE WHEN x.n = 2
                THEN least(x.cnt, coalesce(y.cnt, 0)) ELSE 0 END) AS BIGINT) AS m2,
              CAST(sum(CASE WHEN x.n = 2 THEN x.cnt ELSE 0 END) AS BIGINT) AS t2
            FROM cand c
            JOIN gc x ON x.doc_id = c.a
            LEFT JOIN gc y ON y.doc_id = c.b AND y.n = x.n AND y.gram = x.gram
            GROUP BY c.a, c.b),
          rl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS r FROM tok)
          SELECT a, b, m1, t1, m2, t2, bp_micro, prec_log_micro,
            bp_micro + prec_log_micro AS logbleu_micro
          FROM (
            SELECT pv.a, pv.b, m1, t1, m2, t2,
              CAST(floor(least(0.0, 1.0 - CAST(rl.r AS DOUBLE)
                / CAST(t1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS bp_micro,
              CAST(floor((ln(CAST(m1 + 1 AS DOUBLE) / CAST(t1 + 1 AS DOUBLE))
                  + ln(CAST(m2 + 1 AS DOUBLE) / CAST(t2 + 1 AS DOUBLE)))
                / 2.0 * 1000000.0) AS BIGINT) AS prec_log_micro
            FROM pv JOIN rl ON rl.doc_id = pv.b)"""))

  /** Pairwise ROUGE-1/2 recall (Lin 2004) over the same LSH candidate
    * pairs — the recall twin of eval_bleu (summarization evals and
    * reference-coverage audits read this side): clipped n-gram matches
    * over the REFERENCE gram totals instead of the candidate's. The
    * clipped sum Σ min(cnt_a, cnt_b) is symmetric, so the verify kernel
    * is byte-identical to BLEU's; only the denominators change, which
    * makes this query ALL-integer — no ln, no doubles, nothing to
    * quantize.
    *
    * Scale shape: identical to eval_bleu — pairs from the shared
    * CandidateArtifacts checkpoint, one semi-join-gated per-doc
    * (gram-hash, multiplicity) pass, linear sorted-merge per pair.
    * Drop semantics, mirrored on both engines: a token-free candidate
    * (t1 = 0, no gc rows → oracle inner-join drop) and a token-free
    * reference (r1 = 0, no rt row) both drop the pair — ROUGE of an
    * empty side is undefined; a single-token reference keeps its row
    * with rouge2_ppm = -1 (no reference bigrams to recall).
    */
  private val evalRougeN = Q(
    "eval_rouge_n",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val pairs = graft.dedup.CandidateArtifacts.pairs(s, dir)
      // session-shared gram tables (the eval_bleu note)
      val per = gramCounts(s, dir)
      pairs
        .join(per.select(col("doc_id").as("a"), col("u").as("ua"),
          col("v").as("va")), "a")
        .join(per.select(col("doc_id").as("b"), col("u").as("ub"),
          col("v").as("vb")), "b")
        .select(col("a"), col("b"),
          expr("sorted_summin(ua.gh, ua.cnt, ub.gh, ub.cnt)").as("m1"),
          col("ua.tot").as("t1"),
          expr("sorted_summin(va.gh, va.cnt, vb.gh, vb.cnt)").as("m2"),
          col("ub.tot").as("r1"),
          col("vb.tot").as("r2"))
        .where(col("t1") > 0 && col("r1") > 0)
        .select(col("a"), col("b"), col("m1"), col("m2"), col("r1"), col("r2"),
          expr("(m1 * 1000000) div r1").as("rouge1_ppm"),
          expr("CASE WHEN r2 = 0 THEN -1 " +
            "ELSE (m2 * 1000000) div r2 END").as("rouge2_ppm"))
    },
    Some(s"""WITH ${graft.dedup.DedupQueries.candPairsOracleCte},
          tok AS (
            SELECT doc_id, list_filter(
              string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
            FROM documents),
          g AS (
            SELECT doc_id, 1 AS n, unnest(toks) AS gram FROM tok
            UNION ALL
            SELECT doc_id, 2 AS n, unnest(
              CASE WHEN len(toks) < 2 THEN []
              ELSE list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1]) END) AS gram
            FROM tok),
          gc AS (
            SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS cnt
            FROM g GROUP BY doc_id, n, gram),
          m AS (
            SELECT c.a, c.b,
              CAST(sum(CASE WHEN x.n = 1
                THEN least(x.cnt, coalesce(y.cnt, 0)) ELSE 0 END) AS BIGINT) AS m1,
              CAST(sum(CASE WHEN x.n = 2
                THEN least(x.cnt, coalesce(y.cnt, 0)) ELSE 0 END) AS BIGINT) AS m2
            FROM cand c
            JOIN gc x ON x.doc_id = c.a
            LEFT JOIN gc y ON y.doc_id = c.b AND y.n = x.n AND y.gram = x.gram
            GROUP BY c.a, c.b),
          rt AS (
            SELECT doc_id,
              CAST(sum(CASE WHEN n = 1 THEN cnt ELSE 0 END) AS BIGINT) AS r1,
              CAST(sum(CASE WHEN n = 2 THEN cnt ELSE 0 END) AS BIGINT) AS r2
            FROM gc GROUP BY doc_id)
          SELECT a, b, m1, m2, r1, r2,
            (m1 * 1000000) // r1 AS rouge1_ppm,
            CASE WHEN r2 = 0 THEN -1
              ELSE (m2 * 1000000) // r2 END AS rouge2_ppm
          FROM m JOIN rt ON rt.doc_id = m.b"""))

  /** ROUGE-L recall over the live candidate pairs — the LCS member of the
    * eval family (ROUGE-1/2 are clipped-count recalls; ROUGE-L rewards
    * IN-ORDER overlap, so shuffled boilerplate scores low here while
    * scoring high on rouge1). Same generate-then-verify scale shape as
    * eval_rouge_n: tokenization runs once per candidate DOC behind a
    * checkpoint, the per-PAIR work is the native `lcs_len` DP
    * ([[graft.functions.LcsLength]]) over the first 32 tokens — a
    * declared cap (the text_edit_distance 100-char-head stance) that
    * bounds the quadratic DP at 1024 cells/pair regardless of document
    * length. Integer-exact: lcs, lengths, and a floor-divided ppm recall
    * against the reference (b) side; -1 flags an empty reference, never
    * a division.
    *
    * The oracle replays the SAME DP as a recursive CTE carrying the dp
    * row as a LIST (one step per a-token), using the prefix-max
    * reformulation dp_i[j] = max(dp_{i-1}[j], max_{k≤j}(dp_{i-1}[k-1] +
    * eq(b_k, a_i))) — no intra-row sequential dependency, so each step
    * is one list_transform. RougeLSpec pins Spark-vs-local-DP equality on
    * the live pairs plus hand-checked sequences.
    */
  private val evalRougeL = Q(
    "eval_rouge_l",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val pairs = graft.dedup.CandidateArtifacts.pairs(s, dir)
      val candDocs = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b"))).distinct()
      val per = Tables.spread(docs.select(col("doc_id"), col("text"))
          .join(candDocs, Seq("doc_id"), "left_semi"))
        .select(col("doc_id"),
          expr("slice(word_ngrams(text, 1, false), 1, 32)").as("toks"))
        .localCheckpoint(eager = true) // a-side and b-side passes
      // the joined pair frame is bytes-small but CPU-heavy (the DP) —
      // spread it so AQE's size-based coalesce can't serialize the pass
      Tables.spread(pairs
        .join(per.select(col("doc_id").as("a"), col("toks").as("ta")), "a")
        .join(per.select(col("doc_id").as("b"), col("toks").as("tb")), "b"))
        .select(col("a"), col("b"),
          expr("lcs_len(ta, tb)").as("lcs"),
          expr("CAST(size(ta) AS BIGINT)").as("na"),
          expr("CAST(size(tb) AS BIGINT)").as("nb"))
        .select(col("a"), col("b"), col("lcs"), col("na"), col("nb"),
          expr("CASE WHEN nb = 0 THEN -1 " +
            "ELSE (lcs * 1000000) div nb END").as("rougel_ppm"))
    },
    Some(s"""WITH RECURSIVE ${graft.dedup.DedupQueries.candPairsOracleCte},
          tok AS (
            SELECT doc_id, list_slice(list_filter(
              string_split_regex(lower(text), '[^a-z]+'), t -> t <> ''),
              1, 32) AS toks
            FROM documents),
          pt AS (
            SELECT c.a, c.b, x.toks AS ta, y.toks AS tb,
                   len(x.toks) AS na, len(y.toks) AS nb
            FROM cand c
            JOIN tok x ON x.doc_id = c.a
            JOIN tok y ON y.doc_id = c.b),
          rec AS (
            SELECT a, b, ta, tb, na, nb, 0 AS i,
                   list_transform(range(0, nb + 1), x -> 0) AS dp
            FROM pt
            UNION ALL
            SELECT a, b, ta, tb, na, nb, i + 1,
              list_prepend(0, list_transform(range(1, nb + 1), j ->
                greatest(dp[j + 1], list_max(list_transform(range(1, j + 1), k ->
                  dp[k] + CASE WHEN tb[k] = ta[i + 1] THEN 1 ELSE 0 END)))))
            FROM rec WHERE i < na)
          SELECT a, b, CAST(dp[nb + 1] AS BIGINT) AS lcs,
                 CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                 CASE WHEN nb = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((dp[nb + 1] * 1000000) // nb AS BIGINT)
                 END AS rougel_ppm
          FROM rec WHERE i = na"""))

  /** chrF2 (Popović 2015) over the live candidate pairs — the
    * character-level member of the eval family (BLEU/ROUGE are
    * word-level; chrF is the standard robustness check for morphology
    * and tokenization artifacts, and the engine's variant declares the
    * 5-char shingle it uses everywhere else as the character n-gram).
    * Clipped match m = Σ min(cnt_a, cnt_b) over shared 5-char shingles;
    * precision = m/|a|, recall = m/|b|, and chrF2 = 5PR/(4P+R) reduces
    * to the DIVISION-FREE integer form 5m/(4·tb + ta) (multiply num and
    * den by ta·tb), so every output is one exact floor-divided ppm —
    * no doubles, no zero-denominator case (tot ≥ 1 for any non-null
    * text, and null-text docs never enter the candidate pairs).
    *
    * Scale shape: the eval_rouge_n pattern — one `char_gram_hash_counts`
    * pass per candidate DOC behind a checkpoint (native kernel: sorted
    * distinct shingle hashes + multiplicities), per-pair work a single
    * allocation-free `sorted_summin` merge in codegen. The oracle
    * rebuilds the same counts from raw 5-char substrings (the
    * dedup_minhash_est window formulation) and clips via join+least —
    * hash-vs-text equality is the documented 64-bit collision stance.
    */
  private val evalChrf = Q(
    "eval_chrf",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val pairs = graft.dedup.CandidateArtifacts.pairs(s, dir)
      val candDocs = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b"))).distinct()
      val per = Tables.spread(Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
          .join(candDocs, Seq("doc_id"), "left_semi"))
        .select(col("doc_id"), expr("char_gram_hash_counts(text)").as("g"))
        .localCheckpoint(eager = true) // a-side and b-side passes
      pairs
        .join(per.select(col("doc_id").as("a"), col("g").as("ga")), "a")
        .join(per.select(col("doc_id").as("b"), col("g").as("gb")), "b")
        .select(col("a"), col("b"),
          expr("sorted_summin(ga.gh, ga.cnt, gb.gh, gb.cnt)").as("m"),
          col("ga.tot").as("ta"), col("gb.tot").as("tb"))
        .select(col("a"), col("b"), col("m"), col("ta"), col("tb"),
          expr("(m * 1000000) div ta").as("prec_ppm"),
          expr("(m * 1000000) div tb").as("rec_ppm"),
          expr("(5 * m * 1000000) div (4 * tb + ta)").as("chrf2_ppm"))
    },
    Some(s"""WITH ${graft.dedup.DedupQueries.candPairsOracleCte},
          g AS (
            SELECT doc_id, unnest(
              CASE WHEN length(text) < 5 THEN [text]
              ELSE list_transform(range(1, length(text) - 3),
                     i -> substr(text, i, 5)) END) AS gram
            FROM documents),
          gc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
                 FROM g GROUP BY doc_id, gram),
          tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS tot
                  FROM gc GROUP BY doc_id),
          mm AS (
            SELECT c.a, c.b,
              CAST(sum(least(x.cnt, coalesce(y.cnt, 0))) AS BIGINT) AS m
            FROM cand c
            JOIN gc x ON x.doc_id = c.a
            LEFT JOIN gc y ON y.doc_id = c.b AND y.gram = x.gram
            GROUP BY c.a, c.b)
          SELECT mm.a, mm.b, mm.m, ta.tot AS ta, tb.tot AS tb,
            (mm.m * 1000000) // ta.tot AS prec_ppm,
            (mm.m * 1000000) // tb.tot AS rec_ppm,
            (5 * mm.m * 1000000) // (4 * tb.tot + ta.tot) AS chrf2_ppm
          FROM mm
          JOIN tot ta ON ta.doc_id = mm.a
          JOIN tot tb ON tb.doc_id = mm.b"""))

  /** Word-level token F1 (the SQuAD/em-style answer-overlap metric) over
    * the live candidate pairs — the harmonic-mean member of the overlap
    * family (BLEU reads candidate precision, ROUGE reference recall, F1
    * both at once): m = Σ min(cnt_a, cnt_b) over shared unigrams, and
    * F1 = 2PR/(P+R) reduces to the DIVISION-FREE integer form
    * 2m/(ta+tb), so every output is one exact floor-divided ppm — the
    * eval_chrf algebra applied at the word level.
    *
    * Scale shape: identical to eval_chrf — pairs from the shared
    * CandidateArtifacts checkpoint, one semi-join-gated
    * `word_gram_hash_counts` pass per candidate doc, per-pair work one
    * allocation-free `sorted_summin` merge. Drop semantics: a token-free
    * side makes F1 undefined, so the pair drops on BOTH engines (the
    * eval_bleu t1 = 0 stance; the oracle's inner joins on per-doc gram
    * rows drop them structurally).
    */
  private val evalTokenF1 = Q(
    "eval_token_f1",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val pairs = graft.dedup.CandidateArtifacts.pairs(s, dir)
      // session-shared gram tables (the eval_bleu note); F1 reads the
      // unigram half only
      val per = gramCounts(s, dir)
        .select(col("doc_id"), col("u").as("g"))
      pairs
        .join(per.select(col("doc_id").as("a"), col("g").as("ga")), "a")
        .join(per.select(col("doc_id").as("b"), col("g").as("gb")), "b")
        .select(col("a"), col("b"),
          expr("sorted_summin(ga.gh, ga.cnt, gb.gh, gb.cnt)").as("m"),
          col("ga.tot").as("ta"), col("gb.tot").as("tb"))
        .where(col("ta") > 0 && col("tb") > 0)
        .select(col("a"), col("b"), col("m"), col("ta"), col("tb"),
          expr("(m * 1000000) div ta").as("prec_ppm"),
          expr("(m * 1000000) div tb").as("rec_ppm"),
          expr("(2 * m * 1000000) div (ta + tb)").as("f1_ppm"))
    },
    Some(s"""WITH ${graft.dedup.DedupQueries.candPairsOracleCte},
          tok AS (
            SELECT doc_id, list_filter(
              string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
            FROM documents),
          gc AS (
            SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id, unnest(toks) AS gram FROM tok)
            GROUP BY doc_id, gram),
          tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS tot
                  FROM gc GROUP BY doc_id),
          mm AS (
            SELECT c.a, c.b,
              CAST(sum(least(x.cnt, coalesce(y.cnt, 0))) AS BIGINT) AS m
            FROM cand c
            JOIN gc x ON x.doc_id = c.a
            LEFT JOIN gc y ON y.doc_id = c.b AND y.gram = x.gram
            GROUP BY c.a, c.b)
          SELECT mm.a, mm.b, mm.m, ta.tot AS ta, tb.tot AS tb,
            (mm.m * 1000000) // ta.tot AS prec_ppm,
            (mm.m * 1000000) // tb.tot AS rec_ppm,
            (2 * mm.m * 1000000) // (ta.tot + tb.tot) AS f1_ppm
          FROM mm
          JOIN tot ta ON ta.doc_id = mm.a
          JOIN tot tb ON tb.doc_id = mm.b"""))

  /** Binomial coefficient C(m, k) for the three fixed k values as one
    * arithmetic fragment — a product of k consecutive integers is exactly
    * divisible by k!, so the single floor division is EXACT integer math
    * (max magnitude 50!/40! ≈ 3.1e16, inside BIGINT). `m` is any integer
    * SQL expression; `fdiv` is the engine's floor-divide spelling. */
  private def binomSql(m: String, k: Int, fdiv: String): String =
    if (k == 1) s"($m)"
    else {
      val kFact = (1 to k).map(_.toLong).product
      val prod = (0 until k).map(i => s"(($m) - $i)").mkString(" * ")
      s"(($prod) $fdiv $kFact)"
    }

  /** The CASE arm picking the right binomial ratio per k row. */
  private def passAtKSql(fdiv: String): String = {
    def arm(k: Int) =
      s"""WHEN k = $k THEN CASE
            WHEN n < $k THEN -1
            WHEN n - n_pass < $k THEN 1000000
            ELSE 1000000 - (${binomSql("n - n_pass", k, fdiv)} * 1000000)
              $fdiv ${binomSql("n", k, fdiv)}
          END"""
    s"CASE ${arm(1)} ${arm(5)} ${arm(10)} ELSE -1 END"
  }

  /** Unbiased pass@k (Chen et al. 2021, the HumanEval estimator) of the
    * rule gate over fixed 50-doc task bundles: per bundle (task_id =
    * doc_id div 50) with n docs and n_pass gate-passers, pass@k =
    * 1 − C(n−n_pass, k)/C(n, k) for k ∈ {1, 5, 10} — the probability a
    * k-doc uniform draw from the bundle contains at least one usable doc,
    * the sample-until-usable readout curation dashboards want next to the
    * raw rate. ALL-integer: bundle sizes are ≤ 50 by construction, so
    * both binomials are exact BIGINT products (see [[binomSql]]) and the
    * output is one floor-divided ppm — no doubles anywhere. Degenerate
    * bundles (n < k) report -1, never a negative binomial.
    *
    * Scale shape: one corpus aggregate folds documents to n_docs/50
    * bundle rows; the k-expansion and the binomial arithmetic run on the
    * folded frame only. The rule label reuses the family's gate
    * (n_tok ≥ 20 AND n_chars ≥ 100 — the eval_rate_ci definition), so
    * the label pass rides the same tokenize scan shape.
    */
  private val evalPassAtK = Q(
    "eval_pass_at_k",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // n_tok off the doc-length artifact (the eval_rate_ci note)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .join(graft.text.TextArtifacts.docLens(s, dir), Seq("doc_id"), "left")
        .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
        .groupBy(expr("doc_id div 50").as("task_id"))
        .agg(count(lit(1)).as("n"),
          sum((col("n_tok") >= 20 && col("n_chars") >= 100).cast("long"))
            .as("n_pass"))
        .select(col("task_id"), col("n"), col("n_pass"),
          explode(array(lit(1L), lit(5L), lit(10L))).as("k"))
        .withColumn("pass_ppm", expr(passAtKSql("div")))
    },
    Some(s"""SELECT task_id, n, n_pass, k,
               ${passAtKSql("//")} AS pass_ppm
             FROM (SELECT doc_id // 50 AS task_id,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN n_tok >= 20 AND n_chars >= 100
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
                   FROM (SELECT doc_id, n_chars,
                           CAST(len(list_filter(string_split_regex(
                             lower(text), '[^a-z]+'), t -> t <> ''))
                             AS BIGINT) AS n_tok
                         FROM documents)
                   GROUP BY 1)
             CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (CAST(5 AS BIGINT)),
               (CAST(10 AS BIGINT))) ks(k)"""))

  /** Corpus-level generation diversity — distinct-1 / distinct-2 (Li et
    * al., "A Diversity-Promoting Objective Function for Neural
    * Conversation Models", NAACL 2016): the share of n-gram OCCURRENCES
    * that are unique types, per language. The standard low-diversity
    * alarm for model-generated or template corpora: `text_lexical_
    * diversity` is the PER-DOCUMENT type-token ratio (spinner text
    * inside one doc), this is the CROSS-document collapse detector — a
    * corpus of a thousand distinct-looking docs sharing the same
    * phrasebook scores high there and low here.
    *
    * Scale shape: one tokenize pass emits both gram orders
    * (the eval_rouge_n union shape), the (lang, n, gram) pre-aggregate
    * map-side combines within scan partitions, and the rollup per
    * (lang, n) is combine-friendly counts — nothing wider than the
    * bigram vocabulary ever shuffles, and the result is 2·#langs rows.
    * Integer-exact: counts are BIGINT in any order, one floor-divided
    * ppm at the end.
    */
  private val evalDistinctN = Q(
    "eval_distinct_n",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val grams = Tables.spread(Tables.documents(s, dir)
          .select(col("lang"), col("text")))
        .select(col("lang"),
          expr("word_ngrams(text, 1, false)").as("g1"),
          expr("word_ngrams(text, 2, false)").as("g2"))
        .select(col("lang"), explode(expr(
          "array(struct(CAST(1 AS BIGINT) AS n, g1 AS gs)," +
            " struct(CAST(2 AS BIGINT) AS n, g2 AS gs))")).as("x"))
        .select(col("lang"), col("x.n").as("n"), explode(col("x.gs")).as("gram"))
      grams
        .groupBy(col("lang"), col("n"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("lang"), col("n"))
        .agg(count(lit(1)).as("distinct_grams"),
          sum(col("cnt")).as("total_grams"))
        .select(col("lang"), col("n"), col("distinct_grams"), col("total_grams"),
          expr("(distinct_grams * 1000000) div total_grams").as("distinct_ppm"))
    },
    Some("""WITH tok AS (
              SELECT lang, list_filter(string_split_regex(lower(text),
                '[^a-z]+'), t -> t <> '') AS toks
              FROM documents),
            g AS (
              SELECT lang, CAST(1 AS BIGINT) AS n, unnest(toks) AS gram
              FROM tok
              UNION ALL
              SELECT lang, CAST(2 AS BIGINT) AS n, unnest(
                CASE WHEN len(toks) < 2 THEN []
                ELSE list_transform(range(1, len(toks)),
                  i -> toks[i] || ' ' || toks[i + 1]) END) AS gram
              FROM tok),
            gc AS (
              SELECT lang, n, gram, CAST(count(*) AS BIGINT) AS cnt
              FROM g GROUP BY lang, n, gram)
            SELECT lang, n,
              CAST(count(*) AS BIGINT) AS distinct_grams,
              CAST(sum(cnt) AS BIGINT) AS total_grams,
              (CAST(count(*) AS BIGINT) * 1000000)
                // CAST(sum(cnt) AS BIGINT) AS distinct_ppm
            FROM gc GROUP BY lang, n"""))

  /** Bradley-Terry strength fitting over pairwise quality matches — the
    * arena-style preference aggregation (Bradley & Terry 1952; the MM
    * fixed-point of Hunter, "MM algorithms for generalized Bradley-Terry
    * models", Ann. Statist. 2004; the Chatbot-Arena readout): sources
    * play deterministic head-to-head matches (judged by the rule-gate
    * quality proxy), and the fit turns the win matrix into per-source
    * strengths p_i with p_i/(p_i+p_j) ≈ P(i beats j) — the principled
    * upgrade over raw win RATE, which a lopsided match schedule biases.
    *
    * Matches: docs pair off within their md5 bucket (256 buckets — the
    * engine's deterministic sampling convention; the bucket count is the
    * production knob that scales with the corpus) in md5-shuffled order,
    * adjacent ranks playing one match each — O(n) matches total, never
    * the in-bucket quadratic. Winner = higher n_chars, tie → lower
    * doc_id; same-source matches discard. The win matrix gets the
    * standard add-one prior (one virtual win each direction per source
    * pair), which keeps every MM denominator positive and the MLE finite
    * on sparse schedules.
    *
    * MM solve: 15 fixed rounds of p_i ← W_i / Σ_j n_ij/(p_i+p_j), run in
    * exact BigInt arithmetic (scale 10^12, renormalized to Σp = k·10^6
    * ppm each round) on the DRIVER over the collected win matrix —
    * k²-bounded by the source catalog, never corpus-sized (the bpe_train
    * learned-table stance). The oracle replays the identical integer
    * algebra as 15 unrolled HUGEINT stages, so both engines floor the
    * same quotients; EvalQueriesSpec pins an independent recount.
    */
  private val BtRounds = 15
  private val BtScale = BigInt(1000000000000L) // 10^12

  /** Augmented ordered win matrix (si, sj, w, n) + real per-source stats:
    * shared by the query and EvalQueriesSpec's independent solver. */
  private[queries] def btMatrix(s: org.apache.spark.sql.SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val docs = Tables.documents(s, dir)
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
    // adjacent md5-shuffled ranks pair via lead() over the SAME window —
    // the old shape re-grouped the ranked rows by (bucket, (rk+1) div 2)
    // with max/min(struct(...)), which cost a second corpus exchange plus
    // a SortAggregate pair (struct aggs can't hash-aggregate); rk odd +
    // a non-null lead is exactly the nm = 2 group, and the (n_chars,
    // −doc_id) comparison picks the same winner (r13, guide §2.4)
    val matches = Tables.spread(docs
        .select(col("doc_id"), col("source"), col("n_chars")))
      .withColumn("bucket",
        expr(md5Byte("CAST(doc_id AS STRING)")).cast("long"))
      .withColumn("h", expr("md5(concat('pair', CAST(doc_id AS STRING)))"))
      .withColumn("rk", row_number().over(w))
      .withColumn("nc2", lead(col("n_chars"), 1).over(w))
      .withColumn("id2", lead(col("doc_id"), 1).over(w))
      .withColumn("src2", lead(col("source"), 1).over(w))
      .where(col("rk") % 2 === 1 && col("id2").isNotNull
        && col("source") =!= col("src2"))
      .select(
        when(col("n_chars") > col("nc2")
          || (col("n_chars") === col("nc2") && col("doc_id") < col("id2")),
          col("source")).otherwise(col("src2")).as("wsrc"),
        when(col("n_chars") > col("nc2")
          || (col("n_chars") === col("nc2") && col("doc_id") < col("id2")),
          col("src2")).otherwise(col("source")).as("lsrc"))
      .localCheckpoint(eager = true) // feeds the matrix AND the real stats
    val srcs = docs.select(col("source")).distinct()
    val realw = matches.groupBy(col("wsrc"), col("lsrc"))
      .agg(count(lit(1)).as("w"))
    val grid = srcs.select(col("source").as("si"))
      .crossJoin(broadcast(srcs.select(col("source").as("sj"))))
      .where(col("si") =!= col("sj"))
    val wmat = grid.join(broadcast(realw),
        col("si") === col("wsrc") && col("sj") === col("lsrc"), "left")
      .select(col("si"), col("sj"),
        (lit(1L) + coalesce(col("w"), lit(0L))).as("w"))
    val nmat = wmat.join(
        wmat.select(col("si").as("sj2"), col("sj").as("si2"), col("w").as("wr")),
        col("si") === col("si2") && col("sj") === col("sj2"))
      .select(col("si"), col("sj"), col("w"), (col("w") + col("wr")).as("n"))
    val rstat = srcs
      .join(matches.groupBy(col("wsrc").as("source"))
        .agg(count(lit(1)).as("wn")), Seq("source"), "left")
      .join(matches.groupBy(col("lsrc").as("source"))
        .agg(count(lit(1)).as("ln")), Seq("source"), "left")
      .select(col("source"), coalesce(col("wn"), lit(0L)).as("wins"),
        (coalesce(col("wn"), lit(0L)) + coalesce(col("ln"), lit(0L))).as("games"))
    (nmat, rstat)
  }

  /** The 15-round integer MM solve over a collected (si, sj, w, n)
    * matrix; exact BigInt throughout, floor division only on positive
    * operands (= the oracle's HUGEINT `//`). */
  private[queries] def btSolve(
      mat: Seq[(String, String, Long, Long)]): Map[String, Long] = {
    val srcs = mat.map(_._1).distinct.sorted
    val k = BigInt(srcs.length)
    val wTot = srcs.map(i => i -> BigInt(
      mat.collect { case (si, _, w, _) if si == i => w }.sum)).toMap
    var p = srcs.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to BtRounds) {
      val d = srcs.map { i =>
        i -> mat.collect { case (si, sj, _, n) if si == i =>
          (BigInt(n) * BtScale) / (p(i) + p(sj))
        }.sum
      }.toMap
      val praw = srcs.map(i => i -> (wTot(i) * BtScale) / d(i)).toMap
      val sSum = praw.values.sum
      p = srcs.map(i => i -> (praw(i) * k * BigInt(1000000)) / sSum).toMap
    }
    srcs.map(i => i -> p(i).toLong).toMap
  }

  private val evalEloBt = Q(
    "eval_elo_bt",
    (s, dir) => {
      val (nmat, rstat) = btMatrix(s, dir)
      // k²-bounded (source catalog²): 256 sources is already far past any
      // real catalog; a violation throws instead of OOMing the driver
      val mat = DriverGuard.collectBounded(nmat, 65536, "eval_elo_bt match matrix")
        .map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSeq
      val p = btSolve(mat)
      import s.implicits._
      val pDf = p.toSeq.toDF("source", "p_ppm")
      rstat.join(broadcast(pDf), Seq("source"))
        .select(col("source"), col("games"), col("wins"), col("p_ppm"))
    },
    Some {
      val matchesCte =
        s"""bkt AS (
             SELECT doc_id, source, n_chars,
               CAST(${md5Byte("CAST(doc_id AS VARCHAR)")} AS BIGINT) AS bucket,
               md5('pair' || CAST(doc_id AS VARCHAR)) AS h
             FROM documents),
           rk AS (
             SELECT *, CAST(row_number() OVER (PARTITION BY bucket
               ORDER BY h, doc_id) AS BIGINT) AS rk FROM bkt),
           grp AS (
             SELECT bucket, (rk + 1) // 2 AS m, doc_id, source, n_chars,
               row_number() OVER (PARTITION BY bucket, (rk + 1) // 2
                 ORDER BY n_chars DESC, doc_id) AS pos,
               count(*) OVER (PARTITION BY bucket, (rk + 1) // 2) AS nm
             FROM rk),
           matches AS (
             SELECT w.source AS wsrc, l.source AS lsrc
             FROM grp w JOIN grp l ON l.bucket = w.bucket AND l.m = w.m
             WHERE w.pos = 1 AND l.pos = 2 AND w.nm = 2
               AND w.source <> l.source),
           srcs AS (SELECT DISTINCT source FROM documents),
           kk AS (SELECT CAST(count(*) AS HUGEINT) AS k FROM srcs),
           realw AS (SELECT wsrc, lsrc, CAST(count(*) AS BIGINT) AS w
                     FROM matches GROUP BY 1, 2),
           grid AS (SELECT a.source AS si, b.source AS sj
                    FROM srcs a, srcs b WHERE a.source <> b.source),
           wmat AS (
             SELECT g.si, g.sj, CAST(1 + coalesce(r.w, 0) AS BIGINT) AS w
             FROM grid g LEFT JOIN realw r
               ON r.wsrc = g.si AND r.lsrc = g.sj),
           nmat AS (
             SELECT x.si, x.sj, x.w + y.w AS n
             FROM wmat x JOIN wmat y ON y.si = x.sj AND y.sj = x.si),
           wins AS (SELECT si, CAST(sum(w) AS BIGINT) AS ww
                    FROM wmat GROUP BY si),
           p0 AS (SELECT source AS si, CAST(1000000 AS HUGEINT) AS p
                  FROM srcs)"""
      val rounds = (1 to BtRounds).map { r =>
        s"""t$r AS (
             SELECT n.si, CAST(n.n AS HUGEINT) * 1000000000000
               // (pi.p + pj.p) AS t
             FROM nmat n
             JOIN p${r - 1} pi ON pi.si = n.si
             JOIN p${r - 1} pj ON pj.si = n.sj),
           d$r AS (SELECT si, sum(t) AS d FROM t$r GROUP BY si),
           praw$r AS (
             SELECT w.si, CAST(w.ww AS HUGEINT) * 1000000000000 // d.d AS p
             FROM wins w JOIN d$r d ON d.si = w.si),
           p$r AS MATERIALIZED (
             SELECT si, p * (SELECT k FROM kk) * 1000000
               // (SELECT sum(p) FROM praw$r) AS p
             FROM praw$r)"""
      }.mkString(",\n")
      s"""WITH $matchesCte,
          $rounds,
          rstat AS (
            SELECT s.source,
              coalesce(wr.wn, CAST(0 AS BIGINT)) AS wins,
              coalesce(wr.wn, CAST(0 AS BIGINT))
                + coalesce(ls.ln, CAST(0 AS BIGINT)) AS games
            FROM srcs s
            LEFT JOIN (SELECT wsrc, CAST(count(*) AS BIGINT) AS wn
                       FROM matches GROUP BY 1) wr ON wr.wsrc = s.source
            LEFT JOIN (SELECT lsrc, CAST(count(*) AS BIGINT) AS ln
                       FROM matches GROUP BY 1) ls ON ls.lsrc = s.source)
          SELECT r.source, r.games, r.wins, CAST(p.p AS BIGINT) AS p_ppm
          FROM rstat r JOIN p$BtRounds p ON p.si = r.source"""
    })

  /** Poisson(1) draw from a uniform via the inverse CDF — the Poisson
    * bootstrap's per-(row, replica) weight. Thresholds are the exact
    * partial sums e⁻¹·Σ 1/k! as double literals (identical text both
    * engines); the k ≥ 6 tail (P ≈ 6e-4) caps at 6. */
  private val PoissonW: String =
    """CASE WHEN u < 0.36787944117144233 THEN CAST(0 AS BIGINT)
            WHEN u < 0.7357588823428847  THEN CAST(1 AS BIGINT)
            WHEN u < 0.9196986029286058  THEN CAST(2 AS BIGINT)
            WHEN u < 0.9810118431238462  THEN CAST(3 AS BIGINT)
            WHEN u < 0.9963401531726563  THEN CAST(4 AS BIGINT)
            WHEN u < 0.9994058151824183  THEN CAST(5 AS BIGINT)
            ELSE CAST(6 AS BIGINT) END"""

  private val BootstrapB = 200

  /** Per-language pass-rate confidence interval by POISSON BOOTSTRAP —
    * the resampling CI machinery production pipelines actually run at
    * scale (each row draws an independent Poisson(1) weight per replica,
    * so "resampling n rows with replacement" needs no global coordination
    * and rides the scan), next to eval_rate_ci's analytic Wilson band —
    * the bootstrap generalizes to any statistic, Wilson only to a rate.
    * B = 200 replicas; each replica's rate is an exact integer-ppm ratio
    * of BIGINT weighted sums; the 95% band is the declared order-statistic
    * convention k = max(1, ⌊n/40⌋) → (k-th, (n−k+1)-th) of the ascending
    * surviving replicas — (5th, 196th) at the full 200, and still
    * well-defined on a tiny stratum where zero-weight replicas drop
    * (P ≈ e^(−stratum size) each). The replica weights
    * are md5-SEEDED (doc_id | replica), so runs, engines, and cluster
    * sizes agree bit-for-bit while the weight population is exactly
    * Poisson-shaped. Scale shape: the ×B explode fans out doc-id-sized
    * rows (three longs — never text), the replica aggregate map-side
    * combines to langs × B, and the percentile extraction sorts a
    * 200-element array per language in-core.
    */
  private val evalBootstrapCi = Q(
    "eval_bootstrap_ci",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // n_tok off the doc-length artifact (the eval_rate_ci note)
      val gated = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .join(graft.text.TextArtifacts.docLens(s, dir), Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          (coalesce(col("n_tok"), lit(0L)) >= 20 && col("n_chars") >= 100)
            .cast("long").as("x"))
        .localCheckpoint(eager = true) // point estimate + B-replica explode
      val u16 = PortableHash.md5Hex4("concat(CAST(doc_id AS STRING), '|', CAST(r AS STRING))")
      val reps = gated
        .select(col("doc_id"), col("lang"), col("x"),
          explode(expr(s"sequence(0, ${BootstrapB - 1})")).as("r"))
        .withColumn("u", expr(s"(CAST(($u16) AS DOUBLE) + 0.5) / 65536.0"))
        .withColumn("w", expr(PoissonW))
        .groupBy(col("lang"), col("r"))
        .agg(sum(col("w")).as("nw"), sum(col("w") * col("x")).as("sw"))
        .select(col("lang"),
          expr("sw * 1000000 div nullif(nw, 0L)").as("rate_ppm"))
        .where(col("rate_ppm").isNotNull) // an all-zero-weight replica
      val base = gated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("n_pass"))
      reps.groupBy(col("lang"))
        .agg(sort_array(collect_list(col("rate_ppm"))).as("rs"))
        .join(base, "lang")
        .select(col("lang"), col("n"), col("n_pass"),
          expr("(n_pass * 1000000) div n").as("rate_ppm"),
          size(col("rs")).cast("long").as("n_reps"),
          // indices are SIZE-RELATIVE (k = max(1, ⌊n/40⌋); lo = k-th,
          // hi = (n−k+1)-th): with all 200 replicas surviving this is
          // exactly (5th, 196th), and a tiny stratum that loses
          // zero-weight replicas still gets a well-defined band instead
          // of an out-of-bounds error under ANSI mode
          expr("element_at(rs, CAST(greatest(1L, size(rs) div 40) AS INT))")
            .as("boot_lo_ppm"),
          expr("""element_at(rs, CAST(size(rs)
                    - greatest(1L, size(rs) div 40) + 1L AS INT))""")
            .as("boot_hi_ppm"))
    },
    Some {
      val u16 = PortableHash.md5Hex4("CAST(doc_id AS VARCHAR) || '|' || CAST(r AS VARCHAR)")
      s"""WITH gated AS (
            SELECT doc_id, lang,
              CASE WHEN len(list_filter(string_split_regex(lower(text),
                     '[^a-z]+'), t -> t <> '')) >= 20
                   AND n_chars >= 100 THEN 1 ELSE 0 END AS x
            FROM documents),
          reps AS (
            SELECT lang, r,
              CAST(sum(w) AS BIGINT) AS nw,
              CAST(sum(w * x) AS BIGINT) AS sw
            FROM (SELECT lang, x, r, $PoissonW AS w
                  FROM (SELECT lang, x, r,
                          (CAST(($u16) AS DOUBLE) + 0.5) / 65536.0 AS u
                        FROM (SELECT doc_id, lang, x,
                                unnest(range(0, $BootstrapB)) AS r
                              FROM gated)))
            GROUP BY lang, r),
          rates AS (
            SELECT lang, sw * 1000000 // nw AS rate_ppm
            FROM reps WHERE nw > 0),
          bands AS (
            SELECT lang, list_sort(list(rate_ppm)) AS rs
            FROM rates GROUP BY lang),
          base AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x) AS BIGINT) AS n_pass
            FROM gated GROUP BY lang)
          SELECT b.lang, base.n, base.n_pass,
            (base.n_pass * 1000000) // base.n AS rate_ppm,
            CAST(len(b.rs) AS BIGINT) AS n_reps,
            b.rs[CAST(greatest(1, len(b.rs) // 40) AS INT)] AS boot_lo_ppm,
            b.rs[CAST(len(b.rs) - greatest(1, len(b.rs) // 40) + 1 AS INT)]
              AS boot_hi_ppm
          FROM bands b JOIN base ON base.lang = b.lang"""
    })

  private val PermB = 200

  /** Paired sign-flip permutation test — the distribution-free
    * significance engine the parametric family (experiment_ttest's
    * normal assumption, eval_bootstrap_ci's resampling CI) is missing:
    * for per-item paired differences d_i, the exact null "the pairing
    * is symmetric" is simulated by flipping each d_i's sign with a
    * seeded fair coin, and the p-value is the fraction of flipped sums
    * at least as extreme as the observed one. The tested pairing here
    * is production-real: is the chars/5 token-count estimator (the
    * budgeting shortcut every pipeline uses before tokenizing) BIASED
    * against the real tokenizer count — d_i = 5·n_tok(i) − n_chars(i)
    * per document. B = 200 sign assignments, md5-seeded per (doc,
    * replica) so runs, engines, and cluster sizes agree bit-for-bit;
    * p uses the add-one convention (n_extreme+1)/(B+1) — the observed
    * assignment is itself one draw from the null, which also keeps
    * p > 0 exactly. INTEGER END TO END (d_i, ±1 signs, BIGINT sums; the
    * one division is a ppm floor of non-negative integers); the mean
    * readout is one double division of exact integers, rounded once.
    * Scale shape: the per-doc d rides the scan, the ×B explode fans out
    * 3-long rows (never text), the replica aggregate map-side combines
    * to exactly B rows, and the verdict is a 1-row fold. */
  private val evalPermutationTest = Q(
    "eval_permutation_test",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // n_tok off the doc-length artifact (the eval_rate_ci note)
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .join(graft.text.TextArtifacts.docLens(s, dir), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(5L) * coalesce(col("n_tok"), lit(0L)) - col("n_chars"))
            .as("d"))
        .localCheckpoint(eager = true) // observed sum + B-replica explode
      val obs = d.agg(count(lit(1)).as("n"), sum(col("d")).as("d_sum"))
      val coin = PortableHash.md5Byte(
        "concat(CAST(doc_id AS STRING), '|', CAST(r AS STRING))")
      val perms = d
        .select(col("doc_id"), col("d"),
          explode(expr(s"sequence(0, ${PermB - 1})")).as("r"))
        .select(col("r"),
          expr(s"CASE WHEN (($coin) % 2) = 0 THEN d ELSE -d END").as("sd"))
        .groupBy(col("r")).agg(sum(col("sd")).as("ps"))
      perms.crossJoin(broadcast(obs)) // 1-row observed stats
        .agg(max(col("n")).as("n"), max(col("d_sum")).as("d_sum"),
          count(lit(1)).as("n_perm"),
          sum(expr("CAST(abs(ps) >= abs(d_sum) AS LONG)")).as("n_extreme"))
        .select(col("n"), col("d_sum"),
          expr("round(CAST(d_sum AS DOUBLE) / CAST(n AS DOUBLE), 3) + 0.0")
            .as("d_mean"),
          col("n_perm"), col("n_extreme"),
          expr("((n_extreme + 1) * 1000000) div (n_perm + 1)").as("p_ppm"))
    },
    Some {
      val coin = PortableHash.md5Byte(
        "CAST(doc_id AS VARCHAR) || '|' || CAST(r AS VARCHAR)")
      s"""WITH d AS (
            SELECT doc_id,
              5 * CAST(len(list_filter(string_split_regex(lower(text),
                '[^a-z]+'), t -> t <> '')) AS BIGINT) - n_chars AS d
            FROM documents),
          obs AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(d) AS BIGINT) AS d_sum
            FROM d),
          perms AS (
            SELECT r, CAST(sum(CASE WHEN (($coin) % 2) = 0
                THEN d ELSE -d END) AS BIGINT) AS ps
            FROM (SELECT doc_id, d, unnest(range(0, $PermB)) AS r FROM d)
            GROUP BY r),
          verdict AS (
            SELECT max(n) AS n, max(d_sum) AS d_sum,
              CAST(count(*) AS BIGINT) AS n_perm,
              CAST(sum(CASE WHEN abs(ps) >= abs(d_sum) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme
            FROM perms, obs)
          SELECT n, d_sum,
            round(CAST(d_sum AS DOUBLE) / CAST(n AS DOUBLE), 3) + 0.0 AS d_mean,
            n_perm, n_extreme,
            ((n_extreme + 1) * 1000000) // (n_perm + 1) AS p_ppm
          FROM verdict"""
    })

  /** Paired-classifier agreement — the two readouts a gate comparison
    * runs before swapping filters: McNemar's χ² on the DISCORDANT pairs
    * ((b−c)²/(b+c) — "do the rule gate and the logreg gate keep
    * different fractions", the paired test that is valid where two
    * independent rates are not, because both gates judge the SAME
    * documents) and Cohen's κ (chance-corrected agreement — raw accord
    * is inflated whenever both gates mostly say yes). Classifier A is
    * the rule gate (n_tok ≥ 20 ∧ n_chars ≥ 100), classifier B the
    * hashed-unigram logit sign (quality_logreg's keep) — both already
    * oracle-checked elsewhere, so this query adds only the pairing
    * algebra. Everything is exact: the 2×2 cells are one corpus
    * aggregate per lang, χ² in milli by cross-multiplied integer
    * division, κ in ppm as a ratio of two exact BIGINT polynomials
    * (numerator n·(a+d) − Σ marginal products, denominator n² − Σ) —
    * no doubles anywhere, the strongest determinism class. Degenerate
    * cells report −1 (no discordant pairs → χ² undefined; pe = 1 → κ
    * undefined) rather than dividing by zero.
    */
  private val evalAgreement = Q(
    "eval_agreement",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // rides the word-count artifact — the scoredDf rewrite's algebra
      val judged = graft.text.TextArtifacts.wordCounts(s, dir)
        .withColumn("w_milli",
          expr(s"CAST((${md5Byte("token")}) AS BIGINT) * 2654435761 % 2001 - 1000"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tok"), sum(col("w_milli") * col("cnt")).as("sw"))
        .join(Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
        .select(col("lang"),
          (col("n_tok") >= 20L && col("n_chars") >= 100L).as("ka"),
          (col("sw") > 0L).as("kb"))
      judged.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum((col("ka") && col("kb")).cast("long")).as("a"),
          sum((col("ka") && !col("kb")).cast("long")).as("b"),
          sum((!col("ka") && col("kb")).cast("long")).as("c"),
          sum((!col("ka") && !col("kb")).cast("long")).as("d"))
        .select(col("lang"), col("n"), col("a"), col("b"), col("c"), col("d"),
          // χ² numerator is non-negative, so truncating div ≡ flooring //;
          // DECIMAL(38,0) keeps (b−c)²·1000 exact at any corpus scale
          // (the mix_anneal overflow discipline)
          expr("""CASE WHEN b + c = 0 THEN CAST(-1 AS BIGINT)
                  ELSE CAST((CAST(b - c AS DECIMAL(38,0)) * (b - c) * 1000)
                       div (b + c) AS BIGINT) END""")
            .as("mcnemar_chi2_milli"),
          // κ can be NEGATIVE (worse-than-chance), where truncating and
          // flooring integer division disagree — so the quantization is
          // floor of ONE double quotient from identical integer inputs
          // (the eval_auc_rank determinism pattern: identical IEEE ops →
          // identical floor on both engines)
          expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    - (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                       + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE)) = 0.0
                    THEN CAST(-1 AS BIGINT)
                  ELSE CAST(floor(
                    (CAST(n AS DOUBLE) * CAST(a + d AS DOUBLE)
                     - (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                        + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE)))
                    * 1000000.0
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       - (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                          + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))))
                    AS BIGINT) END""").as("kappa_ppm"))
    },
    Some(s"""WITH judged AS (
               SELECT lang,
                 (n_tok >= 20 AND n_chars >= 100) AS ka,
                 (sw > 0) AS kb
               FROM (SELECT doc_id, lang, n_chars,
                       CAST(count(*) AS BIGINT) AS n_tok,
                       CAST(sum(w_milli) AS BIGINT) AS sw
                     FROM (SELECT doc_id, lang, n_chars,
                             CAST(${md5Byte("term")} AS BIGINT) * 2654435761
                               % 2001 - 1000 AS w_milli
                           FROM (SELECT doc_id, lang, n_chars,
                                   unnest(list_filter(string_split_regex(
                                     lower(text), '[^a-z]+'), t -> t <> ''))
                                     AS term
                                 FROM documents))
                     GROUP BY doc_id, lang, n_chars)),
             cells AS (
               SELECT lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS b,
                 CAST(sum(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END) AS BIGINT) AS d
               FROM judged GROUP BY lang)
             SELECT lang, n, a, b, c, d,
               CASE WHEN b + c = 0 THEN CAST(-1 AS BIGINT)
                 ELSE CAST((CAST(b - c AS HUGEINT) * (b - c) * 1000)
                      // (b + c) AS BIGINT) END
                 AS mcnemar_chi2_milli,
               CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 - (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                    + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE)) = 0.0
                 THEN CAST(-1 AS BIGINT)
               ELSE CAST(floor(
                 (CAST(n AS DOUBLE) * CAST(a + d AS DOUBLE)
                  - (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                     + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE)))
                 * 1000000.0
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    - (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                       + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))))
                 AS BIGINT) END AS kappa_ppm
             FROM cells"""))

  // Murphy decomposition of the Brier score (Murphy 1973) per lang —
  // the WHY behind a calibration readout: Brier = reliability −
  // resolution + uncertainty separates "the forecast probabilities are
  // wrong" (REL, fixable by recalibration) from "the forecaster can't
  // discriminate" (RES, needs a better model) from "the task is just
  // hard" (UNC, irreducible base-rate entropy). Forecast = the same
  // hard-sigmoid the trained gate uses, p_milli = clamp((bucket+1000)/4)
  // over the shared scored frame (the +1000 shift keeps the operand
  // non-negative so div ≡ //). Binning by the EXACT forecast value makes
  // the decomposition identity exact in rationals: the raw Brier sum is
  // a closed form over bin stats (o_k·(p−1000)² + (n_k−o_k)·p², exact
  // BIGINT), while REL/RES terms quantize ONE double per bin to nano
  // units (the §7.4.1 per-row rule — identical integer inputs, identical
  // IEEE expression text on both engines) before the exact integer sum.
  // Scale: one corpus aggregate to ≤ langs × 501 forecast bins;
  // everything after lives on that bounded frame. BrierSpec pins a local
  // recount and the decomposition identity within quantization bounds.
  private val evalBrierDecomp = Q(
    "eval_brier_decomp",
    (s, dir) => {
      val bins = scoredDf(s, dir)
        .withColumn("pm", expr("least(greatest((bucket + 1000) div 4, 0L), 1000L)"))
        .groupBy(col("lang"), col("pm"))
        .agg(count(lit(1)).as("nk"), sum(col("pos")).as("ok"))
        .localCheckpoint(eager = true) // totals + terms: ONE tokenize scan
      val tot = bins.groupBy(col("lang"))
        .agg(sum(col("nk")).as("n"), sum(col("ok")).as("n_pos"))
      bins.join(tot, "lang")
        .select(col("lang"), col("n"), col("n_pos"),
          expr("ok * (pm - 1000) * (pm - 1000) + (nk - ok) * pm * pm")
            .as("bterm"),
          expr("""CAST(round(CAST((pm * nk - 1000 * ok) AS DOUBLE)
                 * CAST((pm * nk - 1000 * ok) AS DOUBLE)
                 * 1000.0 / CAST(nk AS DOUBLE), 0) AS BIGINT)""").as("rterm"),
          expr("""CAST(round((CAST(ok AS DOUBLE) / CAST(nk AS DOUBLE)
                   - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(ok AS DOUBLE) / CAST(nk AS DOUBLE)
                   - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(nk AS DOUBLE) * 1000000000.0, 0) AS BIGINT)""")
            .as("sterm"))
        .groupBy(col("lang"), col("n"), col("n_pos"))
        .agg(sum(col("bterm")).as("bsum"), sum(col("rterm")).as("rsum"),
          sum(col("sterm")).as("ssum"))
        .select(col("lang"), col("n"), col("n_pos"),
          expr("bsum * 1000 div n").as("brier_nano"),
          expr("rsum div n").as("rel_nano"),
          expr("ssum div n").as("res_nano"),
          expr("""CAST(round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 * 1000000000.0, 0) AS BIGINT)""").as("unc_nano"))
    },
    Some(s"""WITH scored AS ($scoredSql),
          bins AS (
            SELECT lang, least(greatest((bucket + 1000) // 4, 0), 1000) AS pm,
              CAST(count(*) AS BIGINT) AS nk, CAST(sum(pos) AS BIGINT) AS ok
            FROM scored GROUP BY 1, 2),
          tot AS (
            SELECT lang, CAST(sum(nk) AS BIGINT) AS n,
              CAST(sum(ok) AS BIGINT) AS n_pos
            FROM bins GROUP BY lang),
          terms AS (
            SELECT b.lang, t.n, t.n_pos,
              ok * (pm - 1000) * (pm - 1000) + (nk - ok) * pm * pm AS bterm,
              CAST(round(CAST((pm * nk - 1000 * ok) AS DOUBLE)
                * CAST((pm * nk - 1000 * ok) AS DOUBLE)
                * 1000.0 / CAST(nk AS DOUBLE), 0) AS BIGINT) AS rterm,
              CAST(round((CAST(ok AS DOUBLE) / CAST(nk AS DOUBLE)
                  - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(ok AS DOUBLE) / CAST(nk AS DOUBLE)
                  - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                * CAST(nk AS DOUBLE) * 1000000000.0, 0) AS BIGINT) AS sterm
            FROM bins b JOIN tot t ON b.lang = t.lang)
          SELECT lang, n, n_pos,
            CAST(sum(bterm) * 1000 // n AS BIGINT) AS brier_nano,
            CAST(sum(rterm) // n AS BIGINT) AS rel_nano,
            CAST(sum(sterm) // n AS BIGINT) AS res_nano,
            CAST(round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
              * (1.0 - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
              * 1000000000.0, 0) AS BIGINT) AS unc_nano
          FROM terms GROUP BY lang, n, n_pos"""))

  // Trapezoidal PR-AUC per lang — the imbalanced-gate companion of
  // eval_auc_rank's ROC view (with 1% positives a useless gate still
  // scores ROC-AUC ≈ 0.5 while its PR-AUC collapses toward the base
  // rate, which is also the readout's published baseline). Sweep the
  // bucketed scores high→low; per bucket the cumulative (TP, FP) give
  // the PR point, and the trapezoid Δrecall·(prec + prec_prev)/2 is the
  // tie-aware area step (all docs in a bucket move together — the
  // eval_auc_rank half-weight stance in PR space; the curve anchors at
  // precision 1 before the first bucket, the standard (0,1) anchor).
  // Each bucket's contribution quantizes ONE double to nano units from
  // exact cumulative BIGINTs (§7.4.1 per-row rule), then exact integer
  // sums; degenerate single-class langs report -1, matching the AUC
  // convention. Shape: one corpus aggregate to the ≤ 2001-bucket
  // histogram; cum window + readout live there.
  private val evalPrAuc = Q(
    "eval_pr_auc",
    (s, dir) => {
      val hist = scoredDf(s, dir)
        .groupBy(col("lang"), col("bucket"))
        .agg(sum(col("pos")).as("np"),
          (count(lit(1)) - sum(col("pos"))).as("nn"))
        .localCheckpoint(eager = true) // totals + cum sweep: ONE tokenize scan
      val tot = hist.groupBy(col("lang"))
        .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      val w = Window.partitionBy(col("lang")).orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("cum_tp", sum(col("np")).over(w))
        .withColumn("cum_fp", sum(col("nn")).over(w))
        .join(tot, "lang")
        .withColumn("term", expr(
          """CASE WHEN np = 0 OR n_pos = 0 THEN 0L
             ELSE CAST(round(CAST(np AS DOUBLE) / CAST(n_pos AS DOUBLE)
               * ((CAST(cum_tp AS DOUBLE) / CAST(cum_tp + cum_fp AS DOUBLE))
                  + (CASE WHEN cum_tp - np + cum_fp - nn = 0 THEN 1.0
                     ELSE CAST(cum_tp - np AS DOUBLE)
                       / CAST(cum_tp - np + cum_fp - nn AS DOUBLE) END))
               / 2.0 * 1000000000.0, 0) AS BIGINT) END"""))
        .groupBy(col("lang"), col("n_pos"), col("n_neg"))
        .agg(sum(col("term")).as("area"))
        .select(col("lang"), col("n_pos"), col("n_neg"),
          expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1L
                  ELSE area END""").as("pr_auc_nano"),
          expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1L
                  ELSE CAST(round(CAST(n_pos AS DOUBLE)
                    / CAST(n_pos + n_neg AS DOUBLE) * 1000000000.0, 0)
                    AS BIGINT) END""").as("baseline_nano"))
    },
    Some(s"""WITH scored AS ($scoredSql),
          hist AS (
            SELECT lang, bucket, CAST(sum(pos) AS BIGINT) AS np,
              CAST(count(*) - sum(pos) AS BIGINT) AS nn
            FROM scored GROUP BY lang, bucket),
          tot AS (
            SELECT lang, CAST(sum(np) AS BIGINT) AS n_pos,
              CAST(sum(nn) AS BIGINT) AS n_neg
            FROM hist GROUP BY lang),
          cum AS (
            SELECT lang, np, nn,
              CAST(sum(np) OVER (PARTITION BY lang ORDER BY bucket DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_tp,
              CAST(sum(nn) OVER (PARTITION BY lang ORDER BY bucket DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cum_fp
            FROM hist),
          terms AS (
            SELECT c.lang, t.n_pos, t.n_neg,
              CASE WHEN np = 0 OR n_pos = 0 THEN 0
              ELSE CAST(round(CAST(np AS DOUBLE) / CAST(n_pos AS DOUBLE)
                * ((CAST(cum_tp AS DOUBLE) / CAST(cum_tp + cum_fp AS DOUBLE))
                   + (CASE WHEN cum_tp - np + cum_fp - nn = 0 THEN 1.0
                      ELSE CAST(cum_tp - np AS DOUBLE)
                        / CAST(cum_tp - np + cum_fp - nn AS DOUBLE) END))
                / 2.0 * 1000000000.0, 0) AS BIGINT) END AS term
            FROM cum c JOIN tot t ON c.lang = t.lang)
          SELECT lang, n_pos, n_neg,
            CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
              ELSE CAST(sum(term) AS BIGINT) END AS pr_auc_nano,
            CASE WHEN n_pos = 0 OR n_neg = 0 THEN -1
              ELSE CAST(round(CAST(n_pos AS DOUBLE)
                / CAST(n_pos + n_neg AS DOUBLE) * 1000000000.0, 0) AS BIGINT)
              END AS baseline_nano
          FROM terms GROUP BY lang, n_pos, n_neg"""))

  // Expected / maximum calibration error per lang — the single-number
  // summary eval_calibration_bins' table rolls up to (and the
  // recalibration KPI eval_brier_decomp's reliability term motivates):
  // over 10 equal-width forecast bins, ECE = Σ (n_b/N)·|conf_b − acc_b|
  // and MCE = max_b |conf_b − acc_b|, with the same hard-sigmoid
  // forecast the gate family shares. EXACT end to end, no doubles at
  // all: (n_b/N)|conf−acc| = |Σp − 1000·o_b| / (1000·N), so ECE_ppm =
  // Σ_b|Σp − 1000·o_b| · 1000 div N and each bin's MCE candidate is
  // |Σp − 1000·o_b| · 1000 div n_b — pure BIGINT arithmetic on both
  // engines. One corpus aggregate to ≤ langs × 10 bins.
  private val evalEce = Q(
    "eval_ece",
    (s, dir) => {
      val bins = scoredDf(s, dir)
        .withColumn("pm", expr("least(greatest((bucket + 1000) div 4, 0L), 1000L)"))
        .withColumn("b10", expr("least(pm div 100, 9L)"))
        .groupBy(col("lang"), col("b10"))
        .agg(count(lit(1)).as("nb"), sum(col("pos")).as("ob"),
          sum(col("pm")).as("sp"))
      bins
        .select(col("lang"), col("nb"), expr("abs(sp - 1000 * ob)").as("dev"),
          expr("abs(sp - 1000 * ob) * 1000 div nb").as("mce_cand"))
        .groupBy(col("lang"))
        .agg(sum(col("nb")).as("n"), count(lit(1)).as("n_bins"),
          sum(col("dev")).as("devsum"), max(col("mce_cand")).as("mce_ppm"))
        .select(col("lang"), col("n"), col("n_bins"),
          expr("devsum * 1000 div n").as("ece_ppm"), col("mce_ppm"))
    },
    Some(s"""WITH scored AS ($scoredSql),
          bins AS (
            SELECT lang,
              least(least(greatest((bucket + 1000) // 4, 0), 1000) // 100, 9)
                AS b10,
              CAST(count(*) AS BIGINT) AS nb,
              CAST(sum(pos) AS BIGINT) AS ob,
              CAST(sum(least(greatest((bucket + 1000) // 4, 0), 1000))
                AS BIGINT) AS sp
            FROM scored GROUP BY 1, 2)
          SELECT lang, CAST(sum(nb) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS n_bins,
            CAST(sum(abs(sp - 1000 * ob)) * 1000 // sum(nb) AS BIGINT)
              AS ece_ppm,
            CAST(max(abs(sp - 1000 * ob) * 1000 // nb) AS BIGINT) AS mce_ppm
          FROM bins GROUP BY lang"""))

  val all: Seq[Q] = Seq(evalAucRank, evalCalibrationBins, evalRateCi, evalBleu,
    evalRougeN, evalRougeL, evalChrf, evalTokenF1, evalPassAtK,
    evalDistinctN, evalEloBt, evalBootstrapCi, evalAgreement,
    evalBrierDecomp, evalPrAuc, evalEce, evalPermutationTest)
}
