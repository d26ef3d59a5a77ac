package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Data-mixture operators around language-model signal:
  *
  *  - CCNet-style perplexity bucketing (head/middle/tail per language by
  *    unigram-LM negative log-likelihood);
  *  - epoch-capped token budgeting (how many epochs of each source fit a
  *    target mixture without exceeding a repetition cap).
  *
  * The perplexity terciles deliberately do NOT sort the corpus: a
  * per-lang rank window would funnel each language — few keys, each
  * corpus-sized — through single reducers (the SCALING.md rule). Instead
  * per-doc scores quantize into a BOUNDED histogram (0.1-nat buckets,
  * ~100 per lang), the tercile thresholds come from a cumulative window
  * over that tiny histogram, and docs label themselves by comparing their
  * bucket to the broadcast thresholds. Bucket-granular terciles are the
  * documented semantic — the boundary bucket tips whole into the next
  * class, which is what production ppl-bucketing does anyway (CCNet cuts
  * on fixed score thresholds, not exact ranks).
  */
object MixQueries {

  /** Phase-1/phase-2 anneal allocations over columns (tokens, total,
    * qtokens, qtotal) — shared by mix_anneal_schedule and the overflow
    * spec. Products promoted to DECIMAL(38,0): budget × tokens is two
    * corpus-scale BIGINTs and passes 2^63 at a ~10^10-token corpus with
    * a dominant source; DECIMAL(38,0) holds any BIGINT×BIGINT product
    * exactly (≤ 8.6e37 < 1e38) and `div` floors back to BIGINT, agreeing
    * with the DuckDB HUGEINT twin (MixAnnealOverflowSpec pins both above
    * 2^63 against BigInt arithmetic). */
  private[graft] val P1TokensExpr: String =
    """(CAST((CAST(total div 2 AS DECIMAL(38,0)) * 9) div 10
         AS DECIMAL(38,0)) * tokens) div total"""
  private[graft] val P2TokensExpr: String =
    """CASE WHEN qtotal = 0 THEN CAST(0 AS BIGINT)
       ELSE (CAST((total div 2) div 10 AS DECIMAL(38,0))
         * qtokens) div qtotal END"""

  private val tokenizeExpr = "word_ngrams(text, 1, false)"

  /** Perplexity head/middle/tail per language. Unigram NLL per token is
    * quantized to integer micro-nats per (lang, token) — vocabulary-sized
    * frame, shuffled join, never hint-broadcast (the tfidf rule) — so the
    * per-doc mean is exact BIGINT math; the per-doc average quantizes to
    * 0.1-nat histogram buckets and the per-lang cumulative tercile
    * thresholds broadcast back. No corpus-sized window anywhere.
    */
  private val qualityPplBuckets = Q(
    "quality_ppl_buckets",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      // (doc, lang, token) counts = the shared word-count artifact with
      // the doc's lang attached (r12: the inline tokenize re-ran the
      // regex pass this artifact already pays once per corpus); one
      // checkpointed frame feeds both the LM fit and the per-doc scoring
      // (the sample_importance shape).
      val pre = graft.text.TextArtifacts.wordCounts(s, dir)
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("token"), col("cnt"))
        .localCheckpoint(eager = true)
      val freq = pre.groupBy(col("lang"), col("token")).agg(sum(col("cnt")).as("c"))
      val totals = freq.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
      val q = freq.join(broadcast(totals), "lang")
        .withColumn("q", expr(
          """CAST(round(ln(CAST(tot AS DOUBLE) / CAST(c AS DOUBLE))
                 * 1000000.0, 0) AS BIGINT)"""))
        .select(col("lang"), col("token"), col("q"))
      val scored = pre.join(q, Seq("lang", "token"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("cnt")).as("n_tok"), sum(col("cnt") * col("q")).as("sq"))
        .withColumn("nll_avg_micro", expr("sq div n_tok"))
        .withColumn("qb", expr("nll_avg_micro div 100000"))
      // bounded histogram: ~#langs × ~100 buckets — windows here are free
      val cumW = Window.partitionBy(col("lang")).orderBy(col("qb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thresholds = scored.groupBy(col("lang"), col("qb"))
        .agg(count(lit(1)).as("nb"))
        .withColumn("cum", sum(col("nb")).over(cumW))
        .withColumn("n", sum(col("nb")).over(Window.partitionBy(col("lang"))))
        .groupBy(col("lang"))
        .agg(min(when(col("cum") * 3 >= col("n"), col("qb"))).as("thr1"),
          min(when(col("cum") * 3 >= col("n") * 2, col("qb"))).as("thr2"))
      scored.join(broadcast(thresholds), "lang")
        .select(col("doc_id"), col("lang"), col("n_tok"),
          col("nll_avg_micro"), col("qb"),
          when(col("qb") < col("thr1"), lit("head"))
            .when(col("qb") < col("thr2"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
    },
    Some("""WITH pre AS (
              SELECT doc_id, lang, token, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT doc_id, lang,
                      unnest(list_filter(string_split_regex(lower(text),
                        '[^a-z]+'), t -> t <> '')) AS token
                    FROM documents)
              GROUP BY doc_id, lang, token),
            freq AS (
              SELECT lang, token, CAST(sum(cnt) AS BIGINT) AS c
              FROM pre GROUP BY lang, token),
            totals AS (
              SELECT lang, CAST(sum(c) AS BIGINT) AS tot
              FROM freq GROUP BY lang),
            q AS (
              SELECT f.lang, f.token,
                CAST(round(ln(CAST(t.tot AS DOUBLE) / CAST(f.c AS DOUBLE))
                  * 1000000.0, 0) AS BIGINT) AS q
              FROM freq f JOIN totals t USING (lang)),
            scored AS (
              SELECT doc_id, lang,
                CAST(sum(cnt) AS BIGINT) AS n_tok,
                CAST(sum(cnt * q) AS BIGINT) // CAST(sum(cnt) AS BIGINT)
                  AS nll_avg_micro
              FROM pre JOIN q USING (lang, token)
              GROUP BY doc_id, lang),
            sb AS (
              SELECT doc_id, lang, n_tok, nll_avg_micro,
                nll_avg_micro // 100000 AS qb
              FROM scored),
            hist AS (
              SELECT lang, qb, CAST(count(*) AS BIGINT) AS nb
              FROM sb GROUP BY lang, qb),
            cums AS (
              SELECT lang, qb,
                CAST(sum(nb) OVER (PARTITION BY lang ORDER BY qb
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum,
                CAST(sum(nb) OVER (PARTITION BY lang) AS BIGINT) AS n
              FROM hist),
            thr AS (
              SELECT lang,
                min(CASE WHEN cum * 3 >= n THEN qb END) AS thr1,
                min(CASE WHEN cum * 3 >= n * 2 THEN qb END) AS thr2
              FROM cums GROUP BY lang)
            SELECT doc_id, sb.lang, n_tok, nll_avg_micro, qb,
              CASE WHEN qb < thr1 THEN 'head'
                   WHEN qb < thr2 THEN 'middle'
                   ELSE 'tail' END AS bucket
            FROM sb JOIN thr ON sb.lang = thr.lang"""))

  /** Epoch-capped token budgeting — the mixture planner: given a total
    * token budget (half the corpus) split equally across sources, how
    * many epochs (repetitions, milli-precision, capped at 3.0 — the
    * "don't repeat data more than a few times" rule) of each source fill
    * its share, and how many tokens that plans. Shape: one map-side
    * combined token aggregate (per-doc counts ride the scan), a one-row
    * total via cross join, integer milli-epoch math — output is one row
    * per source.
    */
  private val mixTokenBudget = Q(
    "mix_token_budget",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val perSource = Tables.documents(s, dir)
        .select(col("source"), size(expr(tokenizeExpr)).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      val tot = perSource.agg(sum(col("tokens")).as("total"),
        count(lit(1)).as("n_src"))
      perSource.crossJoin(broadcast(tot))
        .withColumn("target", expr("(total div 2) div n_src"))
        .withColumn("epochs_milli",
          expr("least(CAST(3000 AS BIGINT), (target * 1000) div tokens)"))
        .select(col("source"), col("n_docs"), col("tokens"), col("target"),
          col("epochs_milli"),
          expr("(tokens * epochs_milli) div 1000").as("planned_tokens"))
    },
    Some("""WITH per_source AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(list_filter(string_split_regex(lower(text),
                  '[^a-z]+'), t -> t <> ''))) AS BIGINT) AS tokens
              FROM documents GROUP BY source),
            tot AS (
              SELECT CAST(sum(tokens) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_src
              FROM per_source)
            SELECT source, n_docs, tokens,
              (total // 2) // n_src AS target,
              least(CAST(3000 AS BIGINT), (((total // 2) // n_src) * 1000) // tokens)
                AS epochs_milli,
              (tokens * least(CAST(3000 AS BIGINT),
                (((total // 2) // n_src) * 1000) // tokens)) // 1000
                AS planned_tokens
            FROM per_source, tot"""))

  /** First two md5 hex digits as 0..255 — the engine's deterministic
    * split convention (CurationQueries.md5Byte). */
  private def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** DoReMi-flavored domain reweighting — upweight sources the reference
    * language model finds SURPRISING (excess loss), the
    * domain-reweighting step between raw mixture and token budgeting
    * (Xie et al., "DoReMi: Optimizing Data Mixtures Speeds Up Language
    * Model Pretraining", 2023 — here one deterministic round with the
    * corpus-fit unigram LM standing in for the proxy/reference pair):
    *
    *  1. reference model = add-one-smoothed unigram LM fit on the
    *     md5-half of the corpus (the corpus_drift split convention);
    *  2. per-source mean NLL under that model; excess = source mean −
    *     pooled mean (surprising sources score positive);
    *  3. weights ∝ max(excess, 0.01 nat) normalized to ppm — the linear
    *     (T→∞) flattening of DoReMi's exponentiated update, kept linear
    *     so every step stays in exact integer micro-nats (a cross-engine
    *     exp() would break the determinism contract).
    *
    * Scale shape: rides the shared (doc_id, token, cnt) word-count
    * artifact instead of re-tokenizing the corpus (r12: the inline
    * explode ran the tokenizer twice — once under the reference
    * frequency table, once under the per-source fold — and shuffled raw
    * token INSTANCES into the freq join; the artifact shape shuffles
    * per-doc aggregated counts, strictly fewer rows, and weights every
    * per-token quantity by cnt — exact integer algebra, sums
    * unchanged). The frequency table is vocabulary-sized → joined
    * shuffled, never hint-broadcast (the tfidf rule); model totals and
    * the per-source frame (≤ #sources rows) broadcast; per-token NLL
    * quantizes per ROW to micro-nats so every sum is order-free BIGINT
    * (the unigram-NLL rule); all divisions are positive-operand `div`,
    * where truncation and floor agree on both engines.
    */
  private val mixDoremi = Q(
    "mix_doremi",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val wc = graft.text.TextArtifacts.wordCounts(s, dir)
      // the reference half derives from doc_id alone — the freq branch
      // filters the artifact directly, no doc-metadata join; only the
      // per-source fold attaches `source` (one doc-keyed equi-join)
      val freq = wc
        .where(expr(s"(${md5Byte("CAST(doc_id AS STRING)")}) < 128"))
        .groupBy(col("token")).agg(sum(col("cnt")).as("fcnt"))
      val stats = freq.agg(sum(col("fcnt")).as("rtot"), count(lit(1)).as("v"))
      val per = wc
        .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id")
        .join(freq, Seq("token"), "left")
        .crossJoin(broadcast(stats))
        .withColumn("q", expr(
          """CAST(round(ln(CAST(coalesce(fcnt, 0L) + 1 AS DOUBLE)
               / CAST(rtot + v AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"""))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_tok"), sum(col("q") * col("cnt")).as("sq"))
      val tot = per.agg(sum(col("n_tok")).as("t_tok"), sum(col("sq")).as("t_sq"))
      val ex = per.crossJoin(broadcast(tot))
        .withColumn("nll_micro", expr("(-sq) div n_tok"))
        .withColumn("excess_micro",
          expr("(-sq) div n_tok - (-t_sq) div t_tok"))
        .withColumn("w_raw", greatest(col("excess_micro"), lit(10000L)))
      val wtot = ex.agg(sum(col("w_raw")).as("tw"))
      ex.crossJoin(broadcast(wtot))
        .select(col("source"), col("n_tok"), col("nll_micro"),
          col("excess_micro"),
          expr("(w_raw * 1000000) div tw").as("weight_ppm"))
    },
    Some(s"""WITH toks AS (
               SELECT source,
                 CASE WHEN ${md5Byte("CAST(doc_id AS VARCHAR)")} < 128
                   THEN 1 ELSE 0 END AS is_ref,
                 unnest(list_filter(string_split_regex(lower(text),
                   '[^a-z]+'), t -> t <> '')) AS token
               FROM documents),
             freq AS (
               SELECT token, CAST(count(*) AS BIGINT) AS cnt
               FROM toks WHERE is_ref = 1 GROUP BY token),
             stats AS (
               SELECT CAST(sum(cnt) AS BIGINT) AS rtot,
                 CAST(count(*) AS BIGINT) AS v
               FROM freq),
             per AS (
               SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
                 CAST(sum(q) AS BIGINT) AS sq
               FROM (SELECT t.source,
                       CAST(round(ln(CAST(coalesce(f.cnt, 0) + 1 AS DOUBLE)
                         / CAST(s.rtot + s.v AS DOUBLE)) * 1000000.0, 0)
                         AS BIGINT) AS q
                     FROM toks t LEFT JOIN freq f USING (token), stats s)
               GROUP BY source),
             tot AS (
               SELECT CAST(sum(n_tok) AS BIGINT) AS t_tok,
                 CAST(sum(sq) AS BIGINT) AS t_sq
               FROM per),
             ex AS (
               SELECT source, n_tok, (-sq) // n_tok AS nll_micro,
                 (-sq) // n_tok - (-t_sq) // t_tok AS excess_micro
               FROM per, tot),
             w AS (
               SELECT source, n_tok, nll_micro, excess_micro,
                 greatest(excess_micro, 10000) AS w_raw
               FROM ex),
             wt AS (SELECT CAST(sum(w_raw) AS BIGINT) AS tw FROM w)
             SELECT source, n_tok, nll_micro, excess_micro,
               (w_raw * 1000000) // wt.tw AS weight_ppm
             FROM w, wt"""))

  /** Two-phase (midtraining/anneal) mixture planning — the now-standard
    * recipe of spending the last slice of the token budget on a
    * quality-skewed mixture: phase 1 (90% of the half-corpus budget)
    * allocates per source proportional to raw token mass, phase 2 (the
    * 10% anneal) proportional to QUALITY-GATED token mass (tokens of
    * docs passing the engine's standard gate, n_tok ≥ 20 ∧ n_chars ≥
    * 100) — so high-quality sources are upweighted exactly when the
    * model is most shaped by its data.
    *
    * Scale shape: one per-doc scan folds into a per-source aggregate
    * (≤ #sources rows), totals broadcast back; every allocation is
    * integer `div` on positive quantities (remainders are un-allocated
    * slack, not redistributed — deterministic and auditable).
    */
  private val mixAnnealSchedule = Q(
    "mix_anneal_schedule",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val perSource = Tables.documents(s, dir)
        .select(col("source"), col("n_chars"),
          size(expr(tokenizeExpr)).cast("long").as("n_tok"))
        .withColumn("pass", (col("n_tok") >= 20L && col("n_chars") >= 100L)
          .cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
          sum(col("pass")).as("n_pass"),
          sum(col("pass") * col("n_tok")).as("qtokens"))
      val tot = perSource.agg(sum(col("tokens")).as("total"),
        sum(col("qtokens")).as("qtotal"))
      // allocation arithmetic: see P1TokensExpr/P2TokensExpr — promoted
      // to DECIMAL(38,0) against the 2^63 product overflow (ADVICE r04)
      perSource.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("tokens"), col("qtokens"),
          expr("(n_pass * 1000000) div n_docs").as("pass_ppm"),
          expr(MixQueries.P1TokensExpr).as("p1_tokens"),
          expr(MixQueries.P2TokensExpr).as("p2_tokens"))
        .withColumn("planned_tokens", col("p1_tokens") + col("p2_tokens"))
    },
    Some("""WITH per_doc AS (
              SELECT source, n_chars,
                CAST(len(list_filter(string_split_regex(lower(text),
                  '[^a-z]+'), t -> t <> '')) AS BIGINT) AS n_tok
              FROM documents),
            per_source AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS tokens,
                CAST(sum(CASE WHEN n_tok >= 20 AND n_chars >= 100
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
                CAST(sum(CASE WHEN n_tok >= 20 AND n_chars >= 100
                  THEN n_tok ELSE 0 END) AS BIGINT) AS qtokens
              FROM per_doc GROUP BY source),
            tot AS (
              SELECT CAST(sum(tokens) AS BIGINT) AS total,
                CAST(sum(qtokens) AS BIGINT) AS qtotal
              FROM per_source)
            SELECT source, n_docs, tokens, qtokens,
              (n_pass * 1000000) // n_docs AS pass_ppm,
              CAST(((CAST(total // 2 AS HUGEINT) * 9 // 10) * tokens)
                // total AS BIGINT) AS p1_tokens,
              CASE WHEN qtotal = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((CAST((total // 2) // 10 AS HUGEINT) * qtokens)
                  // qtotal AS BIGINT) END
                AS p2_tokens,
              CAST(((CAST(total // 2 AS HUGEINT) * 9 // 10) * tokens)
                // total AS BIGINT)
                + CASE WHEN qtotal = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST((CAST((total // 2) // 10 AS HUGEINT) * qtokens)
                    // qtotal AS BIGINT) END
                AS planned_tokens
            FROM per_source, tot"""))

  /** UniMax language-budget waterfilling (Chung et al., "UniMax: Fairer
    * and More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023) — spread a total token budget across
    * languages as uniformly as possible subject to a per-language epoch
    * cap, REDISTRIBUTING what capped (low-resource) languages cannot
    * absorb. `mix_token_budget` is the no-redistribution planner (equal
    * split, leftover forfeited); this is the fair loop the paper argues
    * for: repeatedly give every remaining language an equal share of the
    * remaining budget, freezing any language whose cap is below its share.
    *
    * Exact closed form of that sequential loop — no driver iteration:
    * process languages in ascending cap order; while cap_i ≤ fair_i
    * (fair_i = remaining_i div remaining_langs_i) the language takes its
    * whole cap, and from the FIRST i with cap_i > fair_i every later
    * language takes the sequential fair split of what remains, which is
    * exactly (R_p + j − 1) div m for the j-th of the m fair-regime
    * members (sequential floor-division identity: splitting R over m
    * takers one `div` at a time hands taker j exactly that amount).
    * Ascending caps make strict re-entry into the cap regime impossible
    * — fair shares move by at most 1 between steps while caps only grow,
    * so later caps can at worst TIE the fair share, and min(cap, fair)
    * takes the same value either way. MixUnimaxSpec pins the closed form
    * against the literal loop on randomized cap/budget sets.
    *
    * Budget = 1.5× corpus tokens (a multi-epoch multilingual run), epoch
    * cap 2.0: the fixture's en-scale language lands in the fair regime
    * while tail languages cap out, exercising both branches.
    *
    * Scale shape: ONE map-side-combined token aggregate folds the corpus
    * to a #langs-row frame; every window below runs over that bounded
    * frame (the graph_degree_dist stance on unpartitioned windows). All
    * arithmetic is non-negative BIGINT floor division — `greatest(r, 0)`
    * keeps the one value that can go negative (past-budget prefix
    * remainders on rows after the regime switch, whose fair value is
    * never consumed) out of the truncate-vs-floor divergence zone.
    */
  private val mixUnimax = Q(
    "mix_unimax",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val perLang = Tables.documents(s, dir)
        .select(col("lang"), size(expr(tokenizeExpr)).cast("long").as("n_tok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      val tot = perLang.agg(sum(col("tokens")).as("total"),
        count(lit(1)).as("k"))
      val w = Window.orderBy(col("cap"), col("lang"))
      val base = perLang.crossJoin(broadcast(tot))
        .withColumn("budget", expr("(total * 3) div 2"))
        .withColumn("cap", expr("tokens * 2"))
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum_prev", coalesce(sum(col("cap"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("r", expr("greatest(budget - cum_prev, CAST(0 AS BIGINT))"))
        .withColumn("fair", expr("r div (k - i + 1)"))
        .localCheckpoint(eager = true) // feeds the regime pick AND the rows
      // first row whose cap exceeds its fair share = the regime switch;
      // min(struct) carries that row's remaining budget out with it
      val pRow = base.where(col("cap") > col("fair"))
        .agg(min(struct(col("i"), col("r"))).as("pr"))
        .select(col("pr.i").as("p"), col("pr.r").as("rp"))
      base.crossJoin(broadcast(pRow))
        .withColumn("alloc",
          expr("""CASE WHEN p IS NULL OR i < p THEN cap
                  ELSE (rp + (i - p)) div (k - p + 1) END"""))
        .select(col("lang"), col("n_docs"), col("tokens"), col("budget"),
          col("cap"), col("alloc"),
          expr("""CASE WHEN tokens = 0 THEN CAST(0 AS BIGINT)
                  ELSE (alloc * 1000) div tokens END""").as("epochs_milli"))
    },
    Some("""WITH per_lang AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(list_filter(string_split_regex(lower(text),
                  '[^a-z]+'), t -> t <> ''))) AS BIGINT) AS tokens
              FROM documents GROUP BY lang),
            tot AS (
              SELECT CAST(sum(tokens) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS k
              FROM per_lang),
            caps AS (
              SELECT lang, n_docs, tokens, tokens * 2 AS cap, total, k,
                (total * 3) // 2 AS budget
              FROM per_lang, tot),
            base AS (
              SELECT lang, n_docs, tokens, cap, k, budget,
                CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT) AS i,
                CAST(coalesce(sum(cap) OVER (ORDER BY cap, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_prev
              FROM caps),
            base2 AS (
              SELECT *, greatest(budget - cum_prev, CAST(0 AS BIGINT)) AS r
              FROM base),
            base3 AS (
              SELECT *, r // (k - i + 1) AS fair FROM base2),
            pr AS (
              SELECT min(i) AS p, arg_min(r, i) AS rp
              FROM base3 WHERE cap > fair)
            SELECT lang, n_docs, tokens, budget, cap, alloc,
              CASE WHEN tokens = 0 THEN CAST(0 AS BIGINT)
                   ELSE (alloc * 1000) // tokens END AS epochs_milli
            FROM (
              SELECT lang, n_docs, tokens, budget, cap,
                CASE WHEN p IS NULL OR i < p THEN cap
                     ELSE (rp + (i - p)) // (k - p + 1) END AS alloc
              FROM base3, pr)"""))

  /** Pairwise domain-similarity matrix — Jensen-Shannon divergence
    * between every pair of source distributions over hashed-unigram
    * buckets (B = 4096, md5-portable — the quality_dsir feature space),
    * in integer nano-nats. THE mixture-design input the planners above
    * consume implicitly: near-duplicate domains (low JSD) waste mixture
    * slots, outlier domains (high JSD) need explicit budget — and at
    * 100 TB the matrix is how you pick which of 10⁴ crawl sources to
    * collapse before mix_doremi/mix_unimax ever run.
    *
    * Scale shape: the corpus folds ONCE into the (source × bucket)
    * frame (≤ S·B rows regardless of corpus size, riding the shared
    * wordCounts artifact); the DENSE grid (sources × all 4096 buckets,
    * zeros materialized) is what makes the bucket-keyed self-join emit
    * the one-sided terms a sparse inner join would silently drop (the
    * b = 0 bucket still contributes ½·p·ln 2 to JSD); everything
    * after is S²·B-bounded, never corpus-bounded. Determinism: the
    * corpus_drift contribution expression verbatim — zero-guarded CASE
    * terms, per-row nano-nat quantization, order-free BIGINT sums.
    */
  private val mixDomainSimilarity = Q(
    "mix_domain_similarity",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val cs = TextArtifacts.wordCounts(s, dir)
        .join(Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id")
        .withColumn("bucket",
          expr(s"CAST(${graft.queries.PortableHash.md5Hex4("token")} % 4096 AS BIGINT)"))
        .groupBy(col("source"), col("bucket"))
        .agg(sum(col("cnt")).as("c"))
      val sources = cs.select(col("source")).distinct()
      val grid = sources
        .select(col("source"),
          explode(expr("sequence(0L, 4095L)")).as("bucket"))
      val dense = grid.join(cs, Seq("source", "bucket"), "left")
        .select(col("source"), col("bucket"),
          coalesce(col("c"), lit(0L)).as("c"))
      val totals = dense.groupBy(col("source")).agg(sum(col("c")).as("t"))
      val withTot = dense.join(broadcast(totals), "source")
      val contrib = withTot.as("x")
        .join(withTot.as("y").hint("shuffle_hash"), "bucket")
        .where(col("x.source") < col("y.source") &&
          (col("x.c") > 0L || col("y.c") > 0L))
        .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
          col("x.c").as("a"), col("x.t").as("ta"),
          col("y.c").as("b"), col("y.t").as("tb"))
        .withColumn("contrib", expr(
          """CAST(round((
               CASE WHEN a = 0 THEN 0.0 ELSE
                 0.5 * (CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)) *
                 ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)) /
                    ((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) +
                      CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0)) END +
               CASE WHEN b = 0 THEN 0.0 ELSE
                 0.5 * (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) *
                 ln((CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) /
                    ((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) +
                      CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0)) END
             ) * 1000000000.0, 0) AS BIGINT)"""))
      contrib.groupBy(col("src_a"), col("src_b"))
        .agg(sum(col("contrib")).as("jsd_nano"))
    },
    Some(s"""WITH toks AS (
               SELECT d.doc_id, d.source, unnest(list_filter(
                 string_split_regex(lower(d.text), '[^a-z]+'), t -> t <> ''))
                 AS token
               FROM documents d),
             cs AS (
               SELECT source,
                 CAST(${graft.queries.PortableHash.md5Hex4("token")} % 4096 AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS c
               FROM toks GROUP BY 1, 2),
             grid AS (
               SELECT s.source, b.bucket
               FROM (SELECT DISTINCT source FROM cs) s,
                    (SELECT unnest(range(0, 4096)) AS bucket) b),
             dense AS (
               SELECT g.source, g.bucket, coalesce(cs.c, 0) AS c
               FROM grid g LEFT JOIN cs
                 ON cs.source = g.source AND cs.bucket = g.bucket),
             totals AS (
               SELECT source, CAST(sum(c) AS BIGINT) AS t
               FROM dense GROUP BY source),
             wt AS (
               SELECT d.source, d.bucket, d.c, t.t
               FROM dense d JOIN totals t ON t.source = d.source),
             contrib AS (
               SELECT x.source AS src_a, y.source AS src_b,
                 CAST(round((
                   CASE WHEN x.c = 0 THEN 0.0 ELSE
                     0.5 * (CAST(x.c AS DOUBLE) / CAST(x.t AS DOUBLE)) *
                     ln((CAST(x.c AS DOUBLE) / CAST(x.t AS DOUBLE)) /
                        ((CAST(x.c AS DOUBLE) / CAST(x.t AS DOUBLE) +
                          CAST(y.c AS DOUBLE) / CAST(y.t AS DOUBLE)) / 2.0)) END +
                   CASE WHEN y.c = 0 THEN 0.0 ELSE
                     0.5 * (CAST(y.c AS DOUBLE) / CAST(y.t AS DOUBLE)) *
                     ln((CAST(y.c AS DOUBLE) / CAST(y.t AS DOUBLE)) /
                        ((CAST(x.c AS DOUBLE) / CAST(x.t AS DOUBLE) +
                          CAST(y.c AS DOUBLE) / CAST(y.t AS DOUBLE)) / 2.0)) END
                 ) * 1000000000.0, 0) AS BIGINT) AS contrib
               FROM wt x JOIN wt y ON y.bucket = x.bucket
               WHERE x.source < y.source AND (x.c > 0 OR y.c > 0))
             SELECT src_a, src_b, CAST(sum(contrib) AS BIGINT) AS jsd_nano
             FROM contrib GROUP BY src_a, src_b"""))

  // UCB1 bandit state over source domains (Auer et al. 2002) — the
  // online data-selection view of the mixture problem (ODM / bandit
  // data sampling): each source is an arm, a "pull" is a document
  // drawn from it, the reward is the rule gate's pass bit, and UCB1's
  // mean + √(2 ln N / n) says which source the NEXT training batch
  // should sample to balance exploiting high-quality sources against
  // exploring under-sampled ones. This query materializes the bandit
  // state after replaying the corpus as the pull history: per source
  // the exact (n, n_pass) counts, the ppm mean, the exploration bonus
  // and UCB score as floors of ONE double expression over exact BIGINTs
  // (IEEE ln/sqrt are correctly rounded on both engines — the Wilson-CI
  // stance), and the pick flag via a (score desc, source) rank. Scale:
  // ONE source-keyed aggregate over the scan; the scoring and rank live
  // on the ≤ #sources frame.
  private val mixUcbBandit = Q(
    "mix_ucb_bandit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val arms = Tables.documents(s, dir)
        .select(col("source"),
          expr("""CAST((size(filter(split(lower(text), '[^a-z]+'),
                 t -> t <> '')) >= 20 AND n_chars >= 100) AS LONG)""")
            .as("pass"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("pass")).as("n_pass"))
        .localCheckpoint(eager = true) // pull total + scoring: ONE scan
      val tot = arms.agg(sum(col("n")).as("big_n"))
      val bonus =
        """CAST(floor(sqrt(2.0 * ln(CAST(big_n AS DOUBLE)) / CAST(n AS DOUBLE))
             * 1000000.0) AS BIGINT)"""
      arms.crossJoin(broadcast(tot)) // 1-row pull total
        .select(col("source"), col("n"), col("n_pass"),
          expr("n_pass * 1000000 div n").as("mean_ppm"),
          expr(bonus).as("bonus_ppm"),
          (expr("n_pass * 1000000 div n") + expr(bonus)).as("ucb_ppm"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("ucb_ppm").desc, col("source"))).cast("long"))
    },
    Some("""WITH arms AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN len(list_filter(string_split_regex(
                    lower(text), '[^a-z]+'), t -> t <> '')) >= 20
                  AND n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
              FROM documents GROUP BY source),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM arms),
            scored AS (
              SELECT source, n, n_pass,
                CAST(n_pass * 1000000 // n AS BIGINT) AS mean_ppm,
                CAST(floor(sqrt(2.0 * ln(CAST(big_n AS DOUBLE))
                    / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS bonus_ppm
              FROM arms, tot)
            SELECT source, n, n_pass, mean_ppm, bonus_ppm,
              mean_ppm + bonus_ppm AS ucb_ppm,
              CAST(row_number() OVER (ORDER BY mean_ppm + bonus_ppm DESC,
                source) AS BIGINT) AS rk
            FROM scored"""))

  val all: Seq[Q] = Seq(qualityPplBuckets, mixTokenBudget, mixDoremi,
    mixAnnealSchedule, mixUnimax, mixDomainSimilarity, mixUcbBandit)
}
