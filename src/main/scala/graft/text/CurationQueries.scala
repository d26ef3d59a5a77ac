package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Corpus-curation operators — the remaining ops a large-scale
  * training-data pipeline runs between raw crawl and tokenizer, each
  * designed for the 100 TB shape:
  *
  *  - deterministic hash sampling (reproducible splits, no RNG state, no
  *    shuffle — a filter that pushes to the scan);
  *  - PII scrubbing (regex redaction as codegen'd column math, one pass);
  *  - edit-distance verification over LSH candidate pairs (the
  *    generate-then-verify shape again — never all-pairs);
  *  - fixed-budget sequence packing (assign docs to context-window bins by
  *    streaming cumulative token count inside each shard — one window per
  *    shard partition, no global sort);
  *  - vocabulary top-k (partial-aggregated counts, TakeOrderedAndProject
  *    instead of a global rank window).
  *
  * Every hash derives from md5 (the one digest both engines share) and all
  * arithmetic is integer, so the DuckDB oracle hash-matches exactly.
  */
object CurationQueries {

  /** Native one-pass tokenizer, bit-identical to
    * `filter(split(lower(text), '[^a-z]+'), t -> t <> '')` (WordNgramsSpec);
    * every lambda using it registers GraftFunctions first. */
  private val tokenizeExpr = "word_ngrams(text, 1, false)"

  /** First two md5 hex digits as 0..255 — same digit math on both engines. */
  private def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** Deterministic ~10% sample: hash the key, keep bucket < 26 of 256.
    * Reproducible across runs, engines, and cluster sizes (no RNG, no
    * seed-per-partition state); the predicate is pure column math, so at
    * 100 TB it rides the scan (no shuffle, no sample() skew).
    */
  private val sampleHash = Q(
    "sample_hash",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bucket", expr(md5Byte("CAST(doc_id AS STRING)")).cast("long"))
        .where(col("bucket") < 26)
        .select(col("doc_id"), col("bucket")),
    Some(s"""SELECT doc_id, CAST(${md5Byte("CAST(doc_id AS VARCHAR)")} AS BIGINT) AS bucket
             FROM documents
             WHERE ${md5Byte("CAST(doc_id AS VARCHAR)")} < 26"""))

  /** PII scrubbing. The synthetic corpus is clean, so PII is INJECTED
    * deterministically from doc_id (an email + a phone per row) before
    * redaction — the scrub regexes are exercised positively on every row.
    * Redaction is regexp_replace column math: one codegen'd pass, no UDF;
    * counts are asserted alongside so a silently non-matching pattern
    * cannot pass the oracle.
    */
  private val textPiiScrub = Q(
    "text_pii_scrub",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("dirty", concat(
          substring(col("text"), 1, 40),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" end")))
        .select(
          col("doc_id"),
          regexp_count(col("dirty"), lit("[a-z0-9]+@[a-z.]+[a-z]"))
            .cast("long").as("n_emails"),
          regexp_count(col("dirty"), lit("[+]1-555-[0-9]{4}"))
            .cast("long").as("n_phones"),
          substring(
            regexp_replace(
              regexp_replace(col("dirty"), "[a-z0-9]+@[a-z.]+[a-z]", "<EMAIL>"),
              "[+]1-555-[0-9]{4}", "<PHONE>"),
            1, 80).as("scrubbed")),
    Some("""SELECT doc_id,
            CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z.]+[a-z]')) AS BIGINT)
              AS n_emails,
            CAST(len(regexp_extract_all(dirty, '[+]1-555-[0-9]{4}')) AS BIGINT)
              AS n_phones,
            substr(regexp_replace(
              regexp_replace(dirty, '[a-z0-9]+@[a-z.]+[a-z]', '<EMAIL>', 'g'),
              '[+]1-555-[0-9]{4}', '<PHONE>', 'g'), 1, 80) AS scrubbed
            FROM (SELECT doc_id,
                    substr(text, 1, 40) || ' contact user' ||
                    CAST(doc_id AS VARCHAR) || '@mail.example.com or +1-555-' ||
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end'
                    AS dirty
                  FROM documents)"""))

  /** Edit-distance verification over the LSH candidate pairs — the third
    * verifier (after Jaccard and embedding cosine) on the same
    * generate-then-verify scaffold: candidates from banding, Levenshtein
    * on a fixed 100-char prefix (bounded O(100²) per pair, independent of
    * document length) joined on by doc_id. Fan-out = candidate list.
    */
  private val textEditDistance = Q(
    "text_edit_distance",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val heads = docs.select(col("doc_id"), substring(col("text"), 1, 100).as("head"))
      val joined = graft.dedup.CandidateArtifacts.pairs(s, dir)
        .join(heads.select(col("doc_id").as("a"), col("head").as("ha")), "a")
        .join(heads.select(col("doc_id").as("b"), col("head").as("hb")), "b")
      // The joined pair list is BYTES-small but CPU-heavy (O(len²) DP per
      // row) — AQE coalesces it to one partition by size and serializes
      // the whole DP pass. Spread it first; and near-dup prefixes are
      // usually identical, so equality short-circuits most rows to 0
      // without running the DP at all.
      Tables.spread(joined)
        .select(col("a"), col("b"),
          when(col("ha") === col("hb"), lit(0L))
            .otherwise(levenshtein(col("ha"), col("hb")).cast("long")).as("dist"),
          greatest(length(col("ha")), length(col("hb"))).cast("long").as("max_len"))
    },
    Some(s"""WITH ${graft.dedup.DedupQueries.candPairsOracleCte},
             heads AS (SELECT doc_id, substr(text, 1, 100) AS head FROM documents)
             SELECT c.a, c.b,
               CAST(CASE WHEN x.head = y.head THEN 0
                    ELSE levenshtein(x.head, y.head) END AS BIGINT) AS dist,
               CAST(greatest(length(x.head), length(y.head)) AS BIGINT) AS max_len
             FROM cand c
             JOIN heads x ON x.doc_id = c.a
             JOIN heads y ON y.doc_id = c.b"""))

  /** Fixed-budget sequence packing: stream each shard's documents in
    * doc_id order, accumulate token counts, and assign every document to
    * the 2048-token context-window bin its running offset lands in. The
    * cumulative window runs PER SHARD (source), so at 100 TB each
    * partition packs independently — no global sort, no single-reducer
    * stream; shard count scales with the corpus.
    */
  private val packSequences = Q(
    "pack_sequences",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .withColumn("n_tok", size(expr(tokenizeExpr)).cast("long"))
        .withColumn("offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tok"),
          (col("offset") % 2048).as("bin_offset"),
          (col("offset") / 2048).cast("long").as("bin"))
    },
    Some("""SELECT doc_id, source, n_tok,
            "offset" % 2048 AS bin_offset,
            "offset" // 2048 AS bin
            FROM (SELECT doc_id, source, n_tok,
                    -- DuckDB sum() yields HUGEINT; pin to BIGINT for the hash
                    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                      AS "offset"
                  FROM (SELECT doc_id, source,
                          CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '')) AS BIGINT) AS n_tok
                        FROM documents))"""))

  /** Corpus vocabulary: top 200 tokens by frequency. Counts partial-agg
    * map-side; the top-k is sort+limit (TakeOrderedAndProject — per
    * partition partial top-k), NOT a global rank window, and the rank is
    * computed over the 200 survivors.
    */
  private val vocabTopk = Q(
    "vocab_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // session-shared vocabulary artifact (TextArtifacts)
      val counts = TextArtifacts.vocab(s, dir)
        .select(col("token"), col("freq").as("cnt"))
      val top = counts.orderBy(col("cnt").desc, col("token")).limit(200)
      val w = Window.orderBy(col("cnt").desc, col("token"))
      top.withColumn("rk", row_number().over(w).cast("long"))
    },
    Some("""SELECT token, cnt, rk
            FROM (SELECT token, cnt,
                    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rk
                  FROM (SELECT token, CAST(count(*) AS BIGINT) AS cnt
                        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
                              FROM documents)
                        WHERE token <> '' GROUP BY token))
            WHERE rk <= 200"""))

  /** Stratified sampling: a fixed-size, reproducible subset PER STRATUM
    * ((lang, source) cell) — the balanced-eval-set / per-domain-cap op.
    * Rank within each stratum by md5(doc_id) (a deterministic uniform
    * order, so the "first 20" are a uniform draw), keep 20. The window is
    * partitioned by the stratum key, so at 100 TB every cell ranks
    * independently — no global sort, parallelism = number of strata.
    */
  private val sampleStratified = Q(
    "sample_stratified",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 20)
        .select(col("doc_id"), col("lang"), col("source"), col("rk"))
    },
    Some("""SELECT doc_id, lang, source, rk
            FROM (SELECT doc_id, lang, source,
                    CAST(row_number() OVER (PARTITION BY lang, source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
                  FROM documents)
            WHERE rk <= 20"""))

  /** Reservoir-equivalent deterministic sampling — the k-bounded
    * Aggregator upgrade of [[sampleStratified]]'s window: keep the 10
    * smallest-md5-hash docs per (lang, source) stratum via TopKByValue
    * on the negated hash. Same uniform-draw semantics (a bottom-k by a
    * uniform deterministic hash IS a reservoir sample, reproducibly),
    * different 100 TB shape: the window form hash-partitions and SORTS
    * every stratum's full membership to discard all but 20; this form
    * folds map-side into a ≤10-row buffer per stratum per partition, so
    * the exchange carries k·strata·partitions rows — independent of
    * corpus size. Hash ties (16-bit space) break by doc_id on both
    * engines (the Aggregator's (value DESC, id ASC) total order = the
    * oracle window's (h ASC, doc_id ASC)).
    */
  private val sampleReservoir = Q(
    "sample_reservoir",
    (s, dir) => {
      val tk = udaf(new graft.functions.TopKByValue(10),
        graft.functions.TopKByValue.inputEncoder)
      Tables.documents(s, dir)
        .withColumn("h", expr(graft.queries.PortableHash.md5Hex4("CAST(doc_id AS STRING)")).cast("long"))
        .groupBy(col("lang"), col("source"))
        .agg(tk((-col("h")).cast("double"), col("doc_id")).as("top"))
        .select(col("lang"), col("source"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("lang"), col("source"),
          (col("pos") + 1).cast("long").as("rk"),
          col("e._2").as("doc_id"),
          (-col("e._1")).cast("long").as("h"))
    },
    Some(s"""SELECT lang, source, rk, doc_id, h
            FROM (SELECT lang, source, doc_id, h,
                    CAST(row_number() OVER (PARTITION BY lang, source
                      ORDER BY h, doc_id) AS BIGINT) AS rk
                  FROM (SELECT lang, source, doc_id,
                          CAST(${graft.queries.PortableHash.md5Hex4("CAST(doc_id AS VARCHAR)")} AS BIGINT)
                            AS h
                        FROM documents))
            WHERE rk <= 10"""))

  /** Train/test contamination check: which corpus documents share word
    * 5-grams with a benchmark (eval) set. The benchmark here is a
    * deterministic fixed-size stand-in — the 100 docs with the smallest
    * md5(doc_id) (`TakeOrderedAndProject`, a partial top-k) — because real
    * eval sets are FIXED SIZE while the corpus grows; that is what makes
    * the broadcast of the benchmark gram set legitimate at 100 TB (bounded
    * by the benchmark, not the corpus). The corpus side explodes distinct
    * grams and probes the broadcast set map-side, so only hits reach the
    * per-doc aggregate; at even larger benchmark sizes the
    * `bloom_might_contain` native expression (see
    * [[graft.queries.BloomPrune]]) pre-filters the explode the same way.
    */
  private val contaminationCheck = Q(
    "contamination_check",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      // checkpoint: the gram table feeds BOTH the benchmark side and the
      // corpus side — one materialized pass instead of two. It also keeps
      // InferFiltersFromGenerate's size(grams)>0 pruning predicate above
      // the repartition: without the cut, that inferred filter inlines the
      // whole gram computation below the round-robin exchange, onto the
      // raw single-file scan — the entire corpus gram pass on ONE core,
      // ~3x per row (measured 33 s vs 2 s at sf0.1 with the interpreted
      // chain; word_ngrams is the native one-pass replacement).
      val grams = Tables.spread(docs.select("doc_id", "text"))
        .select(col("doc_id"),
          expr("word_ngrams(text, 5, true)").as("grams"))
        .localCheckpoint(eager = true)
      val benchIds = docs
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(100)
        .select(col("doc_id"))
      val benchGrams = grams.join(broadcast(benchIds), "doc_id")
        .select(explode(col("grams")).as("gram")).distinct()
      val corpus = grams.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
          explode(col("grams")).as("gram"))
      corpus.join(broadcast(benchGrams), "gram")
        .groupBy(col("doc_id"), col("n_grams"))
        .agg(count(lit(1)).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_grams"), 4)
            .as("contamination"))
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  t -> t <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                CASE WHEN len(toks) < 5 THEN []
                ELSE list_distinct(list_transform(range(1, greatest(len(toks) - 3, 1)),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                                 toks[i+3], toks[i+4]))) END AS grams
              FROM toks),
            bench_ids AS (
              SELECT doc_id FROM documents
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100),
            bench AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g
              WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
            corpus AS (
              SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                unnest(grams) AS gram
              FROM g WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids))
            SELECT c.doc_id, c.n_grams, CAST(count(*) AS BIGINT) AS n_hit,
              round(CAST(count(*) AS DOUBLE) / c.n_grams, 4) AS contamination
            FROM corpus c JOIN bench b ON b.gram = c.gram
            GROUP BY c.doc_id, c.n_grams"""))

  /** Fuzzy (near-duplicate) decontamination — the MinHash companion to
    * `contamination_check`'s exact n-gram overlap: flag corpus documents
    * that share any LSH band (same band position, same band hash) with a
    * benchmark document, i.e. are likely near-duplicates of eval data
    * even after light edits that break exact n-gram matching. Scale
    * shape: signatures are computed ONCE (checkpointed — they feed both
    * the benchmark and corpus sides); the benchmark is fixed-size (the
    * md5-order top-100 rule), so its band set broadcasts and corpus rows
    * probe it map-side — only actual hits reach the per-doc aggregate.
    */
  private val contaminationFuzzy = Q(
    "contamination_fuzzy",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // session-shared checkpointed signatures (already materialized —
      // no per-query localCheckpoint needed)
      val sig = graft.dedup.CandidateArtifacts.signatures(s, dir).drop("mh")
      val benchIds = docs
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(100)
        .select(col("doc_id"))
      val long = graft.dedup.DedupQueries.stackBands(sig)
      val bench = long.join(broadcast(benchIds), "doc_id")
        .select(col("band_no"), col("band_hash"), col("doc_id").as("bench_id"))
        .distinct()
      long.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
        .join(broadcast(bench), Seq("band_no", "band_hash"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("band_no")).as("n_bands_hit"),
          countDistinct(col("bench_id")).as("n_bench_neighbors"))
    },
    Some {
      val nBands = graft.functions.MinHashSignature.NumHashes /
        graft.functions.MinHashSignature.BandSize
      val bandUnion = (0 until nBands)
        .map(b => s"SELECT doc_id, $b AS band_no, band$b AS band_hash FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH sig AS (${graft.dedup.DedupQueries.minhashOracle}),
          bench_ids AS (
            SELECT doc_id FROM documents
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100),
          long AS ($bandUnion),
          bench AS (
            SELECT DISTINCT band_no, band_hash, doc_id AS bench_id
            FROM long WHERE doc_id IN (SELECT doc_id FROM bench_ids)),
          corpus AS (
            SELECT doc_id, band_no, band_hash FROM long
            WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids))
          SELECT c.doc_id,
            CAST(count(DISTINCT c.band_no) AS BIGINT) AS n_bands_hit,
            CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_neighbors
          FROM corpus c
          JOIN bench b ON b.band_no = c.band_no AND b.band_hash = c.band_hash
          GROUP BY c.doc_id"""
    })

  /** Repetition detection (Gopher-style quality rule): the fraction of a
    * document's word bigrams that are duplicates — high values flag
    * boilerplate / machine-generated loops. Pure per-row column math (no
    * join, no shuffle, rides the scan); the flag compares the ROUNDED
    * fraction so the 0.2 boundary is engine-stable.
    */
  private val textRepetition = Q(
    "text_repetition",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(expr(tokenizeExpr)).cast("long").as("n_tok"),
          size(expr("word_ngrams(text, 2, false)")).cast("long").as("n_bigrams"),
          size(expr("word_ngrams(text, 2, true)")).cast("long").as("n_distinct"))
        .withColumn("dup_frac", round(
          when(col("n_bigrams") === 0, lit(0.0))
            .otherwise(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams")),
          4))
        .withColumn("repetitive", (col("dup_frac") > 0.2).cast("long"))
    },
    Some("""SELECT doc_id, n_tok, n_bigrams, n_distinct, dup_frac,
              CAST(dup_frac > 0.2 AS BIGINT) AS repetitive
            FROM (SELECT doc_id, n_tok, n_bigrams, n_distinct,
                    round(CASE WHEN n_bigrams = 0 THEN 0
                          ELSE 1 - CAST(n_distinct AS DOUBLE) / n_bigrams END, 4)
                      AS dup_frac
                  FROM (SELECT doc_id,
                          CAST(len(toks) AS BIGINT) AS n_tok,
                          CAST(len(bigrams) AS BIGINT) AS n_bigrams,
                          CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct
                        FROM (SELECT doc_id, toks,
                                CASE WHEN len(toks) < 2 THEN []
                                ELSE list_transform(range(1, greatest(len(toks), 1)),
                                  i -> concat_ws(' ', toks[i], toks[i+1])) END AS bigrams
                              FROM (SELECT doc_id,
                                      list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                        t -> t <> '') AS toks
                                    FROM documents))))"""))

  /** Domain-mixture rebalancing: deterministic sampling toward an EQUAL
    * per-language mixture at ~50% overall keep rate — the "data mixing"
    * step before tokenization. Per-lang keep thresholds are computed from
    * the lang histogram with pure integer math
    * (`total*256 div (2*n_langs*n_lang)`, capped at 256) so both engines
    * agree exactly; a doc survives iff its md5 bucket clears its lang's
    * threshold. At 100 TB: the histogram is a partial agg over a
    * handful of langs, thresholds broadcast back, and the keep predicate
    * is per-row math — no corpus shuffle anywhere.
    */
  private val sampleDomainMix = Q(
    "sample_domain_mix",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val stats = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      val tot = stats.agg(sum(col("n_lang")).as("total"),
        count(lit(1)).as("n_langs"))
      val thresholds = stats.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(lit(256L), expr("(total * 256) div (2 * n_langs * n_lang)"))
            .as("thr"))
      docs
        .withColumn("bucket", expr(md5Byte("CAST(doc_id AS STRING)")).cast("long"))
        .join(broadcast(thresholds), "lang")
        .where(col("bucket") < col("thr"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("thr"))
    },
    Some(s"""WITH stats AS (
               SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
               FROM documents GROUP BY lang),
             tot AS (
               SELECT CAST(sum(n_lang) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_langs
               FROM stats),
             thr AS (
               SELECT lang,
                 least(CAST(256 AS BIGINT),
                   (total * 256) // (2 * n_langs * n_lang)) AS thr
               FROM stats, tot)
             SELECT d.doc_id, d.lang,
               CAST(${md5Byte("CAST(d.doc_id AS VARCHAR)")} AS BIGINT) AS bucket,
               t.thr
             FROM documents d JOIN thr t USING (lang)
             WHERE ${md5Byte("CAST(d.doc_id AS VARCHAR)")} < t.thr"""))

  /** Temperature-flattened language mixture (the multilingual resampling
    * rule of mBERT/XLM-R/mT5): sample langs proportional to n_l^(1/T)
    * with T=2, upweighting tail languages relative to their raw share.
    * α = 1/2 makes the weight `sqrt(n_l)` — correctly-rounded IEEE on
    * both engines (general `pow` is NOT, so T is fixed at 2 rather than
    * configurable) — and it is quantized to integer micro-units
    * immediately, so the weight total, per-lang target counts
    * (budget = half the corpus), and 16-bit keep thresholds are all
    * exact BIGINT arithmetic. At 100 TB: lang histogram = partial agg
    * over ~hundreds of langs, thresholds broadcast, keep predicate is
    * per-row md5 math riding the scan — the sample_domain_mix shape.
    */
  private val sampleTemperature = Q(
    "sample_temperature",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val stats = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
        .withColumn("q", expr(
          "CAST(round(sqrt(CAST(n_lang AS DOUBLE)) * 1000000.0, 0) AS BIGINT)"))
      val tot = stats.agg(sum(col("n_lang")).as("total"), sum(col("q")).as("total_q"))
      val thresholds = stats.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(lit(65536L),
            expr("(65536 * (((total div 2) * q) div total_q)) div n_lang"))
            .as("thr"))
      docs
        .withColumn("bucket", expr(graft.queries.PortableHash.md5Hex4("CAST(doc_id AS STRING)")).cast("long"))
        .join(broadcast(thresholds), "lang")
        .select(col("doc_id"), col("lang"), col("bucket"), col("thr"),
          (col("bucket") < col("thr")).as("keep"))
    },
    Some(s"""WITH stats AS (
               SELECT lang, CAST(count(*) AS BIGINT) AS n_lang,
                 CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS q
               FROM documents GROUP BY lang),
             tot AS (
               SELECT CAST(sum(n_lang) AS BIGINT) AS total,
                 CAST(sum(q) AS BIGINT) AS total_q
               FROM stats),
             thr AS (
               SELECT lang,
                 least(CAST(65536 AS BIGINT),
                   (65536 * (((total // 2) * q) // total_q)) // n_lang) AS thr
               FROM stats, tot)
             SELECT d.doc_id, d.lang,
               CAST(${graft.queries.PortableHash.md5Hex4("CAST(d.doc_id AS VARCHAR)")} AS BIGINT) AS bucket,
               t.thr,
               ${graft.queries.PortableHash.md5Hex4("CAST(d.doc_id AS VARCHAR)")} < t.thr AS keep
             FROM documents d JOIN thr t USING (lang)"""))

  /** DSIR-style importance resampling (Xie et al. 2023): fit a unigram
    * model on a small benchmark-like target set and one on the rest of
    * the corpus, score every non-benchmark document by its summed token
    * log-likelihood ratio (add-one smoothing over the shared vocabulary),
    * and keep the top-50 — selecting the data most "like" the target
    * distribution. Scale shape: the benchmark is FIXED-SIZE (the
    * contamination_check rule — top-100 by md5 order, a bounded
    * TakeOrdered), so its broadcast never grows with the corpus; the two
    * models come out of ONE token aggregate (conditional sums), which is
    * vocabulary-sized and therefore NOT hint-broadcast (the tfidf rule);
    * totals enter as a one-row cross join; per-token log-ratios are
    * quantized to integer micro-nats per ROW so per-doc sums are
    * order-free BIGINT math; and the top-50 rides a TakeOrderedAndProject
    * on the BIGINT sum, never a global window.
    */
  private val sampleImportance = Q(
    "sample_importance",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      // Everything downstream — both model fits AND the per-doc scoring —
      // is a function of (doc, token) COUNTS: exactly the session-shared
      // TextArtifacts.wordCounts checkpoint (this query's private
      // pre-aggregate was the prototype of that artifact).
      val pre = TextArtifacts.wordCounts(s, dir)
      val benchIds = docs
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(100)
        .select(col("doc_id"), lit(1L).as("is_bench"))
      val flagged = pre.join(broadcast(benchIds), Seq("doc_id"), "left")
        .withColumn("is_bench", coalesce(col("is_bench"), lit(0L)))
      val freq = flagged.groupBy(col("token"))
        .agg(sum(col("is_bench") * col("cnt")).as("ct"),
          sum((lit(1L) - col("is_bench")) * col("cnt")).as("cs"))
      val tot = freq.agg(count(lit(1)).as("v"), sum(col("ct")).as("t"),
        sum(col("cs")).as("ss"))
      // The log-ratio is a function of the TOKEN alone, so compute it once
      // per vocabulary entry (freq is already vocab-sized) and join it to
      // the per-doc (token, cnt) pre-aggregate — never to raw occurrences
      // (the text_novelty lesson). Σ_occurrences q(tok) ≡ Σ_tokens cnt·q.
      val q = freq.crossJoin(broadcast(tot))
        .withColumn("q", expr(
          """CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(t + v AS DOUBLE))
                         / (CAST(cs + 1 AS DOUBLE) / CAST(ss + v AS DOUBLE)))
                 * 1000000.0, 0) AS BIGINT)"""))
        .select(col("token"), col("q"))
      val totals = flagged.where(col("is_bench") === 0L)
        .join(q, "token")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tok"), sum(col("cnt") * col("q")).as("sq"))
      totals.orderBy(col("sq").desc, col("doc_id")).limit(50)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("sq").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("n_tok"),
          round(col("sq").cast("double") / 1000000.0, 4).as("logratio"), col("rk"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS token
              FROM documents),
            bench AS (
              SELECT doc_id FROM (
                SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents ORDER BY h, doc_id LIMIT 100)),
            flagged AS (
              SELECT t.doc_id, t.token,
                CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS is_bench
              FROM toks t LEFT JOIN bench b ON b.doc_id = t.doc_id),
            freq AS (
              SELECT token, CAST(sum(is_bench) AS BIGINT) AS ct,
                CAST(sum(1 - is_bench) AS BIGINT) AS cs
              FROM flagged GROUP BY token),
            tot AS (
              SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(ct) AS BIGINT) AS t,
                CAST(sum(cs) AS BIGINT) AS ss
              FROM freq),
            scored AS (
              SELECT doc_id,
                CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(t + v AS DOUBLE))
                            / (CAST(cs + 1 AS DOUBLE) / CAST(ss + v AS DOUBLE)))
                    * 1000000.0, 0) AS BIGINT) AS q
              FROM flagged JOIN freq USING (token), tot
              WHERE is_bench = 0),
            totals AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                CAST(sum(q) AS BIGINT) AS sq
              FROM scored GROUP BY doc_id)
            SELECT doc_id, n_tok,
              round(CAST(sq AS DOUBLE) / 1000000.0, 4) AS logratio,
              CAST(row_number() OVER (ORDER BY sq DESC, doc_id) AS BIGINT) AS rk
            FROM totals ORDER BY sq DESC, doc_id LIMIT 50"""))

  /** Line-level exact dedup (the CCNet/RefinedWeb pass that strips
    * boilerplate shared across pages): split every document into
    * fixed-width token chunks (this corpus has no newlines, so 4-token
    * windows stand in for lines), count each chunk's document frequency
    * corpus-wide, drop chunks appearing in ≥ 3 documents, and reassemble
    * the surviving text in position order.
    *
    * Scale shape: chunk TEXT never shuffles at all — each doc keeps ONE
    * row holding its chunk array + `xxhash64` hash array (checkpointed:
    * one tokenize pass, output-shaped), the corpus-wide df count explodes
    * only the 8-byte hashes, and the positions-to-drop per doc (bounded
    * by actual duplication, tiny — duplication is the exception) join
    * back broadcast so the cleaned text is assembled IN PLACE by an
    * indexed array filter at the scan partition. The earlier shape
    * re-shuffled every chunk string through a doc_id-keyed groupBy to
    * reassemble; this one ships integers and assembles locally. Same
    * collision stance as dedup_substring: the exact-text DuckDB oracle
    * would flag a 64-bit collision at test scale. Docs shorter than one
    * chunk have nothing to dedup and are absent by construction.
    */
  private val dedupLines = Q(
    "dedup_lines",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val ga = Tables.spread(docs.select("doc_id", "text"))
        .withColumn("toks", expr(tokenizeExpr))
        .select(col("doc_id"), expr(
          """CASE WHEN size(toks) < 4 THEN array()
             ELSE transform(sequence(1, size(toks) div 4),
               i -> concat_ws(' ', slice(toks, (i-1)*4+1, 4))) END""").as("chunks"))
        .where(size(col("chunks")) > 0)
        .withColumn("chs", expr("transform(chunks, c -> xxhash64(c))"))
        .localCheckpoint(eager = true) // one row per doc; feeds df-count + assembly
      val dup = ga.select(col("doc_id"), explode(col("chs")).as("ch"))
        .groupBy(col("ch"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df") >= 3).select(col("ch"))
      val dupPos = ga.select(col("doc_id"), posexplode(col("chs")).as(Seq("pos", "ch")))
        .join(dup, "ch")
        .groupBy(col("doc_id")).agg(collect_list(col("pos")).as("dpos"))
      ga.join(dupPos, Seq("doc_id"), "left")
        .withColumn("dpos", coalesce(col("dpos"), expr("CAST(array() AS ARRAY<INT>)")))
        .select(col("doc_id"),
          size(col("chunks")).cast("long").as("n_chunks"),
          (size(col("chunks")) - size(col("dpos"))).cast("long").as("n_kept"),
          size(col("dpos")).cast("long").as("n_dropped"),
          expr("concat_ws(' ', filter(chunks, (c, i) -> NOT array_contains(dpos, i)))")
            .as("clean_text"))
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  t -> t <> '') AS toks
              FROM documents),
            cl AS (
              SELECT doc_id,
                CASE WHEN len(toks) < 4 THEN []
                ELSE list_transform(range(1, len(toks) // 4 + 1),
                  i -> array_to_string(list_slice(toks, (i-1)*4+1, i*4), ' ')) END AS cs
              FROM toks),
            flat AS (
              SELECT doc_id, generate_subscripts(cs, 1) AS pos, unnest(cs) AS chunk
              FROM cl),
            dup AS (
              SELECT chunk FROM flat GROUP BY chunk
              HAVING count(DISTINCT doc_id) >= 3),
            kept AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                string_agg(chunk, ' ' ORDER BY pos) AS clean_text
              FROM flat WHERE chunk NOT IN (SELECT chunk FROM dup)
              GROUP BY doc_id),
            tot AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
              FROM flat GROUP BY doc_id)
            SELECT t.doc_id, t.n_chunks,
              coalesce(k.n_kept, 0) AS n_kept,
              t.n_chunks - coalesce(k.n_kept, 0) AS n_dropped,
              coalesce(k.clean_text, '') AS clean_text
            FROM tot t LEFT JOIN kept k USING (doc_id)"""))

  /** Deterministic global shuffle + sharding — the last step before the
    * tokenizer: give every document a pseudo-random but REPRODUCIBLE
    * position (md5 order, no RNG state), bucketed into 16 output shards.
    * Within-shard positions come from a window PARTITIONED by shard, so at
    * 100 TB each shard ranks independently (parallelism = shard count,
    * shards ≫ cores in production) — there is no global sort anywhere,
    * yet the concatenation of shards in (shard, pos) order is a uniform
    * permutation of the corpus: exactly what sequential training readers
    * need.
    */
  private val shardShuffle = Q(
    "shard_shuffle",
    (s, dir) => {
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("shard",
          expr("(instr('0123456789abcdef', substr(h, 32, 1)) - 1) % 16").cast("long"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    },
    Some("""SELECT doc_id, shard, pos
            FROM (SELECT doc_id, shard,
                    CAST(row_number() OVER (PARTITION BY shard
                      ORDER BY h, doc_id) AS BIGINT) AS pos
                  FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                          CAST((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1) % 16 AS BIGINT) AS shard
                        FROM documents))"""))

  /** Training-shard delivery manifest — the record a dataloader consumes
    * per shard: document/token/byte volumes plus an order-free content
    * checksum (bit_xor of a 32-bit md5-derived row hash), so a re-run,
    * a replica, or a post-transfer shard can be integrity-checked cell
    * by cell without re-reading payloads. Same shard rule as
    * [[shardShuffle]] (last md5 hex digit % 16). Shape: ONE map-side
    * combined aggregate into 16 rows; bit_xor and the sums are
    * associative/commutative, so the checksum is identical under any
    * partitioning or merge order — the mergeable-manifest property that
    * lets incremental loads xor their delta in.
    */
  private val shardManifest = Q(
    "shard_manifest",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val hex8 = (1 to 8).map { i =>
        val pow = 1L << (4 * (8 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * ${pow}L"
      }.mkString("(", " + ", ")")
      Tables.documents(s, dir)
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("shard",
          expr("(instr('0123456789abcdef', substr(h, 32, 1)) - 1) % 16").cast("long"))
        .withColumn("rh", expr(hex8))
        .withColumn("n_tok", size(expr(tokenizeExpr)).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          sum(col("n_chars")).as("n_bytes"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
          expr("bit_xor(rh)").as("checksum"))
    },
    Some {
      val hex8 = (1 to 8).map { i =>
        val pow = 1L << (4 * (8 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * $pow"
      }.mkString("(", " + ", ")")
      s"""SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tok) AS BIGINT) AS n_tokens,
            CAST(sum(n_chars) AS BIGINT) AS n_bytes,
            min(doc_id) AS min_doc, max(doc_id) AS max_doc,
            CAST(bit_xor(CAST($hex8 AS BIGINT)) AS BIGINT) AS checksum
          FROM (SELECT doc_id, n_chars, h,
                  CAST((instr('0123456789abcdef', substr(h, 32, 1)) - 1) % 16
                    AS BIGINT) AS shard,
                  CAST(len(list_filter(string_split_regex(lower(text),
                    '[^a-z]+'), t -> t <> '')) AS BIGINT) AS n_tok
                FROM (SELECT doc_id, n_chars, text,
                        md5(CAST(doc_id AS VARCHAR)) AS h
                      FROM documents))
          GROUP BY shard"""
    })

  /** Classifier-based quality filtering — the "does this look like a
    * reference page" linear model gate (the fastText-style filter LLaMA /
    * CCNet pipelines run after rule-based cleaning). Inference over
    * hashed unigram features: token → md5 bucket (256 features), fixed
    * per-bucket weight, logit = Σ w[bucket] / n_tokens, keep = logit > 0.
    *
    * The weight vector here is a deterministic stand-in (Knuth
    * multiplicative scramble of the bucket id → milli-units in
    * [-1000, 1000]) documented as swappable for trained coefficients —
    * what the engine contributes is the INFERENCE shape: weights live in
    * the expression (no model-table join, nothing broadcast), features
    * hash per token on the explode, and the per-doc score is one partial
    * aggregate. At 100 TB this is scan → explode → agg with map-side
    * combine; no shuffle carries text.
    *
    * Determinism: weights and counts are exact integers; the score is an
    * integer micro-logit via floor(exact/exact) — floor is safe because
    * the quotient is either exactly integral (then the double division is
    * exact) or at least 1/n_tok ≈ 1e-4 away from any integer, far above
    * double error. A round(…, 4) here hash-failed on a .00005 boundary
    * (BigDecimal HALF_UP vs binary-double rounding).
    */
  private val qualityLogreg = Q(
    "quality_logreg",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val bucket = md5Byte("term")
      // per-occurrence weight summed per doc ≡ cnt-weighted sum over the
      // shared (doc, token, cnt) artifact
      TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("term"), col("cnt"))
        .withColumn("w_milli",
          expr(s"CAST(($bucket) AS BIGINT) * 2654435761 % 2001 - 1000"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tok"),
          sum(col("cnt") * col("w_milli")).as("sw"))
        .select(col("doc_id"), col("n_tok"),
          expr("CAST(floor(CAST(sw AS DOUBLE) * 1000.0 / CAST(n_tok AS DOUBLE)) AS BIGINT)")
            .as("logit_micro"),
          (col("sw") > 0L).as("keep"))
    },
    Some(s"""WITH toks AS (
               SELECT doc_id, unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS term
               FROM documents),
             feat AS (
               SELECT doc_id,
                 CAST(${md5Byte("term")} AS BIGINT) * 2654435761 % 2001 - 1000
                   AS w_milli
               FROM toks)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
               CAST(floor(CAST(sum(w_milli) AS DOUBLE) * 1000.0
                 / CAST(count(*) AS DOUBLE)) AS BIGINT) AS logit_micro,
               sum(w_milli) > 0 AS keep
             FROM feat GROUP BY doc_id"""))

  /** RAG-style document chunking: fixed 200-char windows on a 150-char
    * stride (25% overlap), each chunk carrying its offset, length, and
    * md5 fingerprint — the retrieval-index preprocessing shape (distinct
    * from pack_sequences, which BINS whole docs; this SPLITS docs with
    * overlap). Scale: pure per-row generate — `sequence` fan-out is
    * ⌈n_chars/150⌉ per doc, the substring+md5 ride the explode, and
    * nothing shuffles (chunks land partition-local, exactly what a
    * chunk-embed-index pipeline wants before its embed stage).
    */
  private val docChunking = Q(
    "doc_chunking",
    (s, dir) =>
      Tables.documents(s, dir)
        .where(col("n_chars") > 0L)
        .select(col("doc_id"),
          explode(expr("sequence(1L, CAST(n_chars AS BIGINT), 150L)")).as("start"),
          col("text"))
        .select(col("doc_id"),
          expr("(start - 1L) div 150L").as("chunk_no"),
          col("start"),
          length(expr("substring(text, CAST(start AS INT), 200)")).cast("long")
            .as("chunk_len"),
          md5(expr("substring(text, CAST(start AS INT), 200)")).as("chunk_md5")),
    Some("""SELECT doc_id, (start - 1) // 150 AS chunk_no, start,
              CAST(len(substr(text, CAST(start AS INTEGER), 200)) AS BIGINT)
                AS chunk_len,
              md5(substr(text, CAST(start AS INTEGER), 200)) AS chunk_md5
            FROM (SELECT doc_id, text,
                    unnest(generate_series(1, CAST(n_chars AS BIGINT), 150))
                      AS start
                  FROM documents WHERE n_chars > 0)"""))

  /** Gopher rule gate (Rae et al. Table A1, the subset our synthetic
    * corpus exercises): word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, minimum distinct stop words, and
    * alpha-word ratio over raw whitespace tokens — the composite
    * rule-based filter that runs BEFORE any classifier or dedup pass.
    * Every ratio check is cross-multiplied into pure integer comparisons
    * (3·n ≤ Σlen ≤ 10·n, 10·sym ≤ n, 10·alpha ≥ 8·ws), so there is no
    * floating point anywhere — the strongest cross-engine determinism
    * class this engine has. Per-row codegen math; rides the scan.
    */
  private val qualityGopherRules = Q(
    "quality_gopher_rules",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("toks", expr(tokenizeExpr))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("sum_len", expr(
          "aggregate(toks, CAST(0 AS BIGINT), (a, t) -> a + length(t))"))
        .withColumn("n_sym", regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long"))
        .withColumn("n_stop", expr(
          // distinct-stop-word count as explicit contains (intersect
          // dedup semantics differ between engines)
          """CAST(IF(array_contains(toks, 'the'), 1, 0)
               + IF(array_contains(toks, 'a'), 1, 0)
               + IF(array_contains(toks, 'of'), 1, 0)
               + IF(array_contains(toks, 'and'), 1, 0)
               + IF(array_contains(toks, 'to'), 1, 0) AS BIGINT)"""))
        .withColumn("ws", expr("filter(split(text, '\\\\s+'), t -> t <> '')"))
        .withColumn("n_ws", size(col("ws")).cast("long"))
        .withColumn("n_alpha", expr(
          "CAST(size(filter(ws, t -> t rlike '[A-Za-z]')) AS BIGINT)"))
        .select(col("doc_id"), col("n_tok"), col("sum_len"),
          (col("n_tok") >= 50L && col("n_tok") <= 100000L).as("ok_count"),
          (lit(3L) * col("n_tok") <= col("sum_len") &&
            col("sum_len") <= lit(10L) * col("n_tok")).as("ok_wordlen"),
          (lit(10L) * col("n_sym") <= col("n_tok")).as("ok_symbols"),
          (col("n_stop") >= 2L).as("ok_stopwords"),
          (lit(10L) * col("n_alpha") >= lit(8L) * col("n_ws")).as("ok_alpha"))
        .withColumn("pass",
          col("ok_count") && col("ok_wordlen") && col("ok_symbols") &&
            col("ok_stopwords") && col("ok_alpha"))
    },
    Some("""SELECT doc_id, n_tok, sum_len,
              (n_tok >= 50 AND n_tok <= 100000) AS ok_count,
              (3 * n_tok <= sum_len AND sum_len <= 10 * n_tok) AS ok_wordlen,
              (10 * n_sym <= n_tok) AS ok_symbols,
              (n_stop >= 2) AS ok_stopwords,
              (10 * n_alpha >= 8 * n_ws) AS ok_alpha,
              (n_tok >= 50 AND n_tok <= 100000
                AND 3 * n_tok <= sum_len AND sum_len <= 10 * n_tok
                AND 10 * n_sym <= n_tok AND n_stop >= 2
                AND 10 * n_alpha >= 8 * n_ws) AS pass
            FROM (SELECT doc_id,
                    CAST(len(toks) AS BIGINT) AS n_tok,
                    CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT)
                      AS sum_len,
                    CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
                      AS n_sym,
                    CAST(CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END
                       + CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END
                      AS BIGINT) AS n_stop,
                    CAST(len(ws) AS BIGINT) AS n_ws,
                    CAST(len(list_filter(ws, t -> regexp_matches(t, '[A-Za-z]')))
                      AS BIGINT) AS n_alpha
                  FROM (SELECT doc_id, text,
                          list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '') AS toks,
                          list_filter(string_split_regex(text, '\s+'),
                            t -> t <> '') AS ws
                        FROM documents))"""))

  /** Code-vs-prose detection — the routing signal LLM data pipelines use
    * to send documents to the right processing path (code gets different
    * dedup/quality rules than prose) and to measure corpus code share.
    * Two ppm-quantized integer signals, thresholded:
    *
    *   sym_ppm    — code-punctuation density: `;{}()=<>[]` chars / n_chars
    *   indent_ppm — structurally-indented lines (tab or ≥2 spaces) / lines
    *
    * Pure per-row math riding the scan (split + filter + regexp, all
    * codegen'd); integer `div` keeps every value exact cross-engine, the
    * verdict is an integer comparison. No shuffle at all.
    */
  private val textCodeDetect = Q(
    "text_code_detect",
    (s, dir) => {
      // the driver corpus is pure lowercase prose (no punctuation, no
      // newlines), so — like text_pii_scrub's injected PII — every 5th
      // doc gets a deterministic code block appended; the detector must
      // flag exactly those and none of the prose
      Tables.documents(s, dir)
        .withColumn("mixed",
          when(col("doc_id") % 5 === 0, concat(
            substring(col("text"), 1, 60),
            lit("\nwhile (i < n) {\n  acc = acc + f[i];\n  i = i + 1;\n}\n")))
          .otherwise(col("text")))
        .withColumn("n_chars_m", length(col("mixed")).cast("long"))
        .withColumn("n_lines",
          size(split(col("mixed"), "\n")).cast("long"))
        .withColumn("n_indent", expr(
          """CAST(size(filter(split(mixed, '\n'),
               l -> l rlike '^(\t| {2,})')) AS BIGINT)"""))
        .withColumn("n_sym", expr(
          """CAST(length(regexp_replace(mixed, '[^;{}()=<>\\[\\]]', ''))
             AS BIGINT)"""))
        .select(col("doc_id"), col("n_lines"), col("n_indent"), col("n_sym"),
          expr("""CASE WHEN n_chars_m = 0 THEN CAST(0 AS BIGINT)
                  ELSE (CAST(1000000 AS BIGINT) * n_sym) div n_chars_m END""")
            .as("sym_ppm"),
          expr("""(CAST(1000000 AS BIGINT) * n_indent) div n_lines""")
            .as("indent_ppm"))
        .withColumn("looks_code",
          col("sym_ppm") > 30000L || col("indent_ppm") > 200000L)
    },
    Some("""WITH mixed AS (
              SELECT doc_id,
                CASE WHEN doc_id % 5 = 0 THEN
                  substr(text, 1, 60) || chr(10) || 'while (i < n) {'
                    || chr(10) || '  acc = acc + f[i];'
                    || chr(10) || '  i = i + 1;' || chr(10) || '}' || chr(10)
                ELSE text END AS m
              FROM documents),
            sig AS (
              SELECT doc_id,
                CAST(length(m) AS BIGINT) AS n_chars_m,
                CAST(len(string_split(m, chr(10))) AS BIGINT) AS n_lines,
                CAST(len(list_filter(string_split(m, chr(10)),
                  l -> regexp_matches(l, '^(\t| {2,})'))) AS BIGINT)
                  AS n_indent,
                CAST(length(regexp_replace(m, '[^;{}()=<>\[\]]', '', 'g'))
                  AS BIGINT) AS n_sym
              FROM mixed)
            SELECT doc_id, n_lines, n_indent, n_sym,
              CASE WHEN n_chars_m = 0 THEN CAST(0 AS BIGINT)
                   ELSE (1000000 * n_sym) // n_chars_m END AS sym_ppm,
              (1000000 * n_indent) // n_lines AS indent_ppm,
              (CASE WHEN n_chars_m = 0 THEN CAST(0 AS BIGINT)
                    ELSE (1000000 * n_sym) // n_chars_m END) > 30000
                OR ((1000000 * n_indent) // n_lines) > 200000 AS looks_code
            FROM sig"""))

  /** Tokenizer-vocabulary coverage curve — the vocab-sizing question
    * ("what OOV rate does a V-entry vocabulary buy?") answered for
    * V ∈ {10, 100, 1000}: the fraction of token OCCURRENCES covered by
    * the top-V tokens. Scale shape: ONE token-frequency aggregate
    * (vocabulary-sized) is checkpointed and feeds every branch; each
    * top-V is a bounded TakeOrdered (never a vocabulary-wide rank
    * window — the topk_users rule), its sum is V rows, and the corpus
    * total enters as a one-row cross join. Coverage is integer ppm.
    */
  private val tokenizerCoverage = Q(
    "tokenizer_coverage",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // the session-shared vocabulary checkpoint feeds all tops + total
      val freq = TextArtifacts.vocab(s, dir)
        .select(col("token"), col("freq").as("cnt"))
      val total = freq.agg(sum(col("cnt")).as("total"))
      val covered = Seq(10, 100, 1000).map { v =>
        freq.orderBy(col("cnt").desc, col("token")).limit(v)
          .agg(count(lit(1)).as("n_vocab"), sum(col("cnt")).as("covered"))
          .select(lit(v.toLong).as("v"), col("n_vocab"), col("covered"))
      }.reduce(_ unionAll _)
      covered.crossJoin(broadcast(total)) // 1-row total — hint like siblings
        .select(col("v"), col("n_vocab"), col("covered"),
          expr("(covered * 1000000) div total").as("coverage_ppm"))
    },
    Some("""WITH freq AS (
              SELECT token, CAST(count(*) AS BIGINT) AS cnt
              FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
                      '[^a-z]+'), t -> t <> '')) AS token FROM documents)
              GROUP BY token),
            tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
            ranked AS (
              SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rn
              FROM freq),
            tops AS (
              SELECT CAST(s.v AS BIGINT) AS v,
                CAST(count(*) AS BIGINT) AS n_vocab,
                CAST(sum(cnt) AS BIGINT) AS covered
              FROM (SELECT 10 AS v UNION ALL SELECT 100 UNION ALL SELECT 1000) s
              JOIN ranked ON ranked.rn <= s.v
              GROUP BY s.v)
            SELECT v, n_vocab, covered,
              CAST(covered * 1000000 // total AS BIGINT) AS coverage_ppm
            FROM tops, tot"""))

  /** Corpus drift monitoring — the shift detector a continuously-crawled
    * training corpus needs: split the corpus into a "reference" and a
    * "new crawl" snapshot (deterministic md5 half-split of doc_id so the
    * oracle reproduces it; production compares yesterday's lake against
    * today's batch) and report, per language, the Jensen-Shannon
    * divergence between their unigram distributions plus vocabulary
    * birth/death counts. JSD is the symmetric, bounded ([0, ln 2]) drift
    * measure data-quality monitors standardize on.
    *
    * Scale shape: ONE (lang, token) aggregate with conditional sums
    * carries both snapshots' counts (vocabulary-sized, never
    * hint-broadcast — the tfidf rule); per-lang totals are a handful of
    * rows joined back broadcast; every per-token JSD contribution is
    * computed row-wise and quantized to integer nano-nats so the per-lang
    * sum is order-free BIGINT math (§7.4.1); no windows, no self-joins.
    */
  private val corpusDrift = Q(
    "corpus_drift",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val tok = Tables.spread(docs.select(col("doc_id"), col("lang"), col("text")))
        .withColumn("is_new",
          (expr(md5Byte("CAST(doc_id AS STRING)")) < 128).cast("long"))
        .select(col("lang"), col("is_new"), explode(expr(tokenizeExpr)).as("token"))
      val counts = tok.groupBy(col("lang"), col("token"))
        .agg(sum(col("is_new")).as("a"), sum(lit(1L) - col("is_new")).as("b"))
      val totals = counts.groupBy(col("lang"))
        .agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
      counts.join(broadcast(totals), "lang")
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
        .groupBy(col("lang"))
        .agg(sum(col("contrib")).as("jsd_nanonat"),
          count(when(col("a") > 0 && col("b") > 0, 1)).as("vocab_shared"),
          count(when(col("a") > 0 && col("b") === 0, 1)).as("vocab_born"),
          count(when(col("a") === 0 && col("b") > 0, 1)).as("vocab_died"),
          max(col("ta")).as("tokens_new"), max(col("tb")).as("tokens_ref"))
    },
    Some {
      val isNew = md5Byte("CAST(doc_id AS VARCHAR)")
      s"""WITH tok AS (
            SELECT lang,
              CASE WHEN $isNew < 128 THEN 1 ELSE 0 END AS is_new,
              unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                t -> t <> '')) AS token
            FROM documents),
          counts AS (
            SELECT lang, token, CAST(sum(is_new) AS BIGINT) AS a,
              CAST(sum(1 - is_new) AS BIGINT) AS b
            FROM tok GROUP BY lang, token),
          totals AS (
            SELECT lang, CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb
            FROM counts GROUP BY lang),
          contribs AS (
            SELECT c.lang, c.a, c.b, t.ta, t.tb,
              CAST(round((
                CASE WHEN c.a = 0 THEN 0.0 ELSE
                  0.5 * (CAST(c.a AS DOUBLE) / CAST(t.ta AS DOUBLE)) *
                  ln((CAST(c.a AS DOUBLE) / CAST(t.ta AS DOUBLE)) /
                     ((CAST(c.a AS DOUBLE) / CAST(t.ta AS DOUBLE) +
                       CAST(c.b AS DOUBLE) / CAST(t.tb AS DOUBLE)) / 2.0)) END +
                CASE WHEN c.b = 0 THEN 0.0 ELSE
                  0.5 * (CAST(c.b AS DOUBLE) / CAST(t.tb AS DOUBLE)) *
                  ln((CAST(c.b AS DOUBLE) / CAST(t.tb AS DOUBLE)) /
                     ((CAST(c.a AS DOUBLE) / CAST(t.ta AS DOUBLE) +
                       CAST(c.b AS DOUBLE) / CAST(t.tb AS DOUBLE)) / 2.0)) END
              ) * 1000000000.0, 0) AS BIGINT) AS contrib
            FROM counts c JOIN totals t USING (lang))
          SELECT lang, CAST(sum(contrib) AS BIGINT) AS jsd_nanonat,
            CAST(count(CASE WHEN a > 0 AND b > 0 THEN 1 END) AS BIGINT) AS vocab_shared,
            CAST(count(CASE WHEN a > 0 AND b = 0 THEN 1 END) AS BIGINT) AS vocab_born,
            CAST(count(CASE WHEN a = 0 AND b > 0 THEN 1 END) AS BIGINT) AS vocab_died,
            CAST(max(ta) AS BIGINT) AS tokens_new,
            CAST(max(tb) AS BIGINT) AS tokens_ref
          FROM contribs
          GROUP BY lang"""
    })

  /** Content-defined chunking (the Rabin/FastCDC storage-dedup shape):
    * chunk boundaries fall where the hash of the trailing 8-char window
    * hits a target residue (here: first-2-md5-hex % 32 = 0, expected
    * chunk ≈ 32 chars) — so an insertion shifts only the chunks it
    * touches, and identical content re-chunks identically anywhere it
    * appears. That boundary STABILITY is what fixed-stride chunking
    * (doc_chunking) lacks and what chunk-store dedup (restic/borg/LLM
    * corpus delta storage) depends on; `chunk_df` is the corpus-wide
    * dedup signal per chunk.
    *
    * This is the pure (clamp-free) CDC variant: each boundary depends
    * only on its local window, so cut detection is per-row array math
    * riding the scan — fully parallel, no sequential scan state.
    * Production adds min/max chunk clamps, which localize the dependence
    * to a bounded forward scan. Scale: one checkpointed chunk pass; the
    * df count and join back are chunk-md5-keyed (uniform hash keys, no
    * skew).
    */
  private val docChunkingCdc = Q(
    "doc_chunking_cdc",
    (s, dir) => {
      val hashHit =
        """((instr('0123456789abcdef',
              substr(md5(substring(text, CAST(i AS INT) - 7, 8)), 1, 1)) - 1) * 16 +
            (instr('0123456789abcdef',
              substr(md5(substring(text, CAST(i AS INT) - 7, 8)), 2, 1)) - 1)) % 32
           = 0"""
      val chunks = Tables.spread(Tables.documents(s, dir)
          .where(col("n_chars") >= 1L).select("doc_id", "text"))
        .withColumn("cuts", expr(
          s"""CASE WHEN length(text) < 8 THEN CAST(array() AS ARRAY<BIGINT>)
              ELSE filter(sequence(CAST(8 AS BIGINT), CAST(length(text) AS BIGINT)),
                i -> $hashHit) END"""))
        .withColumn("bnds", expr(
          """concat(array(CAST(0 AS BIGINT)), cuts,
               IF(size(cuts) > 0 AND element_at(cuts, -1) = CAST(length(text) AS BIGINT),
                  CAST(array() AS ARRAY<BIGINT>),
                  array(CAST(length(text) AS BIGINT))))"""))
        .select(col("doc_id"), col("text"), posexplode(expr(
          """transform(sequence(1, size(bnds) - 1),
               j -> named_struct('st', element_at(bnds, j) + 1,
                                 'en', element_at(bnds, j + 1)))"""))
          .as(Seq("chunk_no", "c")))
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          col("c.st").as("start"),
          (col("c.en") - col("c.st") + 1L).as("chunk_len"),
          md5(expr(
            "substring(text, CAST(c.st AS INT), CAST(c.en - c.st + 1 AS INT))"))
            .as("chunk_md5"))
        .localCheckpoint(eager = true) // df count + output side
      val dfc = chunks.groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("chunk_df"))
      chunks.join(dfc, "chunk_md5")
        .select(col("doc_id"), col("chunk_no"), col("start"), col("chunk_len"),
          col("chunk_md5"), col("chunk_df"))
    },
    Some {
      val hashHit =
        """((instr('0123456789abcdef',
              substr(md5(substr(text, CAST(i - 7 AS INTEGER), 8)), 1, 1)) - 1) * 16 +
            (instr('0123456789abcdef',
              substr(md5(substr(text, CAST(i - 7 AS INTEGER), 8)), 2, 1)) - 1)) % 32
           = 0"""
      s"""WITH d AS (SELECT doc_id, text FROM documents WHERE n_chars >= 1),
          ct AS (
            SELECT doc_id, text,
              CASE WHEN length(text) < 8 THEN []
              ELSE list_filter(range(8, length(text) + 1), i -> $hashHit) END AS cs
            FROM d),
          bn AS (
            SELECT doc_id, text,
              [CAST(0 AS BIGINT)] || cs ||
                CASE WHEN len(cs) > 0 AND cs[-1] = length(text) THEN []
                     ELSE [CAST(length(text) AS BIGINT)] END AS bnds
            FROM ct),
          chunks AS (
            SELECT doc_id, CAST(j AS BIGINT) AS chunk_no,
              bnds[j + 1] + 1 AS start,
              bnds[j + 2] - bnds[j + 1] AS chunk_len,
              md5(substr(text, CAST(bnds[j + 1] + 1 AS INTEGER),
                CAST(bnds[j + 2] - bnds[j + 1] AS INTEGER))) AS chunk_md5
            FROM bn, unnest(range(0, len(bnds) - 1)) AS t(j)),
          dfc AS (
            SELECT chunk_md5, CAST(count(*) AS BIGINT) AS chunk_df
            FROM chunks GROUP BY chunk_md5)
          SELECT c.doc_id, c.chunk_no, c.start, c.chunk_len, c.chunk_md5,
            dfc.chunk_df
          FROM chunks c JOIN dfc USING (chunk_md5)"""
    })

  /** Green-list watermark detection (Kirchenbauer et al. 2023, simplified
    * to a keyed bigram rule): a watermarking LLM biases each token toward
    * the "green" half of the vocab given its predecessor — here green ⇔
    * md5(prev ⊕ '_' ⊕ tok) has an even leading byte — so watermarked text
    * shows a green-bigram fraction far above the natural 1/2 and the
    * one-proportion z-test flags it. The contamination gate a
    * training-data pipeline runs to keep (marked) synthetic text out of
    * pretraining corpora.
    *
    * The corpus is organic (null distribution, z ≈ 0), so a POSITIVE is
    * injected: every doc_id % 41 = 3 document is replaced by a
    * greedily-constructed all-green token chain. That chain is computed
    * ONCE in Scala over the bounded 4-token vocab and spliced into BOTH
    * engines as the same literal (the eval_ndcg shared-constant trick) —
    * no cross-engine search, every list entry exercised.
    *
    * Scale shape: per-row bigram array math riding the scan (the bigrams
    * explode only into a per-doc count aggregate — actually not even
    * that: counts fold in-core via aggregate()); ONE sqrt double floored
    * to micro units per doc (§7.4.1 floor rule).
    */
  private val textWatermarkDetect = Q(
    "text_watermark_detect",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .withColumn("wtext",
          when(col("doc_id") % 41 === 3, lit(watermarkChain))
            .otherwise(col("text")))
        .withColumn("toks", expr("word_ngrams(wtext, 1, false)"))
        .withColumn("n_bigrams", (size(col("toks")) - 1).cast("long"))
        .where(col("n_bigrams") >= 1)
        .withColumn("n_green", expr(
          s"""aggregate(sequence(1, CAST(n_bigrams AS INT)), CAST(0 AS BIGINT),
                (acc, i) -> acc + IF((${md5Byte(
                  "concat(element_at(toks, i), '_', element_at(toks, i + 1))")}) % 2 = 0,
                  CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"""))
        .select(col("doc_id"), col("n_bigrams"), col("n_green"),
          expr("n_green * 1000000 div n_bigrams").as("green_ppm"),
          expr("""CAST(floor(CAST(2 * n_green - n_bigrams AS DOUBLE)
                    / sqrt(CAST(n_bigrams AS DOUBLE)) * 1000000.0) AS BIGINT)""")
            .as("z_micro"))
        .withColumn("watermarked", col("z_micro") > 2000000L)
    },
    Some(s"""WITH w AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 41 = 3 THEN '$watermarkChain'
                      ELSE text END AS wtext
               FROM documents),
             t AS (
               SELECT doc_id, list_filter(
                 string_split_regex(lower(wtext), '[^a-z]+'), x -> x <> '') AS toks
               FROM w),
             g AS (
               SELECT doc_id, CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
                 CAST(list_sum(list_transform(range(1, len(toks)),
                   i -> CASE WHEN (${md5Byte(
                     "toks[CAST(i AS INTEGER)] || '_' || toks[CAST(i + 1 AS INTEGER)]")}) % 2 = 0
                        THEN 1 ELSE 0 END)) AS BIGINT) AS n_green
               FROM t
               WHERE len(toks) >= 2)
             SELECT doc_id, n_bigrams, n_green,
               n_green * 1000000 // n_bigrams AS green_ppm,
               CAST(floor(CAST(2 * n_green - n_bigrams AS DOUBLE)
                 / sqrt(CAST(n_bigrams AS DOUBLE)) * 1000000.0) AS BIGINT)
                 AS z_micro,
               CAST(floor(CAST(2 * n_green - n_bigrams AS DOUBLE)
                 / sqrt(CAST(n_bigrams AS DOUBLE)) * 1000000.0) AS BIGINT)
                 > 2000000 AS watermarked
             FROM g"""))

  /** The 30-token all-green chain: from 'aa', greedily append the first
    * vocab token whose bigram hashes green. Computed once here, spliced
    * into both engines as the same literal. */
  private[text] lazy val watermarkChain: String = {
    val vocab = Seq("aa", "bb", "cc", "dd")
    def md5b(sx: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xF) * 16 + (h(0) & 0xF)
    }
    val out = scala.collection.mutable.ArrayBuffer("aa")
    while (out.size < 30) {
      val prev = out.last
      // fail at construction, not in a distant spec, if a vocab/hash edit
      // ever leaves some token without a green successor — the chain's
      // whole contract is all-green
      out += vocab.find(u => md5b(s"${prev}_$u") % 2 == 0).getOrElse(
        sys.error(s"watermark vocab has no green successor for '$prev'"))
    }
    out.mkString(" ")
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by its log importance weight under hashed-unigram
    * bag-of-words models of a TARGET distribution (here the `lang = 'en'`
    * slice — "select docs that look like the target corpus") versus the
    * raw pool, log w(x) = Σ_tokens [ln p̂_tgt(bucket) − ln p̂_raw(bucket)]
    * with add-one smoothing over the B = 4096 hashed-feature buckets.
    * This is the published method's exact shape: both models are one
    * bounded frame (B rows regardless of corpus size), fit in a single
    * aggregate pass over the shared (doc, token, cnt) artifact, and
    * scoring is a broadcast join of that frame onto the token stream —
    * at 100 TB nothing vocabulary- or corpus-sized ever shuffles for the
    * model side, and the per-doc score is one partial aggregate.
    *
    * Determinism: the bucket is md5-derived (the engine-portable hash),
    * each bucket's log-ratio is quantized ONCE to integer micro-nats
    * (identical exact-integer-input `ln` expression text on both
    * engines — the text_unigram_nll precedent), and per-doc sums are
    * order-free BIGINT math. Zero-token docs contribute no row on either
    * engine (the wordCounts/unnest contract).
    */
  private val qualityDsir = Q(
    "quality_dsir",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val wc = TextArtifacts.wordCounts(s, dir)
        .withColumn("bucket",
          expr(s"CAST(${graft.queries.PortableHash.md5Hex4("token")} % 4096 AS BIGINT)"))
      val raw = wc.groupBy(col("bucket")).agg(sum(col("cnt")).as("rc"))
      // target counts need each doc's lang — a doc-keyed equi-join onto
      // the artifact (co-keyed with its grouping, not a broadcast: the
      // documents side is corpus-sized)
      val tgt = wc
        .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "doc_id")
        .where(col("lang") === "en")
        .groupBy(col("bucket")).agg(sum(col("cnt")).as("tc"))
      val model = raw.join(tgt, Seq("bucket"), "left")
        .select(col("bucket"), col("rc"),
          coalesce(col("tc"), lit(0L)).as("tc"))
      val tots = model.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
      val q = model.crossJoin(broadcast(tots)) // 1-row totals
        .withColumn("q", expr(
          """CAST(round((ln((CAST(tc AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + 4096.0))
                       - ln((CAST(rc AS DOUBLE) + 1.0) / (CAST(rt AS DOUBLE) + 4096.0)))
                 * 1000000.0, 0) AS BIGINT)"""))
        .select(col("bucket"), col("q"))
      wc.join(broadcast(q), "bucket") // model frame ≤ 4096 rows
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tok"),
          sum(col("cnt") * col("q")).as("logw_micro"))
        .select(col("doc_id"), col("n_tok"), col("logw_micro"),
          (col("logw_micro") > 0L).as("keep"))
    },
    Some(s"""WITH toks AS (
               SELECT d.doc_id, d.lang, unnest(list_filter(
                 string_split_regex(lower(d.text), '[^a-z]+'), t -> t <> ''))
                 AS token
               FROM documents d),
             wc0 AS (
               SELECT doc_id, lang, token, CAST(count(*) AS BIGINT) AS cnt
               FROM toks GROUP BY doc_id, lang, token),
             wc AS (
               SELECT doc_id, lang, cnt,
                 CAST(${graft.queries.PortableHash.md5Hex4("token")} % 4096 AS BIGINT) AS bucket
               FROM wc0),
             raw AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS rc
                     FROM wc GROUP BY bucket),
             tgt AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS tc
                     FROM wc WHERE lang = 'en' GROUP BY bucket),
             model AS (
               SELECT r.bucket, r.rc, coalesce(t.tc, 0) AS tc
               FROM raw r LEFT JOIN tgt t ON t.bucket = r.bucket),
             tots AS (SELECT CAST(sum(tc) AS BIGINT) AS tt,
                             CAST(sum(rc) AS BIGINT) AS rt FROM model),
             q AS (
               SELECT bucket,
                 CAST(round((ln((CAST(tc AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + 4096.0))
                           - ln((CAST(rc AS DOUBLE) + 1.0) / (CAST(rt AS DOUBLE) + 4096.0)))
                     * 1000000.0, 0) AS BIGINT) AS q
               FROM model, tots)
             SELECT wc.doc_id, CAST(sum(wc.cnt) AS BIGINT) AS n_tok,
               CAST(sum(wc.cnt * q.q) AS BIGINT) AS logw_micro,
               sum(wc.cnt * q.q) > 0 AS keep
             FROM wc JOIN q ON q.bucket = wc.bucket
             GROUP BY wc.doc_id"""))

  /** Weighted sampling WITHOUT replacement (k = 50, weight = n_chars) —
    * the Efraimidis-Spirakis one-pass scheme that production samplers
    * use because it needs no global weight total and no sequential
    * state: every row computes key = ln(u) / w for its own uniform u and
    * the k largest keys ARE a weight-proportional without-replacement
    * sample. Distinct from sample_importance (Poisson / with-replacement
    * expectation semantics) and sample_reservoir (unweighted): this is
    * the exact-k weighted draw. u derives from md5(doc_id) (the
    * engine-portable uniform, (u16 + ½)/65536 ∈ (0,1) so ln is always
    * finite) — deterministic across runs/engines while preserving the
    * ES distribution over the key population. Scale: per-row codegen
    * math riding the scan + TakeOrderedAndProject (per-partition
    * partial top-k, no global sort); ordering happens on the BIGINT
    * micro-quantized key so the rank and the published column can never
    * disagree across engines.
    */
  private val sampleWeightedGumbel = Q(
    "sample_weighted_gumbel",
    (s, dir) => {
      val u16 = graft.queries.PortableHash.md5Hex4("CAST(doc_id AS STRING)")
      Tables.documents(s, dir)
        .where(col("n_chars") > 0L)
        .withColumn("key_micro", expr(
          s"""CAST(round(ln((CAST(($u16) AS DOUBLE) + 0.5) / 65536.0)
               / CAST(n_chars AS DOUBLE) * 1000000.0, 0) AS BIGINT)"""))
        .orderBy(col("key_micro").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("n_chars"), col("key_micro"))
    },
    Some {
      val u16 = graft.queries.PortableHash.md5Hex4("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, n_chars, key_micro
          FROM (SELECT doc_id, n_chars,
                  CAST(round(ln((CAST(($u16) AS DOUBLE) + 0.5) / 65536.0)
                    / CAST(n_chars AS DOUBLE) * 1000000.0, 0) AS BIGINT)
                    AS key_micro
                FROM documents WHERE n_chars > 0)
          ORDER BY key_micro DESC, doc_id
          LIMIT 50"""
    })

  // Neyman allocation for stratified sampling (Neyman 1934) — the
  // statistically optimal way to split a fixed annotation/eval budget
  // across strata: n_h ∝ N_h·S_h, so big AND internally-varied strata
  // get the samples (equal or proportional splits waste budget on
  // homogeneous strata — the readout sample_stratified's equal-rate
  // design cannot give). Strata = lang, measurement = n_chars, budget =
  // 100. Determinism: per-stratum variance is an exact rational from
  // BIGINT (n·Σx² − (Σx)²)/n², the stddev is ONE IEEE sqrt of identical
  // integer-derived doubles, the weight N_h·S_h quantizes to integer
  // milli PER STRATUM (§7.4.1 — a double Σ over strata would be
  // order-sensitive), and the allocation is an exact integer floor
  // share of the quantized weight total (Σ alloc ≤ budget by
  // construction — the remainder is the declared rounding residue, not
  // silently redistributed). ONE lang-keyed aggregate over the scan;
  // everything after lives on the ≤ #langs frame.
  private val sampleNeyman = Q(
    "sample_neyman",
    (s, dir) => {
      val strata = Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .select(col("lang"), col("n_docs"),
          expr("""CAST(round(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                 / CAST(n_docs * n_docs AS DOUBLE)) * 1000.0, 0) AS BIGINT)""")
            .as("s_milli"))
        .select(col("lang"), col("n_docs"),
          col("s_milli"), (col("n_docs") * col("s_milli")).as("w_milli"))
      val tot = strata.agg(sum(col("w_milli")).as("wt"))
      strata.crossJoin(broadcast(tot)) // 1-row weight total
        // wt = 0 (every stratum single-doc or zero-variance) would be
        // divide-by-zero: ANSI Spark throws while DuckDB // yields NULL
        // (ADVICE r07 #3) — both engines declare alloc = 0 instead, the
        // eval_pr_auc degenerate-input convention.
        .select(col("lang"), col("n_docs"), col("s_milli"), col("w_milli"),
          expr("CASE WHEN wt = 0 THEN 0L ELSE w_milli * 100 div wt END")
            .as("alloc"))
    },
    Some("""WITH strata AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sx,
                CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
              FROM documents GROUP BY lang),
            w AS (
              SELECT lang, n_docs,
                CAST(round(sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                  / CAST(n_docs * n_docs AS DOUBLE)) * 1000.0, 0) AS BIGINT)
                  AS s_milli
              FROM strata),
            ww AS (
              SELECT lang, n_docs, s_milli,
                CAST(n_docs * s_milli AS BIGINT) AS w_milli
              FROM w)
            SELECT lang, n_docs, s_milli, w_milli,
              CAST(CASE WHEN (SELECT sum(w_milli) FROM ww) = 0 THEN 0
                ELSE w_milli * 100 // (SELECT sum(w_milli) FROM ww)
                END AS BIGINT) AS alloc
            FROM ww"""))

  // Competence-based curriculum ordering (Platanios et al., NAACL 2019):
  // at training-progress fraction p the model's "competence" c(p) = √p
  // gates which difficulty percentiles are sampleable, which inverts to
  // a per-document ELIGIBILITY point — a doc at difficulty percentile q
  // enters the pool at p = q². This query materializes the resulting
  // deterministic training order: difficulty = whitespace token count
  // (longer docs are harder for a fixed context budget), percentile from
  // the (difficulty, doc_id) total order, eligibility in ppm via two
  // integer divisions (qm = r·10⁶ div n, then qm² div 10⁶ — qm ≤ 10⁶
  // keeps the square inside BIGINT at ANY corpus size, unlike the naive
  // r²·10⁶/n² which overflows past ~1M docs). Eligibility is then
  // QUANTIZED into 20 training stages (5% of the run each) and position
  // = row_number over (stage, md5 shuffle key, doc_id): without the
  // quantization every doc has a distinct eligibility and the "order"
  // degenerates to a pure length sort — exactly the gradient-biasing
  // batch stream a curriculum must avoid; within a stage the shuffle
  // key (the same PortableHash uniform every seeded decision in the
  // engine uses) interleaves difficulties reproducibly.
  // Scale: two range-partitioned global sorts (rank + final order) —
  // inherent to materializing a total training order, and exactly what
  // shard_shuffle already pays; everything else rides the scan.
  private val curriculumPacing = Q(
    "curriculum_pacing",
    (s, dir) => {
      val u16 = graft.queries.PortableHash.md5Hex4(
        "concat('cur|', CAST(doc_id AS STRING))")
      val d = Tables.documents(s, dir).select(
        col("doc_id"),
        size(expr("filter(split(text, '\\\\s+'), t -> t <> '')")).cast("long")
          .as("toks"))
        .localCheckpoint(eager = true) // corpus count + rank: ONE tokenize scan
      val n = d.agg(count(lit(1)).as("n"))
      d.withColumn("r", row_number().over(
          Window.orderBy(col("toks"), col("doc_id"))).cast("long"))
        .crossJoin(broadcast(n)) // 1-row corpus count
        .select(col("doc_id"), col("r").as("difficulty_rank"),
          expr("(r * 1000000 div n) * (r * 1000000 div n) div 1000000")
            .as("eligible_ppm"),
          expr(s"CAST(($u16) AS BIGINT)").as("shuffle_key"))
        .withColumn("stage",
          expr("least(eligible_ppm div 50000, 19L)"))
        .withColumn("position", row_number().over(
          Window.orderBy(col("stage"), col("shuffle_key"), col("doc_id")))
          .cast("long"))
    },
    Some {
      val u16 = graft.queries.PortableHash.md5Hex4(
        "'cur|' || CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (
            SELECT doc_id,
              CAST(len(list_filter(string_split_regex(text, '\\s+'),
                t -> t <> '')) AS BIGINT) AS toks
            FROM documents),
          r AS (
            SELECT doc_id,
              CAST(row_number() OVER (ORDER BY toks, doc_id) AS BIGINT) AS r
            FROM d),
          e AS (
            SELECT doc_id, r AS difficulty_rank,
              CAST((r * 1000000 // n) * (r * 1000000 // n) // 1000000 AS BIGINT)
                AS eligible_ppm,
              CAST(($u16) AS BIGINT) AS shuffle_key
            FROM r, (SELECT CAST(count(*) AS BIGINT) AS n FROM d)),
          st AS (
            SELECT doc_id, difficulty_rank, eligible_ppm, shuffle_key,
              CAST(least(eligible_ppm // 50000, 19) AS BIGINT) AS stage
            FROM e)
          SELECT doc_id, difficulty_rank, eligible_ppm, shuffle_key, stage,
            CAST(row_number() OVER (ORDER BY stage, shuffle_key, doc_id)
              AS BIGINT) AS position
          FROM st"""
    })

  /** Stage-drop attribution through the curation gates — the "where did
    * my data go" funnel every pipeline owner reads before anything else
    * ships: raw → length gate (n_chars ≥ 100) → token gate (n_tok ≥ 20)
    * → language gate (the latin-script model targets en/es/de/fr —
    * declared, like every gate here) → exact-dedup survivor (min doc_id
    * per md5(text) among docs passing the earlier gates — dedup
    * operates on the cleaned corpus, the production order). One row per
    * stage with surviving docs/tokens, the docs dropped AT that stage,
    * and the drop rate in ppm of the previous stage.
    *
    * Scale shape: per-doc flags ride ONE scan (5 longs + the md5 per
    * doc, checkpointed); the dedup survivor is one h-keyed min;
    * the ×5 stage explode fans out long-only rows and map-side combines
    * to 5; the lag/ppm readout lives on the 5-row frame. Monotone by
    * construction (stage k's survivors are a subset of k−1's), so the
    * ppm division is over non-negative integers. */
  private val corpusFunnel = Q(
    "corpus_funnel",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val flags0 = Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("h"),
          size(expr(tokenizeExpr)).cast("long").as("n_tok"),
          (col("n_chars") >= 100).cast("long").as("f1"),
          col("lang").isin("en", "es", "de", "fr").cast("long").as("f3"))
        .withColumn("f2", (col("n_tok") >= 20).cast("long"))
        .localCheckpoint(eager = true) // survivor min + stage rollup: ONE scan
      val keep = flags0.where(expr("f1 * f2 * f3 = 1"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
      val staged = flags0.join(keep, Seq("h"), "left")
        .select(col("n_tok"), col("f1"), col("f2"), col("f3"),
          coalesce((col("doc_id") === col("keep_id")).cast("long"), lit(0L))
            .as("f4"),
          explode(expr("array(0L, 1L, 2L, 3L, 4L)")).as("stage"))
        .withColumn("surv", expr(
          """CASE WHEN stage = 0 THEN 1L
                  WHEN stage = 1 THEN f1
                  WHEN stage = 2 THEN f1 * f2
                  WHEN stage = 3 THEN f1 * f2 * f3
                  ELSE f1 * f2 * f3 * f4 END"""))
        .groupBy(col("stage"))
        .agg(sum(col("surv")).as("n_docs"),
          sum(col("surv") * col("n_tok")).as("n_tokens"))
      staged
        .withColumn("prev", lag(col("n_docs"), 1).over(Window.orderBy(col("stage"))))
        .select(col("stage"),
          expr("""CASE stage WHEN 0 THEN 'raw' WHEN 1 THEN 'length'
                  WHEN 2 THEN 'tokens' WHEN 3 THEN 'langid'
                  ELSE 'dedup' END""").as("stage_name"),
          col("n_docs"), col("n_tokens"),
          coalesce(col("prev") - col("n_docs"), lit(0L)).as("dropped_docs"),
          coalesce(expr("(prev - n_docs) * 1000000 div nullif(prev, 0)"), lit(0L))
            .as("drop_ppm"))
    },
    Some("""WITH base AS (
              SELECT doc_id, md5(text) AS h, n_chars, lang,
                CAST(len(list_filter(string_split_regex(lower(text),
                  '[^a-z]+'), t -> t <> '')) AS BIGINT) AS n_tok
              FROM documents),
            flags0 AS (
              SELECT doc_id, h, n_tok,
                CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS f1,
                CASE WHEN n_tok >= 20 THEN 1 ELSE 0 END AS f2,
                CASE WHEN lang IN ('en','es','de','fr') THEN 1 ELSE 0 END AS f3
              FROM base),
            keep AS (
              SELECT h, min(doc_id) AS keep_id
              FROM flags0 WHERE f1 * f2 * f3 = 1 GROUP BY h),
            flags AS (
              SELECT f.n_tok, f.f1, f.f2, f.f3,
                coalesce(CASE WHEN f.doc_id = k.keep_id THEN 1 ELSE 0 END, 0)
                  AS f4
              FROM flags0 f LEFT JOIN keep k ON k.h = f.h),
            staged AS (
              SELECT stage, CAST(sum(surv) AS BIGINT) AS n_docs,
                CAST(sum(surv * n_tok) AS BIGINT) AS n_tokens
              FROM (SELECT n_tok, stage,
                      CASE WHEN stage = 0 THEN 1
                           WHEN stage = 1 THEN f1
                           WHEN stage = 2 THEN f1 * f2
                           WHEN stage = 3 THEN f1 * f2 * f3
                           ELSE f1 * f2 * f3 * f4 END AS surv
                    FROM flags, (SELECT unnest([0, 1, 2, 3, 4]) AS stage))
              GROUP BY stage)
            SELECT CAST(stage AS BIGINT) AS stage,
              CASE stage WHEN 0 THEN 'raw' WHEN 1 THEN 'length'
                   WHEN 2 THEN 'tokens' WHEN 3 THEN 'langid'
                   ELSE 'dedup' END AS stage_name,
              n_docs, n_tokens,
              coalesce(prev - n_docs, 0) AS dropped_docs,
              CAST(coalesce((prev - n_docs) * 1000000 // nullif(prev, 0), 0)
                AS BIGINT) AS drop_ppm
            FROM (SELECT stage, n_docs, n_tokens,
                    lag(n_docs) OVER (ORDER BY stage) AS prev
                  FROM staged)"""))

  val all: Seq[Q] = Seq(sampleHash, sampleStratified, sampleReservoir,
    textPiiScrub,
    textEditDistance, packSequences, vocabTopk, contaminationCheck,
    contaminationFuzzy,
    textRepetition, sampleDomainMix, sampleTemperature, sampleImportance,
    dedupLines, shardShuffle, shardManifest, qualityLogreg, docChunking,
    qualityGopherRules,
    textCodeDetect, corpusDrift, tokenizerCoverage, docChunkingCdc,
    textWatermarkDetect, qualityDsir, sampleWeightedGumbel,
    curriculumPacing, sampleNeyman, corpusFunnel)
}
