package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Near-duplicate detection over `documents` — the training-data-pipeline
  * dedup family (exact dedup lives in CoreQueries as `dedup_exact` /
  * `dedup_window`):
  *
  *  - MinHash + LSH banding over 5-char shingles (signatures per doc; same
  *    band hash ⇒ candidate pair);
  *  - SimHash (16-bit, token-md5 sign aggregation);
  *  - exact n-gram Jaccard verification over the LSH candidate pairs
  *    (generate-then-verify; the join fan-out is the candidate list, not
  *    any block's square).
  *
  * All hashes are md5-derived so the DuckDB oracle reproduces them exactly;
  * at 100 TB the same plans hold: shingling/minhashing is embarrassingly
  * parallel per document, LSH banding turns O(n²) pair search into a
  * groupBy on band hash, and exact-Jaccard verification touches only the
  * candidate pairs LSH surfaced.
  */
object DedupQueries {

  // hash-family constants shared with the native expression (the oracle
  // SQL below is generated from the same values)
  import graft.functions.MinHashSignature.{NumHashes, BandSize, P, A, B}

  /** 28-bit integer base hash from the first 7 hex digits of md5, as
    * DuckDB SQL — digit-by-digit (no conv() in DuckDB). The native Spark
    * expression takes the same 28 bits straight off the digest bytes
    * (graft.functions.MinHashSignature); a ScalaTest property pins the two
    * formulations equal.
    */
  private def baseHashSql(h: String): String =
    (0 until 7).map { i =>
      val pow = 1L << (4 * (6 - i))
      s"(instr('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")

  /** MinHash signatures + LSH band hashes per document — SHUFFLE-FREE and
    * allocation-free: the native one-pass `minhash_sig` expression slides
    * the shingle window over the text inside whole-stage codegen (no
    * shingle array, no interpreted lambda passes, no explode/groupBy),
    * then the 4 band hashes are plain column math over its 12 outputs.
    * Embarrassingly parallel per document — the shape that survives
    * 100 TB (an explode+hash-aggregate would shuffle |doc|×|shingles|
    * rows on doc_id).
    */
  def minhashSignatures(docs: DataFrame, spreadInput: Boolean = true): DataFrame =
    minhashSignaturesFull(docs, spreadInput).drop("mh")

  /** Like [[minhashSignatures]] but keeps the raw 12-slot `mh` array
    * alongside the band columns — the shape [[CandidateArtifacts]]
    * checkpoints once per session so the estimator audit can reuse the
    * same materialized pass the band queries read. */
  private[graft] def minhashSignaturesFull(
      docs: DataFrame, spreadInput: Boolean = true): DataFrame = {
    // the native one-pass expression (graft.functions.MinHashSignature):
    // no shingle array, no 12 interpreted array_min(transform(...)) passes,
    // whole signature inside whole-stage codegen — bit-identical to the
    // composable-SQL formulation the oracle uses.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    // spread probes .rdd partition counts — batch-only; streaming callers
    // pass spreadInput = false (micro-batch parallelism comes from the source)
    val sig = (if (spreadInput) Tables.spread(base) else base)
      .select(col("doc_id"), expr("minhash_sig(text)").as("mh"))
    val bands = (0 until NumHashes / BandSize).map { b =>
      val cols = (0 until BandSize).map(r => element_at(col("mh"), b * BandSize + r + 1))
      md5(concat_ws("_", cols: _*)).as(s"band$b")
    }
    sig.select(col("doc_id") +: col("mh") +: bands: _*)
  }

  private[graft] def minhashOracle: String = {
    val mhDefs = (0 until NumHashes).map { j =>
      s"min((${A(j)} * x + ${B(j)}) % $P) AS mh$j"
    }.mkString(",\n              ")
    val bandDefs = (0 until NumHashes / BandSize).map { b =>
      val cols = (0 until BandSize).map(r => s"mh${b * BandSize + r}").mkString(", ")
      s"md5(concat_ws('_', $cols)) AS band$b"
    }.mkString(", ")
    s"""SELECT doc_id, $bandDefs
        FROM (SELECT doc_id,
              $mhDefs
              FROM (SELECT doc_id, ${baseHashSql("md5(s)")} AS x
                    FROM (SELECT doc_id, unnest(
                            CASE WHEN length(text) < 5 THEN [text]
                            ELSE list_transform(range(1, length(text) - 3),
                                   i -> substr(text, i, 5)) END) AS s
                          FROM documents))
              GROUP BY doc_id)"""
  }

  private val dedupMinhash = Q(
    "dedup_minhash",
    (s, dir) => CandidateArtifacts.signatures(s, dir).drop("mh"),
    Some(minhashOracle))

  /** `sig` (signatures+bands) + `long` (unpivoted bands) — the CTE prefix
    * every banded-LSH oracle builds on (ONE definition: an edit here is
    * the only way to change the band table for every oracle at once). */
  private[graft] def sigLongOracleCte: String = {
    val bandUnion = (0 until NumHashes / BandSize)
      .map(b => s"SELECT doc_id, band$b AS band_hash FROM sig")
      .mkString(" UNION ALL ")
    s"""sig AS ($minhashOracle),
        long AS ($bandUnion)"""
  }

  /** [[sigLongOracleCte]] + `cand` (distinct a<b candidate pairs).
    * Splice as `WITH $candPairsOracleCte, ...`. */
  private[graft] def candPairsOracleCte: String =
    s"""$sigLongOracleCte,
        cand AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM long a JOIN long b
            ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id)"""

  /** [[candPairsOracleCte]] with the [[DefaultMaxBucket]] degenerate-
    * bucket cap applied before the self-join — the oracle twin of
    * `pairsFromSignatures(sig, Some(DefaultMaxBucket))`. */
  private[graft] def cappedCandPairsOracleCte: String =
    s"""$sigLongOracleCte,
        keepb AS (
          SELECT band_hash FROM (
            SELECT band_hash, count(*) AS bw FROM long GROUP BY band_hash)
          WHERE bw <= $DefaultMaxBucket),
        longc AS (
          SELECT l.doc_id, l.band_hash FROM long l JOIN keepb USING (band_hash)),
        cand AS (
          SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
          FROM longc a JOIN longc b
            ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id)"""

  /** Unpivot a signature frame's band0..bandN columns into
    * (doc_id, band_no, band_hash) rows. */
  private[graft] def stackBands(sig: DataFrame): DataFrame =
    sig.selectExpr("doc_id",
      s"stack(${NumHashes / BandSize}, " +
        (0 until NumHashes / BandSize)
          .map(b => s"$b, band$b").mkString(", ") + ") AS (band_no, band_hash)")

  /** Default degenerate-bucket cap for VERIFY stages (VERDICT r10 task
    * 4): buckets wider than this are boilerplate/template mass whose
    * C(k,2) pairwise verifications are Θ(n²) by answer size on a
    * degenerate corpus, while the exact-hash and cluster paths already
    * handle the class at k−1 edges. 256 clears the widest HEALTHY
    * bucket by 2.5× at every driver SF (measured max 18 at sf0.01, 100
    * at sf0.1 — the planted 100-dup class stays fully verified) and
    * collapses the constant-collision regime (`lsh_band_stats` is the
    * observability readout; LshScaleSpec pins the no-op on healthy
    * corpora). `dedup_minhash_pairs` keeps EXACT uncapped semantics —
    * it IS the candidate-list contract; the cap belongs to verify
    * consumers that pay per pair. */
  private[graft] val DefaultMaxBucket = 256

  /** Band self-join over an already-materialized (or exchange-reusable)
    * signature frame — the "generate" half of generate-then-verify.
    *
    * `maxBucket` is the 100 TB degenerate-bucket guard (round-10 decade-3
    * audit, SCALING.md): candidate pairs are Θ(Σ bucket²), so a corpus
    * whose RANDOM pairs collide at constant probability (template farms,
    * tiny-vocabulary text — the synthetic decade corpus measured 10×
    * docs → 99× pairs) makes the verify stage quadratic through no fault
    * of the plan. Capped, buckets wider than `maxBucket` are dropped
    * before the self-join — the CCNet/BigCode "skip degenerate bands"
    * rule: a bucket that wide is boilerplate the exact-hash and cluster
    * paths already handle (clusterEdges stays k−1 per bucket and is NOT
    * capped), not near-dup signal worth C(k,2) verifications. Default
    * None = exact semantics, unchanged oracle surface. */
  private[graft] def pairsFromSignatures(sig: DataFrame,
      maxBucket: Option[Int] = None): DataFrame = {
    val stacked = stackBands(sig)
    val long = maxBucket.fold(stacked) { cap =>
      val keep = stacked.groupBy(col("band_hash"))
        .agg(count(lit(1)).as("bw")).where(col("bw") <= cap)
        .select(col("band_hash"))
      stacked.join(keep, "band_hash")
    }
    val a = long.select(col("band_hash"), col("doc_id").as("a"))
    val b = long.select(col("band_hash"), col("doc_id").as("b"))
    a.join(b, "band_hash").where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** LSH candidate pairs: documents sharing any band hash.
    * Signatures get a hash-exchange on doc_id first: both sides of the
    * self-join then hang off the SAME canonicalized Exchange, so
    * ReuseExchange computes the shingle+minhash pipeline exactly once —
    * no driver-side materialization barrier, and the reused exchange holds
    * signatures (tiny) rather than text (huge), which is the right
    * trade at 100 TB too. (Registry consumers read the session-shared
    * [[CandidateArtifacts]] instead; this entry point serves callers with
    * their own corpus frames — streaming, tests, pipelines.) */
  def minhashCandidatePairs(docs: DataFrame): DataFrame =
    pairsFromSignatures(minhashSignatures(docs).repartition(col("doc_id")))

  private val dedupMinhashPairs = Q(
    "dedup_minhash_pairs",
    (s, dir) => CandidateArtifacts.pairs(s, dir),
    Some(s"""WITH $candPairsOracleCte
          SELECT a, b FROM cand"""))

  /** SimHash: 16 "bits", bit i = sign of Σ_tokens (±1 by parity of hex digit
    * i of md5(token)). Multiplicity-weighted (raw token stream, not set).
    * One pass per document via the native `simhash16` expression — no
    * explode, no shuffle; tokenless docs (NULL) are filtered to match the
    * explode formulation, which emits no row for them. */
  private val dedupSimhash = Q(
    "dedup_simhash",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.spread(Tables.documents(s, dir).select("doc_id", "text"))
        .select(col("doc_id"), expr("simhash16(text)").as("simhash"))
        .where(col("simhash").isNotNull)
    },
    Some {
      val sumDefs = (1 to 16).map { i =>
        s"sum(CASE WHEN (instr('0123456789abcdef', substring(h, $i, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END) AS s$i"
      }.mkString(",\n                ")
      val bitDefs = (1 to 16)
        .map(i => s"CASE WHEN s$i > 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""SELECT doc_id, $bitDefs AS simhash
          FROM (SELECT doc_id,
                $sumDefs
                FROM (SELECT doc_id, md5(token) AS h
                      FROM (SELECT doc_id, unnest(list_filter(
                              string_split_regex(lower(text), '[^a-z]+'),
                              t -> t <> '')) AS token
                            FROM documents))
                GROUP BY doc_id)"""
    })

  /** Exact n-gram Jaccard over LSH candidate pairs: distinct word-3-gram
    * sets, |∩| via `array_intersect` so both engines compute identical
    * integers. The pair list comes from [[minhashCandidatePairs]] (banded
    * LSH), NOT an all-pairs self-join inside coarse blocks — so the join
    * fan-out is the candidate list (≈ linear in corpus size at a fixed
    * near-dup rate), never block². This is the standard
    * generate-candidates-then-verify shape that survives 100 TB; the
    * verify step is two doc_id-keyed joins pulling gram sets onto the
    * (small) pair list. */
  private val dedupNgramJaccard = Q(
    "dedup_ngram_jaccard",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val grams = Tables.spread(docs.select("doc_id", "text"))
        // hash each gram to a LONG before the checkpoint: the intersect
        // only needs equality, so 8-byte elements replace ~25-byte strings
        // in the checkpointed arrays and in both pair-side joins (~3×
        // smaller payload); word_gram_hash_counts emits the distinct-hash
        // set SORTED, so the pair-level intersection is an allocation-free
        // linear merge (sorted_intersect_count) instead of a per-pair hash
        // set. The string-exact DuckDB oracle would flag a 64-bit collision
        .select(col("doc_id"),
          expr("word_gram_hash_counts(text, 3).gh").as("grams"))
        .select(col("doc_id"), col("grams"), size(col("grams")).cast("long").as("n"))
        // one materialized gram pass feeding BOTH pair sides, instead of
        // re-tokenizing the corpus per side (measured 2.9 s → 2.1 s at
        // sf0.1; a repartition+ReuseExchange alternative re-measured 0.4 s
        // SLOWER even with the native word_ngrams — the reused exchange
        // shuffles the KB-fat gram arrays where the checkpoint keeps them
        // node-local)
        .localCheckpoint(eager = true)
      // NO spread here (unlike text_edit_distance): gram arrays are
      // KB-fat, so the pair rows are too big for AQE to coalesce onto one
      // task — the intersect already runs parallel inside the join stage,
      // and an extra exchange would shuffle the gram payloads again
      // (measured 1.7x slower at sf0.1).
      val verified = CandidateArtifacts.pairs(s, dir)
        .join(grams.select(col("doc_id").as("a"), col("grams").as("ga"),
          col("n").as("na")), "a")
        .join(grams.select(col("doc_id").as("b"), col("grams").as("gb"),
          col("n").as("nb")), "b")
        .select(col("a"), col("b"),
          expr("sorted_intersect_count(ga, gb)").as("inter"),
          col("na"), col("nb"))
      // containment (|∩|/|A|, |∩|/|B|) rides the same verified frame for
      // free — the asymmetric signal that catches a short doc quoted
      // wholesale inside a long one, which symmetric Jaccard dilutes
      verified.select(col("a"), col("b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"),
        round(col("inter").cast("double") /
          nullif(col("na") + col("nb") - col("inter"), lit(0L)), 4).as("jaccard"),
        round(col("inter").cast("double") / nullif(col("na"), lit(0L)), 4)
          .as("contain_a"),
        round(col("inter").cast("double") / nullif(col("nb"), lit(0L)), 4)
          .as("contain_b"))
    },
    Some {
      s"""WITH $candPairsOracleCte,
          g AS (
            SELECT doc_id, grams, CAST(len(grams) AS BIGINT) AS n
            FROM (SELECT doc_id,
                    CASE WHEN len(toks) < 3 THEN []
                    ELSE list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) END AS grams
                  FROM (SELECT doc_id,
                          list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '') AS toks
                        FROM documents)))
          SELECT a, b, inter, uni,
            round(CAST(inter AS DOUBLE) / nullif(uni, 0), 4) AS jaccard,
            round(CAST(inter AS DOUBLE) / nullif(na, 0), 4) AS contain_a,
            round(CAST(inter AS DOUBLE) / nullif(nb, 0), 4) AS contain_b
          FROM (SELECT c.a, c.b,
                  CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS inter,
                  x.n + y.n - CAST(len(list_intersect(x.grams, y.grams)) AS BIGINT) AS uni,
                  x.n AS na, y.n AS nb
                FROM cand c
                JOIN g x ON x.doc_id = c.a
                JOIN g y ON y.doc_id = c.b)"""
    })

  /** Dedup clusters: connected components over the LSH candidate-pair
    * graph — "these documents are all versions of one another". Composes
    * the MinHash pipeline with the identity CC operator; docs with no
    * candidate pair form singleton clusters. Cluster id = min doc_id.
    */
  /** doc_id → near-dup cluster id (min doc_id of the component; singleton
    * docs are their own cluster). Shared by `dedup_clusters` and the
    * leakage-safe split. */
  private[graft] def clusterAssignments(s: SparkSession, dir: String): DataFrame =
    // session-shared: ONE CC pass over the SPANNING band edges serves the
    // whole cluster family (see CandidateArtifacts.clusters — components
    // provably equal the full-pair-list closure the oracle computes)
    CandidateArtifacts.clusters(s, dir)

  /** CTE chain ending in `clusters(doc_id, cluster)`; splice after a
    * `WITH RECURSIVE` prefix. */
  private[graft] def clustersOracleCte: String = {
    s"""$candPairsOracleCte,
        pairs AS (SELECT a AS u, b AS v FROM cand),
        und AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        nodes AS (SELECT DISTINCT u AS node FROM und),
        reach(node, r) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT reach.node, und.v FROM reach JOIN und ON reach.r = und.u),
        comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
        clusters AS (
          SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster
          FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)"""
  }

  private val dedupClusters = Q(
    "dedup_clusters",
    (s, dir) => clusterAssignments(s, dir),
    Some(s"""WITH RECURSIVE $clustersOracleCte
             SELECT doc_id, cluster FROM clusters"""))

  /** Leakage-safe train/val/test split: the split is a deterministic
    * function of the near-dup CLUSTER id, not the document id — so two
    * near-duplicate documents can never straddle train and test (the
    * eval-contamination failure mode of naive per-doc hash splits).
    * ~80/10/10 via md5 buckets of the cluster id. Scale: one md5 + two
    * compares on top of the CC output; SplitLeakageSpec asserts the
    * invariant pair-by-pair.
    */
  private val splitLeakageSafe = Q(
    "split_leakage_safe",
    (s, dir) => {
      import org.apache.spark.sql.functions.{col, expr, when}
      val byte =
        """(instr('0123456789abcdef', substr(md5(CAST(cluster AS STRING)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(cluster AS STRING)), 2, 1)) - 1)"""
      clusterAssignments(s, dir)
        .withColumn("bucket", expr(byte).cast("long"))
        .withColumn("split",
          when(col("bucket") < 205, "train")
            .when(col("bucket") < 230, "val")
            .otherwise("test"))
        .select(col("doc_id"), col("cluster"), col("split"))
    },
    Some {
      val byte =
        """(instr('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 2, 1)) - 1)"""
      s"""WITH RECURSIVE $clustersOracleCte
          SELECT doc_id, cluster,
            CASE WHEN b < 205 THEN 'train'
                 WHEN b < 230 THEN 'val'
                 ELSE 'test' END AS split
          FROM (SELECT doc_id, cluster, $byte AS b FROM clusters)"""
    })

  /** The C4-style corpus-cleaning pipeline, composed from the engine's own
    * operators: keep documents that (1) pass the quality gate (>= 20
    * tokens, >= 100 chars), (2) language-ID as English, and (3) are not
    * the duplicate side of any LSH candidate pair (pair (a, b) with a < b
    * keeps a, drops b — "first doc wins"). One left_anti join against the
    * distinct b-side; at 100 TB the anti-join's build side is the pair
    * list, orders of magnitude smaller than the corpus.
    */
  private val corpusClean = Q(
    "corpus_clean",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      // shared langid scoring chain (graft.text.LangId) — the English
      // gate below is the ladder's "en" branch condition
      val feat = graft.text.LangId.withScores(docs
        .withColumn("n_tokens",
          size(expr("word_ngrams(text, 1, false)")).cast("long")))
      val dupSide = CandidateArtifacts.pairs(s, dir)
        .select(col("b").as("doc_id")).distinct()
      feat
        .where(col("n_tokens") >= 20 && col("n_chars") >= 100)
        .where(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_fr") && col("s_en") > 0)
        .join(dupSide, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"))
    },
    Some {
      s"""WITH $candPairsOracleCte,
          dup_side AS (SELECT DISTINCT b AS doc_id FROM cand),
          feat AS (
            SELECT doc_id, n_chars,
                   CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     t -> t <> '')) AS BIGINT) AS n_tokens,
                   CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS s_en,
                   CAST((length(text) - length(replace(text, ' der ', ''))) / 5 AS BIGINT) AS s_de,
                   CAST((length(text) - length(replace(text, ' el ', ''))) / 4 AS BIGINT) AS s_es,
                   CAST((length(text) - length(replace(text, ' le ', ''))) / 4 AS BIGINT) AS s_fr
            FROM documents)
          SELECT doc_id, n_chars, n_tokens
          FROM feat
          WHERE n_tokens >= 20 AND n_chars >= 100
            AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0
            AND doc_id NOT IN (SELECT doc_id FROM dup_side)"""
    })

  /** Quality-priority canonical selection: per near-dup CLUSTER keep the
    * BEST document, not the arbitrary min-id one — the curation rule real
    * pipelines use (you want the longest / highest-quality version of a
    * scraped page, not whichever crawled first). Composes
    * [[clusterAssignments]] with one partial-aggregable argmax:
    * `max(struct(n_chars, -doc_id))` picks max quality, tie → min doc_id,
    * and map-side combines (the cdc_log_compact pattern — no rank window,
    * no per-cluster sort). At 100 TB the only work on top of the CC pass
    * is one join to the quality column and one combine-aggregated groupBy.
    */
  private val dedupKeepBest = Q(
    "dedup_keep_best",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      clusterAssignments(s, dir)
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("best"))
        .select(col("cluster"), col("n_docs"),
          (-col("best.neg")).as("keep_doc_id"),
          col("best.n_chars").as("keep_n_chars"))
    },
    Some(s"""WITH RECURSIVE $clustersOracleCte,
             j AS MATERIALIZED (
               SELECT c.cluster, d.doc_id, d.n_chars
               FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
             mx AS (
               SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
                      max(n_chars) AS m
               FROM j GROUP BY cluster)
             SELECT mx.cluster, mx.n_docs,
               CAST(min(j.doc_id) AS BIGINT) AS keep_doc_id,
               CAST(mx.m AS BIGINT) AS keep_n_chars
             FROM mx JOIN j ON j.cluster = mx.cluster AND j.n_chars = mx.m
             GROUP BY mx.cluster, mx.n_docs, mx.m"""))

  /** Preference-pair mining from near-dup clusters — the DPO/RLHF data
    * construction that turns duplication into supervision: within every
    * cluster of near-duplicate documents, pair the BEST version (max
    * n_chars, tie → min doc_id — the dedup_keep_best canonical) as
    * `chosen` against the WORST (min n_chars, tie → max doc_id) as
    * `rejected`, with the quality margin. Scraped near-dup families are
    * exactly where "same content, different quality" pairs exist —
    * truncated mirrors, boilerplate-injected rehosts — so the cluster
    * pass the dedup pipeline already runs doubles as pair supervision.
    *
    * Scale shape: on top of the CC pass, ONE join to the quality column
    * and ONE combine-aggregated groupBy carrying BOTH argmaxes
    * (`max(struct)` + `min(struct)` partial-aggregate map-side — the
    * cdc_log_compact pattern; no rank window, no per-cluster sort); the
    * n_docs ≥ 2 gate filters the cluster-count-sized aggregate, not the
    * corpus. chosen ≠ rejected always: distinct quality picks distinct
    * docs, and an all-tie cluster resolves to (min id, max id).
    */
  private val minePreferencePairs = Q(
    "mine_preference_pairs",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      clusterAssignments(s, dir)
        .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("best"),
          min(struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("worst"))
        .where(col("n_docs") >= 2)
        .select(col("cluster"), col("n_docs"),
          (-col("best.neg")).as("chosen_doc_id"),
          col("best.n_chars").as("chosen_n_chars"),
          (-col("worst.neg")).as("rejected_doc_id"),
          col("worst.n_chars").as("rejected_n_chars"),
          (col("best.n_chars") - col("worst.n_chars")).as("margin"))
    },
    Some(s"""WITH RECURSIVE $clustersOracleCte,
             j AS MATERIALIZED (
               SELECT c.cluster, d.doc_id, d.n_chars
               FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
             st AS (
               SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
                      max(n_chars) AS mx, min(n_chars) AS mn
               FROM j GROUP BY cluster),
             ch AS (
               SELECT st.cluster, CAST(min(j.doc_id) AS BIGINT) AS chosen_doc_id,
                      CAST(st.mx AS BIGINT) AS chosen_n_chars
               FROM st JOIN j ON j.cluster = st.cluster AND j.n_chars = st.mx
               GROUP BY st.cluster, st.mx),
             rj AS (
               SELECT st.cluster, CAST(max(j.doc_id) AS BIGINT) AS rejected_doc_id,
                      CAST(st.mn AS BIGINT) AS rejected_n_chars
               FROM st JOIN j ON j.cluster = st.cluster AND j.n_chars = st.mn
               GROUP BY st.cluster, st.mn)
             SELECT st.cluster, st.n_docs,
               ch.chosen_doc_id, ch.chosen_n_chars,
               rj.rejected_doc_id, rj.rejected_n_chars,
               CAST(ch.chosen_n_chars - rj.rejected_n_chars AS BIGINT) AS margin
             FROM st
             JOIN ch ON ch.cluster = st.cluster
             JOIN rj ON rj.cluster = st.cluster
             WHERE st.n_docs >= 2"""))

  /** Incremental crawl dedup: flag documents of an incoming batch that
    * LSH-collide with the EXISTING corpus — the production "is today's
    * crawl already in the lake" pass, which never re-pairs the corpus
    * against itself. The batch/corpus boundary here is a deterministic
    * md5 bucket of doc_id (~20% "new") so the oracle reproduces it; in
    * production the corpus band table is precomputed and stored, the
    * daily batch is orders of magnitude smaller, and this join reads the
    * batch's bands against the band table keyed by band_hash — work
    * scales with the batch, not the corpus. Emits every new-batch doc
    * with its distinct-existing-collider count.
    */
  private val dedupIncremental = Q(
    "dedup_incremental",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val long = stackBands(CandidateArtifacts.signatures(s, dir))
      val bucketExpr = expr(
        """(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16 +
           (instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1)""")
      val withB = long.withColumn("bucket", bucketExpr.cast("long"))
      val newBands = withB.where(col("bucket") < 51)
        .select(col("doc_id"), col("band_hash"))
      val oldBands = withB.where(col("bucket") >= 51)
        .select(col("doc_id").as("src"), col("band_hash"))
      val hits = newBands.join(oldBands, "band_hash")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("src")).as("n_src"))
      docs.select(col("doc_id"))
        .withColumn("bucket", bucketExpr.cast("long"))
        .where(col("bucket") < 51).select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_src"), lit(0L)).as("n_src"),
          (coalesce(col("n_src"), lit(0L)) > 0).cast("long").as("is_dup"))
    },
    Some {
      def byte(c: String) =
        s"""(instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 1, 1)) - 1) * 16 +
            (instr('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), 2, 1)) - 1)"""
      s"""WITH $sigLongOracleCte,
          wb AS (SELECT doc_id, band_hash, ${byte("doc_id")} AS bucket FROM long),
          hits AS (
            SELECT n.doc_id, CAST(count(DISTINCT o.doc_id) AS BIGINT) AS n_src
            FROM wb n JOIN wb o
              ON n.band_hash = o.band_hash AND n.bucket < 51 AND o.bucket >= 51
            GROUP BY n.doc_id)
          SELECT d.doc_id, coalesce(h.n_src, 0) AS n_src,
            CAST(coalesce(h.n_src, 0) > 0 AS BIGINT) AS is_dup
          FROM (SELECT doc_id FROM documents WHERE ${byte("doc_id")} < 51) d
          LEFT JOIN hits h ON h.doc_id = d.doc_id"""
    })

  /** Exact duplicated-span detection (the ExactSubstr half of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better"): an
    * 8-word span that appears verbatim in ≥2 documents is memorization
    * fuel; per doc we report how much of it is covered by such spans.
    *
    * Scale shape: the corpus-wide frequency pass groups on
    * `xxhash64(gram)` — an 8-byte integer — so the shuffle ships fixed
    * 16-byte rows, never the ~50-byte gram text (a 64-bit hash over the
    * ~10¹¹ distinct grams of a 100 TB corpus has ~10⁻⁴ collision odds for
    * the WHOLE corpus; a collision inflates one doc's count by one — the
    * DuckDB oracle groups the gram strings themselves and stays exact, so
    * the correctness gate would catch any collision at test scale). The
    * gram frame is materialized once (`localCheckpoint`) because it feeds
    * both the frequency aggregate and the per-doc rollup — the
    * dedup_ngram_jaccard lesson, and here the checkpoint holds hashes,
    * not text.
    */
  /** Core of `dedup_substring` on any (doc_id, text) frame — separated so
    * DedupSubstringSpec can plant shared spans in a synthetic corpus. */
  private[graft] def substringDupStats(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // One tokenize pass; the checkpoint holds each doc's gram-hash ARRAY
    // (8 B/gram), so the per-doc window count is a map-side size() and
    // only the corpus-frequency aggregate ever explodes it.
    // coalesce(text, ''): a NULL-text doc must report (0, 0, NULL) like
    // the oracle's empty-gram branch — without it word_ngrams propagates
    // NULL and size(NULL) diverges from the oracle's 0 (latent on the
    // null-free fixture, real in production)
    val ga = Tables.spread(docs.select("doc_id", "text"))
      .select(col("doc_id"),
        expr("transform(word_ngrams(coalesce(text, ''), 8, true), g -> xxhash64(g))")
          .as("ghs"))
      .localCheckpoint(eager = true)
    val g = ga.select(col("doc_id"), explode(col("ghs")).as("gh"))
    // grams are per-doc distinct, so count(*) per hash = document
    // frequency — and a df = 1 gram has exactly ONE owning document, which
    // the same aggregate can name (min(doc_id) of a 1-row group). That
    // turns "how many of my grams are duplicated" into pure aggregation:
    //   dup_grams(d) = n_grams(d) − #{df=1 grams owned by d}
    // so the corpus-sized gram frame is aggregated twice (by gh, by
    // doc_id) but never JOINED back to the frequency table — the join
    // shuffled the full gram frame a second time and was the bulk of this
    // query's 5.5 s at sf0.1.
    val uniq = g.groupBy(col("gh"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      .where(col("df") === 1L)
      .groupBy(col("owner")).agg(count(lit(1)).as("uniq_grams"))
      .withColumnRenamed("owner", "doc_id")
    // every doc keeps a row via the array frame itself (size() of an
    // empty gram array is 0) — no join back to the docs table needed
    ga.select(col("doc_id"), size(col("ghs")).cast("long").as("n_grams"))
      .join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_grams") - coalesce(col("uniq_grams"), lit(0L))).as("dup_grams"),
        round((col("n_grams") - coalesce(col("uniq_grams"), lit(0L))).cast("double") /
          nullif(col("n_grams"), lit(0L)), 4).as("dup_frac"))
  }

  private val dedupSubstring = Q(
    "dedup_substring",
    (s, dir) => substringDupStats(Tables.documents(s, dir)),
    Some {
      val gram8 = (0 until 8).map(j => s"toks[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
      s"""WITH t AS (
            SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z]+'),
                x -> x <> '') AS toks
            FROM documents),
          g AS (
            SELECT doc_id,
              CASE WHEN len(toks) < 8 THEN []
              ELSE list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
                i -> $gram8)) END AS grams
            FROM t),
          long AS (SELECT doc_id, unnest(grams) AS gram FROM g),
          dup AS (SELECT gram FROM long GROUP BY gram HAVING count(*) >= 2),
          per AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_grams
            FROM long WHERE gram IN (SELECT gram FROM dup)
            GROUP BY doc_id)
          SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
            coalesce(per.dup_grams, 0) AS dup_grams,
            round(CAST(coalesce(per.dup_grams, 0) AS DOUBLE) /
              nullif(len(g.grams), 0), 4) AS dup_frac
          FROM g LEFT JOIN per ON per.doc_id = g.doc_id"""
    })

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    * algorithm): hash every word-4-gram, slide a window of 4 consecutive
    * gram hashes, keep each window's MINIMUM. Guarantees any shared run
    * of ≥ 7 words contributes at least one COMMON fingerprint to both
    * documents, at ~1/4 the density of full substring hashing
    * (`dedup_substring` keeps every 8-gram; winnowing samples them
    * content-deterministically, so the index is 4× smaller for the same
    * detection floor).
    *
    * Scale shape: grams never LEAVE the row — the whole winnow (hash,
    * slide, min, distinct) is per-document ARRAY math inside one codegen'd
    * projection, so nothing shuffles at all (the earlier per-doc window
    * formulation shuffled every gram hash just to sort positions that the
    * generator already emits in order; at sf0.1 that was 4.3 s of pure
    * exchange for a map-side-computable value). Hashes are md5 hex
    * strings, minimum = lexicographic min — identical on both engines, no
    * tie ambiguity (min of a set, not argmin).
    */
  private[graft] def winnowFpArrays(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // coalesce(text, ''): NULL-text docs keep an empty-fingerprint row
    // (n_fp = 0) like the oracle's LEFT JOIN + coalesce, instead of a
    // NULL array whose size() diverges
    Tables.spread(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), expr("winnow_fps(coalesce(text, ''), 4, 4)").as("fps"))
  }

  /** Exploded (doc_id, fp) view of [[winnowFpArrays]] — the inverted-index
    * input shape (docs with no full window disappear, like the original
    * window formulation). The fp key is xxhash64 of the selected md5
    * fingerprint: winnowing SELECTION runs on md5 strings (lexicographic
    * window-min, oracle-identical), but downstream only needs key
    * EQUALITY — 8-byte longs in the checkpoint, the df aggregate and the
    * pair self-join instead of 32-char strings (the dedup_substring
    * ship-hashes-not-text lesson; same 64-bit collision stance). */
  private[graft] def winnowFingerprints(docs: DataFrame): DataFrame =
    winnowFpArrays(docs).select(col("doc_id"),
      explode(expr("transform(fps, f -> xxhash64(f))")).as("fp"))

  // Per-doc winnowing rollup. Docs too short for one full window keep a
  // row with n_fp = 0 (empty fingerprint array). The rollup reads the
  // per-doc array directly — no groupBy, no join, zero exchanges.
  private val dedupWinnowFp = Q(
    "dedup_winnow_fp",
    (s, dir) => {
      winnowFpArrays(Tables.documents(s, dir))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          coalesce(array_min(col("fps")), lit("")).as("fp_lo"),
          coalesce(array_max(col("fps")), lit("")).as("fp_hi"))
    },
    Some {
      val gram4 = (0 until 4).map(j => s"toks[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
      s"""WITH t AS (
            SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z]+'),
                x -> x <> '') AS toks
            FROM documents),
          g AS (
            SELECT doc_id, i, md5($gram4) AS h,
              greatest(len(toks) - 3, 0) AS n_grams
            FROM t, unnest(range(1, greatest(len(toks) - 2, 1))) AS u(i)),
          win AS (
            SELECT doc_id, i, n_grams,
              min(h) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g),
          fps AS (
            SELECT DISTINCT doc_id, fp FROM win WHERE i <= n_grams - 3),
          per AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
              min(fp) AS fp_lo, max(fp) AS fp_hi
            FROM fps GROUP BY doc_id)
          SELECT d.doc_id, coalesce(per.n_fp, 0) AS n_fp,
            coalesce(per.fp_lo, '') AS fp_lo, coalesce(per.fp_hi, '') AS fp_hi
          FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id"""
    })

  // MOSS-style match pairs: documents sharing ≥ 2 winnowing fingerprints,
  // ranked by how many they share. The inverted index (groupBy fp) is the
  // join; fingerprints appearing in > 50 docs are dropped as
  // stop-fingerprints BEFORE the self-join — the posting-list cap that
  // keeps a boilerplate phrase from exploding one bucket quadratically
  // (same guard as LSH band caps). Count per pair is partial-aggregable.
  private val dedupWinnowPairs = Q(
    "dedup_winnow_pairs",
    (s, dir) => {
      val fps = winnowFingerprints(Tables.documents(s, dir))
        .localCheckpoint(eager = true) // one tokenize pass feeds both join sides
      val df = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .where(col("df").between(2, 50)).select(col("fp"))
      val keep = fps.join(df, Seq("fp"))
      val a = keep.select(col("fp"), col("doc_id").as("doc_a"))
      val b = keep.select(col("fp"), col("doc_id").as("doc_b"))
      a.join(b, Seq("fp")).where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= 2)
    },
    Some {
      val gram4 = (0 until 4).map(j => s"toks[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
      s"""WITH t AS (
            SELECT doc_id,
              list_filter(string_split_regex(lower(coalesce(text, '')), '[^a-z]+'),
                x -> x <> '') AS toks
            FROM documents),
          g AS (
            SELECT doc_id, i, md5($gram4) AS h,
              greatest(len(toks) - 3, 0) AS n_grams
            FROM t, unnest(range(1, greatest(len(toks) - 2, 1))) AS u(i)),
          win AS (
            SELECT doc_id, i, n_grams,
              min(h) OVER (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM g),
          fps AS (
            SELECT DISTINCT doc_id, fp FROM win WHERE i <= n_grams - 3),
          keep AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING count(*) BETWEEN 2 AND 50)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(count(*) AS BIGINT) AS shared
          FROM fps a JOIN keep USING (fp) JOIN fps b USING (fp)
          WHERE a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
          HAVING count(*) >= 2"""
    })

  /** Soft deduplication (SoftDeDup-style reweighting): instead of DROPPING
    * near-duplicates, keep every document but DOWN-WEIGHT it by its
    * near-dup family size — sampling weight 1/m for a cluster of m — so
    * repeated content contributes one document's worth of expected
    * gradient mass while rare phrasing variants are still seen. The
    * aggregate corpus "effective mass" is preserved per cluster by
    * construction (Σ weights = n_clusters).
    *
    * Scale shape: on top of the CC pass (the same one dedup_clusters /
    * dedup_keep_best already run), ONE count aggregate over the
    * cluster-assignment frame and ONE join back — both keyed on the
    * cluster id, both partial-aggregable. Weights are integer ppm
    * (1000000 div m — exact on both engines); `is_canonical` marks the
    * min-id member so a consumer can recover hard dedup by filtering.
    */
  private val dedupSoft = Q(
    "dedup_soft",
    (s, dir) => {
      val asg = clusterAssignments(s, dir)
        .localCheckpoint(eager = true) // one CC pass feeds sizes + join back
      val sizes = asg.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"))
      asg.join(sizes, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"),
          expr("1000000 div cluster_size").as("weight_ppm"),
          (col("doc_id") === col("cluster")).as("is_canonical"))
    },
    Some(s"""WITH RECURSIVE $clustersOracleCte,
             sz AS (
               SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
               FROM clusters GROUP BY cluster)
             SELECT c.doc_id, c.cluster, sz.cluster_size,
               CAST(1000000 // sz.cluster_size AS BIGINT) AS weight_ppm,
               c.doc_id = c.cluster AS is_canonical
             FROM clusters c JOIN sz USING (cluster)"""))

  /** MinHash estimator audit: the agreement fraction of two documents'
    * signatures IS the textbook Jaccard estimator (P[mh_j(A) = mh_j(B)] =
    * J(A,B), so agree/k is unbiased) — this query measures that estimator
    * against the EXACT shingle-set Jaccard pairwise on the live candidate
    * pairs, the calibration every LSH threshold choice rests on (with
    * k = 12 hashes the rsd is ~√(J(1−J)/12), so large errors are expected
    * and the point is to SEE them).
    *
    * Scale shape: the corpus-wide pass carries ONLY the 12-int signature
    * (shuffle-light; candidate pairs derive from the same checkpointed
    * signatures, no second shingle pass); the EXPENSIVE per-doc artifact
    * — the distinct hashed shingle-set array, ~|text| longs — is built
    * only for documents that actually appear in a candidate pair (one
    * semi-join gates the second text scan), so exact-verification cost
    * scales with the near-dup population, not the corpus. On THIS
    * synthetic corpus the gate is perf-neutral (planted dups make 95% of
    * docs candidates — 110k pairs at sf0.1, where the verify joins'
    * array payload dominates at ~2.4 s); at a production near-dup rate
    * (a few %) it is the difference between shingling the corpus and
    * shingling the dup population. Exact-Jaccard elements are 8-byte
    * xxhash64 values — the dedup_ngram_jaccard collision stance.
    */
  private val dedupMinhashEst = Q(
    "dedup_minhash_est",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
        .where(col("text").isNotNull).select("doc_id", "text")
      // signatures + candidate pairs come from the session-shared
      // checkpointed artifact (CandidateArtifacts) — the whole LSH family
      // reads ONE materialized shingle+minhash pass
      val sigs = CandidateArtifacts.signatures(s, dir).select("doc_id", "mh")
      // the DEFAULT-capped candidate list (VERDICT r10 task 4): the
      // estimator pays per pair (two signature joins + two shingle-set
      // joins), so degenerate buckets wider than DefaultMaxBucket are
      // dropped BEFORE the self-join — Θ(n²)-by-answer-size on a
      // template-farm corpus becomes bounded, while every healthy driver
      // corpus is untouched (max measured bucket 100 at sf0.1;
      // LshScaleSpec pins capped ≡ uncapped there). The oracle applies
      // the identical cap in SQL. Built off the same checkpointed
      // signature artifact the uncapped pairs read.
      val pairs = CandidateArtifacts.cappedPairs(s, dir)
      val candDocs = pairs.select(col("a").as("doc_id"))
        .union(pairs.select(col("b"))).distinct()
      // native one-pass shingle-set builder: sorted distinct xxhash64 of
      // every 5-char window (identical values to the old
      // array_distinct(transform(..., xxhash64)) chain, pre-sorted so the
      // pair-level intersection is an allocation-free linear merge)
      val sh = Tables.spread(docs.join(candDocs, Seq("doc_id"), "left_semi"))
        .select(col("doc_id"), expr("char_shingle_hashes(text)").as("sh"))
        .withColumn("n", size(col("sh")).cast("long"))
        .localCheckpoint(eager = true) // both verify sides
      pairs
        .join(sigs.select(col("doc_id").as("a"), col("mh").as("ma")), "a")
        .join(sigs.select(col("doc_id").as("b"), col("mh").as("mb")), "b")
        .join(sh.select(col("doc_id").as("a"), col("sh").as("sa"),
          col("n").as("na")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh").as("sb"),
          col("n").as("nb")), "b")
        .select(col("a"), col("b"),
          expr("CAST(size(filter(zip_with(ma, mb, (x, y) -> x = y), v -> v)) AS BIGINT)")
            .as("agree"),
          expr("sorted_intersect_count(sa, sb)").as("inter"),
          col("na"), col("nb"))
        .select(col("a"), col("b"), col("agree"),
          expr(s"agree * 1000000 div $NumHashes").as("est_ppm"),
          expr("inter * 1000000 div (na + nb - inter)").as("exact_ppm"),
          expr(s"abs(agree * 1000000 div $NumHashes" +
            " - inter * 1000000 div (na + nb - inter))").as("err_ppm"))
    },
    Some {
      val mhDefs = (0 until NumHashes).map { j =>
        s"min((${A(j)} * x + ${B(j)}) % $P) AS mh$j"
      }.mkString(", ")
      val agree = (0 until NumHashes)
        .map(j => s"CASE WHEN x.mh$j = y.mh$j THEN 1 ELSE 0 END")
        .mkString("(", " + ", ")")
      s"""WITH $cappedCandPairsOracleCte,
          mhs AS (
            SELECT doc_id, $mhDefs
            FROM (SELECT doc_id, ${baseHashSql("md5(s)")} AS x
                  FROM (SELECT doc_id, unnest(
                          CASE WHEN length(text) < 5 THEN [text]
                          ELSE list_transform(range(1, length(text) - 3),
                                 i -> substr(text, i, 5)) END) AS s
                        FROM documents))
            GROUP BY doc_id),
          sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN length(text) < 5 THEN [text]
              ELSE list_transform(range(1, length(text) - 3),
                     i -> substr(text, i, 5)) END) AS s
            FROM documents)
          SELECT a, b, agree,
            agree * 1000000 // $NumHashes AS est_ppm,
            inter * 1000000 // (na + nb - inter) AS exact_ppm,
            abs(agree * 1000000 // $NumHashes
              - inter * 1000000 // (na + nb - inter)) AS err_ppm
          FROM (SELECT c.a, c.b,
                  CAST($agree AS BIGINT) AS agree,
                  CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS inter,
                  CAST(len(sa.s) AS BIGINT) AS na,
                  CAST(len(sb.s) AS BIGINT) AS nb
                FROM cand c
                JOIN mhs x ON x.doc_id = c.a
                JOIN mhs y ON y.doc_id = c.b
                JOIN sh sa ON sa.doc_id = c.a
                JOIN sh sb ON sb.doc_id = c.b)"""
    })

  // The LSH S-curve of THIS engine's banding config — the design-point
  // readout a dedup operator tunes against: with b bands of r rows the
  // probability two docs at Jaccard similarity s become candidates is
  // 1 − (1 − s^r)^b; the table makes the configured trade-off (miss
  // rate below the knee vs false-candidate rate above it) inspectable
  // next to the measured recall specs. Constants are spliced from
  // MinHashSignature (NumHashes/BandSize — the ONE config definition),
  // so a banding change moves this readout in lockstep. Determinism
  // without pow(): s = i/20, so (1 − s^r)^b = (20^r − i^r)^b / 20^(r·b)
  // — both EXACT BIGINTs under 2^53 at (r, b) = (3, 4), hence exactly
  // representable doubles, and the single IEEE division + round is
  // bit-identical on both engines. 19 literal rows — no scan at all.
  private val dedupLshScurve = {
    import graft.functions.MinHashSignature.{NumHashes, BandSize}
    val r = BandSize
    val b = NumHashes / BandSize
    val base = Seq.fill(r)(20L).product // 20^r
    val denb = Seq.fill(b)(base).product // 20^(r·b) < 2^53
    require(denb < (1L << 53), "LSH S-curve exactness bound exceeded")
    val iPowR = Seq.fill(r)("i").mkString(" * ") // i^r as repeated multiply
    val numB = Seq.fill(b)(s"($base - $iPowR)").mkString(" * ") // (20^r − i^r)^b
    val collide =
      s"""CAST(round((1.0 - CAST($numB AS DOUBLE) / $denb.0) * 1000000.0, 0)
          AS BIGINT)"""
    Q(
      "dedup_lsh_scurve",
      (s, dir) =>
        s.range(1, 20).toDF("i").select(
          expr("i * 5").as("s_pct"),
          expr(collide).as("collide_ppm"),
          lit(b.toLong).as("bands"),
          lit(r.toLong).as("rows_per_band")),
      Some(s"""SELECT CAST(i * 5 AS BIGINT) AS s_pct,
                 $collide AS collide_ppm,
                 CAST($b AS BIGINT) AS bands,
                 CAST($r AS BIGINT) AS rows_per_band
               FROM (SELECT unnest(range(1, 20)) AS i)"""))
  }

  /** LSH band observability (VERDICT r10 task 4) — the banding twin of
    * `skew_diagnose`: the band-bucket WIDTH histogram per band, with
    * each width class's exact pairwise-verification bill
    * (n_buckets · C(bw, 2)) and whether it falls past the
    * [[DefaultMaxBucket]] cap. This is the readout that makes the
    * degenerate-corpus regime VISIBLE before it bites: on a healthy
    * corpus every row has `over_cap = false` and the pairs column sums
    * to the `dedup_minhash_pairs` bound; on a template-farm/tiny-vocab
    * shard the over_cap rows carry almost the entire quadratic mass —
    * exactly what the capped verify stages drop. Runs off the
    * session-shared signature artifact: one stack + two map-side-
    * combined aggregates, output bounded by the distinct width classes
    * (≪ corpus), nothing pairwise is ever materialized. */
  private val lshBandStats = Q(
    "lsh_band_stats",
    (s, dir) => {
      val long = stackBands(CandidateArtifacts.signatures(s, dir))
      long.groupBy(col("band_no"), col("band_hash"))
        .agg(count(lit(1)).as("bw"))
        .groupBy(col("band_no"), col("bw"))
        .agg(count(lit(1)).as("n_buckets"))
        .select(col("band_no").cast("long").as("band_no"),
          col("bw"), col("n_buckets"),
          expr("n_buckets * (bw * (bw - 1) div 2)").as("pairs_bound"),
          (col("bw") > DefaultMaxBucket).as("over_cap"))
    },
    Some {
      val bandUnion = (0 until NumHashes / BandSize)
        .map(b => s"SELECT doc_id, $b AS band_no, band$b AS band_hash FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH sig AS ($minhashOracle),
          long AS ($bandUnion),
          w AS (
            SELECT band_no, band_hash, CAST(count(*) AS BIGINT) AS bw
            FROM long GROUP BY band_no, band_hash)
          SELECT CAST(band_no AS BIGINT) AS band_no, bw,
            CAST(count(*) AS BIGINT) AS n_buckets,
            CAST(count(*) AS BIGINT) * (bw * (bw - 1) // 2) AS pairs_bound,
            bw > $DefaultMaxBucket AS over_cap
          FROM w GROUP BY band_no, bw"""
    })

  val all: Seq[Q] = Seq(dedupMinhash, dedupMinhashPairs, dedupSimhash,
    dedupNgramJaccard, dedupClusters, splitLeakageSafe, corpusClean,
    dedupIncremental, dedupSubstring, dedupWinnowFp, dedupWinnowPairs,
    dedupKeepBest, minePreferencePairs, dedupSoft, dedupMinhashEst,
    dedupLshScurve, lshBandStats)
}
