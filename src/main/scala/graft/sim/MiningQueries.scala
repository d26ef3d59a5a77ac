package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Cross-lingual parallel-corpus mining — the margin-based mate-retrieval
  * step every multilingual pretraining pipeline runs to pair translations
  * across languages (ratio margin of Artetxe & Schwenk, "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings", ACL'19 —
  * the CCMatrix / LASER mining rule):
  *
  *   margin(x, y) = cos(x, y) / ((fwdK(x) + bwdK(y)) / 2)
  *
  * where fwdK(x) is the mean cosine of x's top-k target-side neighbors and
  * bwdK(y) the mean over y's top-k source-side neighbors. Normalizing by
  * both neighborhoods suppresses "hub" vectors that are near everything —
  * raw cosine keeps them, the margin demotes them.
  *
  * Scale shape: scoring broadcasts the SMALLER language side (low-resource
  * mining is exactly the case where one side is orders of magnitude
  * smaller); the source side never shuffles. Both k-NN denominators and
  * the final best-mate pick are per-key top-k over the shared scored
  * frame — checkpointed once, consumed three times. When both sides are
  * web-scale the scored frame comes from a bucketed candidate generator
  * instead (the `lshBuckets`/`multiprobeTopK` machinery in SimQueries —
  * production mining uses ANN k-NN for the same reason); the margin math
  * downstream is identical equi-joins either way.
  *
  * Determinism: cosines are dot_ordered folds (bit-exact both engines);
  * the k-NN means fold the top-k cosines in descending sorted order on
  * both engines (ties are equal doubles, so intra-tie order cannot change
  * the fold); ranking uses raw doubles with id tiebreaks; rounding to 6
  * places happens only on output.
  */
object MiningQueries {

  private val K = 4 // neighbors per side in the margin denominator

  private def dotExpr(a: String, b: String): String = s"dot_ordered($a, $b)"

  /** Mean of the top-K cosines per `key`, summed in descending order —
    * via the k-bounded TopKByValue Aggregator (map-side ≤ K rows per
    * key), NOT a rank window: the window idiom hash-partitions and sorts
    * the full |src|×|tgt| scored frame per side only to keep K rows per
    * key. The aggregator returns (value, id) pairs already in descending
    * value order, so the fold order (and the mean) is identical; ties at
    * the K boundary carry equal values either way. */
  private def knnMean(scored: DataFrame, key: String, other: String,
      out: String): DataFrame = {
    val tk = udaf(new graft.functions.TopKByValue(K),
      graft.functions.TopKByValue.inputEncoder)
    scored.groupBy(col(key))
      .agg(tk(col("cos"), col(other)).as("top"))
      .select(col(key), (expr(
        """aggregate(transform(top, e -> e._1),
             CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
        / size(col("top")).cast("double")).as(out))
  }

  private val mineBitext = Q(
    "mine_bitext",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val lang = Tables.documents(s, dir)
        .select(col("doc_id").as("vec_id"), col("lang"))
      val vecs = Tables.embeddings(s, dir).join(lang, "vec_id")
        .select(col("vec_id"), col("lang"), col("embedding"),
          expr(dotExpr("embedding", "embedding")).as("norm2"))
      val src = vecs.where(col("lang") === "en")
        .select(col("vec_id").as("src_id"), col("embedding").as("s_emb"),
          col("norm2").as("s_n"))
      val tgt = vecs.where(col("lang") === "de")
        .select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"),
          col("norm2").as("t_n"))
      // exact-mining baseline: target side broadcast, source side rides its
      // scan; swap in a bucketed candidate join for web-scale × web-scale
      val scored = src.join(broadcast(tgt))
        .select(col("src_id"), col("tgt_id"),
          (expr(dotExpr("s_emb", "t_emb")) / sqrt(col("s_n") * col("t_n")))
            .as("cos"))
        .localCheckpoint(eager = true) // feeds fwd, bwd, and the margin join
      val fwd = knnMean(scored, "src_id", "tgt_id", "fwd")
      val bwd = knnMean(scored, "tgt_id", "src_id", "bwd")
      val margins = scored.join(fwd, "src_id").join(bwd, "tgt_id")
        .withColumn("margin", col("cos") / ((col("fwd") + col("bwd")) / 2.0))
      val wBest = Window.partitionBy(col("src_id"))
        .orderBy(col("margin").desc, col("tgt_id"))
      margins.withColumn("rn", row_number().over(wBest)).where(col("rn") === 1)
        .select(col("src_id"), col("tgt_id"),
          round(col("cos"), 6).as("cos"),
          round(col("margin"), 6).as("margin"),
          (col("margin") > lit(1.0)).as("accepted"))
    },
    Some {
      def dot(a: String, b: String) = SimOracle.dot(a, b)
      s"""WITH v AS (
            SELECT e.vec_id, d.lang, e.embedding,
              ${dot("e.embedding", "e.embedding")} AS norm2
            FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
          s AS (SELECT vec_id AS src_id, embedding AS s_emb, norm2 AS s_n
                FROM v WHERE lang = 'en'),
          t AS (SELECT vec_id AS tgt_id, embedding AS t_emb, norm2 AS t_n
                FROM v WHERE lang = 'de'),
          scored AS (
            SELECT src_id, tgt_id,
              ${dot("s_emb", "t_emb")} / sqrt(s_n * t_n) AS cos
            FROM s, t),
          fr AS (SELECT src_id, cos, row_number() OVER (
                   PARTITION BY src_id ORDER BY cos DESC, tgt_id) AS rk
                 FROM scored),
          fwd AS (SELECT src_id,
                    list_sum(list_sort(list(cos), 'DESC'))
                      / CAST(count(*) AS DOUBLE) AS fwd
                  FROM fr WHERE rk <= $K GROUP BY src_id),
          br AS (SELECT tgt_id, cos, row_number() OVER (
                   PARTITION BY tgt_id ORDER BY cos DESC, src_id) AS rk
                 FROM scored),
          bwd AS (SELECT tgt_id,
                    list_sum(list_sort(list(cos), 'DESC'))
                      / CAST(count(*) AS DOUBLE) AS bwd
                  FROM br WHERE rk <= $K GROUP BY tgt_id),
          m AS (SELECT sc.src_id, sc.tgt_id, sc.cos,
                  sc.cos / ((f.fwd + b.bwd) / 2.0) AS margin
                FROM scored sc
                JOIN fwd f USING (src_id) JOIN bwd b USING (tgt_id)),
          best AS (SELECT src_id, tgt_id, cos, margin,
                     row_number() OVER (PARTITION BY src_id
                       ORDER BY margin DESC, tgt_id) AS rn
                   FROM m)
          SELECT src_id, tgt_id, round(cos, 6) AS cos,
            round(margin, 6) AS margin, margin > 1.0 AS accepted
          FROM best WHERE rn = 1"""
    })

  /** Per-document n-gram novelty — the duplication-adjusted data-selection
    * signal (what fraction of a doc's distinct word-5-grams appears in NO
    * other document). Boilerplate-heavy and templated docs score low;
    * genuinely fresh text scores high. Corpus-level dedup (MinHash/LSH)
    * removes whole near-dup docs; novelty grades the remainder
    * continuously.
    *
    * Scale shape: one codegen'd shingling pass (native word_ngrams,
    * distinct per doc), explode → ONE hash aggregate keyed by gram for
    * document frequency, join back on gram, one doc-keyed aggregate. No
    * self-joins, no windows; both aggregates are map-side-combinable. The
    * gram join key is the 5-gram string; at 100 TB you'd xxhash64 it to a
    * LONG first (the jaccard query shows that trick) — kept as the string
    * here so the oracle shares the exact key.
    */
  private val textNovelty = Q(
    "text_novelty",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val grams = Tables.spread(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          explode(expr("word_ngrams(text, 5, true)")).as("gram"))
        .localCheckpoint(eager = true) // feeds the df agg and the per-doc count
      // A novel gram (df = 1) has exactly one owning doc, and the df
      // aggregate itself can name it — min(doc_id) of a 1-row group. So
      // per-doc novelty is a second SMALL aggregate over the df = 1 rows,
      // not a join of the corpus-sized gram frame back onto its own
      // frequency table (that join re-shuffled every gram string and was
      // most of this query's 11 s at sf0.1; same rewrite as
      // dedup_substring).
      val novel = grams.groupBy(col("gram"))
        .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
        .where(col("df") === 1L)
        .groupBy(col("owner")).agg(count(lit(1)).as("novel"))
        .withColumnRenamed("owner", "doc_id")
      val per = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        .join(novel, Seq("doc_id"), "left")
      docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("novel"), lit(0L)).as("novel"),
          round(coalesce(col("novel").cast("double")
            / col("n_grams").cast("double"), lit(0.0)), 6).as("novelty"))
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  t -> t <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id, unnest(
                CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
                ELSE list_distinct(list_transform(range(1, len(toks) - 3),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
                                 toks[i+3], toks[i+4]))) END) AS gram
              FROM toks),
            df AS (SELECT gram, CAST(count(*) AS BIGINT) AS df
                   FROM g GROUP BY gram),
            per AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS novel
              FROM g JOIN df USING (gram) GROUP BY doc_id)
            SELECT d.doc_id,
              coalesce(n_grams, 0) AS n_grams,
              coalesce(novel, 0) AS novel,
              round(coalesce(CAST(novel AS DOUBLE) / CAST(n_grams AS DOUBLE),
                             0.0), 6) AS novelty
            FROM documents d LEFT JOIN per USING (doc_id)"""))

  /** Composite quality ranking — z-score-normalize three cheap per-doc
    * signals against the corpus and average them (the ensemble shape
    * data-curation stacks use to blend heterogeneous quality signals
    * into one comparable scale before thresholding):
    *
    *   s_len   — n_chars (document length)
    *   s_lex   — lexical diversity, ppm: 10⁶ · |distinct tokens| / |tokens|
    *   s_alpha — alphabetic density, ppm: 10⁶ · |[A-Za-z] chars| / n_chars
    *
    * Determinism follows anomaly_zscore's §7.4.1 recipe: signals are
    * exact integers (ppm-quantized with BIGINT `div`), corpus moments are
    * ONE aggregate of exact sums, and every double op downstream is the
    * same written expression on both engines. The sums of squares use
    * DECIMAL accumulators — at 10¹²⁺ documents a ppm-squared BIGINT sum
    * (10¹² per row) overflows int64, and ANSI mode would kill the job;
    * decimal(38) keeps the accumulator exact to 10³⁸ (DuckDB's HUGEINT
    * does the same on the oracle side).
    *
    * Scale shape: one scan computing signals → one 1-row moment
    * aggregate, broadcast back over the stream → per-row math. No
    * shuffle wider than the scalar aggregate, no window, no join keyed
    * on data.
    */
  private val qualityEnsemble = Q(
    "quality_ensemble",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val sig = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars").as("s_len"), expr(
          """CASE WHEN size(word_ngrams(text, 1, false)) = 0 THEN CAST(0 AS BIGINT)
             ELSE (CAST(1000000 AS BIGINT)
                   * CAST(size(array_distinct(word_ngrams(text, 1, false))) AS BIGINT))
                  div CAST(size(word_ngrams(text, 1, false)) AS BIGINT) END""")
          .as("s_lex"), expr(
          """CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
             ELSE (CAST(1000000 AS BIGINT)
                   * CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS BIGINT))
                  div n_chars END""").as("s_alpha"))
        .localCheckpoint(eager = true) // one tokenize; moments + output
      val stats = sig.agg(
        count(lit(1)).as("n"),
        sum(col("s_len")).as("len_s"),
        sum(expr("CAST(s_len AS DECIMAL(19,0)) * CAST(s_len AS DECIMAL(19,0))")).as("len_ss"),
        sum(col("s_lex")).as("lex_s"),
        sum(expr("CAST(s_lex AS DECIMAL(19,0)) * CAST(s_lex AS DECIMAL(19,0))")).as("lex_ss"),
        sum(col("s_alpha")).as("alpha_s"),
        sum(expr("CAST(s_alpha AS DECIMAL(19,0)) * CAST(s_alpha AS DECIMAL(19,0))")).as("alpha_ss"))
      def z(sc: String, sums: String, sq: String): org.apache.spark.sql.Column =
        expr(s"""coalesce(
             round((CAST($sc AS DOUBLE) - CAST($sums AS DOUBLE) / CAST(n AS DOUBLE))
               / nullif(sqrt(greatest((CAST($sq AS DOUBLE)
                   - CAST($sums AS DOUBLE) * CAST($sums AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE), 0.0)), 0.0), 4) + 0.0, 0.0)""")
      sig.crossJoin(broadcast(stats))
        .withColumn("z_len", z("s_len", "len_s", "len_ss"))
        .withColumn("z_lex", z("s_lex", "lex_s", "lex_ss"))
        .withColumn("z_alpha", z("s_alpha", "alpha_s", "alpha_ss"))
        .withColumn("score",
          expr("round((z_len + z_lex + z_alpha) / 3.0, 4) + 0.0"))
        .select(col("doc_id"), col("s_len"), col("s_lex"), col("s_alpha"),
          col("z_len"), col("z_lex"), col("z_alpha"), col("score"),
          (col("score") > lit(-0.5)).as("keep"))
    },
    Some("""WITH sig AS (
              SELECT doc_id, n_chars AS s_len,
                CASE WHEN len(toks) = 0 THEN CAST(0 AS BIGINT)
                     ELSE (1000000 * CAST(len(list_distinct(toks)) AS BIGINT))
                          // CAST(len(toks) AS BIGINT) END AS s_lex,
                CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
                     ELSE (1000000 * CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT))
                          // n_chars END AS s_alpha
              FROM (SELECT doc_id, text, n_chars,
                      list_filter(string_split_regex(lower(text), '[^a-z]+'),
                        t -> t <> '') AS toks
                    FROM documents)),
            stats AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                sum(s_len) AS len_s, sum(s_len * s_len) AS len_ss,
                sum(s_lex) AS lex_s, sum(s_lex * s_lex) AS lex_ss,
                sum(s_alpha) AS alpha_s, sum(s_alpha * s_alpha) AS alpha_ss
              FROM sig),
            z AS (
              SELECT doc_id, s_len, s_lex, s_alpha,
                coalesce(round((CAST(s_len AS DOUBLE) - CAST(len_s AS DOUBLE) / CAST(n AS DOUBLE))
                  / nullif(sqrt(greatest((CAST(len_ss AS DOUBLE)
                      - CAST(len_s AS DOUBLE) * CAST(len_s AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE), 0.0)), 0.0), 4) + 0.0, 0.0) AS z_len,
                coalesce(round((CAST(s_lex AS DOUBLE) - CAST(lex_s AS DOUBLE) / CAST(n AS DOUBLE))
                  / nullif(sqrt(greatest((CAST(lex_ss AS DOUBLE)
                      - CAST(lex_s AS DOUBLE) * CAST(lex_s AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE), 0.0)), 0.0), 4) + 0.0, 0.0) AS z_lex,
                coalesce(round((CAST(s_alpha AS DOUBLE) - CAST(alpha_s AS DOUBLE) / CAST(n AS DOUBLE))
                  / nullif(sqrt(greatest((CAST(alpha_ss AS DOUBLE)
                      - CAST(alpha_s AS DOUBLE) * CAST(alpha_s AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n AS DOUBLE), 0.0)), 0.0), 4) + 0.0, 0.0) AS z_alpha
              FROM sig, stats)
            SELECT doc_id, s_len, s_lex, s_alpha, z_len, z_lex, z_alpha,
              round((z_len + z_lex + z_alpha) / 3.0, 4) + 0.0 AS score,
              (round((z_len + z_lex + z_alpha) / 3.0, 4) + 0.0) > -0.5 AS keep
            FROM z"""))

  /** MMR diversity selection (Carbonell & Goldstein, SIGIR'98) — pick k
    * documents maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    * selected: the data-selection step that stops a quality-ranked corpus
    * sample from being twenty copies of the same best document.
    *
    * Scale shape: the DISTRIBUTED part is candidate generation — a
    * TakeOrdered top-20 by relevance (per-partition partial top-k) joined
    * to the embedding table. The greedy selection itself is inherently
    * sequential (each pick depends on all prior picks), runs over the
    * BOUNDED 20-row pool on the driver (the trained-centroid pattern:
    * collect is capped by construction, never corpus-sized), and every
    * double op — ordered dot fold, λ-affine, max — is mirrored exactly by
    * the oracle's five chained MATERIALIZED stages, so the argmax
    * sequence is bit-identical.
    */
  private val MmrPoolSize = 20
  private val MmrK = 5

  private val selectMmr = Q(
    "select_mmr",
    (s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // relevance = lexical-diversity ppm (exact integer, quality_ensemble's
      // s_lex); candidate pool = top-20 by (rel desc, doc_id)
      val rel = Tables.documents(s, dir)
        .select(col("doc_id"), expr(
          """CASE WHEN size(word_ngrams(text, 1, false)) = 0 THEN CAST(0 AS BIGINT)
             ELSE (CAST(1000000 AS BIGINT)
                   * CAST(size(array_distinct(word_ngrams(text, 1, false))) AS BIGINT))
                  div CAST(size(word_ngrams(text, 1, false)) AS BIGINT) END""")
          .as("rel_ppm"))
      val pool = rel.orderBy(col("rel_ppm").desc, col("doc_id")).limit(MmrPoolSize)
        .join(Tables.embeddings(s, dir)
          .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
        .select(col("doc_id"), col("rel_ppm"), col("embedding"))
        .as[(Long, Long, Array[Float])]
        .collect().toSeq // bounded: exactly MmrPoolSize rows by construction
      // ordered left fold in double — element-for-element the same op
      // sequence as dot_ordered / the oracle's list_sum(list_transform)
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
        acc
      }
      val norm = pool.map { case (id, _, e) => id -> math.sqrt(dot(e, e)) }.toMap
      val emb = pool.map { case (id, _, e) => id -> e }.toMap
      def cos(a: Long, b: Long): Double = dot(emb(a), emb(b)) / (norm(a) * norm(b))
      val Lam = 0.5
      var selected = Vector.empty[(Long, Long, Double)] // (doc_id, rel, score)
      var remaining = pool.map { case (id, r, _) => (id, r) }
      while (selected.size < MmrK && remaining.nonEmpty) {
        val scored = remaining.map { case (id, r) =>
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.map(sel => cos(id, sel._1)).max
          (id, r, Lam * (r.toDouble / 1000000.0) - (1.0 - Lam) * maxSim)
        }
        val best = scored.minBy { case (id, _, sc) => (-sc, id) }
        selected :+= best
        remaining = remaining.filterNot(_._1 == best._1)
      }
      selected.zipWithIndex.map { case ((id, r, sc), i) =>
        ((i + 1).toLong, id, r, BigDecimal(sc).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
      }.toDF("rk", "doc_id", "rel_ppm", "score")
    },
    Some {
      val dotAB = SimOracle.dot("a.embedding", "b.embedding")
      def stage(i: Int): String = {
        val prev = (1 until i).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")
        val selectedCte = if (i == 1) "" else s"sel$i AS MATERIALIZED ($prev),"
        val maxSim =
          if (i == 1) "0.0"
          else s"""(SELECT max($dotAB / (sqrt(a.norm) * sqrt(b.norm)))
                   FROM pool a JOIN pool b ON a.doc_id = c.doc_id
                   WHERE b.doc_id IN (SELECT doc_id FROM sel$i))"""
        val notIn = if (i == 1) ""
          else s"WHERE c.doc_id NOT IN (SELECT doc_id FROM sel$i)"
        s"""${selectedCte}
            s$i AS MATERIALIZED (
              SELECT CAST($i AS BIGINT) AS rk, c.doc_id, c.rel_ppm,
                0.5 * (CAST(c.rel_ppm AS DOUBLE) / 1000000.0)
                  - 0.5 * $maxSim AS raw_score
              FROM pool c $notIn
              ORDER BY raw_score DESC, c.doc_id LIMIT 1)"""
      }
      s"""WITH rel AS MATERIALIZED (
            SELECT doc_id,
              CASE WHEN len(toks) = 0 THEN CAST(0 AS BIGINT)
                   ELSE (1000000 * CAST(len(list_distinct(toks)) AS BIGINT))
                        // CAST(len(toks) AS BIGINT) END AS rel_ppm
            FROM (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '[^a-z]+'),
                      t -> t <> '') AS toks
                  FROM documents)),
          pool AS MATERIALIZED (
            SELECT r.doc_id, r.rel_ppm, e.embedding,
              list_sum(list_transform(range(1, 65),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
                AS norm
            FROM (SELECT doc_id, rel_ppm FROM rel
                  ORDER BY rel_ppm DESC, doc_id LIMIT $MmrPoolSize) r
            JOIN embeddings e ON e.vec_id = r.doc_id),
          ${(1 to MmrK).map(stage).mkString(",\n")}
          SELECT rk, doc_id, rel_ppm,
            round(raw_score, 6) + 0.0 AS score
          FROM (${(1 to MmrK).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")})"""
    })

  /** Hard-negative mining for contrastive retrieval training (the DPR /
    * E5 / sentence-transformers recipe): for each query vector, the
    * top-k most-similar vectors with a DIFFERENT label — the negatives a
    * bi-encoder most needs to separate. `outranks_pos` flags negatives
    * scoring above the query's best same-label positive: retrieval
    * failures worth routing to human review, since at corpus scale they
    * are as often labeling noise (false negatives) as model errors.
    *
    * Scale shape: the bounded query set broadcasts, the corpus rides its
    * scan; per-query top-k goes through the k-bounded TopKByValue
    * Aggregator (shuffle carries ≤ k rows per query × partition — no
    * rank window, no per-key sort; `topk_per_key` proves the shape). The
    * best-positive frame is one MAX aggregate, |Q| rows, broadcast back.
    * At web scale the scored frame comes from the ANN candidate
    * generators (lshBuckets / trained IVF) instead of the exact product;
    * everything downstream of `scored` is identical.
    *
    * Determinism: cosines are dot_ordered folds (bit-exact both
    * engines); the outranks flag compares RAW doubles (rounding happens
    * only on output); TopKByValue's (cos DESC, vec_id ASC) total order
    * matches the oracle's window row-for-row.
    */
  private val HnK = 5

  private val mineHardNegatives = Q(
    "mine_hard_negatives",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val vecs = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"),
          expr(dotExpr("embedding", "embedding")).as("norm2"))
        .localCheckpoint(eager = true) // query side + corpus side
      val queries = vecs.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
        .localCheckpoint(eager = true) // positives pass + negatives pass
      val bestPos = scored.where(col("label") === col("q_label"))
        .groupBy(col("q_id")).agg(max(col("cos")).as("pos_cos"))
      val tk = udaf(new graft.functions.TopKByValue(HnK),
        graft.functions.TopKByValue.inputEncoder)
      scored.where(col("label") =!= col("q_label"))
        .groupBy(col("q_id"), col("q_label"))
        .agg(tk(col("cos"), col("vec_id")).as("top"))
        .select(col("q_id"), col("q_label"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .join(broadcast(bestPos), Seq("q_id"), "left")
        .select(col("q_id"), col("q_label").cast("long").as("q_label"),
          col("e._2").as("vec_id"),
          round(col("e._1"), 6).as("cos"),
          (col("pos") + 1).cast("long").as("rk"),
          round(coalesce(col("pos_cos"), lit(-2.0)), 6).as("pos_cos"),
          (col("e._1") > coalesce(col("pos_cos"), lit(-2.0))).as("outranks_pos"))
    },
    Some {
      def dot(a: String, b: String) = SimOracle.dot(a, b)
      s"""WITH v AS (
            SELECT vec_id, label, embedding,
              ${dot("embedding", "embedding")} AS norm2
            FROM embeddings),
          scored AS MATERIALIZED (
            SELECT q.vec_id AS q_id, q.label AS q_label,
              a.vec_id AS vec_id, a.label AS label,
              ${dot("a.embedding", "q.embedding")}
                / sqrt(a.norm2 * q.norm2) AS cos
            FROM v a
            JOIN v q ON q.vec_id < 8 AND a.vec_id <> q.vec_id),
          pos AS (
            SELECT q_id, max(cos) AS pos_cos
            FROM scored WHERE label = q_label GROUP BY q_id),
          negs AS (
            SELECT q_id, q_label, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
            FROM scored WHERE label <> q_label)
          SELECT n.q_id, CAST(n.q_label AS BIGINT) AS q_label, n.vec_id,
            round(n.cos, 6) AS cos, n.rk,
            round(coalesce(p.pos_cos, -2.0), 6) AS pos_cos,
            n.cos > coalesce(p.pos_cos, -2.0) AS outranks_pos
          FROM negs n LEFT JOIN pos p USING (q_id)
          WHERE n.rk <= $HnK"""
    })

  /** NDCG@10 retrieval evaluation — the ranking-quality readout the ANN
    * family (bruteforce / LSH / IVF / PQ variants) is ultimately graded
    * by: per query, retrieve the top-10 cosine neighbors, gain 1 where
    * the neighbor shares the query's label, discount by 1/log₂(pos+1).
    *
    * Determinism without cross-engine logarithms: the discount column is
    * a FIXED micro-unit table computed once in Scala and interpolated as
    * the SAME literal array into the Spark expression and the DuckDB SQL
    * — DCG/IDCG are then exact BIGINT sums and the final NDCG one
    * integer division. IDCG truncates the cumulative-discount table at
    * min(n_rel, 10), the standard ideal-ranking normalization.
    *
    * Scale shape: query set broadcast (8 rows), corpus never shuffles
    * for scoring; per-query top-10 via the k-bounded TopKByValue
    * Aggregator (map-side, no rank window); relevance labels attach by
    * broadcasting the EXPLODED top-k list (queries × 10 rows, bounded by
    * the evaluation, never the corpus) back against the vector scan.
    */
  private val NdcgK = 10

  private val evalNdcg = Q(
    "eval_ndcg",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val disc = (1 to NdcgK).map(p => math.round(1e6 / log2(p + 1.0)))
      val cum = disc.scanLeft(0L)(_ + _).tail
      val vecs = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"),
          expr(dotExpr("embedding", "embedding")).as("norm2"))
        .localCheckpoint(eager = true) // query side + corpus side + labels
      val queries = vecs.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
        .localCheckpoint(eager = true) // top-k pass + n_rel pass
      val nRel = scored.where(col("label") === col("q_label"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_rel"))
      val tk = udaf(new graft.functions.TopKByValue(NdcgK),
        graft.functions.TopKByValue.inputEncoder)
      val topE = scored.groupBy(col("q_id"), col("q_label"))
        .agg(tk(col("cos"), col("vec_id")).as("top"))
        .select(col("q_id"), col("q_label"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("q_id"), col("q_label"), col("e._2").as("vec_id"),
          expr(s"element_at(array(${disc.mkString(", ")}L), CAST(pos + 1 AS INT))")
            .as("d_micro"))
      vecs.select(col("vec_id"), col("label"))
        .join(broadcast(topE), "vec_id")
        .groupBy(col("q_id"), col("q_label"))
        .agg(sum(when(col("label") === col("q_label"), col("d_micro"))
          .otherwise(lit(0L))).as("dcg_micro"))
        // LEFT join + coalesce: a query whose label has zero same-label
        // corpus rows has no nRel row — an inner join would silently drop
        // it, leaving the documented n_rel = 0 → -1 branch unreachable
        // (ADVICE r04). With the left join the degenerate query emits its
        // row with dcg_micro = 0 and ndcg_ppm = -1 on both engines.
        .join(broadcast(nRel), Seq("q_id"), "left")
        .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
        .select(col("q_id"), col("q_label").cast("long").as("q_label"),
          col("n_rel"), col("dcg_micro"),
          expr(s"""CASE WHEN n_rel = 0 THEN -1
            ELSE (dcg_micro * 1000000) div element_at(
              array(${cum.mkString(", ")}L),
              CAST(least(n_rel, $NdcgK) AS INT)) END""").as("ndcg_ppm"))
    },
    Some {
      def dot(a: String, b: String) = SimOracle.dot(a, b)
      def log2(x: Double) = math.log(x) / math.log(2.0)
      val disc = (1 to NdcgK).map(p => math.round(1e6 / log2(p + 1.0)))
      val cum = disc.scanLeft(0L)(_ + _).tail
      s"""WITH v AS (
            SELECT vec_id, label, embedding,
              ${dot("embedding", "embedding")} AS norm2
            FROM embeddings),
          scored AS MATERIALIZED (
            SELECT q.vec_id AS q_id, q.label AS q_label,
              a.vec_id AS vec_id, a.label AS label,
              ${dot("a.embedding", "q.embedding")}
                / sqrt(a.norm2 * q.norm2) AS cos
            FROM v a
            JOIN v q ON q.vec_id < 8 AND a.vec_id <> q.vec_id),
          nrel AS (
            SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel
            FROM scored WHERE label = q_label GROUP BY q_id),
          topk AS (
            SELECT q_id, q_label, label, rk FROM (
              SELECT q_id, q_label, label,
                CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
              FROM scored)
            WHERE rk <= $NdcgK),
          dcg AS (
            SELECT q_id, q_label,
              CAST(sum(CASE WHEN label = q_label
                THEN [${disc.mkString(", ")}][CAST(rk AS INT)]
                ELSE 0 END) AS BIGINT) AS dcg_micro
            FROM topk GROUP BY q_id, q_label)
          SELECT d.q_id, CAST(d.q_label AS BIGINT) AS q_label,
            coalesce(n.n_rel, 0) AS n_rel,
            d.dcg_micro,
            CASE WHEN coalesce(n.n_rel, 0) = 0 THEN -1
            ELSE (d.dcg_micro * 1000000)
              // [${cum.mkString(", ")}][CAST(least(n.n_rel, $NdcgK) AS INT)]
            END AS ndcg_ppm
          FROM dcg d LEFT JOIN nrel n USING (q_id)"""
    })

  /** Matryoshka (MRL) truncation evaluation: how much retrieval quality
    * survives when the 64-dim embedding is truncated to its 16-dim prefix
    * — the measurement behind serving MRL embeddings at a fraction of the
    * index cost. For each query, exact top-3 by full-dim cosine and by
    * prefix cosine, and the overlap between the two lists (recall@3 of
    * the truncated index against the full-dim ground truth).
    *
    * Scale shape: ONE broadcast-query scan scores both metrics per
    * (corpus row, query) — the prefix dot is not a second pass — and both
    * top-3s ride a single groupBy with two k-bounded TopKByValue
    * aggregates (map-side ≤ k rows each, no rank window). Lists render as
    * comma-joined id strings so the output stays array-free for the
    * oracle hash.
    */
  /** (q_id, vec_id, cos64, cos16) for the 5-query Matryoshka evaluation
    * set — every corpus row scored against every query at full dim AND
    * the 16-dim prefix in one broadcast-query scan. Checkpointed: shared
    * by embed_mrl_recall and eval_kendall_tau (and by kendall's two
    * internal passes). */
  private def mrlScored(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        expr("slice(embedding, 1, 16)").as("emb16"),
        expr(dotExpr("embedding", "embedding")).as("n64"),
        expr("dot_ordered(slice(embedding, 1, 16), slice(embedding, 1, 16))")
          .as("n16"))
      .localCheckpoint(eager = true) // query side + corpus side
    val queries = vecs.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("emb16").as("q_emb16"), col("n64").as("q_n64"),
        col("n16").as("q_n16"))
    vecs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (expr(dotExpr("embedding", "q_emb")) / sqrt(col("n64") * col("q_n64")))
          .as("cos64"),
        (expr("dot_ordered(emb16, q_emb16)") / sqrt(col("n16") * col("q_n16")))
          .as("cos16"))
      .localCheckpoint(eager = true)
  }

  /** Oracle CTE chain ending in `scored(q_id, vec_id, cos64, cos16)`. */
  private def mrlScoredOracleCte: String = {
    def dot(a: String, b: String, d: Int) =
      s"list_sum(list_transform(range(1, ${d + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
    s"""v AS (
          SELECT vec_id, embedding,
            ${dot("embedding", "embedding", 64)} AS n64,
            ${dot("embedding", "embedding", 16)} AS n16
          FROM embeddings),
        scored AS MATERIALIZED (
          SELECT q.vec_id AS q_id, a.vec_id,
            ${dot("a.embedding", "q.embedding", 64)}
              / sqrt(a.n64 * q.n64) AS cos64,
            ${dot("a.embedding", "q.embedding", 16)}
              / sqrt(a.n16 * q.n16) AS cos16
          FROM v a JOIN v q ON q.vec_id < 5 AND a.vec_id <> q.vec_id)"""
  }

  private val embedMrlRecall = Q(
    "embed_mrl_recall",
    (s, dir) => {
      val scored = mrlScored(s, dir)
      val tk = udaf(new graft.functions.TopKByValue(3),
        graft.functions.TopKByValue.inputEncoder)
      scored.groupBy(col("q_id"))
        .agg(tk(col("cos64"), col("vec_id")).as("t64"),
          tk(col("cos16"), col("vec_id")).as("t16"))
        .select(col("q_id"),
          expr("array_join(transform(t64, e -> CAST(e._2 AS STRING)), ',')")
            .as("ids_full"),
          expr("array_join(transform(t16, e -> CAST(e._2 AS STRING)), ',')")
            .as("ids_trunc"),
          expr("""CAST(size(array_intersect(
                    transform(t64, e -> e._2), transform(t16, e -> e._2)))
                  AS BIGINT)""").as("n_overlap"))
        .withColumn("recall_ppm", expr("n_overlap * 1000000 div 3"))
    },
    Some {
      s"""WITH $mrlScoredOracleCte,
          r64 AS (
            SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
              ORDER BY cos64 DESC, vec_id) AS rk
            FROM scored),
          r16 AS (
            SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
              ORDER BY cos16 DESC, vec_id) AS rk
            FROM scored),
          t64 AS (
            SELECT q_id,
              string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY rk) AS ids_full,
              list(vec_id ORDER BY rk) AS idl
            FROM r64 WHERE rk <= 3 GROUP BY q_id),
          t16 AS (
            SELECT q_id,
              string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY rk) AS ids_trunc,
              list(vec_id ORDER BY rk) AS idl
            FROM r16 WHERE rk <= 3 GROUP BY q_id)
          SELECT t64.q_id, t64.ids_full, t16.ids_trunc,
            CAST(len(list_intersect(t64.idl, t16.idl)) AS BIGINT) AS n_overlap,
            CAST(len(list_intersect(t64.idl, t16.idl)) AS BIGINT) * 1000000 // 3
              AS recall_ppm
          FROM t64 JOIN t16 USING (q_id)"""
    })

  /** Mean-reciprocal-rank readout for the retrieval family — the metric
    * reported when only the FIRST relevant hit matters (question
    * answering, known-item search): per query, the rank of the first
    * same-label neighbor within the top-10 and its reciprocal in ppm
    * (queries whose top-10 holds no relevant hit report rank −1, rr 0 —
    * the standard MRR@k convention).
    *
    * Scale shape: the eval_ndcg scaffold exactly — broadcast query set,
    * one corpus scan, k-bounded TopKByValue (no rank window), label
    * lookup joined back broadcast, first-hit argmin as one conditional
    * MIN aggregate.
    */
  private val evalMrr = Q(
    "eval_mrr",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val vecs = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"),
          expr(dotExpr("embedding", "embedding")).as("norm2"))
        .localCheckpoint(eager = true) // query side + corpus side + labels
      val queries = vecs.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
      val tk = udaf(new graft.functions.TopKByValue(NdcgK),
        graft.functions.TopKByValue.inputEncoder)
      val topE = scored.groupBy(col("q_id"), col("q_label"))
        .agg(tk(col("cos"), col("vec_id")).as("top"))
        .select(col("q_id"), col("q_label"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("q_id"), col("q_label"), col("e._2").as("vec_id"),
          (col("pos") + 1).cast("long").as("rk"))
      vecs.select(col("vec_id"), col("label"))
        .join(broadcast(topE), "vec_id")
        .groupBy(col("q_id"), col("q_label"))
        .agg(min(when(col("label") === col("q_label"), col("rk"))).as("fr"))
        .select(col("q_id"), col("q_label").cast("long").as("q_label"),
          coalesce(col("fr"), lit(-1L)).as("first_rank"),
          expr("CASE WHEN fr IS NULL THEN CAST(0 AS BIGINT) " +
            "ELSE 1000000 div fr END").as("rr_ppm"))
    },
    Some {
      def dot(a: String, b: String) = SimOracle.dot(a, b)
      s"""WITH v AS (
            SELECT vec_id, label, embedding,
              ${dot("embedding", "embedding")} AS norm2
            FROM embeddings),
          scored AS MATERIALIZED (
            SELECT q.vec_id AS q_id, q.label AS q_label,
              a.vec_id AS vec_id, a.label AS label,
              ${dot("a.embedding", "q.embedding")}
                / sqrt(a.norm2 * q.norm2) AS cos
            FROM v a
            JOIN v q ON q.vec_id < 8 AND a.vec_id <> q.vec_id),
          topk AS (
            SELECT q_id, q_label, label, rk FROM (
              SELECT q_id, q_label, label,
                CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
              FROM scored)
            WHERE rk <= $NdcgK)
          SELECT q_id, CAST(q_label AS BIGINT) AS q_label,
            coalesce(min(CASE WHEN label = q_label THEN rk END), -1)
              AS first_rank,
            CASE WHEN min(CASE WHEN label = q_label THEN rk END) IS NULL
              THEN CAST(0 AS BIGINT)
              ELSE 1000000 // min(CASE WHEN label = q_label THEN rk END) END
              AS rr_ppm
          FROM topk GROUP BY q_id, q_label"""
    })

  /** Kendall-τ rank stability of the truncated (Matryoshka) index: over
    * each query's full-dim top-10, how consistently does the 16-dim
    * prefix cosine ORDER those same candidates? τ complements
    * embed_mrl_recall's set overlap — a truncated index can retrieve the
    * right ten and still rank them uselessly. Concordant/discordant
    * counts are exact integers over the C(10,2) in-list pairs; τ itself
    * ships as the exact fraction tau_num/tau_den (C − D can be negative
    * — the graph_modularity division rule).
    *
    * Scale shape: candidate generation is the k-bounded TopKByValue;
    * everything after operates on ≤ 10 rows per query (the re-rank
    * window and the 45-pair self-join are bounded by k², not the
    * corpus).
    */
  private val evalKendallTau = Q(
    "eval_kendall_tau",
    (s, dir) => {
      val scored = mrlScored(s, dir) // top-k pass + cos16 lookup
      val tk = udaf(new graft.functions.TopKByValue(NdcgK),
        graft.functions.TopKByValue.inputEncoder)
      val top = scored.groupBy(col("q_id"))
        .agg(tk(col("cos64"), col("vec_id")).as("t"))
        .select(col("q_id"), posexplode(col("t")).as(Seq("pos", "e")))
        .select(col("q_id"), col("e._2").as("vec_id"),
          (col("pos") + 1).cast("long").as("rk64"))
      val w16 = Window.partitionBy(col("q_id"))
        .orderBy(col("cos16").desc, col("vec_id"))
      val ranked = top
        .join(scored.select(col("q_id"), col("vec_id"), col("cos16")),
          Seq("q_id", "vec_id"))
        .withColumn("rk16", row_number().over(w16).cast("long")) // ≤ 10 rows/query
        .localCheckpoint(eager = true) // both sides of the pair join
      val pairs = ranked.as("x").join(ranked.as("y"),
          col("x.q_id") === col("y.q_id") && col("x.rk64") < col("y.rk64"))
        .select(col("x.q_id").as("q_id"),
          (col("x.rk16") < col("y.rk16")).cast("long").as("conc"))
      // Spearman ρ over the same two rankings (no ties by construction —
      // both are row_numbers): ρ = 1 − 6Σd²/(n(n²−1)), shipped as the
      // exact fraction rho_num/rho_den like τ
      val spearman = ranked.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"),
          sum(expr("(rk64 - rk16) * (rk64 - rk16)")).as("sd2"))
        .select(col("q_id"),
          (col("n") * (col("n") * col("n") - 1L) - lit(6L) * col("sd2"))
            .as("rho_num"),
          (col("n") * (col("n") * col("n") - 1L)).as("rho_den"))
      pairs.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("conc")).as("concordant"))
        .select(col("q_id"), col("n_pairs"), col("concordant"),
          (col("n_pairs") - col("concordant")).as("discordant"),
          (lit(2L) * col("concordant") - col("n_pairs")).as("tau_num"),
          col("n_pairs").as("tau_den"))
        .join(broadcast(spearman), "q_id")
    },
    Some {
      s"""WITH $mrlScoredOracleCte,
          top AS (
            SELECT q_id, vec_id, cos16, CAST(rk AS BIGINT) AS rk64 FROM (
              SELECT q_id, vec_id, cos16, row_number() OVER (PARTITION BY q_id
                ORDER BY cos64 DESC, vec_id) AS rk
              FROM scored)
            WHERE rk <= $NdcgK),
          ranked AS (
            SELECT q_id, vec_id, rk64, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cos16 DESC, vec_id) AS BIGINT) AS rk16
            FROM top),
          pr AS (
            SELECT x.q_id, CAST(CASE WHEN x.rk16 < y.rk16 THEN 1 ELSE 0 END
              AS BIGINT) AS conc
            FROM ranked x JOIN ranked y
              ON x.q_id = y.q_id AND x.rk64 < y.rk64),
          kt AS (
            SELECT q_id, CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(conc) AS BIGINT) AS concordant,
              CAST(count(*) - sum(conc) AS BIGINT) AS discordant,
              CAST(2 * sum(conc) - count(*) AS BIGINT) AS tau_num,
              CAST(count(*) AS BIGINT) AS tau_den
            FROM pr GROUP BY q_id),
          sp AS (
            SELECT q_id,
              CAST(count(*) * (count(*) * count(*) - 1)
                - 6 * sum((rk64 - rk16) * (rk64 - rk16)) AS BIGINT) AS rho_num,
              CAST(count(*) * (count(*) * count(*) - 1) AS BIGINT) AS rho_den
            FROM ranked GROUP BY q_id)
          SELECT kt.q_id, kt.n_pairs, kt.concordant, kt.discordant,
            kt.tau_num, kt.tau_den, sp.rho_num, sp.rho_den
          FROM kt JOIN sp USING (q_id)"""
    })

  /** Rejection sampling / best-of-n mining — the RLHF-era SFT data
    * construction (sample n candidates per prompt, keep the best one
    * that clears a reward threshold; Llama-2 / WebGPT style): documents
    * bundle into prompts of 8 (doc_id div 8 — the eval_pass_at_k bundle
    * convention), each "generation" scores an integer lexical+alpha
    * composite (both ppm ratios, one tokenize pass, per-row codegen),
    * and each bundle releases its argmax-scoring PASSING candidate
    * (score ≥ 1.4M ≈ the corpus upper quartile; tie → min doc_id via the
    * max(struct(score, −id)) trick — the mine_preference_pairs
    * canonical). Bundles with zero passing candidates are REJECTED
    * whole — that selectivity, n_pass/n per bundle, is the yield metric
    * a BoN pipeline monitors. Scale: scan → per-row score → ONE
    * combine-friendly groupBy on the bundle key (conditional argmax via
    * max-ignores-nulls); nothing corpus-sized shuffles besides the
    * bundle aggregate itself.
    */
  private val mineRejectionSampling = Q(
    "mine_rejection_sampling",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val T = 1400000L
      val scored = Tables.documents(s, dir)
        .select(col("doc_id"), expr("doc_id div 8").as("prompt_id"), expr(
          """CASE WHEN size(word_ngrams(text, 1, false)) = 0 THEN CAST(0 AS BIGINT)
             ELSE (CAST(1000000 AS BIGINT)
                   * CAST(size(array_distinct(word_ngrams(text, 1, false))) AS BIGINT))
                  div CAST(size(word_ngrams(text, 1, false)) AS BIGINT) END
             + CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
               ELSE (CAST(1000000 AS BIGINT)
                     * CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS BIGINT))
                    div n_chars END""").as("score"))
      scored.groupBy(col("prompt_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("score") >= T, 1L).otherwise(0L)).as("n_pass"),
          max(when(col("score") >= T,
            struct(col("score"), (-col("doc_id")).as("neg")))).as("best"))
        .where(col("n_pass") >= 1L)
        .select(col("prompt_id"), col("n"), col("n_pass"),
          (-col("best.neg")).as("chosen_doc_id"),
          col("best.score").as("chosen_score"))
    },
    Some("""WITH scored AS (
              SELECT doc_id, doc_id // 8 AS prompt_id,
                CASE WHEN len(toks) = 0 THEN CAST(0 AS BIGINT)
                     ELSE (1000000 * CAST(len(list_distinct(toks)) AS BIGINT))
                          // CAST(len(toks) AS BIGINT) END
                + CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
                  ELSE (1000000 * CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT))
                       // n_chars END AS score
              FROM (SELECT doc_id, text, n_chars,
                      list_filter(string_split_regex(lower(text), '[^a-z]+'),
                        t -> t <> '') AS toks
                    FROM documents)),
            agg AS (
              SELECT prompt_id, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN score >= 1400000 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_pass,
                max(CASE WHEN score >= 1400000 THEN score END) AS mx
              FROM scored GROUP BY prompt_id)
            SELECT a.prompt_id, a.n, a.n_pass,
              CAST(min(s.doc_id) AS BIGINT) AS chosen_doc_id,
              CAST(a.mx AS BIGINT) AS chosen_score
            FROM agg a JOIN scored s
              ON s.prompt_id = a.prompt_id AND s.score = a.mx
            WHERE a.n_pass >= 1
            GROUP BY a.prompt_id, a.n, a.n_pass, a.mx"""))

  /** Exact KNN-Shapley data valuation (Jia et al., VLDB 2019): for each
    * validation point, the EXACT Shapley value of every training point
    * under the K-nearest-neighbor utility — the data-valuation closed
    * form that made Shapley practical (the general Shapley value needs
    * 2^n coalitions; for KNN utility it telescopes into one pass over
    * the distance ranking: φ_(N) = u_N/N, φ_(r) = φ_(r+1) +
    * (u_r − u_{r+1})·min(r,K)/(K·r)). The training-data question it
    * answers is "which examples HELP and which ones actively hurt this
    * validation set" — negative-φ points are mislabeled/poisoned-data
    * candidates, the pruning signal quality heuristics can't give.
    *
    * Distributed shape: the telescoping recurrence is ORDER-dependent,
    * so it is recast as a per-rank TERM (each rank's marginal
    * contribution, quantized once to integer nano-units) plus a SUFFIX
    * SUM — one rank window and one suffix-frame window per validation
    * point, both partition-local; no sequential driver loop. At corpus
    * scale the exact product against 5 validation points is replaced by
    * the ANN candidate generators upstream (the mine_hard_negatives
    * stance); everything from `ranked` down is identical. Determinism:
    * cosines are dot_ordered folds, ranking tiebreaks on vec_id, terms
    * quantize per row. The cross-engine guarantee is rounding-level and
    * assumes NO training-set-size bound (VERDICT r07 #8): both engines
    * compute the term from the SAME IEEE doubles and both `round` a half
    * AWAY FROM ZERO, so even ranks where min(r,K)·10⁹/(K·r) lands
    * exactly on .5 (possible whenever 2·10⁹/r is integral, e.g.
    * r = 1024) agree by the rounding rule itself, not by tie
    * unreachability. Suffix sums are exact BIGINT: each |term| ≤ 10⁹,
    * so overflow needs ~10⁹ training rows PER VALIDATION POINT times
    * 10⁹ — out of reach at any corpus size this engine admits.
    */
  private val KnnShapK = 5

  private val mineKnnShapley = Q(
    "mine_knn_shapley",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      val vecs = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"),
          expr(dotExpr("embedding", "embedding")).as("norm2"))
        .localCheckpoint(eager = true) // query side + training side
      val queries = vecs.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      val scored = vecs.where(col("vec_id") >= 5)
        .crossJoin(broadcast(queries))
        .select(col("q_id"), col("vec_id"),
          (col("label") === col("q_label")).cast("long").as("u"),
          (expr(dotExpr("embedding", "q_emb")) /
            sqrt(col("norm2") * col("q_norm2"))).as("cos"))
      val wRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val ranked = scored
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy(col("q_id"))))
        .withColumn("u_next", lead(col("u"), 1).over(wRank))
        .withColumn("t", expr(
          s"""CASE WHEN u_next IS NULL THEN
                CAST(round(CAST(u AS DOUBLE) * 1000000000.0
                  / CAST(n AS DOUBLE), 0) AS BIGINT)
              ELSE
                CAST(round(CAST(u - u_next AS DOUBLE)
                  * CAST(least(rk, ${KnnShapK}) AS DOUBLE) * 1000000000.0
                  / ($KnnShapK.0 * CAST(rk AS DOUBLE)), 0) AS BIGINT) END"""))
      val wSuffix = Window.partitionBy(col("q_id")).orderBy(col("rk"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ranked
        .withColumn("phi_nano", sum(col("t")).over(wSuffix))
        .select(col("q_id"), col("vec_id"), col("rk"), col("u"),
          col("phi_nano"))
    },
    Some {
      def dot(a: String, b: String) = SimOracle.dot(a, b)
      s"""WITH v AS (
            SELECT vec_id, label, embedding,
              ${dot("embedding", "embedding")} AS norm2
            FROM embeddings),
          qs AS (
            SELECT vec_id AS q_id, label AS q_label,
              embedding AS q_emb, norm2 AS q_norm2
            FROM v WHERE vec_id < 5),
          scored AS (
            SELECT qs.q_id, a.vec_id,
              CAST(CASE WHEN a.label = qs.q_label THEN 1 ELSE 0 END
                AS BIGINT) AS u,
              ${dot("a.embedding", "qs.q_emb")}
                / sqrt(a.norm2 * qs.q_norm2) AS cos
            FROM v a, qs WHERE a.vec_id >= 5),
          ranked AS (
            SELECT q_id, vec_id, u,
              CAST(row_number() OVER w AS BIGINT) AS rk,
              CAST(count(*) OVER (PARTITION BY q_id) AS BIGINT) AS n,
              lead(u) OVER w AS u_next
            FROM scored
            WINDOW w AS (PARTITION BY q_id ORDER BY cos DESC, vec_id)),
          terms AS (
            SELECT q_id, vec_id, rk, u,
              CASE WHEN u_next IS NULL THEN
                CAST(round(CAST(u AS DOUBLE) * 1000000000.0
                  / CAST(n AS DOUBLE), 0) AS BIGINT)
              ELSE
                CAST(round(CAST(u - u_next AS DOUBLE)
                  * CAST(least(rk, $KnnShapK) AS DOUBLE) * 1000000000.0
                  / ($KnnShapK.0 * CAST(rk AS DOUBLE)), 0) AS BIGINT) END AS t
            FROM ranked)
          SELECT q_id, vec_id, rk, u,
            CAST(sum(t) OVER (PARTITION BY q_id ORDER BY rk
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
              AS phi_nano
          FROM terms"""
    })

  val all: Seq[Q] =
    Seq(mineBitext, textNovelty, qualityEnsemble, selectMmr, mineHardNegatives,
      evalNdcg, embedMrlRecall, evalMrr, evalKendallTau,
      mineRejectionSampling, mineKnnShapley)
}
