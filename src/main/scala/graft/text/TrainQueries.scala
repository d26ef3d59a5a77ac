package graft.text

import org.apache.spark.sql.functions._

import graft.queries.{DriverGuard, Q, Tables}

/** Distributed quality-classifier TRAINING — the step every production
  * curation stack runs that the engine previously only consumed the
  * output of: `quality_logreg` scores with a fixed weight vector, DSIR
  * fits generative importance weights, but nothing LEARNED a
  * discriminative gate from the corpus it filters (VERDICT r06 task 2).
  *
  * `quality_logreg_train` runs k = 3 rounds of full-batch gradient
  * descent for a logistic-style linear model over the same hashed
  * feature space `quality_logreg` infers with (md5-bucketed unigrams,
  * B = 256), so the learned vector is drop-in for that query's scoring
  * shape. Labels are the engine's own rule gate (n_tok ≥ 20 AND
  * n_chars ≥ 100 — the `eval_auc_rank` ground truth), making the family
  * self-contained: rules label, the classifier distills the rules into
  * a smooth score, `eval_auc_rank`'s machinery judges it.
  *
  * == Distributed shape (the bpe_train / power-PCA iterated-learning
  * pattern) ==
  * The per-doc feature list is bucket-bounded (≤ B entries), so the
  * corpus collapses ONCE into `(doc_id, n_tok, y, bc: array<(bucket,
  * cnt)>)` — one tokenize aggregate off the shared
  * [[TextArtifacts.wordCounts]] artifact, checkpointed. Each round is
  * then ONE corpus-linear aggregate: the current weights ride the
  * expression as a 256-long literal array (no model-table join, nothing
  * broadcast), the per-doc margin/error folds over `bc` in codegen, and
  * the gradient reduces map-side into ≤ B rows. The driver holds only
  * the B-bounded weight vector between rounds — the same driver-state
  * contract as the BPE winner and the CC dictionary, guarded by a
  * fail-loudly cap. At 100 TB: k scans, k shuffles of ≤ B·partitions
  * rows, zero text through any exchange.
  *
  * == Exact integer arithmetic (the engine's determinism class) ==
  * True logistic GD needs exp(); engines disagree in the last ulp of
  * transcendentals, so the model uses the HARD-SIGMOID surrogate
  * σ̂(z) = clamp(½ + z/4, 0, 1) (Collobert'04's piecewise-linear
  * logistic, standard in quantized training) — every quantity below is
  * an exact BIGINT on both engines:
  *
  *   z_i  = floor(10⁶·(w·x_i))         micro-logit; x_i = cnt/n_tok
  *   p_i  = (clamp(z_i, ±2·10⁶) + 2·10⁶) div 4          micro-prob
  *   e_i  = p_i − 10⁶·y_i                               micro-error
  *   G_b  = Σ_i e_i·cnt_ib     per-occurrence-weighted gradient (the
  *                             quality_logreg weighting convention)
  *   w_b ← w_b − floor(η·G_b / T),  T = Σ_i n_tok_i,  η = 4
  *
  * Every division shifts its numerator non-negative first (+M·n_tok,
  * +S·T, +2·10⁶) so Spark's truncating `div` and DuckDB's floor `//`
  * agree. Bounds: |Δw| ≤ η·10⁶ per round → |w| ≤ 1.2·10⁷ ≪ M = 10¹⁰;
  * |zn| ≤ |w|·n_tok keeps zn + M·n_tok inside BIGINT for any real doc
  * length. The oracle replays all three rounds as unrolled MATERIALIZED
  * stages (the bpe_train oracle pattern). QualityTrainSpec re-derives
  * the weights in plain Scala and pins an AUC lift over the fixed
  * vector on a separable fixture.
  */
object TrainQueries {

  private[text] val NumBuckets = 256
  private[text] val Rounds = 3
  private[text] val Eta = 4L
  /** micro-logit clamp of the hard sigmoid: σ̂ saturates at |z| = 2. */
  private[text] val ZClamp = 2000000L
  /** non-negativity shift for the per-doc micro-logit division. */
  private[text] val ZShift = 10000000000L
  /** non-negativity shift for the weight-update division. */
  private[text] val UShift = 1000000000L

  /** First two md5 hex digits as 0..255 — the CurationQueries hashed
    * feature convention (same digit math on both engines). */
  private def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** One-round weight update from the collected gradient (exact BIGINT
    * mirror of the SQL stage) — shared with QualityTrainSpec's local
    * trainer so engine and spec can only change in lockstep. */
  private[text] def updateWeights(w: Array[Long], grad: Map[Long, Long],
      totTokens: Long): Array[Long] =
    Array.tabulate(NumBuckets) { b =>
      val g = grad.getOrElse(b.toLong, 0L)
      w(b) - ((Eta * g + UShift * totTokens) / totTokens - UShift)
    }

  /** The training frame: one row per tokenized doc — (doc_id, n_tok, y,
    * bc: bounded array of (bucket, cnt)) — checkpointed so the k rounds
    * scan a materialized RDD. */
  private def docFeatures(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    TextArtifacts.wordCounts(s, dir)
      .withColumn("bucket", expr(md5Byte("token")).cast("long"))
      .groupBy(col("doc_id"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tok"),
        sort_array(collect_list(struct(col("bucket"), col("cnt")))).as("bc"))
      .join(Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id")
      .withColumn("y",
        expr("CASE WHEN n_tok >= 20 AND n_chars >= 100 THEN 1L ELSE 0L END"))
      .select(col("doc_id"), col("n_tok"), col("y"), col("bc"))
      .localCheckpoint(eager = true)

  /** Attach the hard-sigmoid probability `p` (micro-units) under weight
    * vector `w` — the identical zn → z → p chain the gradient, the
    * oracle, and the training-dynamics readout all share. */
  private def withP(docFeat: org.apache.spark.sql.DataFrame,
      w: Array[Long]): org.apache.spark.sql.DataFrame = {
    val wLit = w.mkString("array(", "L,", "L)")
    docFeat
      .withColumn("zn", expr(
        s"""aggregate(bc, 0L, (acc, p) ->
            acc + element_at($wLit, CAST(p.bucket AS INT) + 1) * p.cnt)"""))
      .withColumn("z", expr(s"(zn + ${ZShift}L * n_tok) div n_tok - ${ZShift}L"))
      .withColumn("p", expr(
        s"(greatest(-${ZClamp}L, least(${ZClamp}L, z)) + ${ZClamp}L) div 4"))
  }

  // The trained trajectory is a SESSION ARTIFACT (VERDICT r10 task 5):
  // `quality_logreg_train` and `mine_training_dynamics` both walk the
  // same k GD rounds, and each round is a corpus aggregate — without
  // memoization a bench/verify pass pays the trajectory twice (measured
  // 2.09 s isolated at sf0.1, ~⅔ of it the rounds). The cached value is
  // the checkpointed training frame + the driver-side ≤ (k+1)×256-long
  // weight history — the uni_round2 discipline.
  private val trainCache =
    new graft.queries.SessionCache[(org.apache.spark.sql.DataFrame,
      Seq[Array[Long]])](v => Seq(v._1))

  private[graft] def trainInvalidate(): Unit = trainCache.invalidate()

  /** Run the k GD rounds; returns the checkpointed training frame plus
    * the weight-vector HISTORY [w₀ = 0, w₁, …, w_k] — the training
    * query reads the last entry, the dynamics query reads the path.
    * Memoized once per (session, corpus). */
  private[text] def trainedWeights(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, Seq[Array[Long]]) =
    trainCache.getOrBuild(s, dir) { trainedWeightsBuild(s, dir) }

  private def trainedWeightsBuild(s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, Seq[Array[Long]]) = {
    val docFeat = docFeatures(s, dir)
    val totTokens = docFeat.agg(sum(col("n_tok"))).head().getLong(0)
    // S·T and η·|G| ≤ η·10⁶·T must stay inside BIGINT — a corpus past
    // this bound needs a larger-scale shift constant, not silence.
    require(totTokens > 0L && totTokens < 8000000000L,
      s"quality_logreg_train: corpus token count $totTokens outside the " +
        "exact-integer design range (0, 8e9) — rescale UShift before use")
    val history = scala.collection.mutable.ArrayBuffer(Array.fill(NumBuckets)(0L))
    for (_ <- 1 to Rounds) {
      // bucket domain is [0, 256) by md5Byte construction; anything
      // larger means the feature hash broke — collectBounded fetches at
      // most NumBuckets+1 rows, so a broken hash fails BEFORE the driver
      // materializes an unbounded frame (ADVICE r07 #1)
      val grad = DriverGuard.collectBounded(
        withP(docFeat, history.last)
          .withColumn("e", col("p") - lit(1000000L) * col("y"))
          .select(explode(col("bc")).as("f"), col("e"))
          .groupBy(col("f.bucket")).agg(sum(col("e") * col("f.cnt")).as("g")),
        NumBuckets, "quality_logreg_train gradient")
      val gm = grad.map(r => r.getLong(0) -> r.getLong(1)).toMap
      history += updateWeights(history.last, gm, totTokens)
    }
    (docFeat, history.toSeq)
  }

  private val qualityLogregTrain = Q(
    "quality_logreg_train",
    (s, dir) => {
      val (_, history) = trainedWeights(s, dir)
      val w = history.last
      import s.implicits._
      (0 until NumBuckets).map(b => (b.toLong, w(b))).toDF("bucket", "w_micro")
    },
    Some(s"""WITH $oracleChain
             SELECT bucket, w AS w_micro FROM w3"""))

  // ---------------------------------------------------------------------
  // Shared oracle chain: the three GD rounds as unrolled MATERIALIZED
  // stages — e_r (per-doc micro-error) → g_r (per-bucket gradient) →
  // w_r (updated weights); round 1 inlines w₀ = 0 (z = 0 → p = 500000).
  // quality_logreg_train selects w3 off this chain; the dynamics query
  // selects the per-round probability path off z2/z3 — ONE definition,
  // so the engines' training algebra can only change in lockstep.
  // ---------------------------------------------------------------------

  private def gradStage(eName: String): String =
    s"""SELECT bucket, CAST(sum($eName.e * f.cnt) AS BIGINT) AS g
        FROM feat f JOIN $eName USING (doc_id) GROUP BY bucket"""
  private def updExpr(wExpr: String, gName: String): String =
    s"""CAST($wExpr - (($Eta * coalesce($gName.g, 0) + $UShift * t.t) // t.t
          - $UShift) AS BIGINT)"""
  /** Shift-protected micro-logit → hard-sigmoid probability (the Spark
    * `withP` chain verbatim in DuckDB). */
  private def pExprSql: String =
    s"""(least(greatest((zn + $ZShift * n_tok) // n_tok - $ZShift,
           -$ZClamp), $ZClamp) + $ZClamp) // 4"""
  private def errStage(zName: String): String =
    s"""SELECT doc_id, $pExprSql - 1000000 * y AS e
        FROM $zName"""
  private def marginStage(wName: String): String =
    s"""SELECT l.doc_id, l.n_tok, l.y,
          CAST(sum($wName.w * f.cnt) AS BIGINT) AS zn
        FROM lab l JOIN feat f USING (doc_id)
        JOIN $wName USING (bucket)
        GROUP BY l.doc_id, l.n_tok, l.y"""

  private def oracleChain: String =
    s"""toks AS MATERIALIZED (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS term
          FROM documents),
        feat AS MATERIALIZED (
          SELECT doc_id, CAST(${md5Byte("term")} AS BIGINT) AS bucket,
            CAST(count(*) AS BIGINT) AS cnt
          FROM toks GROUP BY doc_id, bucket),
        lab AS MATERIALIZED (
          SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_tok,
            CASE WHEN sum(f.cnt) >= 20 AND max(d.n_chars) >= 100
                 THEN 1 ELSE 0 END AS y
          FROM feat f JOIN documents d USING (doc_id)
          GROUP BY f.doc_id),
        tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM lab),
        bs AS (SELECT CAST(range AS BIGINT) AS bucket FROM range($NumBuckets)),
        e1 AS MATERIALIZED (
          SELECT doc_id, 500000 - 1000000 * y AS e FROM lab),
        g1 AS MATERIALIZED (${gradStage("e1")}),
        w1 AS MATERIALIZED (
          SELECT bs.bucket, ${updExpr("0", "g1")} AS w
          FROM bs LEFT JOIN g1 USING (bucket) CROSS JOIN tot t),
        z2 AS MATERIALIZED (${marginStage("w1")}),
        e2 AS MATERIALIZED (${errStage("z2")}),
        g2 AS MATERIALIZED (${gradStage("e2")}),
        w2 AS MATERIALIZED (
          SELECT w1.bucket, ${updExpr("w1.w", "g2")} AS w
          FROM w1 LEFT JOIN g2 USING (bucket) CROSS JOIN tot t),
        z3 AS MATERIALIZED (${marginStage("w2")}),
        e3 AS MATERIALIZED (${errStage("z3")}),
        g3 AS MATERIALIZED (${gradStage("e3")}),
        w3 AS (
          SELECT w2.bucket, ${updExpr("w2.w", "g3")} AS w
          FROM w2 LEFT JOIN g3 USING (bucket) CROSS JOIN tot t)"""

  /** Training-dynamics mining (the dataset-cartography readout,
    * Swayamdipta et al., EMNLP 2020) off the SAME GD trajectory
    * `quality_logreg_train` walks: per document, the mean and variance
    * of the TRUE-CLASS probability across the k training checkpoints
    * (p under w₀, w₁, w₂). High-mean docs are "easy" for the gate,
    * low-mean docs actively contradict it (mislabel/outlier
    * candidates — the curation signal cartography exists for), high
    * variance marks the decision boundary the next labeling round
    * should spend on. `above_chance` (mean true-class p > ½) is the
    * knob-free readout; conf/var ship exactly so thresholds stay the
    * analyst's choice.
    *
    * Shape: k scans of the checkpointed training frame (the per-round
    * p is row-local codegen under a literal weight array), one union,
    * ONE doc-keyed aggregate — corpus-linear, nothing wider than
    * (doc_id, p) shuffles. Exactness: p is the integer micro-unit
    * hard-sigmoid shared with training; mean = Σp̂ div k and
    * variance = (k·Σp̂² − (Σp̂)²) div k² are exact BIGINT (p̂ ≤ 10⁶ →
    * k·Σp̂² ≤ 9·10¹²); the oracle reads the identical path off the
    * shared training chain (p₁ = 500000 constant, p₂/p₃ from z2/z3).
    */
  private val mineTrainingDynamics = Q(
    "mine_training_dynamics",
    (s, dir) => {
      val (docFeat, history) = trainedWeights(s, dir)
      // checkpoints BEFORE each round's update: w₀ … w_{k-1}
      val path = history.dropRight(1)
        .map(w => withP(docFeat, w)
          .select(col("doc_id"), col("y"),
            expr("CASE WHEN y = 1L THEN p ELSE 1000000L - p END").as("ph")))
        .reduce(_ union _)
      path.groupBy(col("doc_id"))
        .agg(max(col("y")).as("y"), sum(col("ph")).as("sp"),
          sum(col("ph") * col("ph")).as("sp2"))
        .select(col("doc_id"), col("y"),
          expr(s"sp div ${Rounds}L").as("conf_micro"),
          expr(s"(${Rounds}L * sp2 - sp * sp) div ${Rounds * Rounds}L")
            .as("var_micro2"),
          (col("sp") > lit(500000L * Rounds)).as("above_chance"))
    },
    Some(s"""WITH $oracleChain,
             p1 AS (SELECT doc_id, y, CAST(500000 AS BIGINT) AS p FROM lab),
             p2 AS (SELECT doc_id, y, CAST($pExprSql AS BIGINT) AS p FROM z2),
             p3 AS (SELECT doc_id, y, CAST($pExprSql AS BIGINT) AS p FROM z3),
             path AS (
               SELECT doc_id, y,
                 CASE WHEN y = 1 THEN p ELSE 1000000 - p END AS ph
               FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                     UNION ALL SELECT * FROM p3))
             SELECT doc_id, CAST(max(y) AS BIGINT) AS y,
               CAST(sum(ph) // $Rounds AS BIGINT) AS conf_micro,
               CAST(($Rounds * sum(ph * ph) - sum(ph) * sum(ph))
                 // ${Rounds * Rounds} AS BIGINT) AS var_micro2,
               sum(ph) > ${500000L * Rounds} AS above_chance
             FROM path GROUP BY doc_id"""))

  val all: Seq[Q] = Seq(qualityLogregTrain, mineTrainingDynamics)
}
