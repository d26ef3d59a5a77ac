package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Embedding projection operators — the dimensionality-reduction steps a
  * training-data pipeline runs before indexing or visualizing its
  * embedding space:
  *
  *  - signed random projection (Johnson-Lindenstrauss / SimHash-style)
  *    64→8 dims — the cheap sketch that preserves norms and dot products
  *    in expectation (E‖proj‖² = 8‖q‖², E[proj_a·proj_b] = 8 q_a·q_b; at
  *    8 dims that's bucketing-grade, not distance-grade — widen the
  *    output `sequence` for tighter JL error);
  *  - top-principal-direction extraction by power iteration — the
  *    "which axis carries the variance" diagnostic (and the 1-D
  *    projection dataset maps are colored by).
  *
  * Cross-engine determinism: components quantize to integers up front
  * (`floor(x*1000)` — float→double widening is exact, floor is exact), so
  * every dot product and matrix-vector product is an ORDER-FREE integer
  * sum; the power iteration renormalizes through one double
  * floor-division per component whose operands stay below 2^53, making
  * even that step bit-identical on both engines.
  *
  * Scale shape: the RP is pure per-row math riding the scan (the ±1
  * matrix never materializes — signs come from integer hash parity).
  * Power iteration is per round: one per-row dot against the BROADCAST
  * direction (8·dim bytes), then a (dimension)-keyed partial aggregate —
  * dim cells total regardless of corpus size; renormalization is a
  * one-row frame. Iterations are unrolled ×2 for the oracle the same way
  * cluster_kmeans unrolls Lloyd; [[ClusterQueries.lloydConverge]] is the
  * pattern a production loop would follow.
  */
object ProjectionQueries {

  /** vec_id → floor(x*1000) BIGINT components (coarser than kmeans' 1e-6:
    * power-iteration products multiply THREE quantities, so headroom
    * matters more than resolution here). */
  private def q1000(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))")
      .as("qe"))

  /** Integer dot of the row array against a broadcast direction array. */
  private val dotExpr =
    """aggregate(zip_with(qe, ve, (a, b) -> a * b), CAST(0 AS BIGINT),
       (acc, x) -> acc + x)"""

  /** One power-iteration round: dot each row with the broadcast direction,
    * accumulate w = Σ dot·q per dimension (dim-keyed partial agg), then
    * renormalize to max-abs 1000 in a one-row frame. The floor-division
    * operands (|w|·1000 and max|w|) stay under 2^53 at any corpus size
    * where |w| < 9e12 — beyond that, production would renormalize with a
    * coarser quantum; the SHAPE (broadcast direction + dim-cell agg) is
    * corpus-size-free either way. */
  private def powerRound(qf: DataFrame, v: DataFrame): DataFrame =
    qf.crossJoin(broadcast(v))
      .withColumn("dot", expr(dotExpr))
      .select(col("dot"), posexplode(col("qe")).as(Seq("pos", "qv")))
      .groupBy(col("pos")).agg(sum(col("dot") * col("qv")).as("w"))
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(pos, w))), s -> s.w)")
        .as("we"))
      .select(expr(
        """transform(we, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 /
           CAST(array_max(transform(we, y -> abs(y))) AS DOUBLE)) AS BIGINT))""")
        .as("ve"))

  /** Signed random projection 64→8: proj_j = Σ_i q_i · s(i,j) with
    * s(i,j) = ±1 from the parity of a Knuth-scrambled (i, j) hash — the
    * projection matrix is a formula, not data, so nothing joins and
    * nothing broadcasts; one codegen'd pass over the scan, exploded to
    * (vec_id, j) rows. Norm concentration and dot correlation are pinned
    * by ProjectionSpec.
    */
  private val embedRpProject = Q(
    "embed_rp_project",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // native one-pass expression (graft.functions.RpProject): the HOF
      // formulation (transform∘aggregate over index sequences) ran ~512
      // interpreted closure dispatches per row — 7.96 s at sf0.1; the
      // fused codegen loop computes the identical integer sums
      Tables.embeddings(s, dir)
        .withColumn("proj", expr("rp_project(embedding)"))
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "proj")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("proj"))
    },
    Some("""WITH q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT)
                  AS qv
              FROM embeddings)
            SELECT vec_id, CAST(j AS BIGINT) AS j,
              CAST(sum(qv * CASE WHEN (i * 2654435761 + j * 40503) % 2 = 0
                               THEN 1 ELSE -1 END) AS BIGINT) AS proj
            FROM q, range(8) AS r(j)
            GROUP BY vec_id, j"""))

  /** Top principal direction by two unrolled power-iteration rounds from
    * the all-ones start, then every vector's projection onto it — integer
    * end to end (see class doc for the determinism and scale argument).
    */
  private val embedPowerPca = Q(
    "embed_power_pca",
    (s, dir) => {
      val qf = q1000(Tables.embeddings(s, dir)).localCheckpoint(eager = true)
      val dim = 64
      val v0 = qf.sparkSession.range(1)
        .select(expr(s"transform(sequence(1, $dim), i -> CAST(1000 AS BIGINT))")
          .as("ve"))
      val v2 = powerRound(qf, powerRound(qf, v0)).localCheckpoint(eager = true)
      qf.crossJoin(broadcast(v2))
        .select(col("vec_id"), expr(dotExpr).as("proj"))
    },
    Some("""WITH q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT)
                  AS qv
              FROM embeddings),
            d1 AS (
              SELECT vec_id, CAST(sum(qv * 1000) AS BIGINT) AS dot
              FROM q GROUP BY vec_id),
            w1 AS (
              SELECT q.i, CAST(sum(q.qv * d1.dot) AS BIGINT) AS w
              FROM q JOIN d1 USING (vec_id) GROUP BY q.i),
            m1 AS (SELECT CAST(max(abs(w)) AS BIGINT) AS m FROM w1),
            v1 AS (
              SELECT i, CAST(floor(CAST(w AS DOUBLE) * 1000.0
                / CAST(m AS DOUBLE)) AS BIGINT) AS v
              FROM w1, m1),
            d2 AS (
              SELECT q.vec_id, CAST(sum(q.qv * v1.v) AS BIGINT) AS dot
              FROM q JOIN v1 USING (i) GROUP BY q.vec_id),
            w2 AS (
              SELECT q.i, CAST(sum(q.qv * d2.dot) AS BIGINT) AS w
              FROM q JOIN d2 USING (vec_id) GROUP BY q.i),
            m2 AS (SELECT CAST(max(abs(w)) AS BIGINT) AS m FROM w2),
            v2 AS (
              SELECT i, CAST(floor(CAST(w AS DOUBLE) * 1000.0
                / CAST(m AS DOUBLE)) AS BIGINT) AS v
              FROM w2, m2)
            SELECT q.vec_id, CAST(sum(q.qv * v2.v) AS BIGINT) AS proj
            FROM q JOIN v2 USING (i)
            GROUP BY q.vec_id"""))

  /** Full covariance matrix of the embedding space via the one-pass
    * [[graft.functions.GramMatrix]] Aggregator — the X^T X sufficient
    * statistics (n, Σx, upper Σx·xᵀ) that PCA, whitening, and least
    * squares start from. The naive explode-and-self-join ships dim²/2
    * rows per VECTOR through the shuffle; the Aggregator folds each
    * vector into a ~17 KB dim-bounded buffer map-side, so the exchange
    * carries one buffer per partition at any corpus size (the
    * moment-sketch shape; same bounded-state argument as Misra-Gries).
    * Output: one row per upper-triangle cell with the exact BIGINT
    * sufficient statistics plus `cov_q`, the population covariance
    * floor-quantized from one double expression over those integers
    * (identical IEEE on both engines — the power-iteration rule).
    */
  private val embedGramCov = Q(
    "embed_gram_cov",
    (s, dir) => {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      val dim = 64
      val gram = udaf(new graft.functions.GramMatrix(dim),
        ExpressionEncoder[Seq[Long]]())
      val qf = q1000(Tables.embeddings(s, dir)).select(col("qe"))
      Tables.spread(qf)
        .agg(gram(col("qe")).as("g"))
        .select(col("g"), explode(expr(
          s"""flatten(transform(sequence(0, ${dim - 1}),
              i -> transform(sequence(i, ${dim - 1}),
              j -> named_struct('i', i, 'j', j))))""")).as("p"))
        .select(
          col("p.i").cast("long").as("i"),
          col("p.j").cast("long").as("j"),
          col("g.n").as("n"),
          expr("element_at(g.sx, p.i + 1)").as("sx_i"),
          expr("element_at(g.sx, p.j + 1)").as("sx_j"),
          expr(s"""element_at(g.sxy, CAST(
            p.i * $dim - (p.i * (p.i - 1)) div 2 + (p.j - p.i) + 1 AS INT))""")
            .as("sxy"))
        .withColumn("cov_q", expr(
          """CAST(floor((CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx_i AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx_j AS DOUBLE) / CAST(n AS DOUBLE)))
               * 1000.0) AS BIGINT)"""))
    },
    Some("""WITH q AS (
              SELECT list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS e
              FROM embeddings),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
            sums AS (
              SELECT i, CAST(sum(e[i + 1]) AS BIGINT) AS sx
              FROM q, range(0, 64) t(i) GROUP BY i),
            cells AS (
              SELECT i, j, CAST(sum(e[i + 1] * e[j + 1]) AS BIGINT) AS sxy
              FROM q, range(0, 64) t1(i), range(0, 64) t2(j)
              WHERE j >= i GROUP BY i, j)
            SELECT c.i, c.j, nn.n, si.sx AS sx_i, sj.sx AS sx_j, c.sxy,
              CAST(floor((CAST(c.sxy AS DOUBLE) / CAST(nn.n AS DOUBLE)
                - (CAST(si.sx AS DOUBLE) / CAST(nn.n AS DOUBLE))
                  * (CAST(sj.sx AS DOUBLE) / CAST(nn.n AS DOUBLE)))
                * 1000.0) AS BIGINT) AS cov_q
            FROM cells c
            JOIN sums si ON si.i = c.i
            JOIN sums sj ON sj.i = c.j, nn"""))

  /** Per-dimension standardization (diagonal whitening, z = (x−μ)/σ) —
    * the feature-normalization step before clustering or quantization,
    * driven by the same sufficient statistics [[embedGramCov]] sketches.
    * Shapes: ONE dim-keyed aggregate (64 cells) collapses to a single
    * row of (sum, var-numerator) arrays, broadcast back over the scan;
    * each vector then standardizes in place with `zip_with` — no
    * per-row join, no explode after the stats pass. Determinism: μ and
    * σ enter as exact BIGINTs (num = x_q·n − sx_i, den = n·Σx² − sx²,
    * both < 2⁶³ at bench scale), each z quantizes per CELL by floor of
    * one double quotient (identical IEEE), and the per-vector readout
    * is an order-free xor/min/max over those integers — array-free
    * output, so the oracle hash stays engine-neutral. */
  private val embedWhiten = Q(
    "embed_whiten",
    (s, dir) => {
      val qf = q1000(Tables.embeddings(s, dir))
      val stats = qf
        .select(posexplode(col("qe")).as(Seq("i", "x")))
        .groupBy(col("i"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .agg(sort_array(collect_list(struct(col("i"), col("n"), col("sx"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den")))).as("st"))
        .select(expr("transform(st, c -> c.n)").as("ns"),
          expr("transform(st, c -> c.sx)").as("sxs"),
          expr("transform(st, c -> c.den)").as("dens"))
      qf.crossJoin(broadcast(stats))
        .withColumn("z", expr(
          """zip_with(qe, sequence(0, size(qe) - 1), (x, i) ->
               CAST(floor(CAST(x * element_at(ns, i + 1)
                   - element_at(sxs, i + 1) AS DOUBLE) * 1000.0
                 / sqrt(CAST(greatest(element_at(dens, i + 1), 1L) AS DOUBLE)))
                 AS BIGINT))"""))
        .select(col("vec_id"),
          expr("aggregate(z, 0L, (a, v) -> a ^ v)").as("z_checksum"),
          expr("array_min(z)").as("z_min"), expr("array_max(z)").as("z_max"),
          expr("CAST(size(filter(z, v -> v > 3000 OR v < -3000)) AS BIGINT)")
            .as("n_outlier3s"))
    },
    Some("""WITH q AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS e
              FROM embeddings),
            cells AS (
              SELECT i, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(e[i + 1]) AS BIGINT) AS sx,
                CAST(count(*) * sum(e[i + 1] * e[i + 1])
                  - sum(e[i + 1]) * sum(e[i + 1]) AS BIGINT) AS den
              FROM q, range(0, 64) t(i) GROUP BY i),
            st AS (
              SELECT list(n ORDER BY i) AS ns, list(sx ORDER BY i) AS sxs,
                list(den ORDER BY i) AS dens
              FROM cells),
            z AS (
              SELECT vec_id,
                list_transform(range(0, 64), i ->
                  CAST(floor(CAST(e[CAST(i + 1 AS INT)] * ns[CAST(i + 1 AS INT)]
                      - sxs[CAST(i + 1 AS INT)] AS DOUBLE) * 1000.0
                    / sqrt(CAST(greatest(dens[CAST(i + 1 AS INT)], 1) AS DOUBLE)))
                    AS BIGINT)) AS zv
              FROM q, st)
            SELECT vec_id,
              CAST(list_aggregate(zv, 'bit_xor') AS BIGINT) AS z_checksum,
              CAST(list_aggregate(zv, 'min') AS BIGINT) AS z_min,
              CAST(list_aggregate(zv, 'max') AS BIGINT) AS z_max,
              CAST(len(list_filter(zv, v -> v > 3000 OR v < -3000)) AS BIGINT)
                AS n_outlier3s
            FROM z"""))

  val all: Seq[Q] = Seq(embedRpProject, embedPowerPca, embedGramCov,
    embedWhiten)
}
