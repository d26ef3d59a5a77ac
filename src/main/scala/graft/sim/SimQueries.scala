package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Determinism across engines: both sides cast to double FIRST, then fold
  * the products left-to-right (`aggregate` in Spark, `list_sum` over a
  * `list_transform` in DuckDB) — a fixed-order double summation, bit-exact
  * on both engines. Cosines are rounded to 6 places on output; ranking uses
  * the raw double with vec_id tiebreak.
  *
  *  - `sim_bruteforce_topk` is the exact baseline: broadcast the (tiny)
  *    query set against all vectors — at 100 TB the vector side stays
  *    partition-parallel with no shuffle until the final per-query top-k.
  *  - `sim_lsh_buckets` is the scale path: sign of the projection onto 8
  *    md5-derived ±1 hyperplanes → a 256-bucket code; ANN then only probes
  *    one bucket (candidate set ~n/256) instead of all n.
  */
object SimQueries {

  private val Dim = 64
  private val NumPlanes = 8

  /** Planes-per-corpus-size law (VERDICT r08 task 5): size each hash
    * table so the expected in-bucket population stays ~[[TargetBucket]]
    * (buckets = 2^planes, so planes = round(log2(n / 30))) — big enough
    * that the in-bucket exact top-3 seeds real neighbors, small enough
    * that seeding stays corpus-linear (the bucket-quadratic seed join
    * is (n/2^p)² per bucket × 2^p buckets = n²/2^p). Floor of
    * [[NumPlanes]]: the REGISTERED queries pin planes = 8 for oracle
    * stability at test SFs; the law is the production/bench sizing
    * knob ([[graft.BenchGraphSearch]] asserts its recall floor at 2 M
    * vectors under exactly this law). */
  val TargetBucket = 30L
  def planesFor(n: Long): Int = {
    val p = math.round(math.log(math.max(n, 1L).toDouble / TargetBucket)
      / math.log(2.0)).toInt
    math.max(NumPlanes, p)
  }

  /** dot(a, b) as an ordered left fold in double — the native codegen'd
    * expression (graft.functions.DotOrdered); bit-identical to the
    * `aggregate(zip_with(...))` HOF formulation it replaced (same widen ×
    * accumulate sequence), pinned by DotOrderedSpec. Callers must have run
    * GraftFunctions.register first. */
  private def dotExpr(a: String, b: String): String =
    s"dot_ordered($a, $b)"

  /** ±1 pseudo-random hyperplane weight for (plane j, dim i), md5-derived so
    * the oracle reproduces it: parity of the first hex digit of md5("j_i"). */
  private def planeWeight(j: Int, i: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${j}_$i".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xF) % 2 == 1) 1 else -1
  }

  /** Projection sign expr for plane j: the ±1 plane as a 64-float literal
    * array through the native ordered-fold dot product. Bit-identical to
    * the 64-term `±CAST($arr[i] AS DOUBLE)` sum it replaces (multiplying
    * by ±1.0f widened to double IS IEEE negation/identity; the fold order
    * is the same left-to-right), but the expression tree is ~3× smaller
    * and the fold is one codegen'd loop — the 8-plane bucket code was the
    * dominant analysis+execution cost of every seed/forest build (r12
    * stage probe: seed 2.5 s of the 5 s base-index build at sf0.1).
    * Callers must have run GraftFunctions.register first (the dotExpr
    * contract). The ORACLE keeps the spelled-out ±sum — results are
    * hash-checked identical. */
  private def signExpr(arr: String, j: Int): String = {
    val w = (0 until Dim).map { i =>
      s"CAST(${planeWeight(j, i)}.0 AS FLOAT)" }.mkString(", ")
    s"CASE WHEN dot_ordered($arr, array($w)) > 0 THEN '1' ELSE '0' END"
  }

  def lshBuckets(emb: DataFrame, planes: Int = NumPlanes,
      firstPlane: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession) // dot_ordered
    val code = (firstPlane until firstPlane + planes)
      .map(j => expr(signExpr("embedding", j)))
    emb.select(col("vec_id"), concat(code: _*).as("bucket"))
  }

  private def lshOracle(planes: Int = NumPlanes, firstPlane: Int = 0,
      from: String = "embeddings"): String = {
    val codes = (firstPlane until firstPlane + planes).map { j =>
      val terms = (0 until Dim).map { i =>
        val w = planeWeight(j, i)
        // DuckDB lists are 1-based
        if (w == 1) s"CAST(embedding[${i + 1}] AS DOUBLE)"
        else s"(-CAST(embedding[${i + 1}] AS DOUBLE))"
      }
      s"CASE WHEN (${terms.mkString(" + ")}) > 0 THEN '1' ELSE '0' END"
    }
    s"SELECT vec_id, ${codes.mkString(" || ")} AS bucket FROM $from"
  }

  private val simLshBuckets = Q(
    "sim_lsh_buckets",
    (s, dir) => lshBuckets(Tables.embeddings(s, dir)),
    Some(lshOracle()))

  /** Exact cosine top-k for a query set against the full table. */
  def bruteForceTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val vecs = emb.select(col("vec_id"), col("embedding"),
      expr(dotExpr("embedding", "embedding")).as("norm2"))
    val queries = vecs.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      .where(queryPred)
    val scored = vecs.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  private val simBruteforce = Q(
    "sim_bruteforce_topk",
    (s, dir) =>
      bruteForceTopK(Tables.embeddings(s, dir), col("q_id") < 5, 3),
    Some {
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      s"""SELECT q_id, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT q.vec_id AS q_id, a.vec_id AS vec_id,
                        $dot / sqrt($na * $nq) AS cos
                      FROM embeddings a
                      JOIN embeddings q ON q.vec_id < 5 AND a.vec_id <> q.vec_id))
          WHERE rk <= 3"""
    })

  /** Bucketed ANN: top-k within the query's LSH bucket only — the plan that
    * survives scale (join key = bucket, candidates ~ n / 2^planes).
    * `firstPlane` selects the hash table (the knnSeedDirected convention);
    * sim_graph_search routes entries through BOTH tables. */
  def bucketedTopK(emb: DataFrame, queryPred: Column, k: Int,
      firstPlane: Int = 0, planes: Int = NumPlanes): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // checkpoint: bucket codes + norms feed both join sides; without it the
    // 8 × 64-term projections run twice
    val withBucket = lshBuckets(emb, planes, firstPlane)
      .join(emb, "vec_id")
      .withColumn("norm2", expr(dotExpr("embedding", "embedding")))
      .localCheckpoint(eager = true)
    val queries = withBucket
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      .where(queryPred)
    val scored = withBucket.join(broadcast(queries), "bucket")
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  private val simAnnBucketed = Q(
    "sim_ann_bucketed",
    (s, dir) =>
      bucketedTopK(Tables.embeddings(s, dir), col("q_id") < 20, 3),
    Some {
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      s"""WITH b AS (${lshOracle()})
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT q.vec_id AS q_id, a.vec_id AS vec_id,
                        $dot / sqrt($na * $nq) AS cos
                      FROM embeddings a JOIN b ba ON ba.vec_id = a.vec_id
                      JOIN embeddings q ON q.vec_id < 20
                      JOIN b bq ON bq.vec_id = q.vec_id
                      WHERE ba.bucket = bq.bucket AND a.vec_id <> q.vec_id))
          WHERE rk <= 3"""
    })

  /** Embedding near-dup detection: every vector's best in-bucket neighbor
    * with a near-dup verdict. (This corpus has no true near-dups — max
    * cosine ≈ 0.47 — so the output is the top-1 edge list rather than a
    * thresholded pair set, which would be vacuously empty.) Vectors alone
    * in their bucket report nn_id = -1. At scale this is the LSH-blocked
    * O(n·bucket) plan, not the O(n²) cross join.
    */
  private val dedupEmbedding = Q(
    "dedup_embedding",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val withBucket = lshBuckets(emb)
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .withColumn("norm2", expr(dotExpr("embedding", "embedding")))
        .localCheckpoint(eager = true)
      val other = withBucket.select(col("bucket"),
        col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("norm2").as("b_norm2"))
      val scored = withBucket.join(other, "bucket")
        .where(col("vec_id") =!= col("b_id"))
        .withColumn("cos",
          expr(dotExpr("embedding", "b_emb")) / sqrt(col("norm2") * col("b_norm2")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("b_id"))
      val top1 = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("b_id"), col("cos"))
      emb.select(col("vec_id")).join(top1, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("b_id"), lit(-1L)).as("nn_id"),
          round(coalesce(col("cos"), lit(-1.0)), 6).as("cos"),
          (coalesce(col("cos"), lit(-1.0)) > 0.9).as("near_dup"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      s"""WITH b AS (${lshOracle()}),
          top1 AS (
            SELECT q_id, b_id, cos FROM (
              SELECT q_id, b_id, cos,
                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, b_id) AS rn
              FROM (SELECT q.vec_id AS q_id, a.vec_id AS b_id,
                      $dot / sqrt($na * $nq) AS cos
                    FROM embeddings q JOIN b bq ON bq.vec_id = q.vec_id
                    JOIN b ba ON ba.bucket = bq.bucket
                    JOIN embeddings a ON a.vec_id = ba.vec_id
                    WHERE a.vec_id <> q.vec_id))
            WHERE rn = 1)
          SELECT e.vec_id,
            coalesce(t.b_id, -1) AS nn_id,
            round(coalesce(t.cos, -1.0), 6) AS cos,
            coalesce(t.cos, -1.0) > 0.9 AS near_dup
          FROM embeddings e LEFT JOIN top1 t ON t.q_id = e.vec_id"""
    })

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest centroid's cell; a query probes ONLY its own cell. The
    * centroid set here is deterministic (every 50th vec_id) instead of
    * k-means so the DuckDB oracle can reproduce the assignment exactly —
    * swapping in trained centroids changes only the `cent` frame. At
    * scale: centroids broadcast (K ≈ n/50 rows), the n×K assignment is
    * embarrassingly parallel, and the probe join fans out only within
    * cells (candidates ≈ n/K) — same O(n·cell) shape as production IVF.
    * Assignment ties break on centroid id; cosine ordering is safe because
    * dot_ordered is bit-exact on both engines.
    */
  private val simIvfTopk = Q(
    "sim_ivf_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val vecs = emb.select(col("vec_id"), col("embedding"),
        expr(dotExpr("embedding", "embedding")).as("norm2"))
      val cent = vecs.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("norm2").as("c_norm2"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("c_id"))
      val assigned = vecs.crossJoin(broadcast(cent))
        .withColumn("c_cos",
          expr(dotExpr("embedding", "c_emb")) / sqrt(col("norm2") * col("c_norm2")))
        .withColumn("arn", row_number().over(wAssign))
        .where(col("arn") === 1)
        .select(col("vec_id"), col("embedding"), col("norm2"), col("c_id").as("cell"))
        .localCheckpoint(eager = true) // feeds both probe sides
      val queries = assigned
        .select(col("vec_id").as("q_id"), col("cell"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
        .where(col("q_id") < 20)
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      assigned.join(broadcast(queries), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rk"))
    },
    Some {
      def dot(a: String, b: String) = SimOracle.dot(s"$a.embedding", s"$b.embedding")
      def norm(a: String) = dot(a, a)
      s"""WITH assigned AS (
            SELECT vec_id, cell FROM (
              SELECT v.vec_id, c.vec_id AS cell,
                row_number() OVER (PARTITION BY v.vec_id ORDER BY
                  ${dot("v", "c")} / sqrt(${norm("v")} * ${norm("c")}) DESC,
                  c.vec_id) AS arn
              FROM embeddings v
              JOIN embeddings c ON c.vec_id % 50 = 0)
            WHERE arn = 1)
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT q.vec_id AS q_id, a.vec_id AS vec_id,
                        ${dot("a", "q")} / sqrt(${norm("a")} * ${norm("q")}) AS cos
                      FROM embeddings q
                      JOIN assigned aq ON aq.vec_id = q.vec_id AND q.vec_id < 20
                      JOIN assigned aa ON aa.cell = aq.cell
                      JOIN embeddings a ON a.vec_id = aa.vec_id
                      WHERE a.vec_id <> q.vec_id))
          WHERE rk <= 3"""
    })

  /** Multi-probe LSH ANN: probe the query's own bucket PLUS every bucket
    * at Hamming distance 1 (one probe per flipped sign bit). The
    * recall/cost dial is (planes, probe radius): fewer planes or more
    * probes → more candidates → higher recall. Measured on this corpus
    * (random vectors, nearest cos ≈ 0.47 — hard for sign-LSH):
    * 8-plane single-bucket scans 0.4% of the corpus at recall@3 = 0.00;
    * 6-plane multiprobe scans ~12% at recall@3 = 0.23 (AnnRecallSpec pins
    * the floor). At 100 TB the shape is identical to the single-bucket
    * plan: probes explode only the QUERY side ((planes+1) rows per
    * query, broadcast), the corpus side joins on its one bucket code —
    * no corpus blow-up, candidates ≈ (planes+1) · n / 2^planes.
    */
  def multiprobeTopK(emb: DataFrame, queryPred: Column, k: Int,
      planes: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val withBucket = lshBuckets(emb, planes)
      .join(emb, "vec_id")
      .withColumn("norm2", expr(dotExpr("embedding", "embedding")))
      .localCheckpoint(eager = true)
    // self + one single-bit flip per plane; all probe codes are distinct,
    // so each (query, candidate) pair surfaces at most once
    val probes: Seq[Column] = col("bucket") +: (1 to planes).map { j =>
      concat(
        expr(s"substring(bucket, 1, ${j - 1})"),
        expr(s"CASE substring(bucket, $j, 1) WHEN '1' THEN '0' ELSE '1' END"),
        expr(s"substring(bucket, ${j + 1})"))
    }
    val queries = withBucket
      .select(col("vec_id").as("q_id"), col("bucket"),
        col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      .where(queryPred)
      .select(col("q_id"), col("q_emb"), col("q_norm2"),
        explode(array(probes: _*)).as("probe"))
    val scored = withBucket
      .join(broadcast(queries), col("bucket") === col("probe"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        expr(dotExpr("embedding", "q_emb")) / sqrt(col("norm2") * col("q_norm2")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }

  private val MultiprobePlanes = 6

  private val simAnnMultiprobe = Q(
    "sim_ann_multiprobe",
    (s, dir) =>
      multiprobeTopK(Tables.embeddings(s, dir), col("q_id") < 20, 3,
        MultiprobePlanes),
    Some {
      val P = MultiprobePlanes
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      val flips = s"SELECT vec_id AS q_id, bucket AS probe FROM b WHERE vec_id < 20" +:
        (1 to P).map(j =>
          s"""SELECT vec_id, substr(bucket, 1, ${j - 1}) ||
              (CASE substr(bucket, $j, 1) WHEN '1' THEN '0' ELSE '1' END) ||
              substr(bucket, ${j + 1}) FROM b WHERE vec_id < 20""")
      s"""WITH b AS (${lshOracle(P)}),
          probes AS (${flips.mkString(" UNION ALL ")})
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT p.q_id, a.vec_id,
                        $dot / sqrt($na * $nq) AS cos
                      FROM probes p
                      JOIN b ba ON ba.bucket = p.probe
                      JOIN embeddings a ON a.vec_id = ba.vec_id
                      JOIN embeddings q ON q.vec_id = p.q_id
                      WHERE a.vec_id <> p.q_id))
          WHERE rk <= 3"""
    })

  /** Int8 scalar quantization of the embedding column — the 4× (float32)
    * compression every billion-vector ANN serving stack applies before
    * anything else (FAISS ScalarQuantizer QT_8bit shape): per-DIMENSION
    * [min, max] learned from the corpus, each value mapped to its
    * 256-bucket index.
    *
    * Scale: pass 1 is ONE partial aggregate producing 64 (dim, min, max)
    * rows — broadcast; pass 2 is pure per-row array math riding the scan
    * (no shuffle, no UDF). The codes column is 64 bytes/vector; ANN
    * distance on codes is integer arithmetic (the PQ/IVFADC queries show
    * the LUT pattern).
    *
    * Determinism: bucket index is `floor((v - lo) * 256 / (hi - lo))`
    * clamped to 255 — floor (no round-half ties), with float→double
    * widening and the SAME operation order on both engines; constant
    * dims (hi == lo) map to 0. QuantizeSpec pins reconstruction error
    * ≤ half a bucket width per dimension.
    */
  /** (vec_id, codes: array<bigint>) int8 bucket codes — per-dim [lo, hi]
    * from one 64-row partial aggregate, broadcast; the code map rides the
    * scan. Shared by the quantize query and the integer-ANN search. */
  private[sim] def int8Codes(emb: DataFrame): DataFrame = {
      val stats = emb
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, lo, hi))), s -> struct(CAST(s.lo AS DOUBLE) AS lo, CAST(s.hi AS DOUBLE) AS hi))")
          .as("ranges"))
      emb.crossJoin(broadcast(stats))
        .select(col("vec_id"), expr(
          """zip_with(embedding, ranges, (v, r) ->
               CASE WHEN r.hi = r.lo THEN CAST(0 AS BIGINT)
                    ELSE least(CAST(255 AS BIGINT),
                      CAST(floor((CAST(v AS DOUBLE) - r.lo) * 256.0D / (r.hi - r.lo)) AS BIGINT))
               END)""").as("codes"))
  }

  private val embedQuantizeInt8 = Q(
    "embed_quantize_int8",
    (s, dir) => {
      int8Codes(Tables.embeddings(s, dir))
        // 128-hex-char scalar (the driver's hash compare takes scalars,
        // not arrays — same flattening as the minhash band hashes)
        .select(col("vec_id"),
          expr("array_join(transform(codes, c -> lpad(lower(hex(c)), 2, '0')), '')")
            .as("codes_hex"),
          expr("array_min(codes)").as("code_min"),
          expr("array_max(codes)").as("code_max"))
    },
    Some("""WITH stats AS (
              SELECT s.i AS pos,
                CAST(min(embedding[s.i]) AS DOUBLE) AS lo,
                CAST(max(embedding[s.i]) AS DOUBLE) AS hi
              FROM embeddings, generate_series(1, 64) AS s(i)
              GROUP BY s.i),
            ranges AS (
              SELECT list(struct_pack(lo := lo, hi := hi) ORDER BY pos) AS rs
              FROM stats),
            codes AS (
              SELECT vec_id,
                list_transform(range(1, 65), i ->
                  CASE WHEN rs[i].hi = rs[i].lo THEN CAST(0 AS BIGINT)
                       ELSE least(CAST(255 AS BIGINT),
                         CAST(floor((CAST(embedding[i] AS DOUBLE) - rs[i].lo) * 256.0
                           / (rs[i].hi - rs[i].lo)) AS BIGINT))
                  END) AS cs
              FROM embeddings, ranges)
            SELECT vec_id,
              array_to_string(list_transform(cs, c -> printf('%02x', c)), '')
                AS codes_hex,
              CAST(list_min(cs) AS BIGINT) AS code_min,
              CAST(list_max(cs) AS BIGINT) AS code_max
            FROM codes"""))

  /** Scalar-quantized ANN: exact top-3 by squared L2 over the int8 CODES
    * — the search the 4× compression exists for. Everything after the
    * one-pass quantization is INTEGER arithmetic (code deltas squared and
    * summed — exact on both engines, no float-fold ordering to worry
    * about), and the per-query top-k is the k-bounded TopKByValue
    * Aggregator, not a rank window: each partition ships ≤ 3 candidates
    * per query to the exchange, so the scored stream — n rows per query —
    * is reduced map-side instead of sorted per query. The codes frame
    * feeds both the query side and the corpus side → checkpoint once.
    *
    * QuantizeSpec bounds the distance distortion this search inherits;
    * AnnRecallSpec-style ground truth is `sim_bruteforce_topk` on the
    * raw floats.
    */
  private val simSqTopk = Q(
    "sim_sq_topk",
    (s, dir) => {
      val codes = int8Codes(Tables.embeddings(s, dir))
        .localCheckpoint(eager = true) // query side + corpus side
      val q = codes.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("codes").as("qcodes"))
      val scored = codes.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), expr(
          """aggregate(zip_with(codes, qcodes, (a, b) -> (a - b) * (a - b)),
             CAST(0 AS BIGINT), (acc, v) -> acc + v)""").as("sqdist"))
      val tk = udaf(new graft.functions.TopKByValue(3),
        graft.functions.TopKByValue.inputEncoder)
      scored
        .groupBy(col("q_id"))
        // negated distance: TopKByValue keeps the largest values, ties on
        // the SMALLEST id — exactly ORDER BY sqdist ASC, vec_id ASC
        .agg(tk(-col("sqdist").cast("double"), col("vec_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("q_id"), col("e._2").as("vec_id"),
          (-col("e._1")).cast("long").as("sqdist"),
          (col("pos") + 1).cast("long").as("rk"))
    },
    Some("""WITH stats AS (
              SELECT s.i AS pos,
                CAST(min(embedding[s.i]) AS DOUBLE) AS lo,
                CAST(max(embedding[s.i]) AS DOUBLE) AS hi
              FROM embeddings, generate_series(1, 64) AS s(i)
              GROUP BY s.i),
            ranges AS (
              SELECT list(struct_pack(lo := lo, hi := hi) ORDER BY pos) AS rs
              FROM stats),
            codes AS (
              SELECT vec_id,
                list_transform(range(1, 65), i ->
                  CASE WHEN rs[i].hi = rs[i].lo THEN CAST(0 AS BIGINT)
                       ELSE least(CAST(255 AS BIGINT),
                         CAST(floor((CAST(embedding[i] AS DOUBLE) - rs[i].lo) * 256.0
                           / (rs[i].hi - rs[i].lo)) AS BIGINT))
                  END) AS cs
              FROM embeddings, ranges),
            scored AS (
              SELECT q.vec_id AS q_id, c.vec_id,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (c.cs[i] - q.cs[i]) * (c.cs[i] - q.cs[i]))) AS BIGINT)
                  AS sqdist
              FROM codes c, codes q
              WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
            SELECT q_id, vec_id, sqdist, rk FROM (
              SELECT q_id, vec_id, sqdist,
                CAST(row_number() OVER (
                  PARTITION BY q_id ORDER BY sqdist, vec_id) AS BIGINT) AS rk
              FROM scored)
            WHERE rk <= 3"""))

  /** Approximate symmetric kNN-graph construction — the build step under
    * graph-based ANN indexes and NN-descent/UMAP-style manifold methods:
    * every vector's top-3 in-bucket neighbors by cosine, symmetrized into
    * an undirected edge list with a `mutual` flag (edges found from BOTH
    * endpoints — the high-precision core NN-descent seeds from).
    *
    * Scale shape: candidate generation is the bucket self-join (candidates
    * ≈ n²/2^planes, the sim_ann_bucketed argument — planes grow with the
    * corpus), per-source top-3 goes through the k-bounded TopKByValue
    * Aggregator (map-side ≤ k rows per source, no rank window), and
    * symmetrization is one groupBy on the canonical (least, greatest) key
    * counting directions — cosine is symmetric, so the two directed copies
    * carry the identical double and the rollup needs no recompute.
    */
  /** Directed in-bucket top-3 neighbor list — the kNN-graph seed shared
    * by [[simKnnGraph]] (symmetrized edge output, hash table 0) and
    * [[simKnnDescent]] (one refinement round over the table-0 ∪ table-1
    * union). `firstPlane` selects the hash table: planes
    * [firstPlane, firstPlane+8) — table 1 (planes 8-15) is an independent
    * md5-derived plane set. Returns (a_id, b_id, cos) with raw
    * (unrounded) cosine — consumers round on output only, so ranking
    * always uses the full double. */
  private[sim] def knnSeedDirected(emb: DataFrame,
      planes: Int = NumPlanes, firstPlane: Int = 0): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // bucket + norm2 in ONE projection over emb — the former
    // lshBuckets-then-join-back-on-vec_id paid a whole equi-join exchange
    // to reattach the embedding column it had just projected away (guide
    // §2.4: remove shuffles outright); vec_id is unique, so the direct
    // select is row-identical
    val withBucket = emb.select(col("vec_id"), col("embedding"),
        concat((firstPlane until firstPlane + planes)
          .map(j => expr(signExpr("embedding", j))): _*).as("bucket"),
        expr(dotExpr("embedding", "embedding")).as("norm2"))
      .localCheckpoint(eager = true) // both sides of the bucket self-join
    seedFromBuckets(withBucket, "bucket")
  }

  /** In-bucket exact-cosine directed top-3 off a checkpointed
    * (vec_id, embedding, norm2, `bucketCol`) frame — the self-join +
    * k-bounded select body shared by [[knnSeedDirected]] and the
    * two-table [[knnDescentSeed]] (which computes both tables' codes in
    * one projection/checkpoint instead of two). */
  private def seedFromBuckets(withBucket: DataFrame,
      bucketCol: String): DataFrame = {
    val a = withBucket.select(col(bucketCol).as("bucket"),
      col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("norm2").as("a_norm2"))
    val b = withBucket.select(col(bucketCol).as("bucket"),
      col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("norm2").as("b_norm2"))
    val tk = udaf(new graft.functions.TopKByValue(3),
      graft.functions.TopKByValue.inputEncoder)
    a.join(b, "bucket")
      .where(col("a_id") =!= col("b_id"))
      .withColumn("cos",
        expr(dotExpr("a_emb", "b_emb")) / sqrt(col("a_norm2") * col("b_norm2")))
      .groupBy(col("a_id"))
      .agg(tk(col("cos"), col("b_id")).as("top"))
      .select(col("a_id"), explode(col("top")).as("e"))
      .select(col("a_id"), col("e._2").as("b_id"), col("e._1").as("cos"))
  }

  /** Oracle CTE for [[knnSeedDirected]]: `$seedName(a_id, b_id, cos)`
    * reading buckets from `$bkName`. Splice after a bucket CTE. */
  private def seedOracle(bkName: String = "bk",
      seedName: String = "seed", from: String = "embeddings"): String = {
    val dot = SimOracle.dot("a.embedding", "b.embedding")
    val na  = SimOracle.dot("a.embedding", "a.embedding")
    val nb  = SimOracle.dot("b.embedding", "b.embedding")
    s"""$seedName AS (
          SELECT a_id, b_id, cos FROM (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              $dot / sqrt($na * $nb) AS cos,
              row_number() OVER (PARTITION BY a.vec_id
                ORDER BY $dot / sqrt($na * $nb) DESC, b.vec_id) AS rk
            FROM $from a
            JOIN $bkName ba ON ba.vec_id = a.vec_id
            JOIN $bkName bb ON bb.bucket = ba.bucket
            JOIN $from b ON b.vec_id = bb.vec_id
              AND b.vec_id <> a.vec_id)
          WHERE rk <= 3)"""
  }

  private val simKnnGraph = Q(
    "sim_knn_graph",
    (s, dir) => {
      val directed = knnSeedDirected(Tables.embeddings(s, dir))
      directed
        .select(least(col("a_id"), col("b_id")).as("u"),
          greatest(col("a_id"), col("b_id")).as("v"), col("cos"))
        .groupBy(col("u"), col("v"))
        .agg(round(max(col("cos")), 6).as("cos"),
          (count(lit(1)) === 2L).as("mutual"))
    },
    Some(
      s"""WITH bk AS (${lshOracle()}),
          ${seedOracle()}
          SELECT least(a_id, b_id) AS u, greatest(a_id, b_id) AS v,
            round(max(cos), 6) AS cos,
            count(*) = 2 AS mutual
          FROM seed
          GROUP BY least(a_id, b_id), greatest(a_id, b_id)"""))

  /** One NN-descent refinement round — the Dong-Charikar-Li iteration
    * (WWW'11) that graph-based ANN indexes converge by: a vector's
    * improved neighbor candidates are its current neighbors' neighbors.
    * Candidates(a) = N(a) ∪ N(N(a)) over the UNDIRECTED seed
    * neighborhood (reverse edges carry exactly the "b found a"
    * information NN-descent's sampling step exists to exploit),
    * re-scored by exact cosine, per-node top-3 re-selected.
    *
    * THE SEED MUST SPAN HASH TABLES: over the single-table
    * [[simKnnGraph]] seed alone, descent is provably a no-op — every
    * seed edge connects same-bucket nodes, so N(N(a)) stays inside
    * bucket(a), where the in-bucket top-3 is already exact (measured:
    * seed ≡ descent bit-for-bit). The descent input is therefore the
    * union of TWO independent 8-plane hash tables' in-bucket top-3
    * (planes 0-7 and 8-15 — the LSH-forest seeding graph-ANN builds
    * use); a hop through a neighbor's OTHER-table bucket is what lets
    * the round reconnect a neighborhood one table's quantization split.
    *
    * Scale shape: the seed is k-bounded (≤ 3 out-edges per node per
    * table), so the undirected list is ≤ 4·3·n rows and the two-hop
    * self-join fans out to ≤ 12²·n candidate rows of 8-byte id pairs —
    * corpus-linear, never the bucket-quadratic of widening LSH probes.
    * Embedding payloads attach only at the final gather (two hash joins
    * on vec_id), the re-score is the codegen'd dot_ordered fold, and the
    * re-select is the k-bounded TopKByValue Aggregator (map-side ≤ 3
    * rows per node, no rank window). Further rounds repeat the same join
    * shape; one round is registered because each is plan-identical and
    * KnnGraphSpec pins the recall gain on a clustered fixture.
    *
    * Determinism: ranking uses the raw double cosine with vec_id
    * tiebreak (the SimQueries convention — identical IEEE fold on both
    * engines); output rounds to 6 places after selection.
    */
  /** Descent candidate generation over a two-table union seed:
    * undirected neighborhood ∪ neighbors-of-neighbors as id-only pairs
    * (a_id, c_id). Exposed for [[graft.BenchKnnDescent]]'s fan-out
    * telemetry. */
  def knnDescentCandidates(seed: DataFrame): DataFrame =
    candidatesFromUnd(seed
      .union(seed.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .distinct()
      .localCheckpoint(eager = true)) // one-hop side + both two-hop sides

  /** und → one-hop ∪ two-hop candidate id pairs. The caller owns the und
    * checkpoint lifecycle ([[knnDescentConverge]] releases each round's
    * frame once the round's top-k is materialized). */
  private def candidatesFromUnd(und: DataFrame): DataFrame = {
    val twoHop = und.select(col("a_id"), col("b_id").as("mid"))
      .join(und.select(col("a_id").as("mid"), col("b_id").as("c_id")), "mid")
      .select(col("a_id"), col("c_id"))
    und.select(col("a_id"), col("b_id").as("c_id"))
      .union(twoHop)
      .where(col("a_id") =!= col("c_id"))
      .distinct()
  }

  /** Undirected neighborhood of a SCORED top-k graph `(q_id, vec_id,
    * cos, rk)` with the reverse side CAPPED at the top-[[reverse cap =
    * 3]] in-edges by cosine — NN-descent's reverse sampling (ρ in
    * Dong-Charikar-Li). The seed round's 12²·n fan-out bound held
    * because seed out-degree is table-bounded; from round 2 on the
    * in-degree is whatever the data concentrates on a hub vector, so an
    * uncapped reverse union would let one popular vector quadratically
    * inflate the two-hop join. Capped: deg ≤ 3 out + 3 reverse = 6, so
    * candidates ≤ (6 + 6²)·n per round — corpus-linear at ANY round,
    * the bound BenchKnnDescent asserts. The cap is k-bounded via the
    * same TopKByValue Aggregator as the forward selection (map-side ≤ 3
    * rows per node, no rank window). */
  private[graft] def cappedUnd(tk: DataFrame): DataFrame = {
    val tkAgg = udaf(new graft.functions.TopKByValue(3),
      graft.functions.TopKByValue.inputEncoder)
    val fwd = tk.select(col("q_id").as("a_id"), col("vec_id").as("b_id"))
    val rev = tk
      .groupBy(col("vec_id"))
      .agg(tkAgg(col("cos"), col("q_id")).as("top"))
      .select(col("vec_id").as("a_id"), explode(col("top")).as("e"))
      .select(col("a_id"), col("e._2").as("b_id"))
    fwd.union(rev).distinct()
  }

  /** One post-seed NN-descent round over a scored top-k graph —
    * capped-reverse und → candidates → exact-cosine top-3 re-select.
    * The SAME three stages [[knnDescentConverge]] runs per round (it
    * inlines them to manage the und checkpoint lifecycle), so the
    * convergence driver's round semantics are hash-checked against
    * DuckDB through `sim_knn_descent_r2` even though its round COUNT is
    * data-dependent. */
  def knnDescentRound(tk: DataFrame, emb: DataFrame): DataFrame =
    knnDescentTopK(
      candidatesFromUnd(cappedUnd(tk).localCheckpoint(eager = true)), emb)

  /** Multi-round NN-descent with a convergence criterion (VERDICT r07
    * task 4): round 1 is the registered `sim_knn_descent` round off the
    * two-table LSH-forest seed; each later round is [[knnDescentRound]]
    * (capped-reverse candidates, exact re-select). Stops when the
    * round's directed edge-set delta — top-3 edges NOT present in the
    * previous round's graph, in ppm of the edge count — drops below
    * `epsPpm`, or at `maxRounds`. Each round's graph is checkpointed
    * and the superseded round's frames released (the Components
    * iteration discipline), so resident state is one graph + one und no
    * matter how many rounds run.
    *
    * @return (final scored top-k frame, rounds run, per-round delta ppm)
    */
  def knnDescentConverge(emb: DataFrame, planes: Int = NumPlanes,
      maxRounds: Int = 5, epsPpm: Long = 50000L)
      : (DataFrame, Int, Seq[Long]) = {
    require(maxRounds >= 1 && maxRounds <= 64,
      s"maxRounds $maxRounds outside (0, 64] — each round checkpoints a " +
        "corpus-sized graph; a runaway budget is a mis-set knob")
    val seed = knnDescentSeed(emb, planes).localCheckpoint(eager = true)
    // round 1 = the registered sim_knn_descent round, its und inlined so
    // the checkpoint releases once the round's top-k materializes
    val und1 = seed
      .union(seed.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .distinct().localCheckpoint(eager = true)
    var tk = knnDescentTopK(candidatesFromUnd(und1), emb)
      .localCheckpoint(eager = true)
    graft.identity.Components.unpersistCheckpoint(und1)
    var rounds = 1
    val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
    def deltaPpm(newTk: DataFrame, prev: DataFrame): Long = {
      val next = newTk.select(col("q_id").as("a_id"), col("vec_id").as("b_id"))
      val changed = next.join(prev, Seq("a_id", "b_id"), "left_anti").count()
      changed * 1000000L / math.max(newTk.count(), 1L)
    }
    deltas += deltaPpm(tk, seed)
    while (rounds < maxRounds && deltas.last >= epsPpm) {
      // knnDescentRound's stages, inlined so the round's und checkpoint
      // can be released the moment the round's top-k is materialized
      val und = cappedUnd(tk).localCheckpoint(eager = true)
      val next = knnDescentTopK(candidatesFromUnd(und), emb)
        .localCheckpoint(eager = true)
      graft.identity.Components.unpersistCheckpoint(und)
      deltas += deltaPpm(next,
        tk.select(col("q_id").as("a_id"), col("vec_id").as("b_id")))
      graft.identity.Components.unpersistCheckpoint(tk)
      tk = next
      rounds += 1
    }
    graft.identity.Components.unpersistCheckpoint(seed)
    (tk, rounds, deltas.toSeq)
  }

  /** Exact-cosine re-score + k-bounded top-3 re-select over candidate
    * id-pairs; embedding payloads attach only here (the final gather). */
  def knnDescentTopK(cand: DataFrame, emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val vecs = emb.select(col("vec_id"), col("embedding"),
      expr(dotExpr("embedding", "embedding")).as("norm2"))
    val tk = udaf(new graft.functions.TopKByValue(3),
      graft.functions.TopKByValue.inputEncoder)
    cand
      .join(vecs.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("norm2").as("a_norm2")), "a_id")
      .join(vecs.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("norm2").as("c_norm2")), "c_id")
      .withColumn("cos",
        expr(dotExpr("a_emb", "c_emb")) / sqrt(col("a_norm2") * col("c_norm2")))
      .groupBy(col("a_id"))
      .agg(tk(col("cos"), col("c_id")).as("top"))
      .select(col("a_id").as("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e._2").as("vec_id"),
        round(col("e._1"), 6).as("cos"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Two-table seed (planes [0, p) and [p, 2p)) for the descent round —
    * `planes` is the corpus-scaling knob (buckets = 2^planes per table;
    * grow planes with n to keep in-bucket candidate sets bounded). */
  def knnDescentSeed(emb: DataFrame, planes: Int = NumPlanes): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // both hash tables' codes + norm2 in ONE projection and ONE
    // checkpoint (formerly two knnSeedDirected calls = two emb passes,
    // two checkpoints, and two join-back exchanges)
    val withBoth = emb.select(col("vec_id"), col("embedding"),
        concat((0 until planes)
          .map(j => expr(signExpr("embedding", j))): _*).as("bucket0"),
        concat((planes until 2 * planes)
          .map(j => expr(signExpr("embedding", j))): _*).as("bucket1"),
        expr(dotExpr("embedding", "embedding")).as("norm2"))
      .localCheckpoint(eager = true)
    seedFromBuckets(withBoth, "bucket0")
      .union(seedFromBuckets(withBoth, "bucket1"))
      .select(col("a_id"), col("b_id"))
  }

  private val descentCache =
    new graft.queries.SessionCache[DataFrame](Seq(_))

  /** Session-shared round-1 NN-descent graph — the BUILT ANN index
    * (scored per-node top-3), built once per (session, corpus) and read
    * by `sim_knn_descent` (the build query), `sim_knn_descent_r2` (the
    * refinement round) and `sim_graph_search` (the query path). The
    * production shape: the graph index is constructed once per corpus
    * snapshot and searched many times — rebuilding it inside every
    * search query would charge the build to the read path (measured
    * ~4.8 s of the search query's 5.5 s at sf0.1 was the build). */
  def descentR1(s: SparkSession, dir: String): DataFrame =
    descentCache.getOrBuild(s, dir) {
      val emb = Tables.embeddings(s, dir)
      knnDescentTopK(knnDescentCandidates(knnDescentSeed(emb)), emb)
        .localCheckpoint(eager = true)
    }

  /** Drop the cached descent graph, the incremental-insert base index
    * and the attach log (tests / bench passes). */
  def descentInvalidate(): Unit = {
    descentCache.invalidate()
    baseIndexCache.invalidate()
    attachCache.invalidate()
  }

  private val baseIndexCache =
    new graft.queries.SessionCache[(DataFrame, DataFrame, DataFrame)](
      t => Seq(t._1, t._2, t._3))

  private val baseBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** How many times the base-split index was actually derived (not
    * cache-served) — the PlanSpec share-one-artifact probe. */
  def baseIndexBuildCount: Int = baseBuilds.get()

  /** The base split of the corpus — everything NOT in the md5-selected
    * delta batch ([[NewVecByte]]); the served index that
    * `sim_graph_incremental` grows and `sim_graph_compact` folds the
    * attach edges into. */
  private def baseSplit(s: SparkSession, dir: String): DataFrame = {
    val isNew = expr(
      s"(${graft.queries.PortableHash.md5Byte("CAST(vec_id AS STRING)")}) < $NewVecByte")
    Tables.embeddings(s, dir).where(not(isNew))
  }

  /** Session-shared (scored r1 graph, capped adjacency, bucket codes)
    * of the BASE split's index for `sim_graph_incremental` /
    * `sim_graph_compact` — production grows an EXISTING index;
    * rebuilding it inside every insert batch would charge the build to
    * the ingest path (the descentR1 argument, applied to the base
    * split). The scored graph rides along because compaction folds
    * attach edges into it BY COSINE — the capped adjacency alone has
    * forgotten the scores. */
  private def baseIndex(s: SparkSession, dir: String,
      base: => DataFrame): (DataFrame, DataFrame, DataFrame) =
    baseIndexCache.getOrBuild(s, dir) {
      baseBuilds.incrementAndGet()
      val b = base
      val r1 = knnDescentTopK(knnDescentCandidates(knnDescentSeed(b)), b)
        .localCheckpoint(eager = true)
      (r1, cappedUnd(r1).localCheckpoint(eager = true),
        forestCodes(b).localCheckpoint(eager = true))
    }

  /** Build-or-serve the base-split index off the default md5 split —
    * the bench's cold artifact line (VERDICT r08 task 1: without it the
    * one-time base build lands on `sim_graph_incremental`'s query
    * line). Returns (scored r1 graph, capped adjacency, bucket
    * codes). */
  def baseIndexBuild(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    baseIndex(s, dir, baseSplit(s, dir))

  /** Stage-attributed timing of the [[baseIndexBuild]] pipeline (dev
    * profiling only — graft.ProbeMain `base_index_stages`): each stage
    * materialized and timed separately so the artifact line's cost can
    * be attributed before optimizing (guide §1). Bypasses the session
    * cache; caller should descentInvalidate() first. */
  private[graft] def baseIndexStagesProbe(s: SparkSession, dir: String)
      : Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      out += n -> (System.nanoTime() - t0) / 1e9
      r
    }
    val b = timed("base_split_cp") {
      baseSplit(s, dir).localCheckpoint(eager = true) }
    val seed = timed("seed") {
      knnDescentSeed(b).localCheckpoint(eager = true) }
    val und = timed("und") {
      seed.union(seed.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .distinct().localCheckpoint(eager = true) }
    val cand = timed("candidates") {
      candidatesFromUnd(und).localCheckpoint(eager = true) }
    val r1 = timed("topk") {
      knnDescentTopK(cand, b).localCheckpoint(eager = true) }
    timed("capped_und") { cappedUnd(r1).localCheckpoint(eager = true) }
    timed("forest_codes") { forestCodes(b).localCheckpoint(eager = true) }
    out.toSeq
  }

  /** Write the base-split index (scored graph + capped adjacency +
    * bucket codes) as a parquet snapshot keyed by the embeddings
    * fingerprint — the descentPersistTo lifecycle applied to the
    * incremental-insert twin. */
  def baseIndexPersistTo(s: SparkSession, corpusDir: String,
      artifactDir: String): Unit = {
    val (r1, adj, codes) = baseIndexBuild(s, corpusDir)
    graft.queries.ArtifactStore.writeSnapshot(s, artifactDir,
      descentFingerprint(s, corpusDir),
      Seq("base_r1" -> r1, "base_adj" -> adj, "base_codes" -> codes))
  }

  /** Seed the session cache from a persisted base-index snapshot whose
    * key matches the CURRENT embeddings fingerprint; false otherwise. */
  def baseIndexLoadFrom(s: SparkSession, corpusDir: String,
      artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      descentFingerprint(s, corpusDir),
      Seq("base_r1", "base_adj", "base_codes")) match {
      case Some(m) =>
        baseIndexCache.put(s, corpusDir,
          (m("base_r1"), m("base_adj"), m("base_codes")))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def baseIndexEnsure(s: SparkSession, corpusDir: String,
      artifactDir: String): Boolean = {
    val hit = baseIndexLoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      baseIndexCache.remove(s, corpusDir)
      baseIndexPersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  // ---------------------------------------------------------------------
  // Parquet persistence — the GraphArtifacts/CandidateArtifacts contract
  // for the ANN index: the built graph lands once per corpus snapshot,
  // stamped with the embeddings fingerprint; a later session loads
  // instead of re-deriving, a changed corpus misses the key and
  // rebuilds. This is the production vector-index lifecycle: build per
  // snapshot, serve many searches.
  // ---------------------------------------------------------------------

  /** Snapshot key: the embeddings table fingerprint. */
  def descentFingerprint(s: SparkSession, corpusDir: String): String =
    graft.queries.TableFingerprint.of(s, s"$corpusDir/embeddings.parquet")

  /** Write the round-1 descent graph as parquet under `artifactDir`. */
  def descentPersistTo(s: SparkSession, corpusDir: String,
      artifactDir: String): Unit =
    graft.queries.ArtifactStore.writeSnapshot(s, artifactDir,
      descentFingerprint(s, corpusDir),
      Seq("descent_r1" -> descentR1(s, corpusDir)))

  /** Seed the session cache from a persisted snapshot whose key matches
    * the CURRENT embeddings fingerprint; false otherwise. */
  def descentLoadFrom(s: SparkSession, corpusDir: String,
      artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      descentFingerprint(s, corpusDir), Seq("descent_r1")) match {
      case Some(m) =>
        descentCache.put(s, corpusDir, m("descent_r1"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def descentEnsure(s: SparkSession, corpusDir: String,
      artifactDir: String): Boolean = {
    val hit = descentLoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      // a stale snapshot must not satisfy the session cache either
      descentCache.remove(s, corpusDir)
      descentPersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  private val simKnnDescent = Q(
    "sim_knn_descent",
    (s, dir) => descentR1(s, dir),
    Some {
      val dot = SimOracle.dot("a.embedding", "c.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nc  = SimOracle.dot("c.embedding", "c.embedding")
      s"""WITH bk AS (${lshOracle()}),
          bk1 AS (${lshOracle(NumPlanes, NumPlanes)}),
          ${seedOracle("bk", "seed0")},
          ${seedOracle("bk1", "seed1")},
          seed AS (
            SELECT a_id, b_id FROM seed0
            UNION
            SELECT a_id, b_id FROM seed1),
          und AS (
            SELECT a_id, b_id FROM seed
            UNION
            SELECT b_id, a_id FROM seed),
          cand AS (
            SELECT a_id, b_id AS c_id FROM und
            UNION
            SELECT x.a_id, y.b_id AS c_id
            FROM und x JOIN und y ON y.a_id = x.b_id
            WHERE y.b_id <> x.a_id),
          scored AS (
            SELECT cand.a_id AS q_id, cand.c_id AS vec_id,
              $dot / sqrt($na * $nc) AS cos
            FROM cand
            JOIN embeddings a ON a.vec_id = cand.a_id
            JOIN embeddings c ON c.vec_id = cand.c_id)
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk FROM (
            SELECT q_id, vec_id, cos,
              CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
            FROM scored)
          WHERE rk <= 3"""
    })

  /** SECOND NN-descent round (VERDICT r07 task 4's oracle anchor) —
    * exactly [[knnDescentRound]] applied to `sim_knn_descent`'s output:
    * capped-reverse undirected neighborhood (top-3 in-edges by the
    * round-1 cosine — the Dong-Charikar-Li reverse sampling that keeps
    * hub in-degree from quadratically inflating the two-hop join),
    * candidates, exact-cosine top-3 re-select. This is the round body
    * [[knnDescentConverge]] repeats, unrolled once so DuckDB can replay
    * it — the convergence driver's round SEMANTICS are hash-checked
    * here even though its round COUNT is data-dependent (the
    * approx_stats/_frame companion pattern).
    *
    * Scale shape per round: und degree ≤ 6 (3 out + 3 capped reverse),
    * so candidates ≤ (6 + 6²)·n id-only pairs — corpus-linear at ANY
    * round; embeddings attach only at the final gather; re-select is
    * the k-bounded TopKByValue Aggregator.
    */
  private val simKnnDescentR2 = Q(
    "sim_knn_descent_r2",
    (s, dir) =>
      knnDescentRound(descentR1(s, dir), Tables.embeddings(s, dir)),
    Some {
      val dot = SimOracle.dot("a.embedding", "c.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nc  = SimOracle.dot("c.embedding", "c.embedding")
      s"""WITH bk AS (${lshOracle()}),
          bk1 AS (${lshOracle(NumPlanes, NumPlanes)}),
          ${seedOracle("bk", "seed0")},
          ${seedOracle("bk1", "seed1")},
          seed AS (
            SELECT a_id, b_id FROM seed0
            UNION
            SELECT a_id, b_id FROM seed1),
          und AS (
            SELECT a_id, b_id FROM seed
            UNION
            SELECT b_id, a_id FROM seed),
          cand AS (
            SELECT a_id, b_id AS c_id FROM und
            UNION
            SELECT x.a_id, y.b_id AS c_id
            FROM und x JOIN und y ON y.a_id = x.b_id
            WHERE y.b_id <> x.a_id),
          r1 AS MATERIALIZED (
            SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
              SELECT cand.a_id AS q_id, cand.c_id AS vec_id,
                $dot / sqrt($na * $nc) AS cos,
                row_number() OVER (PARTITION BY cand.a_id
                  ORDER BY $dot / sqrt($na * $nc) DESC, cand.c_id) AS rk
              FROM cand
              JOIN embeddings a ON a.vec_id = cand.a_id
              JOIN embeddings c ON c.vec_id = cand.c_id)
            WHERE rk <= 3),
          rev AS (
            SELECT vec_id AS a_id, q_id AS b_id FROM (
              SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, q_id) AS rn
              FROM r1)
            WHERE rn <= 3),
          und2 AS (
            SELECT q_id AS a_id, vec_id AS b_id FROM r1
            UNION
            SELECT a_id, b_id FROM rev),
          cand2 AS (
            SELECT a_id, b_id AS c_id FROM und2
            UNION
            SELECT x.a_id, y.b_id AS c_id
            FROM und2 x JOIN und2 y ON y.a_id = x.b_id
            WHERE y.b_id <> x.a_id)
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk FROM (
            SELECT cand2.a_id AS q_id, cand2.c_id AS vec_id,
              $dot / sqrt($na * $nc) AS cos,
              CAST(row_number() OVER (PARTITION BY cand2.a_id
                ORDER BY $dot / sqrt($na * $nc) DESC, cand2.c_id) AS BIGINT) AS rk
            FROM cand2
            JOIN embeddings a ON a.vec_id = cand2.a_id
            JOIN embeddings c ON c.vec_id = cand2.c_id)
          WHERE rk <= 3"""
    })

  /** Graph-ANN query path — greedy beam search over the built kNN graph,
    * the READ side of the index the descent family BUILDS (HNSW layer-0 /
    * DiskANN-style greedy routing, expressed as bounded relational hops):
    * a query is routed to one entry point per LSH hash table (in-bucket
    * exact top-1 from each of the two independent plane sets — LSH-forest
    * routing; route by quantization, refine by graph),
    * then three expansion rounds walk the round-1 descent graph —
    * frontier = beam ∪ graph-neighbors(beam), exact-cosine re-score,
    * beam top-4 after hops 1-2, final top-3 after hop 3 (measured on the
    * clustered GraphSearchSpec fixture: recall@3 0.33 for the two-table
    * routing alone → 0.71 after the three hops, floor 0.5 pinned; each
    * hop multiplies the reachable set by the graph degree — the
    * ef_search/beam-depth trade every graph index exposes, and both
    * knobs are one-line constants here). The query's OWN graph edges
    * are never used (the query is treated as outside the index — the
    * production search contract; its own id is excluded from every
    * frontier), so this measures routing + graph connectivity, not
    * self-lookup.
    *
    * Scale shape: adjacency is the capped-reverse neighborhood of the
    * descent graph (deg ≤ 6: 3 out + 3 capped in — the hub bound the
    * descent rounds established), CHECKPOINTED once and read by both
    * hops; each hop's frontier is ≤ beam·(1+6) id-only pairs per query,
    * embeddings attach only at scoring (two hash joins), and the query
    * side broadcasts. Per-query work is CONSTANT in corpus size — the
    * whole point of graph search over IVF probes whose cells grow with
    * n. Determinism: the SimQueries convention — raw-double cosine with
    * vec_id tiebreak for ranking, round(6) on output only; a query
    * singleton in BOTH tables' buckets has no entry point and drops on
    * both engines (declared — production returns its IVF fallback
    * there). */
  /** Bucket-code index over BOTH hash tables — (vec_id, bucket, tbl),
    * part of the BUILT graph index (alongside the descent graph and its
    * capped adjacency), not a search-time computation: routing a query
    * batch must not re-project the corpus. Two separate 8-plane
    * projections unioned (a fused 16×64-term single projection was
    * MEASURED 2.5× slower — it falls off the fast codegen path). At
    * 100 TB this frame is written bucket-partitioned, so the entry
    * probe below becomes partition pruning (the sim_ann_filtered
    * composite-key layout argument). */
  def forestCodes(emb: DataFrame, planes: Int = NumPlanes): DataFrame =
    lshBuckets(emb, planes, 0).withColumn("tbl", lit(0))
      .union(lshBuckets(emb, planes, planes).withColumn("tbl", lit(1)))

  /** The search body shared by the registered `sim_graph_search` query
    * and [[graft.BenchGraphSearch]] (ONE definition — the probe measures
    * exactly the shipped shape): LSH-forest routing — the query's
    * bucket row in `codes` probes each table's members, in-bucket exact
    * top-1 per (query, table) — then `hops` beam-expansion rounds over
    * `adj`, exact-cosine re-score each round, beam top-`beamWidth`
    * between hops, final top-`k` with rank. Returns (q_id, vec_id,
    * cos raw, rk) — callers round on output. `codes` and `adj` are the
    * prebuilt index (callers checkpoint them); per-query search work is
    * then bucket-sized + beam·deg-sized — constant in corpus size. */
  def graphSearch(emb: DataFrame, adj: DataFrame, codes: DataFrame,
      queryPred: Column, beamWidth: Int = 4, k: Int = 3,
      hops: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val vecs = emb.select(col("vec_id"), col("embedding"),
      expr(dotExpr("embedding", "embedding")).as("norm2"))
    val queries = vecs.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      .where(queryPred)
    val qcodes = codes.select(col("vec_id").as("q_id"), col("tbl"),
        col("bucket")).where(queryPred)
    graphSearchFrom(vecs, adj, codes, queries, qcodes, beamWidth, k, hops)
  }

  /** [[graphSearch]] with the query side supplied EXPLICITLY — the form
    * `sim_graph_incremental` needs, where queries (the new-vector batch)
    * are NOT part of the indexed corpus: `vecs`/`adj`/`codes` describe
    * the base index, `queries` carries (q_id, q_emb, q_norm2) and
    * `qcodes` (q_id, tbl, bucket) the queries' own routing codes.
    *
    * EAGER (ADVICE r09 #2): building this frame EXECUTES the whole
    * search — the entry and every hop beam must localCheckpoint eagerly
    * (see the 2^hops note below), so there is no lazy plan to inspect.
    * The RETURNED frame is itself an eager localCheckpoint (k-bounded:
    * ≤ queries × k rows), which lets this method release every
    * intermediate beam before returning; the caller owns the returned
    * checkpoint's lifecycle ([[graft.identity.Components
    * .unpersistCheckpoint]] once its rows are consumed or re-cached).
    * ACCEPTED for the registered one-shot queries (sim_graph_search /
    * _incremental / _delete): Verify/Bench consume a projection of the
    * returned checkpoint and never release it, leaving ONE small
    * (queries × k) resident block per execution until the
    * ContextCleaner GCs it — bounded per run, so repeated Bench reps
    * accumulate a few KB each, not corpus-sized state (ADVICE r10).
    * Long-running callers (StreamAttach) MUST bind the raw frame and
    * release it per trigger. */
  def graphSearchFrom(vecs: DataFrame, adj: DataFrame, codes: DataFrame,
      queries: DataFrame, qcodes: DataFrame, beamWidth: Int = 4,
      k: Int = 3, hops: Int = 3, broadcastQueries: Boolean = true): DataFrame = {
    // The beam/candidate side is per-query-bounded (≤ queries ×
    // beam·(1+deg) rows of two longs) while vecs/adj/codes are
    // corpus-sized index frames — so the SMALL side broadcasts,
    // EXPLICITLY, in every join below: left to AQE's unknown-size
    // estimates after window+distinct stages, Spark shuffles the
    // corpus-fat side per hop instead (measured at the 100k-vector
    // probe: 49 s → the whole search drops to index-scan time once the
    // beam broadcasts). This is the shape that survives 100 TB as long
    // as the QUERY BATCH is bounded: the index never moves, the beam
    // rides the closure. The beam is still query-count-PROPORTIONAL,
    // so an unbounded batch (sim_graph_incremental's md5-selected ~10%
    // delta grows with the corpus) must set `broadcastQueries = false`
    // above [[BroadcastQueryMaxRows]] — past that the hints would blow
    // through driver memory / Spark's 8 GB broadcast cap, and a plain
    // shuffled hash join on q_id/vec_id is the correct large-batch plan
    // (both sides are then data-sized and AQE's estimates are fine).
    def bq(df: DataFrame): DataFrame =
      if (broadcastQueries) broadcast(df) else df
    def expand(beam: DataFrame): DataFrame =
      beam.select(col("q_id"), col("vec_id"))
        .union(adj.join(bq(beam), col("vec_id") === col("a_id"))
          .select(col("q_id"), col("b_id").as("vec_id")))
        .where(col("vec_id") =!= col("q_id"))
        .distinct()
    def score(cand: DataFrame, kk: Int): DataFrame =
      vecs.join(bq(cand), "vec_id")
        .join(bq(queries), "q_id")
        .withColumn("cos", expr(dotExpr("embedding", "q_emb"))
          / sqrt(col("norm2") * col("q_norm2")))
        .withColumn("rk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .where(col("rk") <= kk)
    // LSH-forest routing: one entry per hash table (a single table's
    // quantization can strand the query in an off-manifold fragment;
    // the second table is an independent re-route — same reason the
    // descent seed spans tables). Exact in-bucket top-1 per
    // (query, table), then distinct (both tables may route to one node).
    val entryCand = codes.join(bq(qcodes), Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("tbl"), col("vec_id"))
    val entry = vecs.join(bq(entryCand), "vec_id")
      .join(bq(queries), "q_id")
      .withColumn("cos", expr(dotExpr("embedding", "q_emb"))
        / sqrt(col("norm2") * col("q_norm2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"), col("tbl"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rk") === 1)
      .select(col("q_id"), col("vec_id"))
      .distinct()
      // CHECKPOINT EVERY BEAM (entry + each hop's survivors): expand()
      // references its input beam TWICE (union side + adj-join side),
      // so without a cut the hop-N plan embeds the hop-(N-1) subtree
      // twice and the whole search re-executes earlier hops ~2^hops
      // times — invisible at 8 queries (the "~4 s flat" fixed DAG),
      // ~2 orders of magnitude at a 6k-query insert batch (MEASURED at
      // the 100k-vector compact probe: one grow cycle 211 s → 6.8 s
      // end-to-end once the beams cut). The checkpointed frame is
      // id-pairs only, ≤ beam rows per query — milliseconds to
      // materialize at any batch size.
      .localCheckpoint(eager = true)
    val beam = (1 until hops).foldLeft(entry) { (b, _) =>
      val nb = score(expand(b), beamWidth)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint(eager = true)
      graft.identity.Components.unpersistCheckpoint(b)
      nb
    }
    // materialize the k-bounded answer, then release the last beam —
    // without this the final hop's checkpoint lingered until the
    // ContextCleaner happened to GC it (ADVICE r09 #2)
    val out = score(expand(beam), k).localCheckpoint(eager = true)
    graft.identity.Components.unpersistCheckpoint(beam)
    out
  }

  private val simGraphSearch = Q(
    "sim_graph_search",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      // the index: the session-shared round-1 descent graph (built once
      // per corpus — see descentR1), capped-reverse adjacency + the
      // bucket-code routing table
      val adj = cappedUnd(descentR1(s, dir))
        .localCheckpoint(eager = true) // read by all three hops
      val codes = forestCodes(emb)
        .localCheckpoint(eager = true) // probe side + query side
      graphSearch(emb, adj, codes, col("q_id") < 8)
        .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"),
          col("rk"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "c.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nc  = SimOracle.dot("c.embedding", "c.embedding")
      val dotE = SimOracle.dot("a.embedding", "b.embedding")
      val nb   = SimOracle.dot("b.embedding", "b.embedding")
      val dotS = SimOracle.dot("q.embedding", "v.embedding")
      val nq   = SimOracle.dot("q.embedding", "q.embedding")
      val nv   = SimOracle.dot("v.embedding", "v.embedding")
      s"""WITH bk AS (${lshOracle()}),
          bk1 AS (${lshOracle(NumPlanes, NumPlanes)}),
          ${seedOracle("bk", "seed0")},
          ${seedOracle("bk1", "seed1")},
          seed AS (
            SELECT a_id, b_id FROM seed0
            UNION
            SELECT a_id, b_id FROM seed1),
          und AS (
            SELECT a_id, b_id FROM seed
            UNION
            SELECT b_id, a_id FROM seed),
          cand AS (
            SELECT a_id, b_id AS c_id FROM und
            UNION
            SELECT x.a_id, y.b_id AS c_id
            FROM und x JOIN und y ON y.a_id = x.b_id
            WHERE y.b_id <> x.a_id),
          r1 AS MATERIALIZED (
            SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
              SELECT cand.a_id AS q_id, cand.c_id AS vec_id,
                $dot / sqrt($na * $nc) AS cos,
                row_number() OVER (PARTITION BY cand.a_id
                  ORDER BY $dot / sqrt($na * $nc) DESC, cand.c_id) AS rk
              FROM cand
              JOIN embeddings a ON a.vec_id = cand.a_id
              JOIN embeddings c ON c.vec_id = cand.c_id)
            WHERE rk <= 3),
          rev AS (
            SELECT vec_id AS a_id, q_id AS b_id FROM (
              SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, q_id) AS rn
              FROM r1)
            WHERE rn <= 3),
          adj AS (
            SELECT q_id AS a_id, vec_id AS b_id FROM r1
            UNION
            SELECT a_id, b_id FROM rev),
          entry0 AS (
            SELECT q_id, vec_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY $dotE / sqrt($na * $nb) DESC, b.vec_id) AS rk
              FROM embeddings a
              JOIN bk ba ON ba.vec_id = a.vec_id
              JOIN bk bb ON bb.bucket = ba.bucket
              JOIN embeddings b ON b.vec_id = bb.vec_id
                AND b.vec_id <> a.vec_id
              WHERE a.vec_id < 8)
            WHERE rk = 1),
          entry1 AS (
            SELECT q_id, vec_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY $dotE / sqrt($na * $nb) DESC, b.vec_id) AS rk
              FROM embeddings a
              JOIN bk1 ba ON ba.vec_id = a.vec_id
              JOIN bk1 bb ON bb.bucket = ba.bucket
              JOIN embeddings b ON b.vec_id = bb.vec_id
                AND b.vec_id <> a.vec_id
              WHERE a.vec_id < 8)
            WHERE rk = 1),
          entry AS (
            SELECT q_id, vec_id FROM entry0
            UNION
            SELECT q_id, vec_id FROM entry1),
          c1 AS (
            SELECT q_id, vec_id FROM entry
            UNION
            SELECT e.q_id, u.b_id AS vec_id
            FROM entry e JOIN adj u ON u.a_id = e.vec_id
            WHERE u.b_id <> e.q_id),
          b1 AS (
            SELECT q_id, vec_id FROM (
              SELECT c.q_id, c.vec_id,
                row_number() OVER (PARTITION BY c.q_id
                  ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS rk
              FROM c1 c
              JOIN embeddings q ON q.vec_id = c.q_id
              JOIN embeddings v ON v.vec_id = c.vec_id)
            WHERE rk <= 4),
          c2 AS (
            SELECT q_id, vec_id FROM b1
            UNION
            SELECT b.q_id, u.b_id AS vec_id
            FROM b1 b JOIN adj u ON u.a_id = b.vec_id
            WHERE u.b_id <> b.q_id),
          b2 AS (
            SELECT q_id, vec_id FROM (
              SELECT c.q_id, c.vec_id,
                row_number() OVER (PARTITION BY c.q_id
                  ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS rk
              FROM c2 c
              JOIN embeddings q ON q.vec_id = c.q_id
              JOIN embeddings v ON v.vec_id = c.vec_id)
            WHERE rk <= 4),
          c3 AS (
            SELECT q_id, vec_id FROM b2
            UNION
            SELECT b.q_id, u.b_id AS vec_id
            FROM b2 b JOIN adj u ON u.a_id = b.vec_id
            WHERE u.b_id <> b.q_id)
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk FROM (
            SELECT c.q_id, c.vec_id,
              $dotS / sqrt($nq * $nv) AS cos,
              CAST(row_number() OVER (PARTITION BY c.q_id
                ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS BIGINT)
                AS rk
            FROM c3 c
            JOIN embeddings q ON q.vec_id = c.q_id
            JOIN embeddings v ON v.vec_id = c.vec_id)
          WHERE rk <= 3"""
    })

  /** ~10% of vectors arrive as the delta batch (md5-selected, the
    * dedup_incremental convention — deterministic, scale-proportional,
    * oracle-reproducible). */
  private val NewVecByte = 26

  /** Query-batch row cap for [[graphSearchFrom]]'s broadcast plan
    * (ADVICE r08 #1): ~2 M rows of (id, 64-float embedding, norm) is
    * ~0.6 GB serialized — comfortably under Spark's 8 GB broadcast hard
    * limit and typical driver headroom; a bigger delta batch shuffles
    * instead. */
  private[sim] val BroadcastQueryMaxRows = 2L * 1024 * 1024

  /** Incremental index growth — the INSERT path of the graph-ANN
    * lifecycle (build → search → GROW → [[graphCompact]]), the HNSW
    * insert shape: a delta batch of new vectors (md5-selected ~10%) is
    * each routed through the BASE index exactly like a search
    * (LSH-forest entry from the base bucket table, three beam hops over
    * the base adjacency), and its final top-3 become the new node's
    * attach edges. Reverse-edge maintenance (capping an old node's
    * in-degree when new arrivals displace its neighbors) happens at the
    * next compaction — `sim_graph_compact` — the batch-refresh policy
    * real vector stores run, so serving degree bounds hold between
    * rebuilds.
    *
    * Scale shape: the base index frames (graph, adjacency, codes) are
    * built once per snapshot (here inline over the base split; the
    * artifact lifecycle is descentR1/descentEnsure's); the delta batch
    * rides [[graphSearchFrom]] — PER-NEW-VECTOR work is bucket-sized +
    * beam·deg-sized, constant in corpus size. Total batch cost scales
    * with the batch itself, and the broadcast-the-queries plan holds
    * only below [[BroadcastQueryMaxRows]] — above it the batch shuffles
    * (ADVICE r08 #1), so large-batch ingest is shuffle-bound, not flat.
    * Determinism: the SimQueries cosine/tiebreak convention end to
    * end. */
  private val attachCache = new graft.queries.SessionCache[DataFrame](Seq(_))

  /** Scored attach edges of the delta batch routed through the base
    * index — the shared body of `sim_graph_incremental` (which reports
    * them) and `sim_graph_compact` (which folds them into the served
    * adjacency). Returns (q_id, vec_id, cos ROUNDED to 6, rk).
    *
    * ALWAYS computes (and re-publishes to the session cache): this IS
    * the insert path, so its cost is the marginal ingest cost by
    * definition — serving it from a cache would make the insert query's
    * bench line read ~0. The COMPACTION side reads
    * [[attachEdgesServed]] instead: production compaction folds the
    * attach log the insert path already emitted, so re-running the
    * search inside the compact query would charge ingest work to the
    * maintenance line (the r8 attribution-bug class, one level up). */
  def attachEdges(s: SparkSession, dir: String): DataFrame = {
    val out = attachEdgesCompute(s, dir)
    attachCache.put(s, dir, out)
    out
  }

  /** The attach log as the compaction job sees it: whatever the insert
    * path last emitted this session, or one fresh derivation. */
  def attachEdgesServed(s: SparkSession, dir: String): DataFrame =
    attachCache.getOrBuild(s, dir)(attachEdgesCompute(s, dir))

  private def attachEdgesCompute(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val isNew = expr(
      s"(${graft.queries.PortableHash.md5Byte("CAST(vec_id AS STRING)")}) < $NewVecByte")
    val base = emb.where(not(isNew))
    val newV = emb.where(isNew)
    val (_, adj, codes) = baseIndexBuild(s, dir)
    val vecs = base.select(col("vec_id"), col("embedding"),
      expr(dotExpr("embedding", "embedding")).as("norm2"))
    val queries = newV.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      expr(dotExpr("embedding", "embedding")).as("q_norm2"))
    val qcodes = forestCodes(newV)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    // The delta batch is corpus-PROPORTIONAL (~10% by md5), so the
    // broadcast-the-queries plan only holds below the row cap; a
    // bigger batch falls back to shuffled joins (ADVICE r08 #1). The
    // probe reads vec_id only and stops at cap+1 rows.
    val bcast = newV.select(col("vec_id"))
      .limit(BroadcastQueryMaxRows.toInt + 1)
      .count() <= BroadcastQueryMaxRows
    val search = graphSearchFrom(vecs, adj, codes, queries, qcodes,
      broadcastQueries = bcast)
    // re-checkpoint the ROUNDED projection (the session-cached shape)
    // and release the raw search checkpoint — one resident frame, not two
    val out = search
      .select(col("q_id"), col("vec_id"),
        round(col("cos"), 6).as("cos"), col("rk"))
      .localCheckpoint(eager = true)
    graft.identity.Components.unpersistCheckpoint(search)
    out
  }

  /** Shared oracle CTE chain for the incremental-insert pair
    * (`sim_graph_incremental`, `sim_graph_compact`): base/delta md5
    * split, base-split LSH-forest seed + round-1 descent graph (`r1`) +
    * capped adjacency (`adj`), delta routing codes, LSH-forest entry +
    * three beam hops — ending in `attach(q_id, vec_id, cos RAW, rk ≤
    * 3)`. Callers append their own final SELECT. */
  private def attachOracleCtes: String = {
      val dot = SimOracle.dot("a.embedding", "c.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nc  = SimOracle.dot("c.embedding", "c.embedding")
      val dotE = SimOracle.dot("a.embedding", "b.embedding")
      val nb   = SimOracle.dot("b.embedding", "b.embedding")
      val dotS = SimOracle.dot("q.embedding", "v.embedding")
      val nq   = SimOracle.dot("q.embedding", "q.embedding")
      val nv   = SimOracle.dot("v.embedding", "v.embedding")
      val newPred =
        s"(${graft.queries.PortableHash.md5Byte("CAST(vec_id AS VARCHAR)")}) < $NewVecByte"
      def entryCte(name: String, qk: String, bk: String): String =
        s"""$name AS (
            SELECT q_id, vec_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY $dotE / sqrt($na * $nb) DESC, b.vec_id) AS rk
              FROM newv a
              JOIN $qk qa ON qa.vec_id = a.vec_id
              JOIN $bk bb ON bb.bucket = qa.bucket
              JOIN base b ON b.vec_id = bb.vec_id)
            WHERE rk = 1)"""
      def hopCte(cName: String, from: String): String =
        s"""$cName AS (
            SELECT q_id, vec_id FROM $from
            UNION
            SELECT f.q_id, u.b_id AS vec_id
            FROM $from f JOIN adj u ON u.a_id = f.vec_id
            WHERE u.b_id <> f.q_id)"""
      def beamCte(bName: String, cName: String, k: Int): String =
        s"""$bName AS (
            SELECT q_id, vec_id FROM (
              SELECT c.q_id, c.vec_id,
                row_number() OVER (PARTITION BY c.q_id
                  ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS rk
              FROM $cName c
              JOIN embeddings q ON q.vec_id = c.q_id
              JOIN embeddings v ON v.vec_id = c.vec_id)
            WHERE rk <= $k)"""
      s"""WITH base AS (SELECT * FROM embeddings WHERE NOT ($newPred)),
          newv AS (SELECT * FROM embeddings WHERE $newPred),
          bk AS (${lshOracle(from = "base")}),
          bk1 AS (${lshOracle(NumPlanes, NumPlanes, "base")}),
          ${seedOracle("bk", "seed0", "base")},
          ${seedOracle("bk1", "seed1", "base")},
          seed AS (
            SELECT a_id, b_id FROM seed0
            UNION
            SELECT a_id, b_id FROM seed1),
          und AS (
            SELECT a_id, b_id FROM seed
            UNION
            SELECT b_id, a_id FROM seed),
          cand AS (
            SELECT a_id, b_id AS c_id FROM und
            UNION
            SELECT x.a_id, y.b_id AS c_id
            FROM und x JOIN und y ON y.a_id = x.b_id
            WHERE y.b_id <> x.a_id),
          r1 AS MATERIALIZED (
            SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
              SELECT cand.a_id AS q_id, cand.c_id AS vec_id,
                $dot / sqrt($na * $nc) AS cos,
                row_number() OVER (PARTITION BY cand.a_id
                  ORDER BY $dot / sqrt($na * $nc) DESC, cand.c_id) AS rk
              FROM cand
              JOIN base a ON a.vec_id = cand.a_id
              JOIN base c ON c.vec_id = cand.c_id)
            WHERE rk <= 3),
          rev AS (
            SELECT vec_id AS a_id, q_id AS b_id FROM (
              SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, q_id) AS rn
              FROM r1)
            WHERE rn <= 3),
          adj AS (
            SELECT q_id AS a_id, vec_id AS b_id FROM r1
            UNION
            SELECT a_id, b_id FROM rev),
          qk AS (${lshOracle(from = "newv")}),
          qk1 AS (${lshOracle(NumPlanes, NumPlanes, "newv")}),
          ${entryCte("entry0", "qk", "bk")},
          ${entryCte("entry1", "qk1", "bk1")},
          entry AS (
            SELECT q_id, vec_id FROM entry0
            UNION
            SELECT q_id, vec_id FROM entry1),
          ${hopCte("c1", "entry")},
          ${beamCte("b1", "c1", 4)},
          ${hopCte("c2", "b1")},
          ${beamCte("b2", "c2", 4)},
          ${hopCte("c3", "b2")},
          attach AS (
            SELECT q_id, vec_id, cos, rk FROM (
              SELECT c.q_id, c.vec_id,
                $dotS / sqrt($nq * $nv) AS cos,
                CAST(row_number() OVER (PARTITION BY c.q_id
                  ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS BIGINT)
                  AS rk
              FROM c3 c
              JOIN embeddings q ON q.vec_id = c.q_id
              JOIN embeddings v ON v.vec_id = c.vec_id)
            WHERE rk <= 3)"""
  }

  private val simGraphIncremental = Q(
    "sim_graph_incremental",
    (s, dir) =>
      attachEdges(s, dir).select(col("q_id").as("new_id"), col("vec_id"),
        col("cos"), col("rk")),
    Some(s"""$attachOracleCtes
          SELECT q_id AS new_id, vec_id, round(cos, 6) AS cos, rk
          FROM attach"""))

  /** Graph-ANN COMPACTION — the reverse-edge maintenance
    * `sim_graph_incremental` defers (VERDICT r08 task 2), closing the
    * lifecycle build → search → grow → COMPACT: fold the delta batch's
    * scored attach edges into the base split's scored round-1 graph,
    * then re-enforce the serving degree bound with the SAME
    * capped-reverse selection the build uses ([[cappedUnd]]: every
    * node keeps its ≤ 3 out-edges; in-edges re-compete on cosine and
    * only the top-3 survive — a new arrival that displaces an old
    * node's neighbor evicts the weakest in-edge instead of growing the
    * hub). Output is the compacted undirected adjacency (deg ≤ 6 over
    * base ∪ delta); the routing codes re-emit as [[forestCodes]] over
    * the full corpus — a pure projection, not part of the fold.
    *
    * Scale shape: the fold is a union of two k-bounded edge lists
    * (≤ 3n rows of (long, long, double)) and one k-bounded reverse
    * aggregate ([[graft.functions.TopKByValue]], map-side ≤ 3 rows per
    * node) — one shuffle on vec_id, corpus-linear, no re-scoring (the
    * scores were paid at build/insert time). Determinism: both engines
    * rank the reverse side on the ROUNDED 6-place cosine with q_id
    * tiebreak — the value the attach/r1 records carry. */
  def graphCompact(baseR1: DataFrame, attach: DataFrame,
      tombstones: Option[DataFrame] = None): DataFrame = {
    val folded = baseR1.select(col("q_id"), col("vec_id"), col("cos"))
      .unionByName(attach.select(col("q_id"), col("vec_id"), col("cos")))
    // DELETE sweep (VERDICT r09 task 1): drop every scored edge touching
    // a tombstoned node BEFORE the capped-reverse selection, so a
    // deleted hub's in-neighbors re-compete for its freed reverse slots
    // under the same top-3 rule — the swept graph is exactly the graph
    // the fold would have built had the tombstoned rows never existed.
    // Two shuffled left_anti joins: the kill-list is corpus-PROPORTIONAL
    // (an erasure batch, a dedup loser list), so it must never broadcast
    // — both joins are keyed, corpus-linear, and feed the same one
    // exchange the fold already pays.
    val swept = tombstones.fold(folded) { t =>
      val ids = t.select(col("vec_id"))
      folded
        .join(ids.select(col("vec_id").as("q_id")), Seq("q_id"), "left_anti")
        .join(ids, Seq("vec_id"), "left_anti")
    }
    cappedUnd(swept)
  }

  /** md5-selected erasure kill-list over `vec_id` — the deterministic,
    * oracle-reproducible stand-in for a GDPR/dedup-driven delete batch
    * (~10%: `md5('del:' || vec_id)` first byte < [[NewVecByte]]; the
    * `del:` salt keeps it independent of the insert-batch split, so a
    * vector can be both newly inserted and subsequently deleted). */
  private[graft] def delPredSql(cast: String): String =
    s"(${graft.queries.PortableHash.md5Byte(s"concat('del:', CAST(vec_id AS $cast))")}) < $NewVecByte"

  def tombstones(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(expr(delPredSql("STRING")))
      .select(col("vec_id"))

  private val simGraphCompact = Q(
    "sim_graph_compact",
    (s, dir) => {
      val (r1, _, _) = baseIndexBuild(s, dir)
      graphCompact(r1, attachEdgesServed(s, dir))
    },
    Some(s"""$attachOracleCtes,
          folded AS (
            SELECT q_id, vec_id, cos FROM r1
            UNION ALL
            SELECT q_id, vec_id, round(cos, 6) AS cos FROM attach),
          rev2 AS (
            SELECT vec_id AS a_id, q_id AS b_id FROM (
              SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, q_id) AS rn
              FROM folded)
            WHERE rn <= 3)
          SELECT a_id, b_id FROM (
            SELECT q_id AS a_id, vec_id AS b_id FROM folded
            UNION
            SELECT a_id, b_id FROM rev2)"""))

  /** Serve-time DELETE — the tombstone half of the graph-ANN delete
    * path (VERDICT r09 task 1), the FAISS/HNSW soft-delete shape: the
    * index (adjacency + routing codes, built over the full corpus) is
    * NOT rebuilt; instead the [[tombstones]] kill-list is anti-joined
    * off the scoring and routing frames once, before the search, so a
    * deleted vector can never be an entry point, never enters a beam
    * (beams are scored survivors), and is never returned. Edges
    * incident to tombstones stay in the adjacency until the next
    * [[graphCompact]] sweep (`sim_graph_sweep`) — dead weight on the
    * expansion side only, exactly the cost window a real store accepts
    * between delete and compaction.
    *
    * Scale shape: the kill-list is corpus-proportional, so both
    * anti-joins are shuffled (never broadcast) and run ONCE on the
    * index frames — per-query serve cost is unchanged
    * (bucket + beam·deg). At 100 TB the filtered codes/vecs are what
    * the snapshot re-persist would write anyway. */
  private val simGraphDelete = Q(
    "sim_graph_delete",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val adj = cappedUnd(descentR1(s, dir))
        .localCheckpoint(eager = true)
      val tomb = tombstones(s, dir)
      val live = emb.join(tomb, Seq("vec_id"), "left_anti")
      val vecs = live.select(col("vec_id"), col("embedding"),
        expr(dotExpr("embedding", "embedding")).as("norm2"))
      val codes = forestCodes(emb)
        .join(tomb, Seq("vec_id"), "left_anti")
        .localCheckpoint(eager = true)
      val queries = vecs.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("norm2").as("q_norm2"))
      val qcodes = codes.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
      val out = graphSearchFrom(vecs, adj, codes, queries, qcodes)
      Seq(adj, codes).foreach(graft.identity.Components.unpersistCheckpoint)
      out.select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"),
        col("rk"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "c.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nc  = SimOracle.dot("c.embedding", "c.embedding")
      val dotE = SimOracle.dot("a.embedding", "b.embedding")
      val nb   = SimOracle.dot("b.embedding", "b.embedding")
      val dotS = SimOracle.dot("q.embedding", "v.embedding")
      val nq   = SimOracle.dot("q.embedding", "q.embedding")
      val nv   = SimOracle.dot("v.embedding", "v.embedding")
      def entryCte(name: String, bk: String): String =
        s"""$name AS (
            SELECT q_id, vec_id FROM (
              SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
                row_number() OVER (PARTITION BY a.vec_id
                  ORDER BY $dotE / sqrt($na * $nb) DESC, b.vec_id) AS rk
              FROM live a
              JOIN $bk ba ON ba.vec_id = a.vec_id
              JOIN $bk bb ON bb.bucket = ba.bucket
              JOIN live b ON b.vec_id = bb.vec_id
                AND b.vec_id <> a.vec_id
              WHERE a.vec_id < 8)
            WHERE rk = 1)"""
      def hopCte(cName: String, from: String): String =
        s"""$cName AS (
            SELECT q_id, vec_id FROM $from
            UNION
            SELECT f.q_id, u.b_id AS vec_id
            FROM $from f JOIN adj u ON u.a_id = f.vec_id
            WHERE u.b_id <> f.q_id)"""
      def beamCte(bName: String, cName: String, k: Int): String =
        s"""$bName AS (
            SELECT q_id, vec_id FROM (
              SELECT c.q_id, c.vec_id,
                row_number() OVER (PARTITION BY c.q_id
                  ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS rk
              FROM $cName c
              JOIN live q ON q.vec_id = c.q_id
              JOIN live v ON v.vec_id = c.vec_id)
            WHERE rk <= $k)"""
      s"""WITH live AS (
            SELECT * FROM embeddings WHERE NOT (${delPredSql("VARCHAR")})),
          bk AS (${lshOracle()}),
          bk1 AS (${lshOracle(NumPlanes, NumPlanes)}),
          ${seedOracle("bk", "seed0")},
          ${seedOracle("bk1", "seed1")},
          seed AS (
            SELECT a_id, b_id FROM seed0
            UNION
            SELECT a_id, b_id FROM seed1),
          und AS (
            SELECT a_id, b_id FROM seed
            UNION
            SELECT b_id, a_id FROM seed),
          cand AS (
            SELECT a_id, b_id AS c_id FROM und
            UNION
            SELECT x.a_id, y.b_id AS c_id
            FROM und x JOIN und y ON y.a_id = x.b_id
            WHERE y.b_id <> x.a_id),
          r1 AS MATERIALIZED (
            SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
              SELECT cand.a_id AS q_id, cand.c_id AS vec_id,
                $dot / sqrt($na * $nc) AS cos,
                row_number() OVER (PARTITION BY cand.a_id
                  ORDER BY $dot / sqrt($na * $nc) DESC, cand.c_id) AS rk
              FROM cand
              JOIN embeddings a ON a.vec_id = cand.a_id
              JOIN embeddings c ON c.vec_id = cand.c_id)
            WHERE rk <= 3),
          rev AS (
            SELECT vec_id AS a_id, q_id AS b_id FROM (
              SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, q_id) AS rn
              FROM r1)
            WHERE rn <= 3),
          adj AS (
            SELECT q_id AS a_id, vec_id AS b_id FROM r1
            UNION
            SELECT a_id, b_id FROM rev),
          ${entryCte("entry0", "bk")},
          ${entryCte("entry1", "bk1")},
          entry AS (
            SELECT q_id, vec_id FROM entry0
            UNION
            SELECT q_id, vec_id FROM entry1),
          ${hopCte("c1", "entry")},
          ${beamCte("b1", "c1", 4)},
          ${hopCte("c2", "b1")},
          ${beamCte("b2", "c2", 4)},
          ${hopCte("c3", "b2")}
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk FROM (
            SELECT c.q_id, c.vec_id,
              $dotS / sqrt($nq * $nv) AS cos,
              CAST(row_number() OVER (PARTITION BY c.q_id
                ORDER BY $dotS / sqrt($nq * $nv) DESC, c.vec_id) AS BIGINT)
                AS rk
            FROM c3 c
            JOIN live q ON q.vec_id = c.q_id
            JOIN live v ON v.vec_id = c.vec_id)
          WHERE rk <= 3"""
    })

  /** Tombstone SWEEP at compaction — `sim_graph_compact` with the
    * delete batch honored: the fold drops every scored edge touching a
    * tombstoned node before the capped-reverse re-selection
    * ([[graphCompact]]'s `tombstones` arm), so deleted nodes leave the
    * served adjacency entirely and their former in-neighbors re-compete
    * for the freed reverse slots. Output shape = `sim_graph_compact`
    * (undirected adjacency, deg ≤ 6 over the SURVIVORS). */
  private val simGraphSweep = Q(
    "sim_graph_sweep",
    (s, dir) => {
      val (r1, _, _) = baseIndexBuild(s, dir)
      graphCompact(r1, attachEdgesServed(s, dir),
        Some(tombstones(s, dir)))
    },
    Some(s"""$attachOracleCtes,
          tomb AS (
            SELECT vec_id FROM embeddings WHERE ${delPredSql("VARCHAR")}),
          folded AS (
            SELECT q_id, vec_id, cos FROM r1
            UNION ALL
            SELECT q_id, vec_id, round(cos, 6) AS cos FROM attach),
          swept AS (
            SELECT q_id, vec_id, cos FROM folded
            WHERE q_id NOT IN (SELECT vec_id FROM tomb)
              AND vec_id NOT IN (SELECT vec_id FROM tomb)),
          rev2 AS (
            SELECT vec_id AS a_id, q_id AS b_id FROM (
              SELECT q_id, vec_id,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos DESC, q_id) AS rn
              FROM swept)
            WHERE rn <= 3)
          SELECT a_id, b_id FROM (
            SELECT q_id AS a_id, vec_id AS b_id FROM swept
            UNION
            SELECT a_id, b_id FROM rev2)"""))

  /** NN-descent TO CONVERGENCE (VERDICT r07 task 4): iterate
    * [[knnDescentRound]] until the round's directed edge-set delta
    * drops under 5% (50 000 ppm — the measured recall-plateau knee, see
    * [[knnDescentConverge]]) or the 5-round cap. The round count is
    * data-dependent, so no SQL oracle exists (declared rows-only, the
    * approx_stats stance); the round BODY is hash-pinned by
    * `sim_knn_descent_r2` and the plateau/delta behavior by
    * KnnGraphSpec. `rounds` and `final_delta_ppm` ride every row so the
    * rows-only record still exposes the convergence diagnostics. */
  private val simKnnDescentConverged = Q(
    "sim_knn_descent_converged",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val (tk, rounds, deltas) = knnDescentConverge(emb)
      tk.withColumn("rounds", lit(rounds.toLong))
        .withColumn("final_delta_ppm", lit(deltas.last))
    },
    None)

  val all: Seq[Q] = Seq(simLshBuckets, simBruteforce, simAnnBucketed,
    dedupEmbedding, simIvfTopk, simAnnMultiprobe, embedQuantizeInt8,
    simSqTopk, simKnnGraph, simKnnDescent, simKnnDescentR2,
    simKnnDescentConverged, simGraphSearch, simGraphIncremental,
    simGraphCompact, simGraphDelete, simGraphSweep)
}
