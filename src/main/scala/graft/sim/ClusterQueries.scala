package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Embedding clustering: deterministic fixed-iteration k-means (Lloyd's)
  * — the trained coarse quantizer that `sim_ivf_topk` documents as the
  * swap-in for its modulo quantizer.
  *
  * Exact-oracle determinism comes from doing ALL arithmetic in integers:
  * components are quantized to 1e-6 (`round(x * 1e6)` as BIGINT — float
  * →double conversion is exact and double math is IEEE-identical on both
  * engines), distances are integer sums of squares, and centroid updates
  * are integer `div` means, so no float accumulation order can diverge
  * between Spark and DuckDB. Ties in the argmin break on centroid id via
  * lexicographic `min(struct(dist, cid))`.
  *
  * Scale shape (100 TB): centroids are k rows — always broadcast; each
  * assignment pass is a per-row map against the broadcast set followed by
  * a partial-aggregated `min(struct(...))` groupBy (map-side combine
  * collapses the k candidate rows per vector BEFORE the exchange, unlike
  * a row_number window which would shuffle k·n rows); the centroid
  * update is a (cid, pos) partial agg — k·dim cells regardless of corpus
  * size. Two unrolled Lloyd iterations; production would loop with a
  * convergence test like [[graft.identity.Components]] does.
  */
object ClusterQueries {

  private[graft] val K = 8

  /** Integer squared-L2 between the quantized vector and centroid — the
    * native codegen'd kernel (graft.functions.SqDistOrdered); exact
    * integer math, identical to the interpreted
    * `aggregate(zip_with(...))` HOF it replaced (SqDistOrderedSpec) but
    * one fused loop instead of a zipped intermediate array per
    * (vector, centroid) pair. */
  private val distExpr = "sqdist_ordered(qe, ce)"

  /** embedding → 1e-6-quantized BIGINT component array. */
  private[graft] val quantExpr =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))"

  /** vec_id → 1e-6-quantized BIGINT component array. */
  private[graft] def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), expr(quantExpr).as("qe"))

  /** The k centroid rows folded into ONE broadcast row, so an argmin over
    * them becomes a per-row projection instead of a crossJoin×k +
    * aggregate. Valid while k·dim fits one broadcast row — the same bound
    * the k-row broadcast join already assumed ("centroids always
    * broadcast"); at a k too large for that, neither shape survives and
    * the index moves to a stored coarse quantizer anyway. */
  private[graft] def centsRow(cent: DataFrame): DataFrame =
    cent.agg(collect_list(struct(col("cid"), col("ce"))).as("cents"))

  /** The centroid set collected to the driver — k rows, guarded (the
    * sample_kcenter / eval_elo_bt bounded-collect precedent). Every
    * caller's `cent` is STRUCTURALLY ≤ K rows (a `vec_id < K` seed filter
    * or a groupBy over its cids), so a plain one-job collect() is safe
    * and the bound check is a post-hoc invariant guard. take()-style
    * incremental collection was measured first and cost ~0.4 s on the
    * md5-half lake trainers: with < cap matching rows it runs its
    * escalating partition-batch jobs (1, 4, 20, …) to exhaustion —
    * four sequential job launches where one parallel scan suffices. */
  private def centSeq(cent: DataFrame): Seq[(Long, Seq[Long])] = {
    val rows = cent.select(col("cid"), col("ce")).collect()
    if (rows.length > 4096) throw new IllegalStateException(
      s"centroid set produced ${rows.length} rows — the k-row-by-" +
        "construction argument for this driver collect is violated")
    rows.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
  }

  /** Nearest-centroid struct with the k centroids inlined as LITERAL
    * arrays: `least(struct(dist_1, cid_1[, ce_1]), ...)` IS
    * `min(struct(dist, cid))` — same lexicographic ordering, same cid
    * tie-break — but runs as ONE whole-stage-codegen'd projection. The
    * old shape expanded every vector ×k through a BroadcastNestedLoopJoin
    * and argmin'd with min(struct(...)), which plans as TWO SortAggregates
    * around a hash exchange (struct aggs can't hash-aggregate): per
    * assignment pass that sorted k·n rows and shuffled the corpus once
    * for math that is per-row (guide §2.4, §4). A transform/array_min
    * fold over a broadcast row was measured FIRST and regressed ~1.3×:
    * higher-order functions are CodegenFallback, so the projection went
    * interpreted and every row paid a copy of the joined centroid blob.
    * Literal inlining keeps codegen; the distance kernel stays the native
    * [[distExpr]] fold. Tree size is linear in k — fine for the k-row
    * regime this family declares; a huge-k production index reads a
    * STORED assignment instead of re-deriving one. */
  private def nearestCol(cents: Seq[(Long, Seq[Long])], withCe: Boolean)
      : org.apache.spark.sql.Column = {
    val cands = cents.map { case (cid, ce) =>
      val arr = ce.mkString("array(", "L,", "L)")
      val base = Seq(expr(s"sqdist_ordered(qe, $arr)").as("dist"),
        lit(cid).as("cid"))
      val fields = if (withCe) base :+ expr(arr).as("ce") else base
      struct(fields: _*)
    }
    least(cands: _*)
  }

  private[graft] def assign(qf: DataFrame, cent: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(qf.sparkSession)
    val cents = centSeq(cent)
    // an EMPTY centroid set: the old crossJoin shape emitted no rows
    if (cents.isEmpty)
      return qf.where(lit(false)).select(col("vec_id"),
        lit(null).cast("long").as("cid"), lit(null).cast("long").as("dist"))
    qf.select(col("vec_id"), nearestCol(cents, withCe = false).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))
  }

  /** Lloyd update: integer mean per (cluster, dimension) — k·dim cells,
    * partial-aggregated map-side; rebuilt into ordered centroid arrays. */
  private[graft] def lloydStep(a: DataFrame, qf: DataFrame): DataFrame =
    a.join(qf, "vec_id")
      .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("sum(v) div count(1)").as("cv"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)")
        .as("ce"))

  /** Centroids after one Lloyd iteration from the deterministic seed.
    * Checkpointed eagerly: the result is K rows, but the subtree behind
    * it scans the corpus twice (seed assignment + update); consumers
    * broadcast it in several places (cell assignment, residual
    * computation, probe ranking) and per-consumer recomputation — where
    * exchange reuse can't kick in across jobs — costs a corpus pass
    * each time. K rows checkpoint in milliseconds. */
  private[graft] def trainedCentroids(emb: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val qf = quantized(emb)
    val c0 = qf.where(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("qe").as("ce"))
    val seeds = centSeq(c0)
    // an empty seed set (no vec_id < K in the corpus) trains nothing —
    // the old assign-then-join shape yielded an empty frame too
    if (seeds.isEmpty) return c0.where(lit(false)).localCheckpoint(eager = true)
    // the seed assignment KEEPS qe, so the Lloyd update reads the same
    // rows directly — the old lloydStep(assign(qf, c0), qf) re-joined the
    // assignment to qf on vec_id, shuffling the 64-long qe on BOTH join
    // sides for rows the projection already had (guide §2.4); the update
    // aggregates are unchanged (map-side combine to k·dim cells)
    qf.select(nearestCol(seeds, withCe = false).getField("cid").as("cid"),
        col("qe"))
      .select(col("cid"), posexplode(col("qe")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("sum(v) div count(1)").as("cv"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)")
        .as("ce"))
      .localCheckpoint(eager = true)
  }

  // ---------------------------------------------------------------------
  // Session-shared trained quantizer over the FULL corpus — the stored
  // coarse-index component every trained-IVF query was re-deriving (two
  // corpus passes each: seed assignment + Lloyd update). Production loads
  // it as the stored index; the session checkpoint is the single-JVM
  // equivalent (the descentR1 argument), and the parquet snapshot below
  // is the warm-mode lifecycle shared by every artifact family.
  // ---------------------------------------------------------------------

  private val centroidCache = new graft.queries.SessionCache[DataFrame](Seq(_))

  /** Trained k-row coarse quantizer of `dir`'s embeddings table, built
    * once per (session, corpus). */
  def centroids(s: SparkSession, dir: String): DataFrame =
    centroidCache.getOrBuild(s, dir) {
      trainedCentroids(Tables.embeddings(s, dir))
    }

  def centroidsInvalidate(): Unit = centroidCache.invalidate()

  private def fingerprint(s: SparkSession, corpusDir: String): String =
    graft.queries.TableFingerprint.of(s, s"$corpusDir/embeddings.parquet")

  /** Write the trained centroids as a parquet snapshot keyed by the
    * embeddings fingerprint. */
  def centroidsPersistTo(s: SparkSession, corpusDir: String,
      artifactDir: String): Unit =
    graft.queries.ArtifactStore.writeSnapshot(s, artifactDir,
      fingerprint(s, corpusDir),
      Seq("centroids" -> centroids(s, corpusDir)))

  /** Seed the session cache from a persisted snapshot whose key matches
    * the CURRENT embeddings fingerprint; false otherwise. */
  def centroidsLoadFrom(s: SparkSession, corpusDir: String,
      artifactDir: String): Boolean =
    graft.queries.ArtifactStore.loadSnapshot(s, artifactDir,
      fingerprint(s, corpusDir), Seq("centroids")) match {
      case Some(m) =>
        centroidCache.put(s, corpusDir, m("centroids"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  def centroidsEnsure(s: SparkSession, corpusDir: String,
      artifactDir: String): Boolean = {
    val hit = centroidsLoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      centroidCache.remove(s, corpusDir)
      centroidsPersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  /** Production Lloyd loop: iterate assign→update until the within-cell
    * objective improves by less than `tol` (relative) or `maxIters` runs
    * out. Convergence is tested with two scalar aggregates per round (no
    * data collect), each round's assignment is checkpointed and the
    * superseded checkpoint released — the [[graft.identity.Components]]
    * iteration discipline. The oracle-checked queries keep the fixed
    * 2-iteration unroll (cross-engine-deterministic); this loop is the
    * path a real training job runs, pinned by AnnRecallSpec's
    * convergence test.
    *
    * @return (final centroids, iterations run, objective per round)
    */
  private[graft] def lloydConverge(
      qf: DataFrame,
      c0: DataFrame,
      maxIters: Int = 10,
      tol: Double = 0.01): (DataFrame, Int, Seq[Long]) = {
    var cent = c0
    var assigned = assign(qf, cent).localCheckpoint(eager = true)
    def objective(a: DataFrame): Long =
      a.agg(sum(col("dist"))).collect()(0).getLong(0)
    var obj = objective(assigned)
    val objs = scala.collection.mutable.ArrayBuffer(obj)
    var it = 0
    var done = false
    while (it < maxIters && !done) {
      // centroids are k rows — checkpoint them eagerly so the superseded
      // ASSIGNMENT checkpoint (corpus-sized) can actually be released:
      // plain Dataset.unpersist is a NO-OP on a localCheckpoint'ed frame
      // (the RDD is persisted outside the CacheManager — the
      // Components.unpersistCheckpoint rationale), and a lazy cent would
      // still read the assignment we are about to drop.
      val newCent = lloydStep(assigned, qf).localCheckpoint(eager = true)
      val next = assign(qf, newCent).localCheckpoint(eager = true)
      val nextObj = objective(next)
      done = nextObj >= obj - math.abs(tol * obj)
      graft.identity.Components.unpersistCheckpoint(assigned)
      if (it > 0) graft.identity.Components.unpersistCheckpoint(cent)
      cent = newCent
      assigned = next
      obj = nextObj
      objs += obj
      it += 1
    }
    // the final assignment round is not part of the return value — the
    // returned centroids are materialized above
    graft.identity.Components.unpersistCheckpoint(assigned)
    (cent, it, objs.toSeq)
  }

  private val clusterKmeans = Q(
    "cluster_kmeans",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      assign(quantized(emb), centroids(s, dir))
        .select(col("vec_id"), col("cid").as("cluster"), col("dist"))
    },
    Some(s"""WITH $kmeansOracleCte
             SELECT vec_id, cid AS cluster, dist FROM cells"""))

  /** CTE chain ending in `cells(vec_id, cid, dist)` — the 2-iteration
    * Lloyd assignment; splice after `WITH`. */
  private[graft] def kmeansOracleCte: String =
    s"""q AS (
          SELECT vec_id,
            list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS qe
          FROM embeddings),
        c0 AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id < $K),
        d1 AS (
          SELECT q.vec_id, c.cid,
            CAST(list_sum(list_transform(range(1, 65),
              i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i]))) AS BIGINT) AS dist
          FROM q, c0 c),
        a1 AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM d1)
          WHERE rn = 1),
        s1 AS (
          SELECT a1.cid, t.i AS pos,
            CAST(sum(q.qe[t.i]) AS BIGINT) // count(*) AS cv
          FROM a1 JOIN q USING (vec_id), generate_series(1, 64) AS t(i)
          GROUP BY a1.cid, t.i),
        c1 AS (SELECT cid, list(cv ORDER BY pos) AS ce FROM s1 GROUP BY cid),
        d2 AS (
          SELECT q.vec_id, c.cid,
            CAST(list_sum(list_transform(range(1, 65),
              i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i]))) AS BIGINT) AS dist
          FROM q, c1 c),
        cells AS (
          SELECT vec_id, cid, dist
          FROM (
            SELECT vec_id, cid, dist,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM d2)
          WHERE rn = 1)"""

  /** IVF ANN with the TRAINED coarse quantizer — the swap `sim_ivf_topk`
    * documents: cells come from the k-means assignment above instead of
    * the modulo stand-in, and a query probes only its own cell. Same
    * 100 TB shape as `sim_ivf_topk` (k centroid rows broadcast for the
    * assignment, probe fan-out = cell population ≈ n/k); cell membership
    * is integer-exact so both engines probe identical candidate sets, and
    * the in-cell cosine ranking is the bit-exact ordered double fold.
    */
  private val simIvfTrained = Q(
    "sim_ivf_trained",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      // cell assignment rides the scan as one codegen'd projection (the
      // nearestCol fold over the session-shared trained centroids) — the
      // old shape ran a separate assign pass and equi-joined it back on
      // vec_id for columns the row already had (guide §2.4)
      val vecs = emb.select(col("vec_id"), col("embedding"),
        expr("dot_ordered(embedding, embedding)").as("norm2"),
        expr(quantExpr).as("qe"))
        .withColumn("cell",
          nearestCol(centSeq(centroids(s, dir)), withCe = false)
            .getField("cid"))
        .drop("qe")
        .localCheckpoint(eager = true) // assignment feeds both probe sides
      val queries = vecs
        .select(col("vec_id").as("q_id"), col("cell"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
        .where(col("q_id") < 20)
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      vecs.join(broadcast(queries), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr("dot_ordered(embedding, q_emb)") /
            sqrt(col("norm2") * col("q_norm2")))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"),
          col("rk"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      s"""WITH $kmeansOracleCte
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT q.vec_id AS q_id, a.vec_id AS vec_id,
                        $dot / sqrt($na * $nq) AS cos
                      FROM embeddings q
                      JOIN cells cq ON cq.vec_id = q.vec_id AND q.vec_id < 20
                      JOIN cells ca ON ca.cid = cq.cid
                      JOIN embeddings a ON a.vec_id = ca.vec_id
                      WHERE a.vec_id <> q.vec_id))
          WHERE rk <= 3"""
    })

  /** Trained IVF with nprobe=2 — the production recall/cost dial: each
    * query probes its TWO nearest k-means cells instead of one. The probe
    * list is (queries × nprobe) rows — bounded by the query set, so the
    * top-2-cells window and the probe broadcast both stay tiny no matter
    * the corpus size; the scan side still reads only the probed cells
    * (≈ 2n/k rows). Candidates are a strict superset of `sim_ivf_trained`
    * (each corpus vector lives in exactly one cell, the two probe cells
    * are distinct), so recall can only rise — AnnRecallSpec pins it.
    */
  private val simIvfNprobe = Q(
    "sim_ivf_nprobe",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val qf = quantized(emb)
      val cent = centroids(s, dir)
      // cell assignment rides the scan (the sim_ivf_trained projection)
      val vecs = emb.select(col("vec_id"), col("embedding"),
        expr("dot_ordered(embedding, embedding)").as("norm2"),
        expr(quantExpr).as("qe"))
        .withColumn("cell",
          nearestCol(centSeq(cent), withCe = false).getField("cid"))
        .drop("qe")
        .localCheckpoint(eager = true) // assignment feeds corpus side + probe ranking
      val wProbe = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("cid"))
      val probes = qf.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("qe"))
        .crossJoin(broadcast(cent))
        .withColumn("dist", expr(distExpr))
        .withColumn("rn", row_number().over(wProbe))
        .where(col("rn") <= 2)
        .select(col("q_id"), col("cid").as("cell"))
      // query vectors + norms come from the already-checkpointed vecs
      // frame — a fresh embeddings scan re-ran the 64-term self-dot for
      // nothing
      val queries = vecs.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("norm2").as("q_norm2"))
      val probeSet = probes.join(queries, "q_id")
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      vecs.join(broadcast(probeSet), "cell")
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr("dot_ordered(embedding, q_emb)") /
            sqrt(col("norm2") * col("q_norm2")))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"),
          col("rk"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      s"""WITH $kmeansOracleCte,
          probes AS (
            SELECT vec_id AS q_id, cid AS cell
            FROM (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                  FROM d2 WHERE vec_id < 20)
            WHERE rn <= 2)
          SELECT q_id, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT p.q_id, a.vec_id,
                        $dot / sqrt($na * $nq) AS cos
                      FROM probes p
                      JOIN embeddings q ON q.vec_id = p.q_id
                      JOIN cells ca ON ca.cid = p.cell
                      JOIN embeddings a ON a.vec_id = ca.vec_id
                      WHERE a.vec_id <> p.q_id))
          WHERE rk <= 3"""
    })

  /** FILTERED ANN search (VERDICT r07 task 3) — top-k under a metadata
    * predicate, the production retrieval shape every RAG/dedup stack
    * runs ("nearest neighbors WHERE lang = 'en'"): each query (vec_id
    * < 20) retrieves its top-3 among corpus vectors sharing its OWN
    * `label`, probing its two nearest trained cells (the sim_ivf_nprobe
    * dial). The predicate is part of the INDEX KEY: the probe joins the
    * corpus on the COMPOSITE (cell, label), so only matching posting
    * lists are read BEFORE any distance is scored — post-filtering an
    * unfiltered top-k instead is recall-lossy (a query's true same-label
    * neighbors get displaced from the top-k by filtered-out vectors;
    * AnnRecallSpec measures exactly this gap on the corpus).
    *
    * Scale shape: identical to sim_ivf_nprobe — centroids and the
    * (query × nprobe) probe list broadcast; the corpus side reads only
    * the probed (cell, label) buckets. At 100 TB the composite key IS
    * the physical layout lever: partition the index by (cell, label
    * bucket) and the predicate becomes partition pruning, never a scan
    * +discard. Cell membership is integer-exact, label equality is
    * exact, the in-bucket cosine is the bit-exact ordered double fold —
    * both engines rank identical candidate sets.
    */
  private val simAnnFiltered = Q(
    "sim_ann_filtered",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val qf = quantized(emb)
      val cent = centroids(s, dir)
      // cell assignment rides the scan (the sim_ivf_trained projection)
      val vecs = emb.select(col("vec_id"), col("label"), col("embedding"),
        expr("dot_ordered(embedding, embedding)").as("norm2"),
        expr(quantExpr).as("qe"))
        .withColumn("cell",
          nearestCol(centSeq(cent), withCe = false).getField("cid"))
        .drop("qe")
        .localCheckpoint(eager = true) // assignment feeds corpus side + probe ranking
      val wProbe = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("cid"))
      val probes = qf.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("qe"))
        .crossJoin(broadcast(cent))
        .withColumn("dist", expr(distExpr))
        .withColumn("rn", row_number().over(wProbe))
        .where(col("rn") <= 2)
        .select(col("q_id"), col("cid").as("cell"))
      val queries = vecs.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("label"),
          col("embedding").as("q_emb"), col("norm2").as("q_norm2"))
      // the probe list carries the predicate value — the join below is
      // on (cell, label), the composite posting-list key
      val probeSet = probes.join(queries, "q_id")
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      vecs.join(broadcast(probeSet), Seq("cell", "label"))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          expr("dot_ordered(embedding, q_emb)") /
            sqrt(col("norm2") * col("q_norm2")))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("label"), col("vec_id"),
          round(col("cos"), 6).as("cos"), col("rk"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "q.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nq  = SimOracle.dot("q.embedding", "q.embedding")
      s"""WITH $kmeansOracleCte,
          probes AS (
            SELECT vec_id AS q_id, cid AS cell
            FROM (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                  FROM d2 WHERE vec_id < 20)
            WHERE rn <= 2)
          SELECT q_id, label, vec_id, round(cos, 6) AS cos, rk
          FROM (SELECT q_id, label, vec_id, cos,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS BIGINT) AS rk
                FROM (SELECT p.q_id, q.label AS label, a.vec_id,
                        $dot / sqrt($na * $nq) AS cos
                      FROM probes p
                      JOIN embeddings q ON q.vec_id = p.q_id
                      JOIN cells ca ON ca.cid = p.cell
                      JOIN embeddings a ON a.vec_id = ca.vec_id
                        AND a.label = q.label
                      WHERE a.vec_id <> p.q_id))
          WHERE rk <= 3"""
    })

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * embeddings with the trained coarse quantizer, then within each
    * cluster drop every vector that has a higher-priority (lower vec_id)
    * neighbor above the cosine threshold. The within-cell comparison IS
    * the SemDeDup algorithm — its scale story is that k grows with the
    * corpus so cell population (≈ n/k) stays bounded, and cells compare
    * independently in parallel; no cross-cell pair is ever formed.
    * Threshold 0.3 suits this corpus (random vectors, nearest cos ≈0.47,
    * no planted duplicates); production prose uses ~0.95+. Cosines are
    * bit-exact ordered double folds, so the threshold comparison and the
    * oracle agree exactly.
    */
  private val dedupSemantic = Q(
    "dedup_semantic",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      // cell assignment rides the scan (the sim_ivf_trained projection)
      val vecs = emb.select(col("vec_id"), col("embedding"),
        expr("dot_ordered(embedding, embedding)").as("norm2"),
        expr(quantExpr).as("qe"))
        .withColumn("cell",
          nearestCol(centSeq(centroids(s, dir)), withCe = false)
            .getField("cid"))
        .drop("qe")
        .localCheckpoint(eager = true) // one assignment pass feeds both join sides
      val a = vecs.select(col("cell"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("norm2").as("a_norm2"))
      val b = vecs.select(col("cell"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb"), col("norm2").as("b_norm2"))
      val sim = a.join(b, "cell")
        .where(col("a_id") < col("b_id"))
        .withColumn("cos",
          expr("dot_ordered(a_emb, b_emb)") /
            sqrt(col("a_norm2") * col("b_norm2")))
        .where(col("cos") > 0.3)
        .groupBy(col("b_id"))
        .agg(count(lit(1)).as("n_similar"))
      vecs.select(col("vec_id"), col("cell"))
        .join(sim.withColumnRenamed("b_id", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          coalesce(col("n_similar"), lit(0L)).as("n_similar"),
          (coalesce(col("n_similar"), lit(0L)) === 0L).as("keep"))
    },
    Some {
      val dot = SimOracle.dot("a.embedding", "b.embedding")
      val na  = SimOracle.dot("a.embedding", "a.embedding")
      val nb  = SimOracle.dot("b.embedding", "b.embedding")
      s"""WITH $kmeansOracleCte,
          sim AS (
            SELECT cb.vec_id, CAST(count(*) AS BIGINT) AS n_similar
            FROM cells ca JOIN cells cb ON ca.cid = cb.cid AND ca.vec_id < cb.vec_id
            JOIN embeddings a ON a.vec_id = ca.vec_id
            JOIN embeddings b ON b.vec_id = cb.vec_id
            WHERE $dot / sqrt($na * $nb) > 0.3
            GROUP BY cb.vec_id)
          SELECT c.vec_id, c.cid AS cell,
            coalesce(s.n_similar, 0) AS n_similar,
            coalesce(s.n_similar, 0) = 0 AS keep
          FROM cells c LEFT JOIN sim s ON s.vec_id = c.vec_id"""
    })

  /** Product-quantization ANN (Jégou et al., FAISS's IndexPQ): the
    * 64-dim space splits into M=4 subspaces of 16 dims, each with its own
    * 8-code codebook (seeded from the first 8 vectors, one Lloyd step —
    * the same deterministic training as [[trainedCentroids]], per
    * subspace); every corpus vector compresses to 4 single-byte codes,
    * and query-time asymmetric distance is a LOOKUP-TABLE sum — the
    * query computes 4×8 = 32 real subdistances once, then every corpus
    * vector costs 4 table hits + 3 adds instead of a 64-dim scan.
    *
    * Scale shape: codebooks (M×8 rows) and the per-query distance table
    * (queries×M×8) broadcast; the corpus side carries only (vec_id, sub,
    * code) — 4 small ints per vector, the 16× compression that lets a
    * 100 TB embedding corpus fit a memory-resident scan. The ADC sum is
    * a partial aggregate on (q_id, vec_id); the per-query rank window
    * sees scored candidates only. Production composes this with the IVF
    * cell filter (IVFADC) — both halves exist here independently.
    * Recall floor vs exact brute force is pinned by AnnRecallSpec.
    *
    * Determinism: micro-quantized integers end-to-end (distances,
    * codebook means via truncating div, LUT sums), argmin ties break on
    * code id via min(struct), so both engines assign identical codes.
    */
  private val simPqTopk = Q(
    "sim_pq_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      // (vec_id, sub 0..3, 16-dim micro-quantized subvector); feeds the
      // seed, both assignment passes, the update, and the query side —
      // materialize once instead of re-deriving per consumer.
      val sv = quantized(emb).select(col("vec_id"), explode(expr(
        "transform(sequence(0, 3), m -> named_struct('sub', m, 'sqe', slice(qe, m * 16 + 1, 16)))"))
        .as("x"))
        .select(col("vec_id"), col("x.sub").as("sub"), col("x.sqe").as("sqe"))
        .localCheckpoint(eager = true)
      val c0 = sv.where(col("vec_id") < K)
        .select(col("sub"), col("vec_id").as("cid"), col("sqe").as("ce"))
      // per-sub codebook folded to one broadcast row each (the centsRow
      // shape): the code assignment is a projection that KEEPS sqe, so
      // the old min(struct) SortAggregate pair and the encode→sv join-back
      // on (vec_id, sub) both disappear (guide §2.4)
      def encode(cb: DataFrame): DataFrame =
        sv.join(broadcast(cb.groupBy(col("sub"))
            .agg(collect_list(struct(col("cid"), col("ce"))).as("cands"))),
          "sub")
          .select(col("vec_id"), col("sub"), col("sqe"), expr(
            "array_min(transform(cands, c -> named_struct(" +
              "'dist', sqdist_ordered(sqe, c.ce), 'cid', c.cid))).cid")
            .as("cid"))
      val cb = encode(c0)
        .select(col("sub"), col("cid"), posexplode(col("sqe")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(expr("sum(v) div count(1)").as("cv"))
        .groupBy(col("sub"), col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)")
          .as("ce"))
        // M*8 codebook rows behind a corpus-scan subtree, consumed by both
        // the corpus encode and the query LUT — checkpoint like the centroids.
        .localCheckpoint(eager = true)
      val codes = encode(cb)
      val dtab = sv.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("sub"), col("sqe").as("q_sqe"))
        .join(broadcast(cb), "sub")
        .select(col("q_id"), col("sub"), col("cid"),
          expr("sqdist_ordered(q_sqe, ce)").as("d"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("vec_id"))
      codes.join(broadcast(dtab), Seq("sub", "cid"))
        .where(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("d")).as("adist"))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), col("adist"), col("rk"))
    },
    Some {
      val sq = "list_sum(list_transform(range(1, 17), i -> (a.sqe[i] - c.ce[i]) * (a.sqe[i] - c.ce[i])))"
      val sqQ = "list_sum(list_transform(range(1, 17), i -> (q.sqe[i] - c.ce[i]) * (q.sqe[i] - c.ce[i])))"
      s"""WITH qv AS (
            SELECT vec_id, list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS qe
            FROM embeddings),
          sv AS (
            SELECT vec_id, s.sub,
              list_slice(qe, s.sub * 16 + 1, s.sub * 16 + 16) AS sqe
            FROM qv, (SELECT unnest(range(0, 4)) AS sub) s),
          c0 AS (SELECT sub, vec_id AS cid, sqe AS ce FROM sv WHERE vec_id < $K),
          d0 AS (
            SELECT a.vec_id, a.sub, c.cid, CAST($sq AS BIGINT) AS dist
            FROM sv a JOIN c0 c ON a.sub = c.sub),
          a0 AS (
            SELECT vec_id, sub, cid FROM (
              SELECT vec_id, sub, cid, row_number() OVER (
                PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
              FROM d0)
            WHERE rn = 1),
          s1 AS (
            SELECT a0.sub, a0.cid, t.i AS pos,
              CAST(sum(sv.sqe[t.i]) AS BIGINT) // count(*) AS cv
            FROM a0 JOIN sv ON a0.vec_id = sv.vec_id AND a0.sub = sv.sub,
                 generate_series(1, 16) AS t(i)
            GROUP BY a0.sub, a0.cid, t.i),
          cb AS (SELECT sub, cid, list(cv ORDER BY pos) AS ce
                 FROM s1 GROUP BY sub, cid),
          d1 AS (
            SELECT a.vec_id, a.sub, c.cid, CAST($sq AS BIGINT) AS dist
            FROM sv a JOIN cb c ON a.sub = c.sub),
          codes AS (
            SELECT vec_id, sub, cid FROM (
              SELECT vec_id, sub, cid, row_number() OVER (
                PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
              FROM d1)
            WHERE rn = 1),
          dtab AS (
            SELECT q.vec_id AS q_id, c.sub, c.cid, CAST($sqQ AS BIGINT) AS d
            FROM sv q JOIN cb c ON q.sub = c.sub
            WHERE q.vec_id < 5),
          ad AS (
            SELECT dtab.q_id, codes.vec_id, CAST(sum(dtab.d) AS BIGINT) AS adist
            FROM codes JOIN dtab ON codes.sub = dtab.sub AND codes.cid = dtab.cid
            WHERE codes.vec_id <> dtab.q_id
            GROUP BY 1, 2)
          SELECT q_id, vec_id, adist, rk FROM (
            SELECT q_id, vec_id, adist, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY adist, vec_id) AS BIGINT) AS rk
            FROM ad)
          WHERE rk <= 3"""
    })

  /** IVFADC (Jégou et al.; FAISS IndexIVFPQ) — the composition the two
    * halves above exist for: the trained IVF coarse quantizer restricts
    * the scan to the query's cell, and PQ codes of the RESIDUAL
    * (vector − cell centroid) give the in-cell asymmetric distances from
    * a lookup table. Residual encoding is what makes shared codebooks
    * work: residuals from every cell live near the origin, so one 8-code
    * codebook per subspace covers them all.
    *
    * Scale: this is the billion-vector production shape — the corpus
    * carries (cell, 4 codes) per vector ≈ 5 bytes; a query touches
    * n/k vectors (its cell) at 4 LUT hits each; centroids, codebooks,
    * and per-(query, cell) LUTs all broadcast. Residuals are integer
    * differences of micro-quantized values, so codes and distances stay
    * engine-exact end-to-end.
    */
  private val simIvfadcTopk = Q(
    "sim_ivfadc_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val qf = quantized(emb)
      val cent = centroids(s, dir)
      // (vec_id, cid, rv): cell assignment + integer residual vector;
      // feeds PQ training, corpus encoding, and the query side. The
      // argmin struct carries the winning centroid's ce, so the residual
      // is ONE projection — the old shape re-joined the assignment back
      // to qf on vec_id (a full corpus equi-join for a column the row
      // already had) and then to the centroids on cid (guide §2.4).
      val resid = qf
        .select(col("vec_id"), nearestCol(centSeq(cent), withCe = true).as("m"),
          col("qe"))
        .select(col("vec_id"), col("m.cid").as("cid"),
          expr("zip_with(qe, m.ce, (a, b) -> a - b)").as("rv"))
        .localCheckpoint(eager = true)
      val sv = resid.select(col("vec_id"), col("cid"), explode(expr(
        "transform(sequence(0, 3), m -> named_struct('sub', m, 'sqe', slice(rv, m * 16 + 1, 16)))"))
        .as("x"))
        .select(col("vec_id"), col("cid"), col("x.sub").as("sub"), col("x.sqe").as("sqe"))
      val c0 = sv.where(col("vec_id") < K)
        .select(col("sub"), col("vec_id").as("pqc"), col("sqe").as("pce"))
      // per-sub codebook folded to one broadcast row each (the centsRow
      // shape): the code assignment is a projection that KEEPS sqe, so
      // the old min(struct) SortAggregate pair and the encode→sv join-back
      // on (vec_id, sub) both disappear (guide §2.4)
      def encode(cb: DataFrame): DataFrame =
        sv.join(broadcast(cb.groupBy(col("sub"))
            .agg(collect_list(struct(col("pqc"), col("pce"))).as("cands"))),
          "sub")
          .select(col("vec_id"), col("cid"), col("sub"), col("sqe"), expr(
            "array_min(transform(cands, c -> named_struct(" +
              "'dist', sqdist_ordered(sqe, c.pce), 'pqc', c.pqc))).pqc")
            .as("pqc"))
      val cb = encode(c0)
        .select(col("sub"), col("pqc"), posexplode(col("sqe")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("pqc"), col("pos"))
        .agg(expr("sum(v) div count(1)").as("cv"))
        .groupBy(col("sub"), col("pqc"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)")
          .as("pce"))
        .localCheckpoint(eager = true) // shared by corpus encode + query LUT
      val codes = encode(cb)
      // query side: probe own cell; the query's residual vs that cell
      // splits into subvectors and meets the shared codebook → LUT rows
      // (queries × 4 × 8), broadcast to the corpus codes.
      val dtab = resid.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("cid"), explode(expr(
          "transform(sequence(0, 3), m -> named_struct('sub', m, 'q_sqe', slice(rv, m * 16 + 1, 16)))"))
          .as("x"))
        .select(col("q_id"), col("cid"), col("x.sub").as("sub"), col("x.q_sqe").as("q_sqe"))
        .join(broadcast(cb), "sub")
        .select(col("q_id"), col("cid"), col("sub"), col("pqc"),
          expr("sqdist_ordered(q_sqe, pce)").as("d"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("vec_id"))
      codes.join(broadcast(dtab), Seq("cid", "sub", "pqc"))
        .where(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("d")).as("adist"))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("q_id"), col("vec_id"), col("adist"), col("rk"))
    },
    Some {
      val sq = "list_sum(list_transform(range(1, 17), i -> (a.sqe[i] - c.pce[i]) * (a.sqe[i] - c.pce[i])))"
      val sqQ = "list_sum(list_transform(range(1, 17), i -> (q.q_sqe[i] - c.pce[i]) * (q.q_sqe[i] - c.pce[i])))"
      s"""WITH $kmeansOracleCte,
          cent AS (SELECT cid, ce FROM c1),
          resid AS (
            SELECT q.vec_id, cells.cid,
              list_transform(range(1, 65), i -> q.qe[i] - cent.ce[i]) AS rv
            FROM q JOIN cells ON cells.vec_id = q.vec_id
            JOIN cent ON cent.cid = cells.cid),
          sv AS (
            SELECT vec_id, cid, s.sub,
              list_slice(rv, s.sub * 16 + 1, s.sub * 16 + 16) AS sqe
            FROM resid, (SELECT unnest(range(0, 4)) AS sub) s),
          pc0 AS (SELECT sub, vec_id AS pqc, sqe AS pce FROM sv WHERE vec_id < $K),
          pd0 AS (
            SELECT a.vec_id, a.cid, a.sub, c.pqc, CAST($sq AS BIGINT) AS dist
            FROM sv a JOIN pc0 c ON a.sub = c.sub),
          pa0 AS (
            SELECT vec_id, cid, sub, pqc FROM (
              SELECT vec_id, cid, sub, pqc, row_number() OVER (
                PARTITION BY vec_id, sub ORDER BY dist, pqc) AS rn
              FROM pd0)
            WHERE rn = 1),
          ps1 AS (
            SELECT pa0.sub, pa0.pqc, t.i AS pos,
              CAST(sum(sv.sqe[t.i]) AS BIGINT) // count(*) AS cv
            FROM pa0 JOIN sv ON pa0.vec_id = sv.vec_id AND pa0.sub = sv.sub,
                 generate_series(1, 16) AS t(i)
            GROUP BY pa0.sub, pa0.pqc, t.i),
          pcb AS (SELECT sub, pqc, list(cv ORDER BY pos) AS pce
                  FROM ps1 GROUP BY sub, pqc),
          pd1 AS (
            SELECT a.vec_id, a.cid, a.sub, c.pqc, CAST($sq AS BIGINT) AS dist
            FROM sv a JOIN pcb c ON a.sub = c.sub),
          codes AS (
            SELECT vec_id, cid, sub, pqc FROM (
              SELECT vec_id, cid, sub, pqc, row_number() OVER (
                PARTITION BY vec_id, sub ORDER BY dist, pqc) AS rn
              FROM pd1)
            WHERE rn = 1),
          dtab AS (
            SELECT q.vec_id AS q_id, q.cid, q.sub, c.pqc, CAST($sqQ AS BIGINT) AS d
            FROM (SELECT vec_id, cid, sub, sqe AS q_sqe FROM sv WHERE vec_id < 5) q
            JOIN pcb c ON q.sub = c.sub),
          ad AS (
            SELECT dtab.q_id, codes.vec_id, CAST(sum(dtab.d) AS BIGINT) AS adist
            FROM codes
            JOIN dtab ON codes.cid = dtab.cid AND codes.sub = dtab.sub
                     AND codes.pqc = dtab.pqc
            WHERE codes.vec_id <> dtab.q_id
            GROUP BY 1, 2)
          SELECT q_id, vec_id, adist, rk FROM (
            SELECT q_id, vec_id, adist, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY adist, vec_id) AS BIGINT) AS rk
            FROM ad)
          WHERE rk <= 3"""
    })

  /** First two md5 hex digits as 0..255 (the engine's split convention). */
  private def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** Incremental IVF index maintenance — the ANN twin of
    * `dedup_incremental`: an incoming batch (md5-half of the corpus)
    * is assigned into the EXISTING lake-trained cells, and the readout
    * is the per-cell ingest health report (arrivals, mean/min/max
    * residual distance) an index maintainer watches for cell overflow
    * and drift. Batch-side work is ONE broadcast-centroid pass over
    * the delta — it scales with the batch, never the lake (the
    * dedup_incremental law). The lake-trained quantizer is recomputed
    * here so the DuckDB oracle has a closed form; a production
    * deployment loads it as the stored index and skips those lake
    * passes entirely. Distances are exact integers (1e-6-quantized
    * components through the native sqdist kernel), so cell membership
    * and every statistic hash-match.
    */
  private val simIvfIncremental = Q(
    "sim_ivf_incremental",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val half = md5Byte("CAST(vec_id AS STRING)")
      val lake = emb.where(expr(s"($half) >= 128"))
      val batch = emb.where(expr(s"($half) < 128"))
      assign(quantized(batch), trainedCentroids(lake))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_new"),
          expr("sum(dist) div count(1)").as("mean_dist"),
          min(col("dist")).as("min_dist"), max(col("dist")).as("max_dist"))
    },
    Some(s"""WITH qa AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))
                   AS qe
               FROM embeddings),
             lake AS (
               SELECT * FROM qa
               WHERE ${md5Byte("CAST(vec_id AS VARCHAR)")} >= 128),
             batch AS (
               SELECT * FROM qa
               WHERE ${md5Byte("CAST(vec_id AS VARCHAR)")} < 128),
             c0 AS (SELECT vec_id AS cid, qe AS ce FROM lake
                    WHERE vec_id < $K),
             d1 AS (
               SELECT q.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i])))
                   AS BIGINT) AS dist
               FROM lake q, c0 c),
             a1 AS (
               SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY dist, cid) AS rn
                 FROM d1)
               WHERE rn = 1),
             s1 AS (
               SELECT a1.cid, t.i AS pos,
                 CAST(sum(q.qe[t.i]) AS BIGINT) // count(*) AS cv
               FROM a1 JOIN lake q USING (vec_id),
                 generate_series(1, 64) AS t(i)
               GROUP BY a1.cid, t.i),
             c1 AS (SELECT cid, list(cv ORDER BY pos) AS ce
                    FROM s1 GROUP BY cid),
             db AS (
               SELECT q.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i])))
                   AS BIGINT) AS dist
               FROM batch q, c1 c),
             cells AS (
               SELECT vec_id, cid, dist FROM (
                 SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY dist, cid) AS rn
                 FROM db)
               WHERE rn = 1)
             SELECT cid, CAST(count(*) AS BIGINT) AS n_new,
               CAST(sum(dist) AS BIGINT) // count(*) AS mean_dist,
               min(dist) AS min_dist, max(dist) AS max_dist
             FROM cells GROUP BY cid"""))

  /** Tombstone-aware IVF maintenance — the DELETE twin of
    * `sim_ivf_incremental` (VERDICT r09 task 6): the `del:`-salted
    * kill-list ([[SimQueries.tombstones]]'s convention, ~10%) lands on
    * the standing lake index, and the readout is the per-cell erasure
    * report — population before, tombstoned count, survivors, and the
    * mean residual distance over the SURVIVORS only — i.e. the cell
    * stats genuinely reflect the removals instead of silently carrying
    * deleted members (the gap the r9 verdict named).
    *
    * Scale shape: the tombstone flag is a PURE function of vec_id (md5),
    * so deletion costs no join at all — one broadcast-centroid assign
    * pass over the lake (the trained path's own cost; production reads
    * the stored cell assignment instead) plus a flag column folded into
    * the same map-side-combined aggregate. Survivor means are integer
    * `div` guarded by a CASE so a fully-erased cell reports NULL, not a
    * division error, on both engines. */
  private val simIvfDelete = Q(
    "sim_ivf_delete",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val half = md5Byte("CAST(vec_id AS STRING)")
      val lake = emb.where(expr(s"($half) >= 128"))
      assign(quantized(lake), trainedCentroids(lake))
        .withColumn("is_del", expr(SimQueries.delPredSql("STRING")))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_before"),
          sum(expr("CASE WHEN is_del THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"))
            .as("n_del"),
          sum(expr("CASE WHEN is_del THEN CAST(0 AS BIGINT) ELSE dist END"))
            .as("sum_after"))
        .select(col("cid"), col("n_before"), col("n_del"),
          (col("n_before") - col("n_del")).as("n_after"),
          expr("""CASE WHEN n_before - n_del > 0
                  THEN sum_after div (n_before - n_del) END""")
            .as("mean_dist_after"))
    },
    Some(s"""WITH qa AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))
                   AS qe
               FROM embeddings),
             lake AS (
               SELECT * FROM qa
               WHERE ${md5Byte("CAST(vec_id AS VARCHAR)")} >= 128),
             c0 AS (SELECT vec_id AS cid, qe AS ce FROM lake
                    WHERE vec_id < $K),
             d1 AS (
               SELECT q.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i])))
                   AS BIGINT) AS dist
               FROM lake q, c0 c),
             a1 AS (
               SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY dist, cid) AS rn
                 FROM d1)
               WHERE rn = 1),
             s1 AS (
               SELECT a1.cid, t.i AS pos,
                 CAST(sum(q.qe[t.i]) AS BIGINT) // count(*) AS cv
               FROM a1 JOIN lake q USING (vec_id),
                 generate_series(1, 64) AS t(i)
               GROUP BY a1.cid, t.i),
             c1 AS (SELECT cid, list(cv ORDER BY pos) AS ce
                    FROM s1 GROUP BY cid),
             dl AS (
               SELECT q.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i])))
                   AS BIGINT) AS dist
               FROM lake q, c1 c),
             cells AS (
               SELECT vec_id, cid, dist FROM (
                 SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY dist, cid) AS rn
                 FROM dl)
               WHERE rn = 1),
             flagged AS (
               SELECT cid, dist,
                 ${SimQueries.delPredSql("VARCHAR")} AS is_del
               FROM cells),
             agg AS (
               SELECT cid, CAST(count(*) AS BIGINT) AS n_before,
                 CAST(sum(CASE WHEN is_del THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_del,
                 CAST(sum(CASE WHEN is_del THEN 0 ELSE dist END) AS BIGINT)
                   AS sum_after
               FROM flagged GROUP BY cid)
             SELECT cid, n_before, n_del,
               n_before - n_del AS n_after,
               CASE WHEN n_before - n_del > 0
                 THEN sum_after // (n_before - n_del) END AS mean_dist_after
             FROM agg"""))

  /** Greedy k-center (farthest-point-first) coreset selection — the
    * diversity-maximizing data-selection rule (Sener & Savarese's core-set
    * active learning; 2-approximation of the k-center objective): start
    * from vec_id 0, then repeatedly pick the vector FARTHEST from the
    * already-selected set. Complements select_mmr (which trades relevance
    * against diversity over a bounded pool): k-center is pure coverage and
    * its per-round argmax runs over the WHOLE corpus.
    *
    * Scale shape: each of the k−1 rounds is one scan + one max(struct)
    * aggregate — the selected set (≤ k rows) broadcasts to a crossJoin,
    * the per-vector min-distance partial-aggregates map-side, and only a
    * single row reaches the driver per round (the trained-centroid
    * pattern: driver state bounded by k, never corpus-sized). Distances
    * are exact integer squared-L2 on the 1e-6-quantized components, so
    * the argmax sequence is engine-identical; the oracle replays it as
    * chained MATERIALIZED stages (the select_mmr discipline).
    */
  private val KcK = 5

  private val sampleKcenter = Q(
    "sample_kcenter",
    (s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val qf = quantized(Tables.embeddings(s, dir))
        .localCheckpoint(eager = true) // reused by every round
      var rows = Vector((1L, 0L, 0L)) // (rk, vec_id, d2_prev); seed = vec 0
      while (rows.size < KcK) {
        val centIds = rows.map(_._2)
        val cent = qf.where(col("vec_id").isin(centIds: _*))
          .select(col("vec_id").as("cid"), col("qe").as("ce"))
        // min-distance-to-selected is a per-row fold over the folded
        // selected-set row (the centsRow shape) — the old crossJoin×|sel|
        // + groupBy(vec_id) shuffled the corpus once per round for
        // per-row math (guide §2.4)
        val far = qf.where(!col("vec_id").isin(centIds: _*))
          .crossJoin(broadcast(centsRow(cent)))
          .select(col("vec_id"),
            expr("array_min(transform(cents, c -> sqdist_ordered(qe, c.ce)))")
              .as("dmin"))
          .agg(max(struct(col("dmin"), (-col("vec_id")).as("neg"))).as("m"))
          .select(col("m.dmin").as("dmin"), (-col("m.neg")).as("vec_id"))
          .collect()(0)
        rows :+= ((rows.size + 1).toLong, far.getLong(1), far.getLong(0))
      }
      rows.toDF("rk", "vec_id", "d2_prev")
    },
    Some {
      val d2 = "CAST(list_sum(list_transform(range(1, 65), i -> (a.qe[i] - c.qe[i]) * (a.qe[i] - c.qe[i]))) AS BIGINT)"
      def stage(i: Int): String = {
        val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j")
          .mkString(" UNION ALL ")
        s"""s$i AS MATERIALIZED (
              SELECT CAST($i AS BIGINT) AS rk, vec_id, dmin AS d2_prev
              FROM (SELECT a.vec_id, min($d2) AS dmin
                    FROM q a JOIN q c ON c.vec_id IN ($sel)
                    WHERE a.vec_id NOT IN ($sel)
                    GROUP BY a.vec_id)
              ORDER BY dmin DESC, vec_id LIMIT 1)"""
      }
      s"""WITH q AS MATERIALIZED (
            SELECT vec_id, list_transform(embedding,
              x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)) AS qe
            FROM embeddings),
          s1 AS MATERIALIZED (
            SELECT CAST(1 AS BIGINT) AS rk, CAST(0 AS BIGINT) AS vec_id,
              CAST(0 AS BIGINT) AS d2_prev),
          ${(2 to KcK).map(stage).mkString(",\n")}
          ${(1 to KcK).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")}"""
    })

  val all: Seq[Q] = Seq(clusterKmeans, simIvfTrained, simIvfNprobe, dedupSemantic,
    simPqTopk, simIvfadcTopk, simIvfIncremental, simIvfDelete, sampleKcenter,
    simAnnFiltered)
}
