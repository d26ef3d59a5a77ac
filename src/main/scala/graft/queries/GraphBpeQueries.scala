package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Three capability families the engine was still missing as REGISTERED
  * queries: a multi-way star-schema join (the TPC-H shape every
  * warehouse query reduces to), an iterative link-analysis pass
  * (PageRank over the identity graph), and the counting step at the
  * heart of distributed BPE tokenizer training.
  */
object GraphBpeQueries {

  // TPC-H Q5-shaped revenue rollup: lineitem ⋈ orders ⋈ customer ⋈
  // nation ⋈ region, region + date filtered. The scale shape Catalyst
  // picks and PlanSpec pins: the two BIG sides (lineitem, orders) meet
  // in ONE shuffle join on orderkey; every dimension hop — customer,
  // nation, region — broadcasts, and the date/region filters push into
  // the scans so the join sees only qualifying years. At 100 TB
  // bucketing both fact tables on orderkey would delete the last
  // exchange too (sink/BucketedTables does exactly that).
  // Determinism: the per-item revenue double is quantized to integer
  // cents per ROW (§7.4.1 — a raw sum(double) is addition-order
  // sensitive), summed exactly, divided back once on output.
  private val joinMultiwayRevenue = Q(
    "join_multiway_revenue",
    (s, dir) => {
      val lineitem = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val orders = Tables.orders(s, dir)
        .where(col("o_orderdate").between("1996-01-01", "1997-12-31"))
        .select(col("o_orderkey"), col("o_custkey"))
      val customer = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val nation = Tables.nation(s, dir)
      val region = Tables.region(s, dir).where(col("r_name") === "ASIA")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(expr(
          "CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0) AS BIGINT)) AS DOUBLE) / 100.0"),
          2).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT n_name,
                   round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0, 0)
                     AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate BETWEEN '1996-01-01' AND '1997-12-31'
            GROUP BY n_name"""))

  // Two Jacobi iterations of PageRank (d = 0.85) over the undirected
  // identity graph — the iterative join-aggregate pattern (Pregel's
  // inner loop) as a declarative query. Each iteration is one shuffle:
  // contributions group on the edge head. At 100 TB you'd hash-partition
  // the edge list on src ONCE and every iteration reuses that exchange
  // (the Components loop in identity/ does exactly this); two fixed
  // iterations keep the query a finite plan the oracle can mirror
  // non-recursively. Determinism: per-edge contributions are quantized
  // to integer pico-units per ROW (the §7.4.1 cross-row-double rule —
  // a raw sum(1.0/deg) is order-sensitive in the last ulp), so the
  // per-node sums are exact BIGINTs on both engines; the damping affine
  // is then a single identical expression over exact integer input.
  private val graphPagerank = Q(
    "graph_pagerank",
    (s, dir) => {
      // session-shared checkpointed artifacts (GraphArtifacts: 2^40
      // offset + try_cast + null filter — ADVICE r05); both iterations
      // read the one materialized edge RDD
      val und = graft.identity.GraphArtifacts.und(s, dir)
      val deg = graft.identity.GraphArtifacts.deg(s, dir)
      val withDeg = und.join(deg, "src")
      // r0 = 1 for every node, so round 1's per-edge contribution is
      // 1/deg — quantized per row, summed exactly.
      val r1 = withDeg
        .groupBy(col("dst"))
        .agg(sum(expr("CAST(round(1000000000000.0 / CAST(deg AS DOUBLE), 0) AS BIGINT)"))
          .as("c1"))
        .select(col("dst").as("node"),
          expr("0.15 + 0.85 * (CAST(c1 AS DOUBLE) / 1000000000000.0)").as("r1"))
      val r2 = withDeg
        .join(r1, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("CAST(round(r1 / CAST(deg AS DOUBLE) * 1000000000000.0, 0) AS BIGINT)"))
          .as("c2"))
        .select(col("dst").as("node"),
          expr("0.15 + 0.85 * (CAST(c2 AS DOUBLE) / 1000000000000.0)").as("r2"))
      r2.select(col("node"), round(col("r2"), 4).as("rank"))
    },
    Some(s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
            ${graft.identity.GraphArtifacts.undOracle},
            ${graft.identity.GraphArtifacts.degOracle},
            wd AS (SELECT und.src, und.dst, deg.deg
                   FROM und JOIN deg ON und.src = deg.src),
            r1 AS (SELECT dst AS node,
                     0.15 + 0.85 * (CAST(sum(CAST(round(1000000000000.0
                         / CAST(deg AS DOUBLE), 0) AS BIGINT)) AS DOUBLE)
                       / 1000000000000.0) AS r1
                   FROM wd GROUP BY dst),
            r2 AS (SELECT wd.dst AS node,
                     0.15 + 0.85 * (CAST(sum(CAST(round(r1.r1
                         / CAST(wd.deg AS DOUBLE) * 1000000000000.0, 0) AS BIGINT)) AS DOUBLE)
                       / 1000000000000.0) AS r2
                   FROM wd JOIN r1 ON wd.src = r1.node
                   GROUP BY wd.dst)
            SELECT node, round(r2, 4) AS rank FROM r2"""))

  /** Per-seed restart mass in nano-units. 10⁹ (not the pagerank query's
    * 10¹²) so the damped per-node accumulations stay far inside BIGINT
    * even when the seed set reaches 10⁸ nodes: total circulating mass is
    * n_seeds·10⁹, and mass conservation bounds every per-node sum (and
    * its ×85 damping product) by 85·n_seeds·10⁹ < 9.2·10¹⁸ for any graph
    * shape, hub or not. */
  private val PprSeedMassNano = 1000000000L

  /** Personalized PageRank from a seeded node set — the seed-expansion
    * primitive behind graph-based corpus curation (start from a curated
    * whitelist, walk the link/identity graph, harvest the high-mass
    * frontier; the crawl-frontier scoring shape). Two Jacobi iterations
    * of r ← 0.15·e_seeds + 0.85·AᵀD⁻¹r with restart mass only on the
    * md5-selected seed set (~1/8 of nodes — the portable-hash seeding
    * convention, so the oracle reproduces the set exactly).
    *
    * Unlike `graph_pagerank` (per-row pico-quantized doubles), this is
    * INTEGER END TO END: mass lives in nano-units, the per-edge spread
    * is BIGINT floor division mass div deg (both engines floor — mass is
    * non-negative), and the damping affine (mass·15·10⁹·is_seed +
    * 85·c) div 100 is exact BIGINT arithmetic; no double is ever
    * computed, so no rounding convention can drift. Scale shape: same as
    * pagerank — one shuffle per iteration (contributions group on the
    * edge head) over the session-shared checkpointed edge artifact; the
    * `mass > 0` pushdown keeps iteration-1 traffic to the seed
    * neighborhoods only (on a 100 TB graph with a 0.1% seed set, round
    * 1 touches the seeds' out-edges, not the graph). */
  private val graphPpr = Q(
    "graph_ppr",
    (s, dir) => {
      val und = graft.identity.GraphArtifacts.und(s, dir)
      val deg = graft.identity.GraphArtifacts.deg(s, dir)
      val nodes = deg.withColumn("is_seed",
        expr(s"CAST(((${PortableHash.md5Byte("CAST(src AS STRING)")}) < 32) AS LONG)"))
      val withDeg = und.join(deg, "src")
      // one mass spread: per-edge floor share of src's mass, grouped on dst
      def step(r: DataFrame): DataFrame =
        withDeg.join(r.select(col("node"), col("mass")).where(col("mass") > 0),
            col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(expr("mass div deg")).as("c"))
      // teleport-to-seeds damping over ALL nodes (a zero-in-mass seed
      // still gets its restart mass)
      def damp(c: DataFrame): DataFrame =
        nodes.join(c, col("src") === col("dst"), "left")
          .select(col("src").as("node"), col("is_seed"),
            expr(s"(is_seed * ${15 * PprSeedMassNano} + 85 * coalesce(c, 0)) div 100")
              .as("mass"))
      val r0 = nodes.select(col("src").as("node"), col("is_seed"),
        (col("is_seed") * lit(PprSeedMassNano)).as("mass"))
      val r2 = damp(step(damp(step(r0))))
      r2.where(col("mass") > 0)
        .select(col("node"), col("is_seed"), col("mass").as("ppr_nano"))
    },
    Some(s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
            ${graft.identity.GraphArtifacts.undOracle},
            ${graft.identity.GraphArtifacts.degOracle},
            nodes AS (SELECT src, deg,
              CASE WHEN (${PortableHash.md5Byte("CAST(src AS VARCHAR)")}) < 32
                   THEN 1 ELSE 0 END AS is_seed
              FROM deg),
            wd AS (SELECT und.src, und.dst, deg.deg
                   FROM und JOIN deg ON und.src = deg.src),
            r0 AS (SELECT src AS node, is_seed,
                     CAST(is_seed * $PprSeedMassNano AS BIGINT) AS mass
                   FROM nodes),
            c1 AS (SELECT wd.dst, CAST(sum(r0.mass // wd.deg) AS BIGINT) AS c
                   FROM wd JOIN r0 ON r0.node = wd.src
                   WHERE r0.mass > 0 GROUP BY wd.dst),
            r1 AS (SELECT n.src AS node, n.is_seed,
                     CAST((n.is_seed * ${15 * PprSeedMassNano}
                       + 85 * coalesce(c1.c, 0)) // 100 AS BIGINT) AS mass
                   FROM nodes n LEFT JOIN c1 ON c1.dst = n.src),
            c2 AS (SELECT wd.dst, CAST(sum(r1.mass // wd.deg) AS BIGINT) AS c
                   FROM wd JOIN r1 ON r1.node = wd.src
                   WHERE r1.mass > 0 GROUP BY wd.dst),
            r2 AS (SELECT n.src AS node, n.is_seed,
                     CAST((n.is_seed * ${15 * PprSeedMassNano}
                       + 85 * coalesce(c2.c, 0)) // 100 AS BIGINT) AS mass
                   FROM nodes n LEFT JOIN c2 ON c2.dst = n.src)
            SELECT node, CAST(is_seed AS BIGINT) AS is_seed, mass AS ppr_nano
            FROM r2 WHERE mass > 0"""))

  // The counting step of BPE tokenizer training, distributed: adjacent
  // symbol-pair frequencies over the corpus, weighted by word frequency.
  // The expensive explode runs over the DISTINCT-WORD table (vocabulary-
  // sized — millions of rows at 100 TB, not trillions), because pair
  // count per word × word frequency is exactly the corpus pair count;
  // that factoring is how real distributed BPE trainers stay feasible.
  // Top-20 merges via TakeOrderedAndProject with the (count desc, pair)
  // total order; rk derived over the 20 survivors.
  private val bpeMergeTopk = Q(
    "bpe_merge_topk",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // session-shared vocabulary artifact (TextArtifacts)
      val vocab = graft.text.TextArtifacts.vocab(s, dir)
        .select(col("token").as("w"), col("freq"))
      val pairs = vocab
        .select(col("freq"), explode(expr(
          """CASE WHEN length(w) < 2 THEN array()
             ELSE transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))
             END""")).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("pair")).limit(20)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("pair"))
      top.withColumn("rk", row_number().over(w).cast("long"))
    },
    Some("""WITH words AS (
              SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
              FROM documents),
            vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
                      FROM words GROUP BY w),
            pairs AS (
              SELECT substr(w, i, 2) AS pair, freq
              FROM vocab, unnest(range(1, len(w))) AS u(i)
              WHERE len(w) >= 2),
            agg AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
                    FROM pairs GROUP BY pair),
            top AS (SELECT pair, cnt FROM agg
                    ORDER BY cnt DESC, pair LIMIT 20)
            SELECT pair, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rk
            FROM top"""))

  /** BPE tokenizer APPLICATION — the encode step every training pipeline
    * runs after `bpe_merge_topk` learns the merge table: rebuild the
    * ranked top-20 merge list, encode the corpus, and report per-doc BPE
    * token counts and fertility (micro-tokens per word).
    *
    * Scale shape: encoding happens once per DISTINCT word (the
    * vocabulary), never per occurrence — per-doc totals come from the
    * (doc, word, cnt) pre-aggregate joined to the encoded vocabulary
    * (Zipf makes the vocabulary orders of magnitude smaller than the
    * corpus). The merge table is FIXED-SIZE (20 rows) and collected once
    * — the trained-centroid pattern ([[graft.sim.ClusterQueries]]) — so
    * application is 20 chained codegen `replace` calls over the
    * char-spaced word: a pure per-row map, no join against a merge table,
    * no shuffle beyond the two aggregates. Merges apply in rank order,
    * each replacing left-to-right non-overlapping (Java and DuckDB
    * `replace` agree exactly; the oracle replays the identical chain as a
    * recursive CTE stepping rk = 1..20).
    *
    * Determinism: merge learning is the bpe_merge_topk aggregate (BIGINT
    * counts, ties on pair text); application spaces every symbol
    * (" t h e ") so a merged symbol can never be half-matched across a
    * boundary; fertility is integer ppm — no doubles anywhere.
    */
  /** Encode a distinct-word frame `(w)` with a fixed ranked merge list:
    * char-space every symbol (" t h e "), apply each 2-char merge in rank
    * order as a left-to-right non-overlapping `replace`, and return the
    * surviving symbol array per word. Separated from the query so
    * BpeEncodeSpec can pin the application semantics on hand-checked
    * words (boundary safety, concat-reconstruction, the left-to-right
    * overlap rule both engines share). */
  /** Top-20 character-bigram merges learned from the vocabulary — ONE
    * definition shared by bpe_encode and bpe_encode_dropout (a change
    * to the cap or the (cnt desc, pair) tie-break moves both encoders
    * in lockstep, so "baseline vs dropout fertility" can never compare
    * against a stale merge table). 20 rows — driver-bounded. */
  private[queries] def bpeMerges(vocab: DataFrame): Seq[String] =
    vocab
      .select(col("freq"), explode(expr(
        """CASE WHEN length(w) < 2 THEN array()
           ELSE transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))
           END""")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(20)
      .select(col("pair")).collect().map(_.getString(0)).toSeq

  /** Oracle CTE prefix (words → wc → vocab → pairs → agg → merges) —
    * the [[bpeMerges]] twin both encode oracles splice, same lockstep
    * rationale. */
  private val bpeMergesOracle: String =
    """words AS (
         SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
         FROM documents),
       wc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
              FROM words GROUP BY doc_id, w),
       vocab AS (SELECT w, CAST(sum(cnt) AS BIGINT) AS freq
                 FROM wc GROUP BY w),
       pairs AS (
         SELECT substr(w, i, 2) AS pair, freq
         FROM vocab, unnest(range(1, len(w))) AS u(i)
         WHERE len(w) >= 2),
       agg AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
               FROM pairs GROUP BY pair),
       merges AS (
         SELECT pair, row_number() OVER (ORDER BY cnt DESC, pair) AS rk
         FROM (SELECT pair, cnt FROM agg ORDER BY cnt DESC, pair LIMIT 20))"""

  private[queries] def bpeApply(vocab: DataFrame, merges: Seq[String]): DataFrame =
    merges.foldLeft(vocab.select(col("w"),
      concat(lit(" "), expr("regexp_replace(w, '(.)', '$1 ')")).as("s"))) { (df, m) =>
      df.withColumn("s",
        expr(s"replace(s, ' ${m.charAt(0)} ${m.charAt(1)} ', ' $m ')"))
    }.select(col("w"), expr("filter(split(trim(s), ' '), t -> t <> '')").as("toks"))

  private val bpeEncode = Q(
    "bpe_encode",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      // session-shared artifacts: (doc, word, cnt) feeds the per-doc
      // totals, the vocabulary feeds merge learning
      val wc = graft.text.TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("w"), col("cnt"))
      val vocab = graft.text.TextArtifacts.vocab(s, dir)
        .select(col("token").as("w"), col("freq"))
      val encoded = bpeApply(vocab, bpeMerges(vocab))
        .select(col("w"), size(col("toks")).cast("long").as("ntok"))
      wc.join(encoded, "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("ntok")).as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          expr("(n_bpe_tokens * 1000000) div n_words").as("fertility_ppm"))
    },
    Some(s"""WITH RECURSIVE $bpeMergesOracle,
            enc AS (
              SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, 0 AS step
              FROM vocab
              UNION ALL
              SELECT e.w,
                replace(e.s,
                  ' ' || substr(m.pair, 1, 1) || ' ' || substr(m.pair, 2, 1) || ' ',
                  ' ' || m.pair || ' '),
                e.step + 1
              FROM enc e JOIN merges m ON m.rk = e.step + 1),
            ntok AS (
              SELECT w, CAST(len(list_filter(string_split(trim(s), ' '),
                t -> t <> '')) AS BIGINT) AS ntok
              FROM enc WHERE step = 20)
            SELECT wc.doc_id, CAST(sum(wc.cnt) AS BIGINT) AS n_words,
              CAST(sum(wc.cnt * n.ntok) AS BIGINT) AS n_bpe_tokens,
              CAST(sum(wc.cnt * n.ntok) * 1000000 // sum(wc.cnt) AS BIGINT) AS fertility_ppm
            FROM wc JOIN ntok n ON n.w = wc.w
            GROUP BY wc.doc_id"""))

  // Two synchronous rounds of label propagation (community detection):
  // every node starts labeled by its own id, then repeatedly adopts the
  // most frequent label among its neighbors — the Raghavan et al. LPA
  // inner loop as a declarative query. Vote = one (dst, label) count
  // aggregate + one argmax via min(struct(-cnt, label)) partial
  // aggregate per round (ties break to the SMALLEST label, making the
  // sync rounds deterministic — vanilla LPA tie-breaks randomly). Same
  // shapes as the CC iteration: every step shuffles on a node id, the
  // edge list materializes once and feeds both rounds. Fixed 2-round
  // unroll keeps the plan finite for the oracle; a production run loops
  // with the Components convergence discipline.
  /** The 2-round LPA pipeline shared by graph_label_propagation and
    * graph_modularity: (fwd one-direction edges, und checkpointed
    * undirected edges, labels after two synchronous votes). Shared so the
    * modularity readout scores exactly the clustering the sibling query
    * emits (ModularitySpec asserts that coupling). */
  private[queries] def lpaPieces(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    // session-shared checkpointed artifacts (GraphArtifacts): fwd feeds
    // modularity's internal-edge count, und feeds both vote rounds
    val fwd = graft.identity.GraphArtifacts.fwd(s, dir)
    val und = graft.identity.GraphArtifacts.und(s, dir)
    def vote(labels: DataFrame): DataFrame =
      und.join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min(struct(-col("cnt"), col("label"))).as("m"))
        .select(col("dst").as("node"), col("m.label").as("label"))
    val l0 = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    (fwd, und, vote(vote(l0)))
  }

  /** Oracle CTE chain ending in `v2(node, label)`; splice after `WITH`. */
  private[queries] val lpaOracleCte: String =
    s"""${graft.identity.GraphArtifacts.fwdOracle},
      ${graft.identity.GraphArtifacts.undOracle},
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM und),
      v1 AS (
        SELECT dst AS node, label FROM (
          SELECT dst, label,
            row_number() OVER (PARTITION BY dst
              ORDER BY count(*) DESC, label) AS rn
          FROM und JOIN l0 ON und.src = l0.node
          GROUP BY dst, label)
        WHERE rn = 1),
      v2 AS (
        SELECT dst AS node, label FROM (
          SELECT dst, label,
            row_number() OVER (PARTITION BY dst
              ORDER BY count(*) DESC, label) AS rn
          FROM und JOIN v1 ON und.src = v1.node
          GROUP BY dst, label)
        WHERE rn = 1)"""

  private val graphLabelProp = Q(
    "graph_label_propagation",
    (s, dir) => {
      val (_, _, labels) = lpaPieces(s, dir)
      labels.select(col("node"), col("label"))
    },
    Some(s"""WITH $lpaOracleCte
             SELECT node, label FROM v2"""))

  // Triangle counting + global clustering coefficient over the
  // co-purchase graph (two parts are adjacent iff some order contains
  // both). The textbook scalable plan:
  //
  //  - edge derivation is an intra-order self-join — fan-out bounded by
  //    order size (≤7 lineitems), never corpus × corpus;
  //  - every edge ORIENTS from its lower-(degree, id) endpoint, so
  //    out-degree is O(√m) even on power-law graphs — the wedge join
  //    (E'⋈E' on the middle vertex) is linear-ish instead of exploding
  //    on hub vertices (the same hub-taming idea as CC's small-star);
  //  - each triangle is counted exactly once (its unique orientation),
  //    closed by one more equi-join back to E'.
  //
  // The oriented edge set feeds the wedge join twice and the closing
  // join once → checkpoint it (the shared-generator discipline).
  // Everything is integer; the clustering coefficient is basis points
  // `3·triangles·10⁴ div wedges`. Scalar totals meet in one crossJoin
  // chain of 1-row aggregates — a single plan, no driver-side .count()
  // round-trips (the text_tfidf lesson).
  /** Degree-ordered orientation: each undirected (a < b) pair becomes
    * one directed edge lower-(deg, id) → higher. This is what bounds the
    * wedge join: a vertex's OUT-degree counts only neighbors of
    * equal-or-higher degree, so it is ≤ √(2m) regardless of how skewed
    * the degree distribution is (hubs receive edges; they emit few) —
    * pinned on a hub graph by TriangleSpec. */
  private[queries] def orient(pairs: DataFrame): DataFrame = {
      val deg = pairs.select(col("a").as("node"))
        .union(pairs.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      pairs
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("v")))
            .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
  }

  /** Orientation + bloom-pruned wedge-closure kernel shared by
    * `graph_triangles` (counts the closed rows) and
    * `graph_clustering_coeff` (explodes each closed row's three corners
    * into per-node triangle counts): returns the degree frame
    * (node, deg), one row (u, wu, wv) per unordered triangle — u the
    * wedge center (lowest (deg, id) corner), (wu, wv) the closing
    * oriented edge — and the oriented edge count. */
  private[graft] def triangleClosure(pairs: DataFrame,
      pruneListener: BloomPrune.AdaptivePrune => Unit = _ => (),
      pairsCheckpointed: Boolean = false): (DataFrame, DataFrame, Long) = {
      // the pair list is usually the expensive part (a fact-table
      // self-join upstream) — build it ONCE; deg is likewise shared by
      // the orientation and the wedge totals (un-checkpointed, the
      // totals branch silently re-ran the whole upstream self-join).
      // pairsCheckpointed: callers handing a GraphArtifacts checkpoint
      // skip the redundant re-materialization.
      val p = if (pairsCheckpointed) pairs else pairs.localCheckpoint(eager = true)
      val deg = p.select(col("a").as("node"))
        .union(p.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true) // orientation ×2 + totals
      // Orientation keeps the higher endpoint's degree too, so the
      // adjacency list below can sort in ORIENTATION order (deg, id) —
      // that makes every in-core pair (v_i, v_j), i < j, a wedge whose
      // closing edge, if it exists, is exactly v_i→v_j.
      val oriented = p
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .select(
          when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
            .otherwise(
              struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
            .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
        .localCheckpoint(eager = true) // adjacency + closure side + edge count
      // Wedge-closure counting: an acyclically-oriented triangle is a
      // wedge (v_i, v_j) at its lowest-(deg, id) vertex u plus the closing
      // edge v_i→v_j, so triangles = |wedges ⋈ oriented-edges|. The wedge
      // set (Σ C(od, 2) rows, od ≤ √(2m) by the orientation — the
      // MapReduce triangle-counting bound) streams out of one flat
      // self-equi-join on the wedge center u; rows are three longs, all
      // codegen. Two earlier forms measured WORSE at sf0.1: shipping each
      // sorted neighbor array duplicated per out-edge and intersecting
      // (Σ od² longs through the exchange, 33 s), and generating wedge
      // pairs in-core by slicing per-vertex struct arrays (Σ od² struct
      // copies, 70 s).
      //
      // The closure join itself would shuffle all Σ C(od, 2) wedges
      // (41.6M at sf0.1) only for ~2% of them to close — so the wedge
      // stream is BLOOM-PRUNED against the oriented edge-key set in the
      // SAME stage that generates it (BloomPrune: distributed build,
      // native codegen probe), and only survivors (true triangles + fpp)
      // reach the exchange. False positives pass through to the exact
      // join; no false negatives. The filter is BUDGET-sized from the
      // real edge count (a driver-side count on the already-checkpointed
      // edge list, reused as the n_edges output literal): fpp 0.001 while
      // the bits fit the 256 MB budget, then degrading fpp as edges grow
      // — the prune still kills ~90% of the wedge shuffle at fpp 0.1 —
      // and only past ~1.5 B edges (achievable fpp ≥ 0.5, filter passes
      // most wedges anyway) does pruneAdaptive hand back the unpruned
      // stream and the closure join pays the standard Σ od² cost. Each
      // unordered triangle is counted exactly once because the closing
      // edge exists in exactly ONE orientation — TriangleSpec's
      // random-graph brute-force check pins this; BenchTriangles measures
      // the pruned path engaged on a 10 M-edge graph.
      val nEdges = oriented.count()
      // shuffle_hash hints: both joins key on longs with an edge-list-sized
      // build side — hashing it beats sort-merge's two sorts, and the
      // 41.6M-row wedge stream (probe side) never sorts at all
      // the wedge center u rides along (one extra long per SURVIVING
      // wedge only — the prune fires before the exchange) so the
      // clustering-coefficient consumer can attribute each triangle to
      // all three corners
      val wedges = oriented.select(col("u"), col("v").as("wu"), col("dv").as("d1"))
        .join(oriented.select(col("u"), col("v").as("wv"), col("dv").as("d2"))
          .hint("shuffle_hash"), "u")
        .where(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("wu") < col("wv")))
        .select(col("u"), col("wu"), col("wv"),
          xxhash64(col("wu"), col("wv")).as("ek"))
      val closing = oriented
        .select(col("u").as("wu"), col("v").as("wv"),
          xxhash64(col("u"), col("v")).as("ek"))
      val ap = BloomPrune.pruneAdaptive(wedges, "ek",
        closing.select(col("ek")), "ek", nKeys = math.max(nEdges, 1000L))
      pruneListener(ap)
      val closed = ap.df
        .join(closing.hint("shuffle_hash"), Seq("wu", "wv", "ek"))
        .select(col("u"), col("wu"), col("wv"))
      (deg, closed, nEdges)
  }

  /** The graph_triangles output frame from a closure's parts — shared by
    * the ad-hoc [[triangleStats]] path and the artifact-backed
    * [[coClosure]] consumers. */
  private def statsFromClosure(deg: DataFrame, closed: DataFrame,
      nEdges: Long): DataFrame = {
      val tri = closed.agg(count(lit(1)).as("n_triangles"))
      val totals = deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      totals.crossJoin(tri).withColumn("n_edges", lit(nEdges))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("n_triangles"),
          expr("(3 * n_triangles * 10000) div n_wedges").as("clustering_bp"))
  }

  /** (n_nodes, n_edges, n_wedges, n_triangles, clustering_bp) for an
    * undirected simple graph given as distinct (a < b) pairs.
    * @param pruneListener observes the adaptive bloom-prune decision
    *   (BenchTriangles asserts the pruned path engaged at 10 M edges). */
  private[graft] def triangleStats(pairs: DataFrame,
      pruneListener: BloomPrune.AdaptivePrune => Unit = _ => (),
      pairsCheckpointed: Boolean = false): DataFrame = {
      val (deg, closed, nEdges) =
        triangleClosure(pairs, pruneListener, pairsCheckpointed)
      statsFromClosure(deg, closed, nEdges)
  }

  private val coClosureCache =
    new SessionCache[(DataFrame, DataFrame, Long)](v => Seq(v._1, v._2))
  private val coClosureBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** How many times the co-purchase closure has been built this JVM —
    * pinned by PlanSpec: running graph_triangles AND
    * graph_clustering_coeff must build it once. */
  private[graft] def coClosureBuildCount: Int = coClosureBuilds.get()

  /** Session-shared triangle closure over the co-purchase graph — the
    * GraphArtifacts discipline one level up: the orientation + wedge
    * join + bloom prune + closure join is the family's dominant shared
    * cost (~2.5 s at sf0.1), and graph_triangles and
    * graph_clustering_coeff both need exactly its (deg, closed, nEdges)
    * output, so it materializes ONCE per (session, corpus) — the closed
    * frame is triangle-sized (tiny), the deg frame is checkpointed
    * inside the kernel already. Stopped-session entries are evicted only
    * from this cache and before its computeIfAbsent (the
    * CandidateArtifacts concurrency contract). Bench pre-builds and
    * attributes it as `graph_triclosure`. */
  private[graft] def coClosure(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame, Long) =
    coClosureCache.getOrBuild(s, dir) {
      coClosureBuilds.incrementAndGet()
      val (deg, closed, n) = triangleClosure(
        graft.identity.GraphArtifacts.coPairs(s, dir),
        pairsCheckpointed = true)
      (deg, closed.localCheckpoint(eager = true), n)
    }

  /** Drop the cached closure (Bench's isolated re-measure pass). Block
    * reclamation is deterministic now (VERDICT r07 task 7): SessionCache
    * caps residency at 2 dirs per session AND explicitly unpersists an
    * evicted entry's checkpoint blocks — no ContextCleaner/GC timing in
    * the loop. */
  private[graft] def coClosureInvalidate(): Unit = coClosureCache.invalidate()

  // Parquet persistence for the closure — the ArtifactStore contract the
  // other three families already follow (VERDICT r06 task 4: the warm
  // bench path must cover the 19.7 s triclosure line too, or warm
  // artifact_sec never approaches 0). nEdges rides as a 1-row frame.
  private def coClosureFingerprint(s: org.apache.spark.sql.SparkSession,
      corpusDir: String): String =
    TableFingerprint.of(s, s"$corpusDir/lineitem.parquet")

  private[graft] def coClosurePersistTo(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Unit = {
    val (deg, closed, n) = coClosure(s, corpusDir)
    import s.implicits._
    ArtifactStore.writeSnapshot(s, artifactDir,
      coClosureFingerprint(s, corpusDir),
      Seq("co_deg" -> deg, "co_closed" -> closed,
        "co_nedges" -> Seq(n).toDF("n_edges")))
  }

  private[graft] def coClosureLoadFrom(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Boolean =
    ArtifactStore.loadSnapshot(s, artifactDir,
      coClosureFingerprint(s, corpusDir),
      Seq("co_deg", "co_closed", "co_nedges")) match {
      case Some(m) =>
        val n = m("co_nedges").head().getLong(0)
        coClosureCache.put(s, corpusDir, (m("co_deg"), m("co_closed"), n))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  private[graft] def coClosureEnsure(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Boolean = {
    val hit = coClosureLoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      coClosureCache.remove(s, corpusDir) // stale snapshot ≠ fresh cache
      coClosurePersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  private val graphTriangles = Q(
    "graph_triangles",
    (s, dir) => {
      // the whole closure (pairs → orientation → pruned wedges →
      // closed triangles) is the session-shared artifact, consumed by
      // graph_clustering_coeff too — see coClosure
      val (deg, closed, nEdges) = coClosure(s, dir)
      statsFromClosure(deg, closed, nEdges)
    },
    Some("""WITH pairs AS (
              SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
            deg AS (
              SELECT node, CAST(count(*) AS BIGINT) AS deg
              FROM (SELECT a AS node FROM pairs
                    UNION ALL SELECT b FROM pairs)
              GROUP BY node),
            oriented AS (
              SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
              FROM pairs
              JOIN deg ta ON ta.node = a
              JOIN deg tb ON tb.node = b,
              LATERAL (SELECT ta.deg AS da, tb.deg AS db)),
            tri AS (
              SELECT CAST(count(*) AS BIGINT) AS n_triangles
              FROM oriented e1
              JOIN oriented e2 ON e1.u = e2.u AND e1.v <> e2.v
              JOIN oriented e3 ON e3.u = e1.v AND e3.v = e2.v),
            totals AS (
              SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
              FROM deg),
            ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM oriented)
            SELECT n_nodes, n_edges, n_wedges, n_triangles,
                   CAST((3 * n_triangles * 10000) // n_wedges AS BIGINT)
                     AS clustering_bp
            FROM totals, ec, tri"""))

  /** Per-node LOCAL clustering coefficient over the co-purchase graph —
    * the node-level companion of `graph_triangles`' global transitivity:
    * for each node v with deg(v) ≥ 2, the fraction of its neighbor pairs
    * that are themselves adjacent, cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
    * in integer basis points. The community-quality / spam-structure
    * readout per entity (a crawler that co-occurs with everything has
    * hub degree and near-zero cc; a tight product family has cc → 1).
    *
    * Shares [[triangleClosure]] — the degree-ordered orientation and the
    * bloom-pruned wedge-closure stream — with `graph_triangles`; the only
    * addition is attributing each closed triangle to its three corners
    * (one explode of a 3-element array per TRIANGLE, not per wedge —
    * triangles survive the prune, wedges don't) and one bounded groupBy.
    * Top-25 by (tri, node) via TakeOrderedAndProject; the deg ≥ 2 filter
    * is semantic (cc is undefined below two neighbors), applied
    * identically in the oracle.
    */
  private val graphClusteringCoeff = Q(
    "graph_clustering_coeff",
    (s, dir) => {
      val (deg, closed, _) = coClosure(s, dir)
      val perNode = closed
        .select(explode(array(col("u"), col("wu"), col("wv"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("tri"))
      deg.where(col("deg") >= 2)
        .join(perNode, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"))
        .withColumn("cc_bp", expr("2 * tri * 10000 div (deg * (deg - 1))"))
        .orderBy(col("tri").desc, col("node"))
        .limit(25)
    },
    Some("""WITH pairs AS MATERIALIZED (
              SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM lineitem x JOIN lineitem y
                ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
            deg AS MATERIALIZED (
              SELECT node, CAST(count(*) AS BIGINT) AS deg
              FROM (SELECT a AS node FROM pairs
                    UNION ALL SELECT b FROM pairs)
              GROUP BY node),
            tri3 AS (
              -- each triangle once as a < b < c (pairs are canonical a < b)
              SELECT p1.a AS x, p1.b AS y, p2.b AS z
              FROM pairs p1
              JOIN pairs p2 ON p2.a = p1.b
              JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b),
            pn AS (
              SELECT node, CAST(count(*) AS BIGINT) AS tri
              FROM (SELECT x AS node FROM tri3
                    UNION ALL SELECT y FROM tri3
                    UNION ALL SELECT z FROM tri3)
              GROUP BY node)
            SELECT d.node, d.deg, coalesce(pn.tri, 0) AS tri,
              CAST(2 * coalesce(pn.tri, 0) * 10000
                   // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_bp
            FROM deg d LEFT JOIN pn ON pn.node = d.node
            WHERE d.deg >= 2
            ORDER BY tri DESC, d.node
            LIMIT 25"""))

  /** k-core decomposition (k = 10) of the undirected signup graph — the
    * classic graph-quality filter (peel low-degree fringe until every
    * surviving node has ≥ k in-core neighbors; spam/bot subgraphs and
    * weakly-attached noise fall off first). Batagelj-Zaveršnik peeling,
    * distributed: each round is ONE degree aggregate plus two semi-joins
    * restricting the edge list to surviving endpoints — the standard
    * iterative shape (same loop skeleton as identity/Components: driver
    * convergence via a scalar count, per-round localCheckpoint with
    * explicit release of the superseded edge set, edges only ever
    * shrink). Converges in 3 rounds at sf0.01 / 2 at sf0.1 (measured);
    * the 8-round cap exists for pathological chains — KCoreSpec pins
    * convergence well under it, and rounds past the fixpoint are no-ops,
    * which is what lets the non-recursive oracle (8 chained peel stages)
    * mirror a convergence loop exactly.
    */
  private val KCoreK = 10
  private val KCoreRounds = 8

  /** The undirected signup bipartite edge list (user ↔ offset+props.k) —
    * the session-shared checkpointed artifact (kept as a named alias
    * because KCoreSpec / DegreeDistSentenceSpec recount through it). */
  private[graft] def signupEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = graft.identity.GraphArtifacts.und(s, dir)

  private val graphKcore = Q(
    "graph_kcore",
    (s, dir) => {
      // the base edge list is the SHARED artifact — never unpersist it;
      // per-round peeled lists are this query's own checkpoints and are
      // released as soon as superseded
      val base = signupEdges(s, dir)
      var edges = base
      var nEdges = edges.count()
      var round = 0
      var converged = false
      while (!converged && round < KCoreRounds) {
        // round 0's degree frame IS the shared artifact — only peeled
        // rounds re-aggregate (they must: edges shrank)
        val deg0 =
          if (round == 0) graft.identity.GraphArtifacts.deg(s, dir)
          else edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val keep = deg0.where(col("deg") >= KCoreK)
        val next = edges
          .join(keep.select(col("src")), Seq("src"), "left_semi")
          .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint(eager = true)
        val n = next.count()
        converged = n == nEdges
        if (edges ne base) graft.identity.Components.unpersistCheckpoint(edges)
        edges = next
        nEdges = n
        round += 1
      }
      // every node reports: full degree, in-core degree, membership flag —
      // a membership-only output is vacuously empty when the whole graph
      // peels away (the sf0.001 10-core), which hides the result shape
      val core = edges.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
        .select(col("src").as("node"), col("core_deg"))
      graft.identity.GraphArtifacts.deg(s, dir)
        .select(col("src").as("node"), col("deg"))
        .join(core, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("core_deg"), lit(0L)).as("core_deg"),
          col("core_deg").isNotNull.as("in_core"))
    },
    Some {
      // MATERIALIZED is load-bearing: every stage references its
      // predecessor three times, and DuckDB's default CTE inlining would
      // re-evaluate the whole chain exponentially (3^8 base scans — the
      // un-hinted form runs for minutes; materialized it's milliseconds)
      val peel = (1 to KCoreRounds).map { i =>
        s"""n$i AS MATERIALIZED (SELECT src AS node FROM e${i - 1}
                    GROUP BY src HAVING count(*) >= $KCoreK),
            e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
                    JOIN n$i a ON a.node = e.src
                    JOIN n$i b ON b.node = e.dst)"""
      }.mkString(",\n")
      s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
          e0 AS MATERIALIZED (SELECT src, dst FROM fwd
                 UNION ALL SELECT dst, src FROM fwd),
          $peel,
          core AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
                   FROM e$KCoreRounds GROUP BY src),
          full0 AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                    FROM e0 GROUP BY src)
          SELECT f.node, f.deg,
            coalesce(c.core_deg, 0) AS core_deg,
            c.core_deg IS NOT NULL AS in_core
          FROM full0 f LEFT JOIN core c ON c.node = f.node"""
    })

  /** Link prediction over the RECENT co-purchase graph: for NON-adjacent
    * part pairs, common-neighbor count + Jaccard similarity (in ppm) —
    * "parts bought alongside the same partners but never together" (the
    * recommend-a-merge / recommend-a-product primitive). Two scale
    * controls, both part of the declared semantics and applied
    * identically in the oracle:
    *   1. a 12-month ship-date window — recommendation signal is
    *      recency-weighted anyway, and the window is what keeps wedge
    *      count (quadratic in degree) flat as history accumulates: the
    *      full-history graph densifies forever, the trailing-window
    *      graph does not. The predicate pushes to the parquet scan.
    *   2. EXCLUDE hub middles (degree > cap) — a hub being a shared
    *      neighbor carries ~no signal (Adamic-Adar weights it ~1/log deg
    *      for the same reason), and the cap bounds the wedge join at
    *      cap·2m edges-out regardless of skew.
    * Top-20 via TakeOrderedAndProject (per-partition partial top-k),
    * full tie-break (cn, jaccard_ppm, u, v) — no global sort, no rank
    * window.
    */
  private val CnHubCap = 128L
  private val CnWindow = "l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' " +
    "AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"

  // pairs + deg are checkpointed (released on eviction); capped derives
  // from them, so its entry in the release list is a documented no-op.
  private val cnGraphCache =
    new SessionCache[(DataFrame, DataFrame, DataFrame)](v => Seq(v._1, v._2))
  private val cnGraphBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** How many times the link-prediction graph has been built this JVM —
    * pinned by PlanSpec: running graph_common_neighbors AND
    * graph_adamic_adar must build it once. */
  private[graft] def cnGraphBuildCount: Int = cnGraphBuilds.get()

  /** The windowed co-purchase link-prediction graph — (pairs, deg,
    * capped adjacency), computed ONCE per (session, corpus) and shared
    * by graph_common_neighbors and graph_adamic_adar (the coClosure
    * discipline: both need exactly this derivation, and the fact-table
    * self-join is its dominant cost). pairs and deg are checkpointed;
    * capped re-derives from them per consumer (two cheap scans of the
    * materialized frames). Same stopped-session eviction contract as
    * the sibling caches. */
  private[graft] def cnGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame, DataFrame) = {
    cnGraphCache.getOrBuild(s, dir) {
      cnGraphBuilds.incrementAndGet()
      val li = Tables.lineitem(s, dir).where(expr(CnWindow))
        .select(col("l_orderkey"), col("l_partkey"))
      // the pair list feeds adjacency (×2 directions), degrees, and the
      // final anti-join — build the fact-table self-join ONCE
      val pairs = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
        .distinct()
        .localCheckpoint(eager = true)
      val und = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = true) // hub filter + u-score + v-score
      val capped = und.join(
        deg.where(col("deg") <= CnHubCap).select(col("src")),
        Seq("src"), "left_semi")
      (pairs, deg, capped)
    }
  }

  // Parquet persistence for the link-prediction graph — the
  // ArtifactStore contract the other four families follow (capped
  // re-derives from the two persisted frames, so only pairs + deg land
  // on disk). Fingerprinted over lineitem, the one source table.
  private def cnGraphFingerprint(s: org.apache.spark.sql.SparkSession,
      corpusDir: String): String =
    TableFingerprint.of(s, s"$corpusDir/lineitem.parquet")

  private[graft] def cnGraphPersistTo(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Unit = {
    val (pairs, deg, _) = cnGraph(s, corpusDir)
    ArtifactStore.writeSnapshot(s, artifactDir,
      cnGraphFingerprint(s, corpusDir),
      Seq("cn_pairs" -> pairs, "cn_deg" -> deg))
  }

  private[graft] def cnGraphLoadFrom(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Boolean =
    ArtifactStore.loadSnapshot(s, artifactDir,
      cnGraphFingerprint(s, corpusDir), Seq("cn_pairs", "cn_deg")) match {
      case Some(m) =>
        val pairs = m("cn_pairs")
        val deg = m("cn_deg")
        val und = pairs.select(col("a").as("src"), col("b").as("dst"))
          .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        val capped = und.join(
          deg.where(col("deg") <= CnHubCap).select(col("src")),
          Seq("src"), "left_semi")
        cnGraphCache.put(s, corpusDir, (pairs, deg, capped))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  private[graft] def cnGraphEnsure(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Boolean = {
    val hit = cnGraphLoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      cnGraphCache.remove(s, corpusDir) // stale snapshot ≠ fresh cache
      cnGraphPersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  /** Drop the cached link-prediction graph (Bench's isolated
    * re-measure pass; block reclamation follows the coClosure
    * ContextCleaner path). */
  private[graft] def cnGraphInvalidate(): Unit = cnGraphCache.invalidate()

  /** Oracle CTE chain for [[cnGraph]] (li → pairs → und → deg → capped)
    * — one definition spliced into both consumers' oracles so the
    * window/cap semantics can only change in lockstep. */
  private def cnGraphOracle: String =
    s"""li AS MATERIALIZED (
          SELECT l_orderkey, l_partkey FROM lineitem WHERE $CnWindow),
        pairs AS MATERIALIZED (
          SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
          FROM li x JOIN li y
            ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
        und AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs),
        deg AS MATERIALIZED (
          SELECT src, CAST(count(*) AS BIGINT) AS deg
          FROM und GROUP BY src),
        capped AS MATERIALIZED (
          SELECT u.src, u.dst FROM und u
          JOIN deg d ON d.src = u.src AND d.deg <= $CnHubCap)"""

  private val graphCommonNeighbors = Q(
    "graph_common_neighbors",
    (s, dir) => {
      val (pairs, deg, capped) = cnGraph(s, dir)
      val cn = capped.as("e1").join(capped.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
        .groupBy(col("e1.dst").as("u"), col("e2.dst").as("v"))
        .agg(count(lit(1)).as("cn"))
      cn.join(pairs.select(col("a").as("u"), col("b").as("v")),
          Seq("u", "v"), "left_anti")
        .join(deg.select(col("src").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("src").as("v"), col("deg").as("dv")), Seq("v"))
        .select(col("u"), col("v"), col("cn"),
          expr("cn * 1000000 div (du + dv - cn)").as("jaccard_ppm"))
        .orderBy(col("cn").desc, col("jaccard_ppm").desc, col("u"), col("v"))
        .limit(20)
    },
    Some(s"""WITH $cnGraphOracle,
            c AS (
              SELECT e1.dst AS u, e2.dst AS v, CAST(count(*) AS BIGINT) AS cn
              FROM capped e1 JOIN capped e2
                ON e1.src = e2.src AND e1.dst < e2.dst
              GROUP BY e1.dst, e2.dst),
            nonadj AS (
              SELECT c.u, c.v, c.cn FROM c
              WHERE NOT EXISTS (SELECT 1 FROM pairs p
                                WHERE p.a = c.u AND p.b = c.v))
            SELECT n.u, n.v, n.cn,
              CAST(n.cn * 1000000 // (du.deg + dv.deg - n.cn) AS BIGINT)
                AS jaccard_ppm
            FROM nonadj n
            JOIN deg du ON du.src = n.u
            JOIN deg dv ON dv.src = n.v
            ORDER BY n.cn DESC, jaccard_ppm DESC, n.u, n.v
            LIMIT 20"""))

  // Adamic-Adar link prediction (Adamic & Adar 2003) over the SAME
  // windowed co-purchase graph graph_common_neighbors audits — the
  // weighted refinement of its raw count: each shared neighbor z
  // contributes 1/ln(deg z), so a niche shared partner carries more
  // signal than a popular one (the principle the hub CAP applies as a
  // hard cutoff, here applied smoothly below the cap). The per-wedge
  // term quantizes ONE double to micro units at the wedge row (§7.4.1
  // per-row rule — deg z ≥ 2 for any shared neighbor, so ln > 0), then
  // exact BIGINT sums; the wedge join, anti-join, and top-k run on the
  // shared cnGraph artifact (built once per session/corpus — the
  // coClosure discipline), so this query's marginal cost is one wedge
  // aggregate + TakeOrderedAndProject. Full (aa desc, u, v) tie-break.
  private val graphAdamicAdar = Q(
    "graph_adamic_adar",
    (s, dir) => {
      val (pairs, deg, capped) = cnGraph(s, dir)
      val wedges = capped.as("e1").join(capped.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
        .select(col("e1.src").as("z"), col("e1.dst").as("u"),
          col("e2.dst").as("v"))
        .join(deg.select(col("src").as("z"), col("deg").as("dz")), Seq("z"))
      wedges
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("cn"),
          sum(expr(
            "CAST(round(1000000.0 / ln(CAST(dz AS DOUBLE)), 0) AS BIGINT)"))
            .as("aa_micro"))
        .join(pairs.select(col("a").as("u"), col("b").as("v")),
          Seq("u", "v"), "left_anti")
        .orderBy(col("aa_micro").desc, col("u"), col("v"))
        .limit(20)
    },
    Some(s"""WITH $cnGraphOracle,
            w AS (
              SELECT e1.dst AS u, e2.dst AS v,
                CAST(count(*) AS BIGINT) AS cn,
                CAST(sum(CAST(round(1000000.0 / ln(CAST(d.deg AS DOUBLE)), 0)
                  AS BIGINT)) AS BIGINT) AS aa_micro
              FROM capped e1
              JOIN capped e2 ON e1.src = e2.src AND e1.dst < e2.dst
              JOIN deg d ON d.src = e1.src
              GROUP BY e1.dst, e2.dst)
            SELECT u, v, cn, aa_micro FROM w
            WHERE NOT EXISTS (SELECT 1 FROM pairs p
                              WHERE p.a = w.u AND p.b = w.v)
            ORDER BY aa_micro DESC, u, v
            LIMIT 20"""))

  // BPE-dropout encode (Provilkov et al., ACL 2020) — the subword
  // regularizer: during encoding each learned merge is stochastically
  // skipped, so a word sees multiple segmentations across epochs and the
  // model learns compositional subwords instead of memorizing one
  // segmentation per word. The paper drops per merge OCCURRENCE; this
  // engine's deterministic variant drops per (word, merge) via the
  // PortableHash uniform at rate ~10% (u16 < 6554/65536) — coarser but
  // seeded, so the oracle hash-matches and a training run is exactly
  // reproducible (swap the seed derivation for an epoch-keyed PRF to get
  // the paper's per-epoch resampling, changing nothing structural).
  // Readout: per doc the baseline and dropout token counts side by side
  // — dropout splits in AGGREGATE (the regularization price the spec
  // pins at corpus level; per word it is NOT an invariant, since a
  // skipped high-rank merge can free characters for a lower-rank
  // overlapping merge to join more pairs — "baba" under merges ab,ba).
  // Work rides the SAME vocab artifact and driver-bounded
  // 20-merge list as bpe_encode; the conditional replace is per-row
  // codegen over the vocab frame.
  private[queries] def bpeApplyDropout(vocab: DataFrame,
      merges: Seq[String]): DataFrame =
    merges.foldLeft(vocab.select(col("w"),
      concat(lit(" "), expr("regexp_replace(w, '(.)', '$1 ')")).as("s"))) { (df, m) =>
      val u16 = PortableHash.md5Hex4(s"concat(w, '|$m')")
      df.withColumn("s", expr(
        s"""CASE WHEN ($u16) < 6554 THEN s
            ELSE replace(s, ' ${m.charAt(0)} ${m.charAt(1)} ', ' $m ') END"""))
    }.select(col("w"), expr("filter(split(trim(s), ' '), t -> t <> '')").as("toks"))

  private val bpeEncodeDropout = Q(
    "bpe_encode_dropout",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val wc = graft.text.TextArtifacts.wordCounts(s, dir)
        .select(col("doc_id"), col("token").as("w"), col("cnt"))
      val vocab = graft.text.TextArtifacts.vocab(s, dir)
        .select(col("token").as("w"), col("freq"))
      val merges = bpeMerges(vocab) // the bpe_encode table, one definition
      val base = bpeApply(vocab, merges)
        .select(col("w"), size(col("toks")).cast("long").as("ntok"))
      val drop = bpeApplyDropout(vocab, merges)
        .select(col("w"), size(col("toks")).cast("long").as("ndrop"))
      wc.join(base, "w").join(drop, "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("ntok")).as("n_bpe_tokens"),
          sum(col("cnt") * col("ndrop")).as("n_drop_tokens"))
        .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
          col("n_drop_tokens"),
          expr("(n_bpe_tokens * 1000000) div n_words").as("fertility_ppm"),
          expr("(n_drop_tokens * 1000000) div n_words").as("drop_fertility_ppm"))
    },
    Some {
      val u16 = PortableHash.md5Hex4("w || '|' || m.pair")
      s"""WITH RECURSIVE $bpeMergesOracle,
          enc AS (
            SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, 0 AS step
            FROM vocab
            UNION ALL
            SELECT e.w,
              CASE WHEN ($u16) < 6554 THEN e.s
              ELSE replace(e.s,
                ' ' || substr(m.pair, 1, 1) || ' ' || substr(m.pair, 2, 1) || ' ',
                ' ' || m.pair || ' ') END,
              e.step + 1
            FROM enc e JOIN merges m ON m.rk = e.step + 1),
          encb AS (
            SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, 0 AS step
            FROM vocab
            UNION ALL
            SELECT e.w,
              replace(e.s,
                ' ' || substr(m.pair, 1, 1) || ' ' || substr(m.pair, 2, 1) || ' ',
                ' ' || m.pair || ' '),
              e.step + 1
            FROM encb e JOIN merges m ON m.rk = e.step + 1),
          ndrop AS (
            SELECT w, CAST(len(list_filter(string_split(trim(s), ' '),
              t -> t <> '')) AS BIGINT) AS ndrop
            FROM enc WHERE step = 20),
          nbase AS (
            SELECT w, CAST(len(list_filter(string_split(trim(s), ' '),
              t -> t <> '')) AS BIGINT) AS ntok
            FROM encb WHERE step = 20)
          SELECT wc.doc_id, CAST(sum(wc.cnt) AS BIGINT) AS n_words,
            CAST(sum(wc.cnt * nb.ntok) AS BIGINT) AS n_bpe_tokens,
            CAST(sum(wc.cnt * nd.ndrop) AS BIGINT) AS n_drop_tokens,
            CAST(sum(wc.cnt * nb.ntok) * 1000000 // sum(wc.cnt) AS BIGINT)
              AS fertility_ppm,
            CAST(sum(wc.cnt * nd.ndrop) * 1000000 // sum(wc.cnt) AS BIGINT)
              AS drop_fertility_ppm
          FROM wc
          JOIN nbase nb ON nb.w = wc.w
          JOIN ndrop nd ON nd.w = wc.w
          GROUP BY wc.doc_id"""
    })

  /** Newman modularity readout of the LPA communities — the quality score
    * community detection is judged by (Q = Σ_c [e_c/m − (d_c/2m)²]):
    * per community its node count, degree mass d_c, internal edge count
    * e_c, and the GLOBAL modularity as an exact integer fraction
    * q_num/q_den = Σ_c(4·m·e_c − d_c²) / 4m² — emitting numerator and
    * denominator separately keeps the whole query division-free, which
    * sidesteps the one true cross-engine hazard here (Spark `div`
    * truncates toward zero, DuckDB `//` floors — they disagree on
    * NEGATIVE quotients, and modularity can be negative).
    *
    * Scale shape: e_c is the one-direction edge list joined to labels on
    * both endpoints (node-keyed shuffles); d_c is a degree aggregate
    * joined to labels; the community rollup is label-keyed partial
    * aggregation and the global total is one scalar broadcast back.
    * BIGINT bound: |4·m·e_c| ≤ 4m², so the numerator stays exact while
    * 2m < ~2×10⁹ edges per graph — beyond that, promote to DECIMAL(38).
    */
  private val graphModularity = Q(
    "graph_modularity",
    (s, dir) => {
      val (fwd, und, rawLabels) = lpaPieces(s, dir)
      val labels = rawLabels.localCheckpoint(eager = true) // 3 consumers
      val m = fwd.count()
      val eIn = fwd
        .join(labels.select(col("node").as("src"), col("label").as("la")), "src")
        .join(labels.select(col("node").as("dst"), col("label").as("lb")), "dst")
        .where(col("la") === col("lb"))
        .groupBy(col("la")).agg(count(lit(1)).as("e_in"))
        .select(col("la").as("label"), col("e_in"))
      val stats = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .join(labels, col("src") === col("node"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_sum"))
      val co = stats.join(eIn, Seq("label"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .withColumn("num",
          lit(4L) * lit(m) * col("e_in") - col("d_sum") * col("d_sum"))
      val tot = co.agg(sum(col("num")).as("q_num"))
      co.crossJoin(broadcast(tot))
        .select(col("label"), col("n_nodes"), col("d_sum"), col("e_in"),
          col("q_num"), lit(4L * m * m).as("q_den"))
    },
    Some(s"""WITH $lpaOracleCte,
            mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM fwd),
            ein AS (
              SELECT la.label, CAST(count(*) AS BIGINT) AS e_in
              FROM fwd
              JOIN v2 la ON la.node = fwd.src
              JOIN v2 lb ON lb.node = fwd.dst
              WHERE la.label = lb.label
              GROUP BY la.label),
            st AS (
              SELECT v2.label, CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(sum(d.deg) AS BIGINT) AS d_sum
              FROM (SELECT src, CAST(count(*) AS BIGINT) AS deg
                    FROM und GROUP BY src) d
              JOIN v2 ON v2.node = d.src
              GROUP BY v2.label),
            co AS (
              SELECT st.label, st.n_nodes, st.d_sum,
                coalesce(ein.e_in, 0) AS e_in,
                4 * mm.m * coalesce(ein.e_in, 0) - st.d_sum * st.d_sum AS num
              FROM st LEFT JOIN ein USING (label), mm),
            tot AS (SELECT CAST(sum(num) AS BIGINT) AS q_num FROM co)
            SELECT co.label, co.n_nodes, co.d_sum, co.e_in,
              tot.q_num, CAST(4 * mm.m * mm.m AS BIGINT) AS q_den
            FROM co, tot, mm"""))

  /** Degree assortativity (Newman's r) of the signup graph — do
    * high-degree nodes attach to other hubs (r > 0, social-graph-like) or
    * to leaves (r < 0, bipartite/hub-and-spoke like this one)? The
    * graph-health readout that distinguishes organic linking from
    * spam-farm stars. Pearson correlation of (deg_u, deg_v) over the
    * DIRECTED edge list (both directions — the standard symmetric form,
    * so the u- and v-moment sums coincide).
    *
    * Scale shape: one degree aggregate, two node-keyed joins decorating
    * the edge list, one scalar moment aggregate — every sum exact BIGINT
    * (bounded by m·maxdeg², safe to ~10⁹ edges here). The correlation's
    * sqrt forces ONE double expression, floored to micro units — both
    * engines floor the same correctly-rounded value (§7.4.1); the moment
    * sums ship alongside so the exact-integer part is fully auditable.
    */
  private val graphAssortativity = Q(
    "graph_assortativity",
    (s, dir) => {
      // shared checkpointed artifacts; deg decorates both endpoints
      val und = graft.identity.GraphArtifacts.und(s, dir)
      val deg = graft.identity.GraphArtifacts.deg(s, dir)
      und
        .join(deg.select(col("src"), col("deg").as("du")), "src")
        .join(deg.select(col("src").as("dst"), col("deg").as("dv")), "dst")
        .agg(count(lit(1)).as("m"),
          sum(col("du") * col("dv")).as("s_uv"),
          sum(col("du")).as("s_u"),
          sum(expr("du * du")).as("s_uu"))
        .select(col("m"), col("s_uv"), col("s_u"), col("s_uu"),
          expr("""CAST(floor(
                    (CAST(m AS DOUBLE) * CAST(s_uv AS DOUBLE)
                      - CAST(s_u AS DOUBLE) * CAST(s_u AS DOUBLE))
                    / nullif(CAST(m AS DOUBLE) * CAST(s_uu AS DOUBLE)
                      - CAST(s_u AS DOUBLE) * CAST(s_u AS DOUBLE), 0.0)
                    * 1000000.0) AS BIGINT)""").as("assort_micro"))
    },
    Some(s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
            ${graft.identity.GraphArtifacts.undOracle},
            ${graft.identity.GraphArtifacts.degOracle},
            mom AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                CAST(sum(a.deg * b.deg) AS BIGINT) AS s_uv,
                CAST(sum(a.deg) AS BIGINT) AS s_u,
                CAST(sum(a.deg * a.deg) AS BIGINT) AS s_uu
              FROM und e JOIN deg a ON a.src = e.src
                         JOIN deg b ON b.src = e.dst)
            SELECT m, s_uv, s_u, s_uu,
              CAST(floor(
                (CAST(m AS DOUBLE) * CAST(s_uv AS DOUBLE)
                  - CAST(s_u AS DOUBLE) * CAST(s_u AS DOUBLE))
                / nullif(CAST(m AS DOUBLE) * CAST(s_uu AS DOUBLE)
                  - CAST(s_u AS DOUBLE) * CAST(s_u AS DOUBLE), 0.0)
                * 1000000.0) AS BIGINT) AS assort_micro
            FROM mom"""))

  /** Degree distribution + CCDF of the signup graph — the power-law
    * diagnostic every graph-quality audit starts from (a heavy tail that
    * suddenly fattens means bot rings or scraper farms joined the
    * identity graph; the CCDF column is what gets plotted on log-log
    * axes). Reference analogue: the per-key cardinality profiling the
    * reference's schema pass does per table
    * (/root/reference/src/KissmetricsToDatabase.php:238-258), lifted to
    * the graph domain.
    *
    * Scale shape: one edge-keyed degree aggregate (the only
    * corpus-sized shuffle), then a |distinct degrees|-sized frequency
    * table — hundreds of rows even at 10⁹ nodes, so the unpartitioned
    * CCDF window and the broadcast scalar total are driver-trivial by
    * construction (the trained-centroid pattern: big → tiny → window
    * the tiny). Integer-exact output: counts are BIGINT, the CCDF is a
    * floor-divided ppm of two exact integers — no doubles anywhere.
    */
  private val graphDegreeDist = Q(
    "graph_degree_dist",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val deg = graft.identity.GraphArtifacts.deg(s, dir)
      val dist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .localCheckpoint(eager = true) // feeds the total AND the window
      // deg is distinct post-groupBy: the desc window has no ties, and
      // the default RANGE UNBOUNDED PRECEDING..CURRENT ROW frame is the
      // same on both engines.
      dist
        .crossJoin(broadcast(dist.agg(sum(col("n_nodes")).as("n_total"))))
        .withColumn("n_ge",
          sum(col("n_nodes")).over(Window.orderBy(col("deg").desc)))
        .select(col("deg"), col("n_nodes"),
          expr("(n_ge * 1000000) div n_total").as("ccdf_ppm"))
    },
    Some(s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
            ${graft.identity.GraphArtifacts.undOracle},
            ${graft.identity.GraphArtifacts.degOracle},
            dist AS (SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
                     FROM deg GROUP BY deg),
            tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM dist)
            SELECT deg, n_nodes,
              (CAST(sum(n_nodes) OVER (ORDER BY deg DESC) AS BIGINT)
                * 1000000) // n_total AS ccdf_ppm
            FROM dist, tot"""))

  /** Iterated BPE merge LEARNING (VERDICT r05 #6) — the loop real
    * tokenizer training runs, distributed: pick the most frequent
    * adjacent symbol pair, merge it everywhere, recount, repeat.
    * `bpe_merge_topk` is one round's count; `bpe_encode` applies a
    * fixed table; this learns the table — and iteration order MATTERS
    * (after merging "th", "he" loses every "the" occurrence, so round 2
    * picks a genuinely different pair than round 1's runner-up).
    *
    * Scale shape: every round is ONE explode+aggregate over the
    * DISTINCT-WORD frame (vocabulary-sized — the bpe_merge_topk
    * factoring: pair count per word × word frequency) plus a 1-row
    * collect of the winner; work is bounded by merges × vocab, never
    * corpus-sized, and each round's re-encoded vocab is checkpointed
    * with the superseded round released (the k-core peel discipline).
    * Ties break (count desc, pair text) — deterministic on both engines.
    *
    * Oracle: the identical loop unrolled as chained MATERIALIZED stage
    * triples (pairs → 1-row winner → re-encoded vocab), the bpe_encode /
    * graph_kcore pattern; `replace` is left-to-right non-overlapping on
    * both engines (bpe_encode's documented stance). BpeTrainSpec pins
    * the merge table against an independent in-memory trainer.
    */
  private val BpeTrainMerges = 10

  /** One merge round's pair counts over an encoded vocab `(w, freq, s)`:
    * adjacent SYMBOL pairs (symbols are multi-char after earlier merges,
    * so pair text is space-separated, e.g. "th e"), weighted by word
    * frequency. Shared with BpeTrainSpec's independent recount. */
  private[queries] def bpePairCounts(enc: DataFrame): DataFrame =
    enc.select(col("freq"),
        expr("filter(split(trim(s), ' '), t -> t <> '')").as("syms"))
      .select(col("freq"), explode(expr(
        """CASE WHEN size(syms) < 2 THEN array()
           ELSE transform(sequence(1, size(syms) - 1),
             i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))
           END""")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))

  /** The iterated merge-learning loop over an encoded vocab frame —
    * shared by `bpe_train` and BpeTrainSpec's negative test. `merges` is
    * capped (VERDICT r06 task 6): each round localCheckpoints a
    * vocab-sized frame and appends one driver row, so a mis-sized merge
    * budget would grind the block manager and the driver for hours
    * before failing — bound it loudly up front instead. */
  private[queries] def bpeLearnMerges(enc0: DataFrame, merges: Int)
      : Seq[(Long, String, Long)] = {
    require(merges >= 1 && merges <= 4096,
      s"bpe_train merge budget $merges outside (0, 4096] — one checkpointed " +
        "vocab frame and one driver round per merge; a budget past real " +
        "tokenizer vocab sizes is a mis-set knob, not a workload")
    var enc = enc0
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = bpePairCounts(enc)
        .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        learned += ((r.toLong, pair, cnt))
        // pair is [a-z ]+ by construction (word_ngrams tokens) — safe
        // to inline in the replace literal
        val merged = pair.replace(" ", "")
        val next = enc.withColumn("s",
            expr(s"replace(s, ' $pair ', ' $merged ')"))
          .localCheckpoint(eager = true)
        graft.identity.Components.unpersistCheckpoint(enc)
        enc = next
        r += 1
      }
    }
    graft.identity.Components.unpersistCheckpoint(enc)
    learned.toSeq
  }

  private val bpeTrain = Q(
    "bpe_train",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val vocab = graft.text.TextArtifacts.vocab(s, dir)
        .select(col("token").as("w"), col("freq"))
      val enc = vocab.select(col("w"), col("freq"),
        concat(lit(" "), expr("regexp_replace(w, '(.)', '$1 ')")).as("s"))
        .localCheckpoint(eager = true)
      import s.implicits._
      bpeLearnMerges(enc, BpeTrainMerges).toDF("rk", "pair", "cnt")
    },
    Some {
      val stages = (1 to BpeTrainMerges).map { r =>
        s"""p$r AS (
             SELECT syms[i] || ' ' || syms[i + 1] AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM (SELECT freq, list_filter(string_split(trim(s), ' '),
                     t -> t <> '') AS syms FROM enc${r - 1}),
                  unnest(range(1, len(syms))) AS u(i)
             GROUP BY 1),
           m$r AS MATERIALIZED (
             SELECT CAST($r AS BIGINT) AS rk, pair, cnt FROM p$r
             ORDER BY cnt DESC, pair LIMIT 1),
           enc$r AS MATERIALIZED (
             SELECT w, freq,
               replace(e.s, ' ' || m.pair || ' ',
                 ' ' || replace(m.pair, ' ', '') || ' ') AS s
             FROM enc${r - 1} e, m$r m)"""
      }.mkString(",\n")
      val union = (1 to BpeTrainMerges)
        .map(r => s"SELECT rk, pair, cnt FROM m$r").mkString(" UNION ALL ")
      val header =
        """WITH words AS (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
             FROM documents),
           vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
                     FROM words GROUP BY w),
           enc0 AS MATERIALIZED (
             SELECT w, freq, ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s
             FROM vocab),"""
      s"""$header
          $stages
          $union"""
    })

  /** WordPiece merge rounds over an encoded vocab frame — the
    * [[bpeLearnMerges]] loop with the LIKELIHOOD-RATIO objective: each
    * round merges the pair maximizing cnt(ab)/(cnt(a)·cnt(b)) (the
    * pair whose merge most increases corpus likelihood under a unigram
    * symbol model — Schuster & Nakajima 2012, the BERT trainer), not
    * the raw count BPE greedily takes. Scores are integer nano-units
    * (cnt·10⁹ div (c_l·c_r)) with (score desc, pair) tie-break; ANSI
    * mode makes a c_l·c_r overflow (corpus past ~3·10⁹ symbol
    * occurrences) fail loudly — the declared scale path is a
    * DECIMAL(38) score, not silence. Shares [[bpePairCounts]] and the
    * checkpoint-release discipline; same 4096 merge-budget cap. */
  private[queries] def wordpieceLearnMerges(enc0: DataFrame, merges: Int)
      : Seq[(Long, String, Long, Long)] = {
    require(merges >= 1 && merges <= 4096,
      s"tokenizer_wordpiece merge budget $merges outside (0, 4096] — one " +
        "checkpointed vocab frame and one driver round per merge")
    var enc = enc0
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val syms = enc
        .select(col("freq"),
          explode(expr("filter(split(trim(s), ' '), t -> t <> '')")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("c"))
      val top = bpePairCounts(enc)
        .withColumn("l", expr("split(pair, ' ')[0]"))
        .withColumn("r", expr("split(pair, ' ')[1]"))
        .join(syms.select(col("sym").as("l"), col("c").as("cl")), "l")
        .join(syms.select(col("sym").as("r"), col("c").as("cr")), "r")
        .select(col("pair"), col("cnt"),
          expr("cnt * 1000000000L div (cl * cr)").as("score"))
        .orderBy(col("score").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getAs[String]("pair")
        learned += ((r.toLong, pair, top(0).getAs[Long]("cnt"),
          top(0).getAs[Long]("score")))
        val merged = pair.replace(" ", "")
        val next = enc.withColumn("s",
            expr(s"replace(s, ' $pair ', ' $merged ')"))
          .localCheckpoint(eager = true)
        graft.identity.Components.unpersistCheckpoint(enc)
        enc = next
        r += 1
      }
    }
    graft.identity.Components.unpersistCheckpoint(enc)
    learned.toSeq
  }

  private val WordpieceMerges = 8

  /** WordPiece tokenizer training — the third member of the subword
    * family (bpe_train = greedy count, tokenizer_unigram = EM pruning,
    * this = likelihood-ratio merging): per round ONE pair aggregate +
    * ONE symbol aggregate over the vocabulary frame, a 1-row winner
    * collect, re-encode, repeat ×8 — corpus appears only through the
    * shared vocab artifact, work bounded by merges × vocab. The
    * likelihood objective is what separates it from BPE observably: a
    * frequent pair of two very frequent symbols (e.g. "e t") loses to a
    * rarer pair of rare symbols, so the learned tables diverge on real
    * corpora (WordpieceSpec pins the divergence and an independent
    * in-memory trainer equality). Oracle: the identical loop unrolled
    * as MATERIALIZED stage quadruples (pairs → symbol counts → scored
    * 1-row winner → re-encoded vocab), the bpe_train pattern. */
  private val tokenizerWordpiece = Q(
    "tokenizer_wordpiece",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val vocab = graft.text.TextArtifacts.vocab(s, dir)
        .select(col("token").as("w"), col("freq"))
      val enc = vocab.select(col("w"), col("freq"),
        concat(lit(" "), expr("regexp_replace(w, '(.)', '$1 ')")).as("s"))
        .localCheckpoint(eager = true)
      import s.implicits._
      wordpieceLearnMerges(enc, WordpieceMerges)
        .toDF("rk", "pair", "cnt", "score")
    },
    Some {
      val stages = (1 to WordpieceMerges).map { r =>
        s"""p$r AS (
             SELECT syms[i] || ' ' || syms[i + 1] AS pair,
                    CAST(sum(freq) AS BIGINT) AS cnt
             FROM (SELECT freq, list_filter(string_split(trim(s), ' '),
                     t -> t <> '') AS syms FROM enc${r - 1}),
                  unnest(range(1, len(syms))) AS u(i)
             GROUP BY 1),
           sy$r AS (
             SELECT sym, CAST(sum(freq) AS BIGINT) AS c
             FROM (SELECT freq, list_filter(string_split(trim(s), ' '),
                     t -> t <> '') AS syms FROM enc${r - 1}),
                  unnest(syms) AS u(sym)
             GROUP BY sym),
           m$r AS MATERIALIZED (
             SELECT CAST($r AS BIGINT) AS rk, pair, cnt,
               CAST(cnt * 1000000000 // (sl.c * sr.c) AS BIGINT) AS score
             FROM p$r
             JOIN sy$r sl ON sl.sym = string_split(pair, ' ')[1]
             JOIN sy$r sr ON sr.sym = string_split(pair, ' ')[2]
             ORDER BY score DESC, pair LIMIT 1),
           enc$r AS MATERIALIZED (
             SELECT w, freq,
               replace(e.s, ' ' || m.pair || ' ',
                 ' ' || replace(m.pair, ' ', '') || ' ') AS s
             FROM enc${r - 1} e, m$r m)"""
      }.mkString(",\n")
      val union = (1 to WordpieceMerges)
        .map(r => s"SELECT rk, pair, cnt, score FROM m$r").mkString(" UNION ALL ")
      val header =
        """WITH words AS (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
             FROM documents),
           vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
                     FROM words GROUP BY w),
           enc0 AS MATERIALIZED (
             SELECT w, freq, ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS s
             FROM vocab),"""
      s"""$header
          $stages
          $union"""
    })

  /** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece model) —
    * one full EM round, distributed: seed a piece inventory from
    * substring statistics, Viterbi-segment every vocabulary word under
    * the seed model (the E-step), and re-estimate piece probabilities
    * from the best segmentations (the M-step). The other half of the
    * subword-tokenizer family next to bpe_train's greedy merges: BPE
    * grows pieces bottom-up, unigram prunes a rich inventory by
    * likelihood — production tokenizers (T5, Llama's SentencePiece) are
    * unigram-trained.
    *
    *  - Inventory: all substrings of length ≤ 4 over the (length ≤ 20)
    *    vocabulary, seeded with freq-weighted occurrence counts; keep
    *    the top-300 by (count, piece) plus ALL single characters —
    *    singles guarantee every word stays segmentable, the standard
    *    SentencePiece closure property.
    *  - E-step: per-word Viterbi as ONE whole-stage-codegen fold —
    *    dp[i] = max over inventory substrings (j → i] of dp[j] + q — via
    *    the `aggregate` HOF over the word's candidate list (vocab-sized
    *    work: the corpus appears only through the shared vocab artifact;
    *    a word is segmented once no matter how many billion times it
    *    occurs). Backtracking recomputes each step's argmax from dp,
    *    packed into a single BIGINT ((score + 10⁹)·64 + (63 − j)) so the
    *    (max score, then longest piece) tie-break is one integer max —
    *    portable, no struct-comparison semantics in play.
    *  - M-step: explode best-path pieces weighted by word frequency,
    *    one bounded aggregate; output the learned table (top-100 by
    *    count, integer ppm).
    *
    * The DuckDB oracle replays the SAME DP as a layered recursive CTE
    * (layer k = best score over exactly-k-piece paths — the GROUP BY in
    * the recursive term keeps each layer at one row per (word, pos), so
    * the recursion is polynomial, not path-enumerating), the identical
    * packed-argmax choice table, and a recursive backtrack walk; scores
    * are integer micro-nats from the one ln() quantization both engines
    * share. UnigramTokSpec recounts the whole EM round in Scala.
    */
  private val UniMaxWordLen = 20
  private val UniMaxPieceLen = 4
  private val UniTopK = 300

  /** The length ≤ [[UniMaxWordLen]] vocabulary as (word, freq). */
  private[graft] def uniWords(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.text.TextArtifacts.vocab(s, dir)
      .where(length(col("token")) <= UniMaxWordLen)
      .select(col("token").as("word"), col("freq"))
      .localCheckpoint(eager = true) // occurrences + both M-step weights

  /** All (word, freq, j, i, sub) substring occurrences, length ≤ 4. */
  private[graft] def uniOcc(words: DataFrame): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(expr("sequence(0, CAST(length(word) AS INT) - 1)")).as("j"))
      .select(col("word"), col("freq"), col("j"),
        explode(expr(s"sequence(1, $UniMaxPieceLen)")).as("l"))
      .where(expr("j + l <= length(word)"))
      .select(col("word"), col("freq"), col("j"),
        (col("j") + col("l")).as("i"),
        expr("substring(word, j + 1, l)").as("sub"))

  /** Seed inventory scores q0: top-300 substrings by freq-weighted count
    * plus all single chars, log-prob quantized to micro-nats. */
  private[graft] def uniSeedQ(occ: DataFrame): DataFrame = {
    val cnt0 = occ.groupBy(col("sub")).agg(sum(col("freq")).as("c"))
    val v = cnt0.orderBy(col("c").desc, col("sub")).limit(UniTopK)
      .union(cnt0.where(length(col("sub")) === 1))
      .distinct()
    val tot = v.agg(sum(col("c")).as("t"))
    v.crossJoin(broadcast(tot)) // 1-row total
      .select(col("sub"), expr(
        "CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0, 0) AS BIGINT)")
        .as("q"))
  }

  /** One Viterbi E-step: best segmentation of every word under the piece
    * scores `q(sub, q)`, returned as (word, freq, piece) rows — the DP
    * fold and the packed-argmax backtrack described in the
    * tokenizer_unigram Scaladoc. */
  private[graft] def uniPieces(occ: DataFrame, q0: DataFrame): DataFrame = {
    // The q frame is inventory-bounded (≤ ~330 rows) but its SUBTREE is
    // not: round 2's scores derive from round 1's ENTIRE Viterbi E-step.
    // Both the underflow probe below and the broadcast join would each
    // evaluate that subtree — exactly the 2.28 → 4.74 s r7 regression on
    // tokenizer_unigram_r2 (VERDICT r07 task 1: the guard and the
    // doubling landed in the same commit). Checkpoint once: the probe
    // and the broadcast then read ~330 materialized rows.
    val q = q0.localCheckpoint(eager = true)
    // Packed-argmax underflow guard (ADVICE r06): the backtrack packs
    // (score + 10⁹)·64 + (63 − j) and decodes j via % 64, which silently
    // decodes garbage if any Viterbi score drops below −10⁹ micro-nats.
    // A path has ≤ UniMaxWordLen pieces, so min(q)·UniMaxWordLen bounds
    // every dp value — assert it clears the offset (free on the
    // checkpointed inventory).
    val minQRow = q.agg(min(col("q"))).head()
    val minQ = if (minQRow.isNullAt(0)) 0L else minQRow.getLong(0)
    require(minQ * UniMaxWordLen > -1000000000L,
      s"unigram packed-argmax underflow: min piece score $minQ micro-nats × " +
        s"$UniMaxWordLen-char words reaches the 10^9 packing offset — widen " +
        "the offset before trusting any backtrack")
    // per-word candidate list: inventory substrings with their spans —
    // the model side is inventory-bounded, a broadcast by construction
    val cands = occ.join(broadcast(q), "sub")
      .groupBy(col("word"), col("freq"))
      .agg(sort_array(collect_list(struct(col("i"), col("j"), col("q"))))
        .as("cands"))
    val dp = cands.withColumn("dp", expr(
      """aggregate(sequence(1, CAST(length(word) AS INT)), array(0L),
           (acc, i) -> array_append(acc,
             array_max(transform(filter(cands, c -> c.i = i),
               c -> element_at(acc, c.j + 1) + c.q))))"""))
    // backtrack: at each cursor position the argmax candidate is
    // recomputed from dp via the packed integer (no pointers carried);
    // the fold runs length(word) steps and no-ops once the cursor
    // reaches 0 (a word always segments into ≤ length pieces)
    val seg = dp.withColumn("bt", expr(
      """aggregate(sequence(1, CAST(length(word) AS INT)),
           named_struct('pos', CAST(length(word) AS INT),
                        'ps', CAST(array() AS ARRAY<STRUCT<j: INT, i: INT>>)),
           (acc, x) -> IF(acc.pos <= 0, acc,
             named_struct(
               'pos', CAST(63 - (array_max(transform(filter(cands, c -> c.i = acc.pos),
                  c -> (element_at(dp, c.j + 1) + c.q + 1000000000L) * 64
                       + CAST(63 - c.j AS BIGINT))) % 64) AS INT),
               'ps', array_append(acc.ps, named_struct(
                 'j', CAST(63 - (array_max(transform(filter(cands, c -> c.i = acc.pos),
                    c -> (element_at(dp, c.j + 1) + c.q + 1000000000L) * 64
                         + CAST(63 - c.j AS BIGINT))) % 64) AS INT),
                 'i', acc.pos)))))"""))
    seg
      .select(col("word"), col("freq"), explode(col("bt.ps")).as("p"))
      .select(col("word"), col("freq"),
        expr("substring(word, p.j + 1, p.i - p.j)").as("piece"))
  }

  /** M-step + readout: freq-weighted piece counts, top-100, integer ppm. */
  private[graft] def uniTable(pieces: DataFrame): DataFrame = {
    val m = pieces.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val tot1 = m.agg(sum(col("cnt")).as("t"))
    m.crossJoin(broadcast(tot1))
      .select(col("piece"), col("cnt"),
        expr("cnt * 1000000 div t").as("p_ppm"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(100)
  }

  /** The round-1 oracle CTE chain (words → occ → seed inventory →
    * layered-recursive DP → packed-argmax backtrack → learned counts
    * `m`) — shared by tokenizer_unigram and tokenizer_unigram_r2 so the
    * two oracles can only change in lockstep (the GraphArtifacts
    * adjacency discipline). Splice as `WITH RECURSIVE $uniOracleRound1,
    * …`. */
  private val uniOracleRound1: String =
    s"""words AS (
               SELECT word, CAST(count(*) AS BIGINT) AS freq
               FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
                       '[^a-z]+'), t -> t <> '')) AS word
                     FROM documents)
               GROUP BY word
               HAVING len(word) <= $UniMaxWordLen),
             occ AS (
               SELECT word, freq, j, j + l AS i, substr(word, j + 1, l) AS sub
               FROM (SELECT word, freq, len(word) AS n,
                       unnest(range(0, len(word))) AS j
                     FROM words)
               CROSS JOIN (SELECT unnest(range(1, ${UniMaxPieceLen + 1})) AS l)
               WHERE j + l <= n),
             cnt0 AS (
               SELECT sub, CAST(sum(freq) AS BIGINT) AS c
               FROM occ GROUP BY sub),
             v AS (
               SELECT DISTINCT sub, c FROM (
                 SELECT sub, c FROM cnt0 ORDER BY c DESC, sub LIMIT $UniTopK)
               UNION
               SELECT sub, c FROM cnt0 WHERE len(sub) = 1),
             tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
             q AS (
               SELECT sub, CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                 * 1000000.0, 0) AS BIGINT) AS q
               FROM v, tot),
             cands AS (
               SELECT o.word, o.j, o.i, q.q
               FROM occ o JOIN q ON q.sub = o.sub),
             dp AS (
               SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS score FROM words
               UNION ALL
               SELECT c.word, c.i AS pos, max(dp.score + c.q) AS score
               FROM dp JOIN cands c ON c.word = dp.word AND c.j = dp.pos
               GROUP BY c.word, c.i),
             best AS (
               SELECT word, pos, max(score) AS score
               FROM dp GROUP BY word, pos),
             choice AS (
               SELECT c.word, c.i,
                 CAST(63 - max((b.score + c.q + 1000000000) * 64 + (63 - c.j))
                   % 64 AS BIGINT) AS j
               FROM cands c JOIN best b ON b.word = c.word AND b.pos = c.j
               GROUP BY c.word, c.i),
             bt AS (
               SELECT word, CAST(len(word) AS BIGINT) AS pos,
                 CAST(NULL AS VARCHAR) AS piece
               FROM words
               UNION ALL
               SELECT bt.word, ch.j AS pos,
                 substr(bt.word, CAST(ch.j + 1 AS INT),
                   CAST(bt.pos - ch.j AS INT)) AS piece
               FROM bt JOIN choice ch
                 ON ch.word = bt.word AND ch.i = bt.pos
               WHERE bt.pos > 0),
             m AS (
               SELECT b.piece, CAST(sum(w.freq) AS BIGINT) AS cnt
               FROM bt b JOIN words w ON w.word = b.word
               WHERE b.piece IS NOT NULL
               GROUP BY b.piece)"""

  private val tokenizerUnigram = Q(
    "tokenizer_unigram",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val words = uniWords(s, dir)
      val occ = uniOcc(words)
      uniTable(uniPieces(occ, uniSeedQ(occ)))
    },
    Some(s"""WITH RECURSIVE $uniOracleRound1,
             tot1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM m)
             SELECT piece, cnt, CAST(cnt * 1000000 // t AS BIGINT) AS p_ppm
             FROM m, tot1
             ORDER BY cnt DESC, piece
             LIMIT 100"""))

  /** Second EM round — re-estimate the inventory from round 1's learned
    * counts and Viterbi-segment again: the SentencePiece training loop's
    * actual iteration step (inventory PRUNING is emergent — a multi-char
    * piece never chosen in round 1 gets no count and leaves the
    * inventory; singles are add-one smoothed so the coverage closure
    * survives pruning and every word stays segmentable). The machinery
    * is tokenizer_unigram's helpers applied once more with q1; the
    * oracle chains the ENTIRE round-1 recursive apparatus and a second
    * (dp2/choice2/bt2) copy — chained recursive CTEs, the bpe_train
    * unrolled-stage discipline one level up. UnigramTokSpec proves the
    * EM direction: the corpus Viterbi log-likelihood under q1 is at
    * least round 1's segmentation re-scored under q1.
    */
  /** Round-2 inventory scores from round 1's learned counts `m1(piece,
    * cnt)`: used multi-char pieces keep their counts (a never-chosen
    * piece leaves the inventory — SentencePiece pruning, emergent), ALL
    * single chars enter add-one smoothed so the coverage closure
    * survives and every word stays segmentable. */
  private[graft] def uniRound2Q(occ: DataFrame, m1: DataFrame): DataFrame = {
    val v2 = m1.where(length(col("piece")) > 1)
      .select(col("piece").as("sub"), col("cnt").as("c"))
      .union(occ.where(length(col("sub")) === 1).select(col("sub")).distinct()
        .join(m1.select(col("piece").as("sub"), col("cnt")), Seq("sub"), "left")
        .select(col("sub"), (coalesce(col("cnt"), lit(0L)) + 1L).as("c")))
    val tot2 = v2.agg(sum(col("c")).as("t"))
    v2.crossJoin(broadcast(tot2))
      .select(col("sub"), expr(
        "CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0, 0) AS BIGINT)")
        .as("q"))
  }

  /** The round-2 oracle CTE chain (re-estimated inventory v2/q2 → second
    * Viterbi dp2/choice2 → backtrack bt2) on top of [[uniOracleRound1]] —
    * ONE definition shared by tokenizer_unigram_r2 and
    * tokenizer_fertility, so the trained model both queries read can only
    * change in lockstep. Splice as `WITH RECURSIVE $uniOracleRound1,
    * $uniOracleRound2, …` and read `bt2` (per-word pieces). */
  private val uniOracleRound2: String =
    s"""v2 AS (
               SELECT piece AS sub, cnt AS c FROM m WHERE len(piece) > 1
               UNION ALL
               SELECT s.sub, coalesce(m2src.cnt, 0) + 1 AS c
               FROM (SELECT DISTINCT sub FROM occ WHERE len(sub) = 1) s
               LEFT JOIN m m2src ON m2src.piece = s.sub),
             tot2 AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v2),
             q2 AS (
               SELECT sub, CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                 * 1000000.0, 0) AS BIGINT) AS q
               FROM v2, tot2),
             cands2 AS (
               SELECT o.word, o.j, o.i, q2.q
               FROM occ o JOIN q2 ON q2.sub = o.sub),
             dp2 AS (
               SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS score FROM words
               UNION ALL
               SELECT c.word, c.i AS pos, max(dp2.score + c.q) AS score
               FROM dp2 JOIN cands2 c ON c.word = dp2.word AND c.j = dp2.pos
               GROUP BY c.word, c.i),
             best2 AS (
               SELECT word, pos, max(score) AS score
               FROM dp2 GROUP BY word, pos),
             choice2 AS (
               SELECT c.word, c.i,
                 CAST(63 - max((b.score + c.q + 1000000000) * 64 + (63 - c.j))
                   % 64 AS BIGINT) AS j
               FROM cands2 c JOIN best2 b ON b.word = c.word AND b.pos = c.j
               GROUP BY c.word, c.i),
             bt2 AS (
               SELECT word, CAST(len(word) AS BIGINT) AS pos,
                 CAST(NULL AS VARCHAR) AS piece
               FROM words
               UNION ALL
               SELECT bt2.word, ch.j AS pos,
                 substr(bt2.word, CAST(ch.j + 1 AS INT),
                   CAST(bt2.pos - ch.j AS INT)) AS piece
               FROM bt2 JOIN choice2 ch
                 ON ch.word = bt2.word AND ch.i = bt2.pos
               WHERE bt2.pos > 0)"""

  private val uniR2Cache = new SessionCache[DataFrame](Seq(_))
  private val uniR2Builds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** How many times the trained unigram segmentation has been derived
    * this JVM — pinned by PlanSpec: running tokenizer_unigram_r2 AND
    * tokenizer_fertility must train it once. */
  private[graft] def uniRound2BuildCount: Int = uniR2Builds.get()

  /** Round-2 (trained-model) segmentation of every vocabulary word —
    * (word, freq, piece) rows; the shared Spark twin of
    * [[uniOracleRound2]], consumed by tokenizer_unigram_r2 (M-step
    * readout) and tokenizer_fertility (per-word piece counts).
    *
    * SESSION ARTIFACT (VERDICT r08 task 6): the two-round EM train
    * (seed quantize → Viterbi → re-estimate → Viterbi) is the pair's
    * dominant shared cost (~6 s isolated at sf0.1) and is vocab-sized —
    * the TRAIN side of a train→apply split, built once per corpus
    * snapshot in production. Bench pre-builds and attributes it as
    * `uni_round2`; parquet persist/ensure keys on the documents
    * fingerprint. */
  private[graft] def uniRound2Pieces(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    uniR2Cache.getOrBuild(s, dir) {
      uniR2Builds.incrementAndGet()
      graft.functions.GraftFunctions.register(s)
      val words = uniWords(s, dir)
      val occ = uniOcc(words).localCheckpoint(eager = true) // both rounds
      val m1 = uniPieces(occ, uniSeedQ(occ))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      uniPieces(occ, uniRound2Q(occ, m1)).localCheckpoint(eager = true)
    }

  /** Drop the cached trained segmentation (Bench isolated re-measure). */
  private[graft] def uniRound2Invalidate(): Unit = uniR2Cache.invalidate()

  private def uniRound2Fingerprint(s: org.apache.spark.sql.SparkSession,
      corpusDir: String): String =
    TableFingerprint.of(s, s"$corpusDir/documents.parquet")

  private[graft] def uniRound2PersistTo(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Unit =
    ArtifactStore.writeSnapshot(s, artifactDir,
      uniRound2Fingerprint(s, corpusDir),
      Seq("uni_round2_pieces" -> uniRound2Pieces(s, corpusDir)))

  private[graft] def uniRound2LoadFrom(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Boolean =
    ArtifactStore.loadSnapshot(s, artifactDir,
      uniRound2Fingerprint(s, corpusDir), Seq("uni_round2_pieces")) match {
      case Some(m) =>
        uniR2Cache.put(s, corpusDir, m("uni_round2_pieces"))
        true
      case None => false
    }

  /** Load-or-build-and-persist; true when the snapshot was reused. */
  private[graft] def uniRound2Ensure(s: org.apache.spark.sql.SparkSession,
      corpusDir: String, artifactDir: String): Boolean = {
    val hit = uniRound2LoadFrom(s, corpusDir, artifactDir)
    if (!hit) {
      uniR2Cache.remove(s, corpusDir) // stale snapshot ≠ fresh cache
      uniRound2PersistTo(s, corpusDir, artifactDir)
    }
    hit
  }

  private val tokenizerUnigramR2 = Q(
    "tokenizer_unigram_r2",
    (s, dir) => uniTable(uniRound2Pieces(s, dir)),
    Some(s"""WITH RECURSIVE $uniOracleRound1,
             $uniOracleRound2,
             mm AS (
               SELECT b.piece, CAST(sum(w.freq) AS BIGINT) AS cnt
               FROM bt2 b JOIN words w ON w.word = b.word
               WHERE b.piece IS NOT NULL
               GROUP BY b.piece),
             tot3 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM mm)
             SELECT piece, cnt, CAST(cnt * 1000000 // t AS BIGINT) AS p_ppm
             FROM mm, tot3
             ORDER BY cnt DESC, piece
             LIMIT 100"""))

  /** Tokenizer FERTILITY audit per language — pieces emitted per word
    * under the TRAINED (round-2) unigram model: the standard multilingual
    * tokenizer-quality readout (a lang whose fertility runs high pays
    * more sequence length per sentence — the "tokenizer tax" that decides
    * whether a vocab serves a language or fragments it). Closes the
    * train→apply loop the BPE family already has (bpe_train →
    * bpe_encode): tokenizer_unigram_r2 LEARNS the model, this APPLIES it
    * corpus-wide and rolls the cost up per lang.
    *
    * Scale shape: the trained segmentation is vocab-sized work (each
    * word Viterbi-segments once via [[uniRound2Pieces]], no matter its
    * corpus multiplicity — the unigram family's central factoring); the
    * corpus appears only through the shared wordCounts artifact, joined
    * to the per-word piece counts on the word key and folded to ≤ #langs
    * rows in ONE aggregate. Words longer than [[UniMaxWordLen]] sit
    * outside the trained vocabulary and are excluded from BOTH counts on
    * both engines (declared, not silent). fert_ppm guards the
    * all-long-words degenerate lang with the sample_neyman zero
    * convention.
    */
  private val tokenizerFertility = Q(
    "tokenizer_fertility",
    (s, dir) => {
      val perWord = uniRound2Pieces(s, dir)
        .groupBy(col("word")).agg(count(lit(1)).as("n_pieces_w"))
      val wc = graft.text.TextArtifacts.wordCounts(s, dir)
        .withColumnRenamed("token", "word")
      wc.join(perWord, "word") // len <= UniMaxWordLen filter rides the join
        .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "doc_id")
        .groupBy(col("lang"))
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("n_pieces_w")).as("n_pieces"))
        .select(col("lang"), col("n_words"), col("n_pieces"),
          expr("CASE WHEN n_words = 0 THEN 0L ELSE n_pieces * 1000000 div n_words END")
            .as("fert_ppm"))
    },
    Some(s"""WITH RECURSIVE $uniOracleRound1,
             $uniOracleRound2,
             pw AS (
               SELECT word, CAST(count(*) AS BIGINT) AS n_pieces_w
               FROM bt2 WHERE piece IS NOT NULL GROUP BY word),
             wc AS (
               SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
               FROM (SELECT doc_id, unnest(list_filter(string_split_regex(
                       lower(text), '[^a-z]+'), x -> x <> '')) AS word
                     FROM documents)
               GROUP BY doc_id, word)
             SELECT d.lang,
               CAST(sum(wc.cnt) AS BIGINT) AS n_words,
               CAST(sum(wc.cnt * pw.n_pieces_w) AS BIGINT) AS n_pieces,
               CAST(CASE WHEN sum(wc.cnt) = 0 THEN 0
                 ELSE sum(wc.cnt * pw.n_pieces_w) * 1000000 // sum(wc.cnt)
                 END AS BIGINT) AS fert_ppm
             FROM wc
             JOIN pw USING (word)
             JOIN documents d USING (doc_id)
             GROUP BY d.lang"""))

  /** Multi-source BFS distance histogram over the signup graph — the
    * shortest-path member of the graph family (components answers
    * "connected to WHAT", this answers "how FAR"): hop distance from the
    * deterministic seed set (user nodes ≡ 0 mod 1000) out to a declared
    * 6-hop horizon, folded to the (dist, n_nodes) histogram. The
    * iterative shape every distributed BFS uses: per round ONE
    * frontier-join on the shared checkpointed edge artifact plus one
    * anti-join against the visited set; each round's new layer is
    * checkpointed, rounds after the frontier empties are no-ops (the
    * kcore convergence stance — a fixed unrollable round count is what
    * lets the oracle mirror a loop exactly). Frontiers carry bare node
    * ids (8 bytes) — at 100 TB the per-round exchange is node-set-sized,
    * never edge-payload-sized. Oracle: 6 unrolled MATERIALIZED layer
    * CTEs (the kcore lesson: un-hinted, DuckDB's CTE inlining
    * re-evaluates the chain exponentially).
    */
  private val BfsRounds = 6
  private val BfsSeedMod = 1000L

  private val graphBfsDistance = Q(
    "graph_bfs_distance",
    (s, dir) => {
      val und = graft.identity.GraphArtifacts.und(s, dir)
      var layer = und
        .where(col("src") % BfsSeedMod === 0L &&
          col("src") < graft.identity.GraphArtifacts.Offset)
        .select(col("src").as("node")).distinct()
        .withColumn("dist", lit(0L))
        .localCheckpoint(eager = true)
      var reached = layer
      for (k <- 1 to BfsRounds) {
        val next = und
          .join(layer.select(col("node").as("src")), "src")
          .select(col("dst").as("node")).distinct()
          .join(reached.select(col("node")), Seq("node"), "left_anti")
          .withColumn("dist", lit(k.toLong))
          .localCheckpoint(eager = true)
        reached = reached.union(next)
        layer = next
      }
      reached.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
    },
    Some {
      val layers = (1 to BfsRounds).map { k =>
        s"""n$k AS MATERIALIZED (
              SELECT DISTINCT u.dst AS node FROM und u
              JOIN r${k - 1} f ON f.node = u.src),
            r$k AS MATERIALIZED (
              SELECT node, CAST($k AS BIGINT) AS dist FROM n$k
              WHERE node NOT IN (SELECT node FROM c${k - 1})),
            c$k AS MATERIALIZED (
              SELECT node, dist FROM c${k - 1}
              UNION ALL SELECT node, dist FROM r$k)"""
      }.mkString(",\n")
      s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
          ${graft.identity.GraphArtifacts.undOracle},
          r0 AS MATERIALIZED (
            SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
            FROM und
            WHERE src % $BfsSeedMod = 0
              AND src < ${graft.identity.GraphArtifacts.Offset}),
          c0 AS MATERIALIZED (SELECT node, dist FROM r0),
          $layers
          SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
          FROM c$BfsRounds GROUP BY dist"""
    })

  // Two rounds of Kleinberg's HITS over the directed signup alias graph
  // — the hub/authority companion of graph_pagerank's eigenvector view.
  // The graph is bipartite by construction (fwd's namespace offset makes
  // users pure hubs and alias nodes pure authorities), so the classic
  // alternating update is exact here: h⁰ ≡ 1 ⇒ a¹ = in-degree (an exact
  // BIGINT), and each subsequent half-step is one shuffle on the shared
  // checkpointed edge artifact — at 100 TB the edge list is
  // hash-partitioned once and every half-step reuses that exchange (the
  // pagerank/Components stance). HITS normalizes by the L2 norm, which
  // is an order-sensitive double; this engine normalizes by the MAX
  // score in ppm instead (same fixed point up to scale on a bipartite
  // graph, and the division is a single exact integer op per node — the
  // §7.4.1 cross-row-double rule). Readout: top-10 per side with a
  // deterministic (score desc, node) total order.
  private val graphHits = Q(
    "graph_hits",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val fwd = graft.identity.GraphArtifacts.fwd(s, dir)
      val a1 = fwd.groupBy(col("dst")).agg(count(lit(1)).as("a1"))
      val a1p = a1.crossJoin(broadcast(a1.agg(max(col("a1")).as("m1")))) // 1-row max
        .select(col("dst"), expr("a1 * 1000000 div m1").as("a1p"))
      val h1 = fwd.join(a1p, "dst")
        .groupBy(col("src")).agg(sum(col("a1p")).as("h1"))
      // checkpointed: consumed by BOTH the hub top-k and the a² pull —
      // without it each TakeOrdered branch re-runs the whole half-step
      // chain from the edge artifact (visible as a doubled plan)
      val h1p = h1.crossJoin(broadcast(h1.agg(max(col("h1")).as("mh")))) // 1-row max
        .select(col("src"), expr("h1 * 1000000 div mh").as("h1p"))
        .localCheckpoint(eager = true)
      val a2 = fwd.join(h1p, "src")
        .groupBy(col("dst")).agg(sum(col("h1p")).as("a2"))
      val a2p = a2.crossJoin(broadcast(a2.agg(max(col("a2")).as("ma")))) // 1-row max
        .select(col("dst"), expr("a2 * 1000000 div ma").as("a2p"))
      // top-10 per side via orderBy+limit (TakeOrderedAndProject — the
      // graph_common_neighbors discipline: per-partition partial top-k,
      // no corpus-wide rank window); the rk window then runs on the
      // 20-row result only
      val hubsTop = h1p.select(lit("hub").as("side"), col("src").as("node"),
          col("h1p").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("node")).limit(10)
      val authsTop = a2p.select(lit("auth").as("side"), col("dst").as("node"),
          col("a2p").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("node")).limit(10)
      hubsTop.unionAll(authsTop)
        .withColumn("rk", row_number().over(Window.partitionBy(col("side"))
          .orderBy(col("score_ppm").desc, col("node"))).cast("long"))
    },
    Some(s"""WITH ${graft.identity.GraphArtifacts.fwdOracle},
        a1 AS (SELECT dst, CAST(count(*) AS BIGINT) AS a1 FROM fwd GROUP BY dst),
        a1p AS (SELECT dst, CAST(a1 * 1000000 // m1 AS BIGINT) AS a1p
                FROM a1, (SELECT max(a1) AS m1 FROM a1)),
        h1 AS (SELECT f.src, CAST(sum(p.a1p) AS BIGINT) AS h1
               FROM fwd f JOIN a1p p ON f.dst = p.dst GROUP BY f.src),
        h1p AS (SELECT src, CAST(h1 * 1000000 // mh AS BIGINT) AS h1p
                FROM h1, (SELECT max(h1) AS mh FROM h1)),
        a2 AS (SELECT f.dst, CAST(sum(p.h1p) AS BIGINT) AS a2
               FROM fwd f JOIN h1p p ON f.src = p.src GROUP BY f.dst),
        a2p AS (SELECT dst, CAST(a2 * 1000000 // ma AS BIGINT) AS a2p
                FROM a2, (SELECT max(a2) AS ma FROM a2)),
        u AS (SELECT 'hub' AS side, src AS node, h1p AS score_ppm FROM h1p
              UNION ALL
              SELECT 'auth' AS side, dst AS node, a2p AS score_ppm FROM a2p)
        SELECT side, node, score_ppm, rk FROM (
          SELECT side, node, score_ppm,
            CAST(row_number() OVER (PARTITION BY side
              ORDER BY score_ppm DESC, node) AS BIGINT) AS rk
          FROM u)
        WHERE rk <= 10"""))

  val all: Seq[Q] = Seq(joinMultiwayRevenue, graphPagerank, bpeMergeTopk,
    bpeEncode, graphLabelProp, graphTriangles, graphKcore,
    graphCommonNeighbors, graphModularity, graphAssortativity,
    graphDegreeDist, bpeTrain, graphClusteringCoeff, tokenizerUnigram,
    tokenizerUnigramR2, graphBfsDistance, tokenizerWordpiece, graphHits,
    graphAdamicAdar, bpeEncodeDropout, tokenizerFertility, graphPpr)
}
