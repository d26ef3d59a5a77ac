package graft.identity

import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** O16 — the reference's flagship identity-resolution capability as a
  * registered query. Alias edges are derived from signup events
  * (user_id ↔ offset+props.k, the analog of the reference's `_p` ↔ `_p2`
  * alias pairs, `/root/reference/src/Operations/FileImporter.php:97-102`);
  * components are computed with the large-star/small-star iteration in
  * [[Components]]; canonical id = min of component.
  *
  * The oracle is a DuckDB recursive-CTE reachability closure — O(Σ|C|²)
  * and only viable at oracle scale (≤ a few hundred nodes at sf0.01); the
  * Spark side is the O(E log N) scale path.
  */
object IdentityQueries {

  /** Namespace separator between user_id and props.k alias ids. 2^40, not
    * a "big enough" decimal: the two id spaces must be PROVABLY disjoint
    * — with the old 10^6 offset a user_id of 1,000,005 collided with
    * alias k=5 and silently merged two unrelated clusters (latent at
    * bench scale, corrupting at any realistic population; both engines
    * shared the bug, so the oracle agreed with the wrong answer). 2^40
    * (~1.1e12) clears any credible user population while keeping
    * offset + k far from BIGINT overflow. */
  private val Offset = 1L << 40

  private val identityComponents = Q(
    "identity_components",
    (s, dir) => {
      val edges = Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        // try_cast, not cast: Spark 4 runs ANSI mode, where one malformed
        // (non-numeric) props.k would abort the whole query instead of
        // skipping the row; the null it yields is dropped by the CC
        // normalize filter (oracle mirrors with TRY_CAST + null filter).
        // No .distinct() here: connectedComponents' normalize already
        // canonicalizes + distincts the edge set — an outer distinct was
        // a second full edge shuffle for nothing.
        .select(col("user_id").as("src"),
          (expr("try_cast(get_json_object(props, '$.k') AS LONG)") + Offset)
            .as("dst"))
      Components.connectedComponents(edges)
    },
    Some(s"""WITH RECURSIVE $componentsOracleCte
      SELECT node, component FROM comp"""))

  /** Reachability closure ending in `comp(node, component)` — shared by
    * both oracles; splice after `WITH RECURSIVE`. O(Σ|C|²), oracle-scale
    * only; the Spark side is the O(E log N) star iteration.
    */
  private def componentsOracleCte: String =
    // the null/self-loop filter mirrors the Spark-side CC normalize: a
    // row with null user_id or unparseable k contributes NO edge (and no
    // node) on either engine — without it the oracle would keep a node
    // the Spark side drops, a latent row-count mismatch
    s"""edges AS (SELECT DISTINCT user_id AS u,
                  $Offset + TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT) AS v
                FROM events WHERE event_type = 'signup'),
      ok AS (SELECT u, v FROM edges
             WHERE u IS NOT NULL AND v IS NOT NULL AND u <> v),
      und AS (SELECT u, v FROM ok UNION SELECT v, u FROM ok),
      nodes AS (SELECT DISTINCT u AS node FROM und),
      reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, und.v FROM reach JOIN und ON reach.r = und.u),
      comp AS (SELECT node, CAST(min(r) AS BIGINT) AS component
               FROM reach GROUP BY node)"""

  // Graph-health telemetry over the identity graph: how many clusters of
  // each size exist. Two hash aggregates over the components frame — the
  // first groups |V| rows on component, the second groups |components|
  // rows on size; output is O(max cluster size) rows. The skew-resilience
  // story of the star iteration (ComponentsSpec's power-law stress) is
  // what makes the first aggregate safe at 100 TB.
  private val identityGraphStats = Q(
    "identity_graph_stats",
    (s, dir) =>
      identityComponents.run(s, dir)
        .groupBy(col("component")).agg(count(lit(1)).as("csize"))
        .groupBy(col("csize")).agg(count(lit(1)).as("n_components")),
    Some(s"""WITH RECURSIVE $componentsOracleCte,
      sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
                FROM comp GROUP BY component)
      SELECT csize, CAST(count(*) AS BIGINT) AS n_components
      FROM sizes GROUP BY csize"""))

  val all: Seq[Q] = Seq(identityComponents, identityGraphStats)
}
