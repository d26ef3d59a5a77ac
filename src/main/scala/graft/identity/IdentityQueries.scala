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

  // The user_id / props.k namespace offset is hoisted to
  // [[GraphArtifacts.Offset]] (2^40) so the whole signup-graph family
  // (identity, pagerank, LPA, k-core, assortativity, degree_dist) shares
  // ONE provably-disjoint id space; see the rationale there.

  private val identityComponents = Q(
    "identity_components",
    (s, dir) =>
      // the session-shared checkpointed edge artifact (try_cast + null
      // filter + distinct live THERE, next to the oracle CTE that mirrors
      // them). fwd is distinct, null-free, and self-loop-free with
      // src < dst guaranteed by the namespace offset — exactly the CC
      // inputDistinct contract, so normalize skips its edge re-shuffle.
      Components.connectedComponents(GraphArtifacts.fwd(s, dir),
        inputDistinct = true),
    Some(s"""WITH RECURSIVE $componentsOracleCte
      SELECT node, component FROM comp"""))

  /** Reachability closure ending in `comp(node, component)` — shared by
    * both oracles; splice after `WITH RECURSIVE`. O(Σ|C|²), oracle-scale
    * only; the Spark side is the O(E log N) star iteration.
    */
  private def componentsOracleCte: String =
    // fwdOracle carries the null filter that mirrors the Spark-side edge
    // artifact: a row with null user_id or unparseable k contributes NO
    // edge (and no node) on either engine — without it the oracle would
    // keep a node the Spark side drops, a latent row-count mismatch.
    // (u <> v is vacuous under the namespace offset.)
    s"""${GraphArtifacts.fwdOracle},
      ok AS (SELECT src AS u, dst AS v FROM fwd),
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
