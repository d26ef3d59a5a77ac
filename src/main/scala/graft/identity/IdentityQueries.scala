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

  private val Offset = 1000000L

  private val identityComponents = Q(
    "identity_components",
    (s, dir) => {
      val edges = Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        .select(col("user_id").as("src"),
          (get_json_object(col("props"), "$.k").cast("long") + Offset).as("dst"))
        .distinct()
      Components.connectedComponents(edges)
    },
    Some(s"""WITH RECURSIVE
      edges AS (SELECT DISTINCT user_id AS u,
                  $Offset + CAST(json_extract_string(props, '$$.k') AS BIGINT) AS v
                FROM events WHERE event_type = 'signup'),
      und AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
      nodes AS (SELECT DISTINCT u AS node FROM und),
      reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, und.v FROM reach JOIN und ON reach.r = und.u)
      SELECT node, CAST(min(r) AS BIGINT) AS component
      FROM reach GROUP BY node"""))

  val all: Seq[Q] = Seq(identityComponents)
}
