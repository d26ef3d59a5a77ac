package graft.sim

/** Shared DuckDB SQL fragments for the embedding oracles.
  *
  * ONE definition of the ordered double-cast dot product every cosine
  * oracle splices (numerators and norms alike) — it mirrors the native
  * `dot_ordered` fold bit-for-bit (widen each float to double, multiply,
  * accumulate left-to-right), which is what keeps cosine scores
  * hash-matching across engines. Before this helper the fragment was
  * repeated ~40 times across SimQueries/ClusterQueries/MiningQueries;
  * a future change (e.g. an embedding-dim bump) edits exactly one line.
  * Integer squared-distance variants (different element expressions)
  * remain at their sites.
  */
private[sim] object SimOracle {

  /** `list_sum(list_transform(range(1, 65), i -> CAST(a[i] AS DOUBLE) *
    * CAST(b[i] AS DOUBLE)))` over two 64-dim float list expressions. */
  def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
}
