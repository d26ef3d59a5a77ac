package graft.queries

/** The engine-portable deterministic uniforms: md5 is the one digest both
  * Spark and DuckDB share, and these SQL fragments do the same pure digit
  * arithmetic on its hex form in either dialect. Every seeded decision in
  * the engine (hash sampling, DP noise, bootstrap weights, DSIR buckets,
  * Gumbel keys) derives from one of these two, so the convention lives in
  * exactly one place — a change here is a change everywhere, never a
  * silent desynchronization between query families. (Several modules
  * still carry a private `md5Byte` predating this object; new code should
  * reference these.)
  */
object PortableHash {

  /** First two md5 hex digits as 0..255 — the coarse split/bucket
    * convention (~0.4% granularity). */
  def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** First four md5 hex digits as 0..65535 — the fine-grained uniform
    * (per-mille-accurate thresholds, feature buckets, inverse-CDF
    * seeds). */
  def md5Hex4(sqlExprStr: String): String =
    (0 until 4).map { i =>
      val pow = 1L << (4 * (3 - i))
      s"(instr('0123456789abcdef', substr(md5($sqlExprStr), ${i + 1}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")
}
