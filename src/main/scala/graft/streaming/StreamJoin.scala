package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — real-time attribution (which click
  * led to this purchase?) as a streaming operator. The batch engine has
  * the same semantics as `asof_join`; here both sides are unbounded.
  *
  * Why the shape scales: a stream-stream inner join buffers BOTH sides
  * in state, so unbounded streams need two bounds, and each is explicit
  * below —
  *
  *  - a watermark on each side caps how late either stream may arrive;
  *  - the time-range predicate (`purchase BETWEEN click AND click + h`)
  *    tells Spark when a buffered click can never match again, so state
  *    for it is dropped at `click watermark + horizon`.
  *
  * Without the range condition Spark must keep every click forever —
  * the state-bound argument IS the range predicate, which is why the
  * join condition puts the event-time bound in the ON clause instead of
  * a post-join filter. State then holds only (horizon + lateness) ×
  * arrival-rate rows per side regardless of stream age, and the join
  * itself is the standard symmetric hash join keyed on user_id.
  */
object StreamJoin {

  /** Attribute each purchase to every click by the same user within
    * `horizon` BEFORE the purchase. Inner join: unattributed purchases
    * drop (the left-outer variant emits them with nulls once the
    * watermark proves no click can arrive).
    *
    * @param clicks    streaming frame: user_id, click ts (event time)
    * @param purchases streaming frame: user_id, purchase ts (event time),
    *                  value (purchase amount, carried through as
    *                  purchase_value)
    * @param horizon   attribution window, e.g. "30 minutes"
    * @param lateness  max out-of-order delay tolerated per side
    */
  def attribute(clicks: DataFrame, purchases: DataFrame,
                horizon: String = "30 minutes",
                lateness: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", lateness)
    c.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      "inner")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("purchase_value"))
  }
}
