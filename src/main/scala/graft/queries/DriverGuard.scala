package graft.queries

import org.apache.spark.sql.{DataFrame, Row}

/** Fail-loudly gate for the engine's few bounded driver-side collects
  * (VERDICT r06 task 6 — the [[graft.identity.Components]]
  * driverFinishEdges discipline generalized): every `.collect()` whose
  * safety argument is "bounded by construction" goes through here, so a
  * mis-sized knob or a broken bounding invariant throws with the
  * violated budget in the message instead of silently materializing a
  * corpus-scale frame on the driver.
  */
object DriverGuard {

  /** `df.collect()` gated by an explicit row cap: fetches at most
    * `cap + 1` rows (incremental `take`, never the full frame) and
    * throws if the cap is exceeded. */
  def collectBounded(df: DataFrame, cap: Int, what: String): Array[Row] = {
    val rows = df.take(cap + 1)
    if (rows.length > cap) throw new IllegalStateException(
      s"$what produced more than $cap rows — the bounded-by-construction " +
        "argument for this driver collect is violated; fix the bound or " +
        "keep the frame distributed")
    rows
  }
}
