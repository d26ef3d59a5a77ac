package graft.queries

import graft.SparkSpec

/** Locks in the physical-plan properties the 100 TB design depends on —
  * a regression here is invisible to the correctness oracle (same rows,
  * 100x the shuffle) so it must be pinned by plan inspection.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters reach the parquet scan (pushdown)") {
    val p = plan("filter_like")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("StringContains") || p.contains("StringStartsWith"), p.take(2000))
  }

  test("projection prunes the scan schema") {
    val p = plan("scan_project")
    // events has props; the projection does not read it
    assert(p.contains("ReadSchema"))
    assert(!p.contains("props"), "scan reads pruned column 'props'")
  }

  test("dimension joins broadcast (no sort-merge for small sides)") {
    val p = plan("join_alias_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to sort-merge")
  }

  test("anti-join builds on the small side") {
    val p = plan("join_anti_new")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
  }

  test("brute-force cosine broadcasts the query set, not the corpus") {
    val p = plan("sim_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("minhash signatures plan has no aggregate (fused expression)") {
    val p = plan("dedup_minhash")
    assert(!p.contains("HashAggregate"),
      "signature computation regressed to an aggregate")
    assert(p.contains("minhash_sig") || p.contains("minhashsignature") ||
      p.toLowerCase.contains("minhash"), p.take(2000))
  }
}
