package graft.multimodal

import graft.SparkSpec
import graft.queries.Registry

/** Internal-consistency checks for scene-cut detection that the
  * shared-formulation oracle can't make. */
class ScenecutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("multimodal_scenecut: mask popcount equals n_cuts, bounds hold") {
    val rows = Registry.queries("multimodal_scenecut")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var flagged = 0
    rows.foreach { r =>
      val (n, mask, mx) = (r.getAs[Long]("n_cuts"), r.getAs[Long]("cut_mask"),
        r.getAs[Long]("max_delta"))
      assert(java.lang.Long.bitCount(mask).toLong === n)
      assert((mask & 1L) === 0L, "frame 0 has no predecessor, bit 0 must be clear")
      assert(mask < 16L, "only frames 1..3 can cut")
      assert(n >= 0L && n <= 3L)
      assert(mx >= 0L && mx <= 1020L, "luma_x4 delta bounded by 4*255")
      assert((n > 0) === (mx > 256L), "cuts iff some delta exceeds threshold")
      val l0 = r.getAs[Long]("luma0_x4")
      assert(l0 >= 0L && l0 <= 1020L)
      if (n > 0) flagged += 1
    }
    // the md5-derived frames should both cut and not-cut across the corpus
    assert(flagged > 0 && flagged < rows.length)
  }
}
