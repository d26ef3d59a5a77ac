package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKByValueSpec extends SparkSpec {

  private val agg = new TopKByValue(3)

  private def bruteTopK(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortBy { case (v, id) => (-v, id) }.take(k)

  test("reduce/merge equal sort-take-k on random folds (ties included)") {
    val rnd = new Random(7)
    for (_ <- 1 to 50) {
      val rows = Seq.fill(rnd.nextInt(20))(
        (rnd.nextInt(5).toDouble, rnd.nextInt(100).toLong))
      // fold through reduce in arbitrary order
      val reduced = rows.foldLeft(agg.zero)(agg.reduce)
      assert(reduced == bruteTopK(rows, 3), s"reduce path, rows=$rows")
      // split arbitrarily, reduce each half, merge
      val (l, r) = rows.splitAt(if (rows.isEmpty) 0 else rnd.nextInt(rows.size))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == bruteTopK(rows, 3), s"merge path, rows=$rows")
    }
  }

  test("merge never exceeds k and keeps the sorted invariant") {
    val a = Vector((9.0, 1L), (9.0, 3L), (7.0, 2L))
    val b = Vector((9.0, 2L), (8.0, 5L), (7.0, 1L))
    val m = agg.merge(a, b)
    assert(m == Vector((9.0, 1L), (9.0, 2L), (9.0, 3L)))
  }

  test("query equals the rank-window formulation on the events table") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("topk_per_key")(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSet
    val ev = graft.queries.Tables.events(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    val want = ev
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rk"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("plan is a two-phase object-hash aggregate with no Window/Sort") {
    val p = graft.SparkEntry.queries("topk_per_key")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // typed Aggregator plans as ObjectHashAggregate, partial then final
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Window"), "per-key top-k fell back to a rank window")
  }
}
