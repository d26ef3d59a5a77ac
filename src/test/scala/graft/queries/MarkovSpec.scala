package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Local recount of events_markov_stationary's two power steps from the
  * raw per-user event sequences, plus the distribution facts: mass is
  * non-negative and sums to ~1 (minus deterministic truncation), and the
  * chain closure really removed terminal-only states.
  */
class MarkovSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("events_markov_stationary matches a local two-step recount") {
    val seqs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Long]("us")))
    val trans = seqs.groupBy(_._1).values.toSeq.flatMap { es =>
      es.sortBy(e => (e._4, e._3)).map(_._2).toList.sliding(2)
        .collect { case List(a, b) => (a, b) }
    }.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    val states = trans.keys.map(_._1).toSet
    val closed = trans.filter { case ((_, next), _) => states.contains(next) }
    val rowTot = closed.groupBy(_._1._1).map { case (i, m) => i -> m.values.sum }
    val p = closed.map { case ((i, j), c) => (i, j) -> c * 1000000L / rowTot(i) }
    def step(v: Map[String, Long]): Map[String, Long] =
      p.toSeq.groupBy(_._1._2).map { case (j, cells) =>
        j -> cells.map { case ((i, _), pp) => v(i) * pp }.sum / 1000000L
      }
    val v0 = states.map(_ -> 1000000L / states.size).toMap
    val v2 = step(step(v0))
    val expected = v2.toSeq.sortBy { case (st, v) => (-v, st) }.zipWithIndex
      .map { case ((st, v), i) => st -> ((v, i + 1L)) }.toMap
    val got = Registry.queries("events_markov_stationary")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("state") ->
        ((r.getAs[Long]("pi_ppm"), r.getAs[Long]("rk")))).toMap
    assert(got === expected)
    // a (truncated) distribution: non-negative, sums to 1 within the
    // deterministic integer-division loss (v0 seeding + per-cell ppm
    // truncation + one div per state per step — comfortably < 1000 ppm
    // on a ~10-state chain)
    assert(got.values.forall(_._1 >= 0L))
    val mass = got.values.map(_._1).sum
    assert(mass <= 1000000L && mass >= 999000L)
  }
}
