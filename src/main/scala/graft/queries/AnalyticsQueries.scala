package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The product-analytics queries a Kissmetrics warehouse exists to serve
  * (the reference ETLs events into Redshift precisely so analysts can run
  * these): ordered funnel conversion and weekly cohort retention.
  *
  * Determinism: all comparisons use microsecond epoch keys
  * (`unix_micros` / `epoch_ns // 1000`, the engine's cross-engine
  * timestamp rule), week buckets are `date_trunc('week', ...)` (Monday
  * start on both engines), and every count is BIGINT.
  *
  * Scale shape: each funnel step is one filtered aggregate joined to the
  * previous step's (user, ts) — step tables shrink monotonically, so each
  * join's build side is smaller than the last; retention is two hash
  * aggregates and one equi-join on user_id.
  */
object AnalyticsQueries {

  // Ordered 3-step funnel view -> click -> purchase: step N counts users
  // whose earliest step-N event happens strictly AFTER their step-(N-1)
  // time.
  private val funnelSteps = Q(
    "funnel_steps",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val t1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = ev.where(col("event_type") === "click")
        .join(t1, "user_id").where(col("us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val t3 = ev.where(col("event_type") === "purchase")
        .join(t2, "user_id").where(col("us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      val mk = (step: Int, name: String, df: org.apache.spark.sql.DataFrame) =>
        df.agg(count(lit(1)).as("users"))
          .select(lit(step.toLong).as("step"), lit(name).as("step_name"), col("users"))
      mk(1, "view", t1).union(mk(2, "click", t2)).union(mk(3, "purchase", t3))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
            t1 AS (SELECT user_id, min(us) AS t1 FROM ev
                   WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN t1 USING (user_id)
                   WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
            t3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN t2 USING (user_id)
                   WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id)
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
                   CAST(count(*) AS BIGINT) AS users FROM t1
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM t2
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM t3"""))

  // Weekly cohort retention: cohort = week of a user's first event;
  // (cohort, offset) counts distinct users active `offset` weeks later.
  private val cohortRetention = Q(
    "cohort_retention",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      ev.join(first, "user_id")
        .groupBy(
          date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("users"))
    },
    Some("""WITH ev AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
                 FROM events),
            first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
            SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
                   CAST((wk - cohort_wk) / 7 AS BIGINT) AS week_offset,
                   CAST(count(DISTINCT ev.user_id) AS BIGINT) AS users
            FROM ev JOIN first USING (user_id)
            GROUP BY cohort_wk, CAST((wk - cohort_wk) / 7 AS BIGINT)"""))

  // Spark's NATIVE session_window operator (vs the hand-rolled lag/cumsum
  // in events_sessionize): one aggregate, no window-function sort pass.
  // Session end = last event + gap, exactly what the oracle's
  // max(us) + gap reproduces; all keys microsecond integers.
  private val sessionWindowAgg = Q(
    "session_window_agg",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          unix_micros(col("w.end")).as("session_end_us"),
          col("n")),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
            marked AS (
              SELECT user_id, us,
                CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM (SELECT user_id, us,
                      lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us
                    FROM e)),
            sess AS (
              SELECT user_id, us,
                sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked)
            SELECT user_id, min(us) AS session_start_us,
                   max(us) + 1800000000 AS session_end_us,
                   CAST(count(*) AS BIGINT) AS n
            FROM sess GROUP BY user_id, sid"""))

  // Markov path analysis: per-user time-ordered event stream -> lag(1)
  // transition pairs -> global (prev, next) counts. The lag window is
  // partitioned by user_id (per-user sort, never a global one) and the
  // final aggregate's cardinality is |event_type|² — a handful of rows no
  // matter the corpus size. Ties in ts break on event_id so the lag is a
  // total order on both engines.
  private val eventTransitions = Q(
    "event_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("prev_type"), col("event_type").as("next_type"), col("cnt"))
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                  ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_type
              FROM events)
            SELECT prev_type, event_type AS next_type,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type"""))

  // Long-run occupancy of the user-journey Markov chain — the
  // where-do-users-END-UP readout on top of event_transitions' raw
  // matrix: two power-iteration steps of π' = πP from the uniform start
  // (the graph_pagerank fixed-iteration stance: a finite plan the oracle
  // can mirror non-recursively; two steps already separate sinks from
  // pass-through states on a ~10-state chain). The chain is restricted
  // to states WITH outgoing transitions (a terminal type has no row in
  // P; restricting + row-normalizing is the declared dangling-state
  // semantics, documented here rather than silently absorbing).
  // Determinism: P cells quantize to ppm per cell (cnt·10⁶ div rowtot,
  // exact ints), each iteration sums v·p products in exact BIGINT and
  // divides ONCE by 10⁶ — truncation is deterministic and identical on
  // both engines. Scale: the transition aggregate is the one corpus
  // shuffle; everything after lives on the ≤ states² frame.
  private val eventsMarkovStationary = Q(
    "events_markov_stationary",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val trans = ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(eager = true) // tiny; feeds P, states, and both steps
      // keep only transitions among states that THEMSELVES have out-edges
      val states = trans.select(col("prev_type").as("st")).distinct()
      val closed = trans.join(states.select(col("st").as("event_type")),
        Seq("event_type"), "left_semi")
      val tot = closed.groupBy(col("prev_type")).agg(sum(col("cnt")).as("rt"))
      val p = closed.join(tot, "prev_type")
        .select(col("prev_type").as("i"), col("event_type").as("j"),
          expr("cnt * 1000000 div rt").as("p_ppm"))
      val v0 = states
        .crossJoin(broadcast(states.agg(count(lit(1)).as("ns")))) // 1-row
        .select(col("st"), expr("1000000 div ns").as("v"))
      def step(v: DataFrame): DataFrame =
        p.join(v.select(col("st").as("i"), col("v")), "i")
          .groupBy(col("j"))
          .agg(expr("sum(v * p_ppm) div 1000000").as("v"))
          .select(col("j").as("st"), col("v"))
      val v2 = step(step(v0))
      v2.select(col("st").as("state"), col("v").as("pi_ppm"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("pi_ppm").desc, col("state"))).cast("long"))
    },
    Some("""WITH seq AS (
              SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                  ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_type
              FROM events),
            trans AS (
              SELECT prev_type, event_type AS next_type,
                CAST(count(*) AS BIGINT) AS cnt
              FROM seq WHERE prev_type IS NOT NULL
              GROUP BY prev_type, event_type),
            states AS (SELECT DISTINCT prev_type AS st FROM trans),
            closed AS (
              SELECT t.prev_type, t.next_type, t.cnt FROM trans t
              WHERE EXISTS (SELECT 1 FROM states s WHERE s.st = t.next_type)),
            tot AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS rt
                    FROM closed GROUP BY prev_type),
            p AS (
              SELECT c.prev_type AS i, c.next_type AS j,
                CAST(c.cnt * 1000000 // t.rt AS BIGINT) AS p_ppm
              FROM closed c JOIN tot t ON t.prev_type = c.prev_type),
            v0 AS (
              SELECT st, CAST(1000000 // (SELECT count(*) FROM states)
                AS BIGINT) AS v
              FROM states),
            v1 AS (
              SELECT p.j AS st, CAST(sum(v0.v * p.p_ppm) // 1000000 AS BIGINT)
                AS v
              FROM p JOIN v0 ON v0.st = p.i GROUP BY p.j),
            v2 AS (
              SELECT p.j AS st, CAST(sum(v1.v * p.p_ppm) // 1000000 AS BIGINT)
                AS v
              FROM p JOIN v1 ON v1.st = p.i GROUP BY p.j)
            SELECT st AS state, v AS pi_ppm,
              CAST(row_number() OVER (ORDER BY v DESC, st) AS BIGINT) AS rk
            FROM v2"""))

  // Trailing-7-day rolling stats per user — the RANGE window frame
  // (time-interval peers, not row counts), the one window shape the
  // battery in window_funcs doesn't cover. Scale: the window partitions
  // by user_id, so the sort is per-user within hash partitions — no
  // global sort, no single-reducer funnel; state per task is one frame's
  // peers. Determinism: values are quantized to integer cents per ROW
  // before the frame sum (§7.4.1 — a rolling double sum re-associates),
  // divided back once on output.
  private val windowRollingStats = Q(
    "window_rolling_stats",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val SevenDaysUs = 7L * 86400L * 1000000L
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-(SevenDaysUs - 1L), Window.currentRow)
      ev.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_7d"),
        round(sum(col("vc")).over(w).cast("double") / 100.0, 2).as("sum_7d"))
    },
    Some("""SELECT event_id, user_id,
              CAST(count(*) OVER w AS BIGINT) AS n_7d,
              round(CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) OVER w
                AS DOUBLE) / 100.0, 2) AS sum_7d
            FROM (SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS us
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN 604799999999 PRECEDING AND CURRENT ROW)"""))

  // Type-2 slowly-changing dimension built from the event stream: each
  // user's purchase-value tier over time, one row per tier CHANGE with
  // [valid_from, valid_to) microsecond bounds and a current flag — the
  // CDC materialization every warehouse dimension load performs.
  // Scale: both windows partition by user_id (per-user sorts inside hash
  // partitions); the change filter drops consecutive repeats BEFORE the
  // lead() that assigns validity, so the second window runs over the
  // (much smaller) change table, not the raw stream.
  /** The type-2 dimension both cdc_scd2 and join_scd2_pit build: tier
    * changes with [valid_from, valid_to] microsecond bounds per user
    * (valid_to null on the open version). Shared so the PIT consumer can
    * never drift from the dimension the build query emits. */
  private[queries] def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = Tables.events(s, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CASE WHEN value < 50.0 THEN 'low' WHEN value < 150.0 THEN 'mid' " +
          "ELSE 'high' END").as("tier"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    src
      .withColumn("prev_tier", lag(col("tier"), 1).over(w))
      .where(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
      .withColumn("valid_to", lead(col("us"), 1).over(w) - lit(1L))
      .select(col("user_id"), col("tier"), col("us").as("valid_from"),
        col("valid_to"))
  }

  /** Oracle CTE chain ending in `dim(user_id, tier, valid_from,
    * valid_to)`; splice after `WITH`. */
  private[queries] val scd2OracleCte: String =
    """src AS (
         SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
           CASE WHEN value < 50.0 THEN 'low' WHEN value < 150.0 THEN 'mid'
                ELSE 'high' END AS tier
         FROM events WHERE event_type = 'purchase'),
       dim AS (
         SELECT user_id, tier, us AS valid_from,
           lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - 1
             AS valid_to
         FROM (
           SELECT user_id, event_id, us, tier,
             lag(tier) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS prev_tier
           FROM src)
         WHERE prev_tier IS NULL OR prev_tier <> tier)"""

  private val cdcScd2 = Q(
    "cdc_scd2",
    (s, dir) =>
      scd2Dim(s, dir)
        .select(col("user_id"), col("tier"), col("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current")),
    Some(s"""WITH $scd2OracleCte
             SELECT user_id, tier, valid_from, valid_to,
               valid_to IS NULL AS is_current
             FROM dim"""))

  // Time-series resampling onto an hourly grid with forward-fill — the
  // gap-filling feature-engineering op (resample + LOCF): each user's
  // observed hours aggregate to integer cents, the user's own
  // [first, last] hour range explodes into a dense grid, and empty hours
  // carry the last observed sum forward. Scale: the grid explode is
  // bounded per user (span hours), the fill is a per-user running
  // last() — user-partitioned window, no global sort; everything before
  // it is partial-aggregated. The user_id < 100 gate bounds the DENSE
  // output (grids materialize rows; a production run would write
  // per-user shards), not the technique.
  private val resampleFfill = Q(
    "resample_ffill",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val HourUs = 3600000000L
      val ev = Tables.events(s, dir)
        .where(col("user_id") < 100L)
        .select(col("user_id"),
          expr(s"unix_micros(ts) div $HourUs").as("hr"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      val hourly = ev.groupBy(col("user_id"), col("hr"))
        .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_cents"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
        .select(col("user_id"), explode(expr("sequence(mn, mx)")).as("hr"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("sum_cents"), ignoreNulls = true).over(w).as("filled_cents"),
          col("sum_cents").isNull.as("gap_filled"))
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_ns(ts) // 1000 // 3600000000 AS hr,
                CAST(round(value * 100.0, 0) AS BIGINT) AS vc
              FROM events WHERE user_id < 100),
            hourly AS (
              SELECT user_id, hr, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(vc) AS BIGINT) AS sum_cents
              FROM ev GROUP BY 1, 2),
            grid AS (
              SELECT user_id, unnest(generate_series(mn, mx)) AS hr
              FROM (SELECT user_id, min(hr) AS mn, max(hr) AS mx
                    FROM ev GROUP BY user_id))
            SELECT g.user_id, g.hr,
              coalesce(h.n_events, 0) AS n_events,
              last_value(h.sum_cents IGNORE NULLS) OVER (
                PARTITION BY g.user_id ORDER BY g.hr
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
              h.sum_cents IS NULL AS gap_filled
            FROM grid g LEFT JOIN hourly h
              ON h.user_id = g.user_id AND h.hr = g.hr"""))

  // RFM customer segmentation: per-user recency (hours since last event,
  // vs the corpus max), frequency (events), monetary (integer-cent
  // revenue), each cut at its exact median into a binary score — the
  // classic marketing segmentation as a warehouse query. Scale: the
  // naive formulation is ntile() over ALL users — a global single-task
  // sort (the topk_users trap); here the 3 medians compute once on the
  // user-aggregate table and broadcast as one row, so scoring is a
  // per-row compare. Median halves (not quartiles) keep the threshold
  // count at 3 scalars; percentile_cont interpolation is
  // engine-identical (exact_percentiles proves it), and thresholds are
  // floored to integers so the compares are integer-exact.
  private val rfmSegments = Q(
    "rfm_segments",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      val agg = ev.groupBy(col("user_id"))
        .agg(max(col("us")).as("last_us"),
          count(lit(1)).as("frequency"),
          sum(col("vc")).as("monetary"))
        .crossJoin(broadcast(ev.agg(max(col("us")).as("now_us"))))
        .select(col("user_id"),
          expr("(now_us - last_us) div 3600000000").as("recency_h"),
          col("frequency"), col("monetary"))
      val cuts = agg.agg(
        expr("CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY recency_h)) AS BIGINT)").as("r_med"),
        expr("CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY frequency)) AS BIGINT)").as("f_med"),
        expr("CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY monetary)) AS BIGINT)").as("m_med"))
      agg.crossJoin(broadcast(cuts))
        .select(col("user_id"), col("recency_h"), col("frequency"), col("monetary"),
          (col("recency_h") <= col("r_med")).as("r_hi"),
          (col("frequency") > col("f_med")).as("f_hi"),
          (col("monetary") > col("m_med")).as("m_hi"))
        .withColumn("segment",
          concat(
            when(col("r_hi"), lit("R")).otherwise(lit("r")),
            when(col("f_hi"), lit("F")).otherwise(lit("f")),
            when(col("m_hi"), lit("M")).otherwise(lit("m"))))
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_ns(ts) // 1000 AS us,
                CAST(round(value * 100.0, 0) AS BIGINT) AS vc
              FROM events),
            agg AS (
              SELECT user_id,
                (SELECT max(us) FROM ev) - max(us) AS diff_us,
                CAST(count(*) AS BIGINT) AS frequency,
                CAST(sum(vc) AS BIGINT) AS monetary
              FROM ev GROUP BY user_id),
            agg2 AS (
              SELECT user_id, diff_us // 3600000000 AS recency_h,
                frequency, monetary
              FROM agg),
            cuts AS (
              SELECT
                CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY recency_h)) AS BIGINT) AS r_med,
                CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY frequency)) AS BIGINT) AS f_med,
                CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY monetary)) AS BIGINT) AS m_med
              FROM agg2)
            SELECT user_id, recency_h, frequency, monetary,
              recency_h <= r_med AS r_hi,
              frequency > f_med AS f_hi,
              monetary > m_med AS m_hi,
              concat(CASE WHEN recency_h <= r_med THEN 'R' ELSE 'r' END,
                     CASE WHEN frequency > f_med THEN 'F' ELSE 'f' END,
                     CASE WHEN monetary > m_med THEN 'M' ELSE 'm' END) AS segment
            FROM agg2, cuts"""))

  // Rolling active users — DAU / trailing-7-day WAU / stickiness, the
  // sliding-window COUNT DISTINCT every product dashboard runs. The
  // naive window-function formulation (distinct over a RANGE frame)
  // doesn't exist in SQL; the scalable shape is: collapse events to
  // distinct (day, user) FIRST (the only corpus-sized shuffle), explode
  // each day-activity into the ≤7 windows it can serve, distinct again
  // on (window, user) — bounded by 7× the daily-active pairs, not by
  // events — and count. Stickiness is integer basis points (dau·10⁴ div
  // wau): exact on both engines, no float division. At 100 TB the exact
  // distincts swap for HLL sketch unions (approx_stats shows that path);
  // the plan shape is unchanged.
  private val rollingActiveUsers = Q(
    "rolling_active_users",
    (s, dir) => {
      val du = Tables.events(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day_no"),
          col("user_id"))
        .distinct()
      val dau = du.groupBy(col("day_no")).agg(count(lit(1)).as("dau"))
      val wau = du
        .select(explode(expr("sequence(day_no, day_no + 6)")).as("w_end"),
          col("user_id"))
        .distinct()
        .groupBy(col("w_end")).agg(count(lit(1)).as("wau"))
      dau.join(wau, col("day_no") === col("w_end"))
        .select(col("day_no"), col("dau"), col("wau"),
          expr("(dau * 10000) div wau").as("stickiness_bp"))
    },
    Some("""WITH du AS (
              SELECT DISTINCT epoch_ns(ts) // 1000 // 86400000000 AS day_no, user_id
              FROM events),
            dau AS (
              SELECT day_no, CAST(count(*) AS BIGINT) AS dau
              FROM du GROUP BY day_no),
            wau AS (
              SELECT w_end, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
              FROM (SELECT unnest(range(day_no, day_no + 7)) AS w_end, user_id
                    FROM du)
              GROUP BY w_end)
            SELECT day_no, dau, wau, (dau * 10000) // wau AS stickiness_bp
            FROM dau JOIN wau ON day_no = w_end"""))

  // Sketch-path rolling distinct — the 100 TB shape of
  // `rolling_active_users`: the raw event stream aggregates ONCE into a
  // per-day HLL sketch (DataSketches `hll_sketch_agg`, partial-agg like
  // any hash aggregate), and every trailing-7-day count is then a union
  // of 7 kilobyte-sized sketches (`hll_union_agg`) — window cost is
  // days × 7 sketch merges, independent of corpus size, where the exact
  // path re-touches every (day, user) pair per window. Mergeability is
  // the property that matters: sketches also roll up across
  // dimensions/files at report time without re-scanning raw data.
  // No oracle by design (sketch internals are engine-specific);
  // RollingHllSpec pins the estimates to the exact day-pair-collapse
  // counts within published HLL error.
  private val rollingActiveHll = Q(
    "rolling_active_hll",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day_no"),
          col("user_id"))
        .groupBy(col("day_no"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        // one row per day, ~KB each; feeds both the DAU estimate and the
        // 7-way window union — materialize the event-stream aggregate once
        .localCheckpoint(eager = true)
      val dau = daily.select(col("day_no"),
        expr("hll_sketch_estimate(sk)").as("dau_est"))
      val wau = daily
        .select(explode(expr("sequence(day_no, day_no + 6)")).as("w_end"),
          col("sk"))
        .groupBy(col("w_end"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("wau_est"))
      dau.join(wau, col("day_no") === col("w_end"))
        .select(col("day_no"), col("dau_est"), col("wau_est"))
    },
    None)

  // Deterministic companion for the rows-only sketch query above (the
  // approx_stats_frame pattern): the SAME pipeline's output projected to
  // its deterministic column — the day keys that survive the dau⋈wau
  // join — hash-compared against DuckDB. A wiring regression (wrong day
  // arithmetic, a join that drops or duplicates days) fails this oracle;
  // the estimates stay pinned by RollingHllSpec's error bounds.
  private val rollingActiveHllFrame = Q(
    "rolling_active_hll_frame",
    (s, dir) => rollingActiveHll.run(s, dir).select(col("day_no")),
    // ts IS NOT NULL mirrors the Spark side's behavior on a null-ts row:
    // its null day_no cannot survive the dau⋈wau equi-join (the wau
    // explode of sequence(null, null+6) emits no rows), while a bare
    // DISTINCT here would emit the NULL day — a latent row-count mismatch
    // if the fixture ever grows null timestamps
    Some("""SELECT DISTINCT epoch_ns(ts) // 1000 // 86400000000 AS day_no
            FROM events WHERE ts IS NOT NULL"""))

  // Multi-touch attribution — the marketing query a Kissmetrics warehouse
  // ultimately funds: every purchase splits credit across the user's
  // clicks in a 7-day lookback, LINEAR (1/n each) and TIME-DECAY
  // (halving per day of age) side by side.
  //
  // Scale shape: the click↔purchase pairing is an equi-join on user_id
  // with the time-range predicate applied post-join — per-user fan-out is
  // bounded by the lookback window, never user-history × user-history
  // (the range_join pattern). Credit normalization windows partition by
  // purchase_id, so frame state is one purchase's clicks; nothing global
  // sorts or funnels to one task.
  //
  // Determinism: decay weights are 2^(7 - age_days) — exact BIGINTs —
  // and credit shares are integer basis points `(w * 10000) div Σw`,
  // so the whole query is floating-point-free on both engines.
  private val attributionMultitouch = Q(
    "attribution_multitouch",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("us").as("c_us"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("p_us"))
      val DayUs = 86400000000L
      val pairs = purchases.join(clicks, "user_id")
        .where(col("c_us") <= col("p_us") &&
          col("p_us") - col("c_us") <= lit(7 * DayUs))
        .withColumn("age_days", expr(s"(p_us - c_us) div $DayUs"))
        .withColumn("w", expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(7 - age_days AS INT))"))
      val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("purchase_id"))
      pairs
        .withColumn("total_w", sum(col("w")).over(wp))
        .withColumn("n", count(lit(1)).over(wp))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("age_days"), col("w"),
          expr("(w * 10000) div total_w").as("credit_decay_bp"),
          expr("10000 div n").as("credit_linear_bp"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, event_type,
                          epoch_ns(ts) // 1000 AS us FROM events),
            c AS (SELECT user_id, event_id AS click_id, us AS c_us
                  FROM ev WHERE event_type = 'click'),
            p AS (SELECT user_id, event_id AS purchase_id, us AS p_us
                  FROM ev WHERE event_type = 'purchase'),
            pairs AS (
              SELECT p.user_id, purchase_id, click_id,
                     (p_us - c_us) // 86400000000 AS age_days
              FROM p JOIN c ON p.user_id = c.user_id
               AND c_us <= p_us AND p_us - c_us <= 7 * 86400000000)
            SELECT user_id, purchase_id, click_id,
                   CAST(age_days AS BIGINT) AS age_days,
                   CAST(1 << (7 - age_days) AS BIGINT) AS w,
                   CAST((1 << (7 - age_days)) * 10000 //
                     sum(1 << (7 - age_days)) OVER (PARTITION BY purchase_id)
                     AS BIGINT) AS credit_decay_bp,
                   CAST(10000 // count(*) OVER (PARTITION BY purchase_id)
                     AS BIGINT) AS credit_linear_bp
            FROM pairs"""))

  /** A/B experiment readout — the product-analytics endpoint a
    * Kissmetrics-style warehouse ultimately feeds: users hash-split into
    * two arms, per-arm per-event-type value metric, Welch's t on the arm
    * difference. Assignment is the engine's deterministic md5-bucket rule
    * (sample_hash's idiom), so both engines derive identical arms with no
    * stored assignment table — exactly how real experiment pipelines
    * bucket by user-id hash.
    *
    * Users without a given event type count as zeros (the
    * exposed-population denominator, not the converted one): a tiny
    * distinct-type frame crosses the user list (broadcast ×5 rows), and
    * missing (user, type) cells coalesce to 0 — dropping them would bias
    * every mean upward and is the classic A/B analysis bug.
    *
    * Determinism (anomaly_zscore's §7.4.1 recipe): the metric is exact
    * integer cents per row, so each arm reduces to exact BIGINT
    * (n, Σx, Σx²) partials in any order; mean/variance/t then flow from
    * identical integers through textually identical double expressions
    * on both engines, rounded only on output (+0.0 folds -0.0).
    *
    * Scale shape: one per-(user, type) partial aggregate, one
    * per-(type, arm) aggregate, a conditional-sum pivot to one row per
    * type — no windows, no data-keyed joins except the broadcast type
    * cross. The t-statistic math sees six integers per event type.
    */
  private def md5Arm(idExpr: String): String =
    s"""((instr('0123456789abcdef', substr(md5($idExpr), 1, 1)) - 1) * 16 +
         (instr('0123456789abcdef', substr(md5($idExpr), 2, 1)) - 1)) % 2"""

  private val welchT =
    """round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
         / nullif(sqrt(
             ((CAST(ss0 AS DOUBLE)
               - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
              / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE)
           + ((CAST(ss1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
              / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)), 0.0), 4) + 0.0"""

  /** Changelog compaction — the CDC-apply half of every lakehouse table
    * format (Delta/Hudi/Iceberg merge-on-read): replay a change log of
    * upserts and deletes into final table state. Latest record per key
    * wins (sequence = event time, unique id as the tiebreaker real CDC
    * streams carry); a terminal DELETE removes the key entirely. Here the
    * event stream IS the changelog: `error` events are the delete marker,
    * everything else upserts the user's row.
    *
    * Scale shape: compaction is ONE partial-aggregable argmax —
    * max(struct(seq, id, op, payload)) per key — so map-side combine
    * collapses each partition to one candidate per key BEFORE the
    * shuffle; the exchange carries ≤ one row per (key × partition), not
    * the log. Struct max isn't hash-bufferable, so Spark plans
    * SortAggregate with PARTITION-LOCAL key sorts (global=false) on the
    * already-collapsed stream — CPU-linear-ish, no extra exchange. The
    * row_number-per-key formulation this replaces shuffles the FULL log
    * and sorts it per key on the reduce side; at 100 TB of CDC history
    * the shuffle volume is the lake, vs one candidate row per key here.
    * The struct's field order makes lexicographic max ≡ ORDER BY seq
    * DESC, id DESC.
    */
  private val cdcLogCompact = Q(
    "cdc_log_compact",
    (s, dir) => {
      val log = Tables.events(s, dir).select(
        col("user_id"), unix_micros(col("ts")).as("seq"), col("event_id"),
        col("event_type"), expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vq"))
      log.groupBy(col("user_id"))
        .agg(max(struct(col("seq"), col("event_id"), col("event_type"),
          col("vq"))).as("last"))
        .where(col("last.event_type") =!= "error") // terminal delete → key gone
        .select(col("user_id"), col("last.seq").as("seq"),
          col("last.event_id").as("event_id"),
          col("last.event_type").as("op"), col("last.vq").as("vq"))
    },
    Some("""SELECT user_id, seq, event_id, event_type AS op, vq
            FROM (SELECT user_id, epoch_ns(ts) // 1000 AS seq, event_id,
                    event_type, CAST(round(value * 100.0, 0) AS BIGINT) AS vq,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 AND op <> 'error'"""))

  private val experimentTtest = Q(
    "experiment_ttest",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vq"))
      val users = ev.select(col("user_id")).distinct()
        .withColumn("arm", expr(md5Arm("CAST(user_id AS STRING)")).cast("long"))
      val types = ev.select(col("event_type")).distinct()
      val cells = ev.groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("vq")).as("cents"))
      val metric = users.crossJoin(broadcast(types))
        .join(cells, Seq("user_id", "event_type"), "left")
        .select(col("event_type"), col("arm"),
          coalesce(col("cents"), lit(0L)).as("x"))
      metric.groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx"))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("arm") === 0, col("n"))).as("n0"),
          max(when(col("arm") === 1, col("n"))).as("n1"),
          max(when(col("arm") === 0, col("sx"))).as("s0"),
          max(when(col("arm") === 1, col("sx"))).as("s1"),
          max(when(col("arm") === 0, col("sxx"))).as("ss0"),
          max(when(col("arm") === 1, col("sxx"))).as("ss1"))
        .withColumn("t_stat", coalesce(expr(welchT), lit(0.0)))
        .select(col("event_type"), col("n0"), col("n1"),
          expr("round(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0, 4) + 0.0")
            .as("mean0"),
          expr("round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 4) + 0.0")
            .as("mean1"),
          col("t_stat"), (abs(col("t_stat")) > 1.96).as("significant"))
    },
    Some(s"""WITH ev AS (
              SELECT user_id, event_type,
                CAST(round(value * 100.0, 0) AS BIGINT) AS vq
              FROM events),
            users AS (
              SELECT user_id,
                CAST(${md5Arm("CAST(user_id AS VARCHAR)")} AS BIGINT) AS arm
              FROM (SELECT DISTINCT user_id FROM ev)),
            types AS (SELECT DISTINCT event_type FROM ev),
            cells AS (
              SELECT user_id, event_type, CAST(sum(vq) AS BIGINT) AS cents
              FROM ev GROUP BY user_id, event_type),
            metric AS (
              SELECT t.event_type, u.arm, coalesce(c.cents, 0) AS x
              FROM users u CROSS JOIN types t
              LEFT JOIN cells c
                ON c.user_id = u.user_id AND c.event_type = t.event_type),
            arms AS (
              SELECT event_type, arm, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM metric GROUP BY event_type, arm),
            wide AS (
              SELECT event_type,
                max(CASE WHEN arm = 0 THEN n END) AS n0,
                max(CASE WHEN arm = 1 THEN n END) AS n1,
                max(CASE WHEN arm = 0 THEN sx END) AS s0,
                max(CASE WHEN arm = 1 THEN sx END) AS s1,
                max(CASE WHEN arm = 0 THEN sxx END) AS ss0,
                max(CASE WHEN arm = 1 THEN sxx END) AS ss1
              FROM arms GROUP BY event_type)
            SELECT event_type, n0, n1,
              round(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 100.0, 4) + 0.0
                AS mean0,
              round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 4) + 0.0
                AS mean1,
              coalesce($welchT, 0.0) AS t_stat,
              abs(coalesce($welchT, 0.0)) > 1.96 AS significant
            FROM wide"""))

  /** Sample-ratio-mismatch guardrail for the A/B readout: before trusting
    * `experiment_ttest`, verify the md5 arm split actually lands 50/50
    * WITHIN each exposure segment (users who triggered the event type) —
    * segment-level SRM is how assignment bugs are localized in practice.
    * One-degree chi-square with equal expectation reduces to
    * (n0−n1)²/(n0+n1); counts are exact BIGINTs so the statistic is
    * integer micro-units (no doubles anywhere), flagged above the
    * p=0.05 df=1 critical value 3.841459. Scale: participation distinct
    * + one user-keyed join + a segment-count aggregate — nothing wider
    * than the event scan, output is |event types| rows.
    */
  private val abSrmCheck = Q(
    "ab_srm_check",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"))
      val users = ev.select(col("user_id")).distinct()
        .withColumn("arm", expr(md5Arm("CAST(user_id AS STRING)")).cast("long"))
      ev.distinct() // exposure: the user triggered this event type at all
        .join(users, Seq("user_id"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
        .withColumn("chi2_micro",
          expr("(n0 - n1) * (n0 - n1) * 1000000 div (n0 + n1)"))
        .select(col("event_type"), col("n0"), col("n1"), col("chi2_micro"),
          (col("chi2_micro") > 3841459L).as("srm"))
    },
    Some(s"""WITH users AS (
              SELECT user_id,
                CAST(${md5Arm("CAST(user_id AS VARCHAR)")} AS BIGINT) AS arm
              FROM (SELECT DISTINCT user_id FROM events)),
            expo AS (SELECT DISTINCT user_id, event_type FROM events),
            seg AS (
              SELECT e.event_type,
                CAST(sum(CASE WHEN u.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                CAST(sum(CASE WHEN u.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
              FROM expo e JOIN users u ON u.user_id = e.user_id
              GROUP BY e.event_type)
            SELECT event_type, n0, n1,
              CAST((n0 - n1) * (n0 - n1) * 1000000 // (n0 + n1) AS BIGINT)
                AS chi2_micro,
              (n0 - n1) * (n0 - n1) * 1000000 // (n0 + n1) > 3841459 AS srm
            FROM seg"""))

  /** Time-bounded funnel (conversion window): view → click → purchase
    * where each next step must land within ONE DAY of the previous one —
    * the funnel analysts actually run (unbounded funnels credit
    * conversions months later). Composed from the native as-of operator:
    * each step is a forward as-of join with `tolerance` (earliest later
    * event of the step type within the window), so the whole funnel is a
    * chain of O(1)-state streaming merges — two shuffles per step, no
    * per-user event-list materialization, no rank windows. Users who
    * miss a step carry null times forward (a null left time never
    * matches — the exec's null contract), so one pass emits every
    * user's deepest stage.
    */
  private val funnelWindow = Q(
    "funnel_window",
    (s, dir) => {
      val DayUs = 86400000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("us").as("c_us"))
      val s2 = graft.plans.AsOf.joinForward(views, clicks,
          Seq("user_id"), Seq("c_user_id"), "t1", "c_us",
          strict = true, tolerance = Some(DayUs))
        .select(col("user_id"), col("t1"), col("c_us").as("t2"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("us").as("p_us"))
      graft.plans.AsOf.joinForward(s2, purchases,
          Seq("user_id"), Seq("p_user_id"), "t2", "p_us",
          strict = true, tolerance = Some(DayUs))
        .select(col("user_id"), col("t1"),
          coalesce(col("t2"), lit(-1L)).as("t2"),
          coalesce(col("p_us"), lit(-1L)).as("t3"),
          (lit(1L) + col("t2").isNotNull.cast("long")
            + col("p_us").isNotNull.cast("long")).as("stage"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
                        FROM events),
            v AS (SELECT user_id, min(us) AS t1 FROM ev
                  WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT v.user_id, v.t1, t.c_us AS t2
                   FROM v LEFT JOIN LATERAL (
                     SELECT c.us AS c_us FROM ev c
                     WHERE c.user_id = v.user_id AND c.event_type = 'click'
                       AND c.us > v.t1 AND c.us - v.t1 <= 86400000000
                     ORDER BY c.us LIMIT 1) t ON TRUE),
            s3 AS (SELECT s2.user_id, s2.t1, s2.t2, t.p_us AS t3
                   FROM s2 LEFT JOIN LATERAL (
                     SELECT p.us AS p_us FROM ev p
                     WHERE p.user_id = s2.user_id AND p.event_type = 'purchase'
                       AND s2.t2 IS NOT NULL AND p.us > s2.t2
                       AND p.us - s2.t2 <= 86400000000
                     ORDER BY p.us LIMIT 1) t ON TRUE)
            SELECT user_id, t1, coalesce(t2, -1) AS t2, coalesce(t3, -1) AS t3,
              CAST(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
                     + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                AS stage
            FROM s3"""))

  // Point-in-time (as-of-validity) dimension join — the consumer side of
  // cdc_scd2: each fact row joins the dimension VERSION that was valid at
  // the fact's event time, the lookup every fact load against a type-2
  // dimension performs (and the bitemporal query `FOR SYSTEM_TIME AS OF`
  // sugars). The dimension side is change-compressed (rows = tier
  // CHANGES, not the event stream), so the equi-join on user_id meets a
  // few versions per user and the validity range is a cheap post-join
  // predicate — the range_join discipline: the equi key drives the
  // shuffle, intervals never cross-product. Disjoint [from, to] intervals
  // per user guarantee ≤ 1 match per fact; facts before the first change
  // surface as tier 'none' via the left join.
  private val joinScd2Pit = Q(
    "join_scd2_pit",
    (s, dir) => {
      val dim = scd2Dim(s, dir)
      val facts = Tables.events(s, dir)
        .where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      facts.join(dim,
          facts("user_id") === dim("user_id") &&
            col("us") >= col("valid_from") &&
            (col("valid_to").isNull || col("us") <= col("valid_to")),
          "left")
        .select(col("event_id"), facts("user_id").as("user_id"), col("us"),
          coalesce(col("tier"), lit("none")).as("tier"))
    },
    Some(s"""WITH $scd2OracleCte,
            facts AS (
              SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
              FROM events WHERE event_type = 'view')
            SELECT f.event_id, f.user_id, f.us,
              coalesce(d.tier, 'none') AS tier
            FROM facts f LEFT JOIN dim d
              ON d.user_id = f.user_id AND f.us >= d.valid_from
              AND (d.valid_to IS NULL OR f.us <= d.valid_to)"""))

  // Gaps-and-islands: per-user consecutive-ACTIVE-DAY streaks (the
  // engagement metric behind "7-day streak" badges and churn features) —
  // the one windowed shape the battery still lacked. The classic
  // day − row_number() island key turns consecutive days into a constant
  // group; everything after the per-user window is a partial aggregate.
  // Scale: distinct (user, day) FIRST (partial-agg collapse of the raw
  // stream), the window sorts per user inside hash partitions, and the
  // longest-streak argmax is one combine-aggregated max(struct) — no
  // second window, no per-user re-sort.
  private val streakIslands = Q(
    "streak_islands",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val days = Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(struct(col("len"), (-col("start_day")).as("neg"))).as("best"))
        .select(col("user_id"), col("n_active_days"), col("n_streaks"),
          col("best.len").as("longest_streak"),
          (-col("best.neg")).as("longest_start_day"))
    },
    Some("""WITH days AS (
              SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
              FROM events),
            isl AS (
              SELECT user_id,
                day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                  AS grp, day
              FROM days),
            streaks AS (
              SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
                min(day) AS start_day
              FROM isl GROUP BY user_id, grp),
            mx AS (
              SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                CAST(count(*) AS BIGINT) AS n_streaks, max(len) AS ml
              FROM streaks GROUP BY user_id)
            SELECT m.user_id, m.n_active_days, m.n_streaks,
              CAST(m.ml AS BIGINT) AS longest_streak,
              CAST(min(s.start_day) AS BIGINT) AS longest_start_day
            FROM mx m JOIN streaks s
              ON s.user_id = m.user_id AND s.len = m.ml
            GROUP BY m.user_id, m.n_active_days, m.n_streaks, m.ml"""))

  // Week-over-week growth — the period-over-period trend readout every
  // metrics dashboard leads with. Calendar lag is a self-join on
  // (event_type, day − 7), not a row-offset window: lag(7) over daily
  // rows silently compares the wrong days the moment a day is missing,
  // while the join keys the comparison on the calendar. Scale: two
  // partial-aggregated daily rollups joined on a tiny composite key;
  // growth quantized by flooring the one double division both engines
  // compute from identical integers (floor of the same correctly-rounded
  // double — the §7.4.1 rule for possibly-negative quotients, where
  // integer div/`//` would diverge).
  private val trendWowGrowth = Q(
    "trend_wow_growth",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("vc")).as("cents"))
        .localCheckpoint(eager = true) // current side + lagged side
      daily.join(daily.select(col("event_type"),
          (col("day") + 7L).as("day"), col("cnt").as("prev_cnt"),
          col("cents").as("prev_cents")),
          Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("cnt"), col("prev_cnt"),
          col("cents"), col("prev_cents"),
          expr("""CAST(floor(CAST((cnt - prev_cnt) * 10000 AS DOUBLE)
                     / CAST(prev_cnt AS DOUBLE)) AS BIGINT)""")
            .as("cnt_growth_bp"),
          expr("""CASE WHEN prev_cents = 0 THEN NULL
                  ELSE CAST(floor(CAST((cents - prev_cents) * 10000 AS DOUBLE)
                     / CAST(prev_cents AS DOUBLE)) AS BIGINT) END""")
            .as("cents_growth_bp"))
    },
    Some("""WITH daily AS (
              SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT)
                  AS cents
              FROM events GROUP BY event_type, 2)
            SELECT c.event_type, c.day, c.cnt, p.cnt AS prev_cnt,
              c.cents, p.cents AS prev_cents,
              CAST(floor(CAST((c.cnt - p.cnt) * 10000 AS DOUBLE)
                / CAST(p.cnt AS DOUBLE)) AS BIGINT) AS cnt_growth_bp,
              CASE WHEN p.cents = 0 THEN NULL
              ELSE CAST(floor(CAST((c.cents - p.cents) * 10000 AS DOUBLE)
                / CAST(p.cents AS DOUBLE)) AS BIGINT) END AS cents_growth_bp
            FROM daily c JOIN daily p
              ON p.event_type = c.event_type AND p.day = c.day - 7"""))

  // Seasonal anomaly detection: each day's event count z-scored against
  // its event type's OWN day-of-week baseline — the decomposition that
  // stops every Saturday from alerting as a dip. Day-of-week comes from
  // pure epoch-day arithmetic ((day + 4) % 7, 1970-01-01 = Thursday) so
  // both engines agree without touching calendar functions. Exact BIGINT
  // (n, Σ, Σ²) per (type, dow) — ≤ 7·|types| baseline cells — broadcast
  // back over the daily rollup; the anomaly_zscore determinism recipe.
  private val trendDowAnomaly = Q(
    "trend_dow_anomaly",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dow", expr("(day + 4) % 7"))
        .localCheckpoint(eager = true) // baseline + scoring sides
      val base = daily.groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sv"),
          sum(expr("cnt * cnt")).as("svv"))
      daily.join(broadcast(base), Seq("event_type", "dow"))
        .withColumn("z", expr(
          """round((CAST(cnt AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
               / nullif(sqrt((CAST(svv AS DOUBLE)
                   - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE)), 0.0), 4) + 0.0"""))
        .select(col("event_type"), col("day"), col("dow"), col("cnt"),
          coalesce(col("z"), lit(0.0)).as("z"),
          (abs(coalesce(col("z"), lit(0.0))) > 2.0).as("anomaly"))
    },
    Some("""WITH daily AS (
              SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
                CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY event_type, 2),
            wd AS (SELECT event_type, day, cnt, (day + 4) % 7 AS dow FROM daily),
            base AS (
              SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cnt) AS BIGINT) AS sv,
                CAST(sum(cnt * cnt) AS BIGINT) AS svv
              FROM wd GROUP BY event_type, dow)
            SELECT w.event_type, w.day, w.dow, w.cnt,
              coalesce(z, 0.0) AS z, abs(coalesce(z, 0.0)) > 2.0 AS anomaly
            FROM (SELECT w.event_type, w.day, w.dow, w.cnt,
                    round((CAST(w.cnt AS DOUBLE) - CAST(b.sv AS DOUBLE) / CAST(b.n AS DOUBLE))
                      / nullif(sqrt((CAST(b.svv AS DOUBLE)
                          - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE) / CAST(b.n AS DOUBLE))
                        / CAST(b.n AS DOUBLE)), 0.0), 4) + 0.0 AS z
                  FROM wd w JOIN base b
                    ON b.event_type = w.event_type AND b.dow = w.dow) w"""))

  // Usage-concentration readout: exact Gini coefficient of per-user event
  // counts plus the top-decile share — the "do 10% of users generate 90%
  // of traffic" dashboard number. The eval_auc_rank discipline again:
  // both statistics look like they need a corpus sort (all-pairs |xi−xj|
  // for Gini, a global rank for the decile) but the per-user count lives
  // on a BOUNDED lattice, so everything folds into the count-of-counts
  // histogram — the Gini numerator is a histogram self-join (bounded²
  // cells), the decile walk is a cumulative window over the same bounded
  // frame, and Gini ships as an exact integer fraction (no division).
  private val eventsConcentration = Q(
    "events_concentration",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("nc"))
        .localCheckpoint(eager = true) // totals + gini self-join + decile walk
      val tot = hist.agg(sum(col("nc")).as("n"),
        sum(col("c") * col("nc")).as("total"))
      val gini = hist.select(col("c").as("cx"), col("nc").as("nx"))
        .crossJoin(hist.select(col("c").as("cy"), col("nc").as("ny")))
        .agg(sum(col("nx") * col("ny") * abs(col("cx") - col("cy")))
          .as("gini_num"))
      val w = Window.orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val topd = hist
        .withColumn("cum_before", coalesce(sum(col("nc")).over(w), lit(0L)))
        .crossJoin(broadcast(tot))
        .select(expr("""greatest(CAST(0 AS BIGINT),
                          least(nc, n div 10 - cum_before)) * c""").as("ev"))
        .agg(sum(col("ev")).as("topd_events"))
      tot.crossJoin(gini).crossJoin(topd)
        .select(col("n").as("n_users"), col("total").as("total_events"),
          col("gini_num"), (lit(2L) * col("n") * col("total")).as("gini_den"),
          expr("n div 10").as("topd_users"), col("topd_events"),
          expr("topd_events * 1000000 div total").as("topd_share_ppm"))
    },
    Some("""WITH uc AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY user_id),
            hist AS (
              SELECT c, CAST(count(*) AS BIGINT) AS nc FROM uc GROUP BY c),
            tot AS (
              SELECT CAST(sum(nc) AS BIGINT) AS n,
                CAST(sum(c * nc) AS BIGINT) AS total
              FROM hist),
            gini AS (
              SELECT CAST(sum(x.nc * y.nc * abs(x.c - y.c)) AS BIGINT)
                AS gini_num
              FROM hist x, hist y),
            walk AS (
              SELECT c, nc, coalesce(sum(nc) OVER (ORDER BY c DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS cum_before
              FROM hist),
            topd AS (
              SELECT CAST(sum(greatest(0,
                least(nc, tot.n // 10 - cum_before)) * c) AS BIGINT)
                AS topd_events
              FROM walk, tot)
            SELECT tot.n AS n_users, tot.total AS total_events,
              gini.gini_num, CAST(2 * tot.n * tot.total AS BIGINT) AS gini_den,
              CAST(tot.n // 10 AS BIGINT) AS topd_users,
              topd.topd_events,
              CAST(topd.topd_events * 1000000 // tot.total AS BIGINT)
                AS topd_share_ppm
            FROM tot, gini, topd"""))

  /** Exponentially weighted moving average of the daily event count per
    * event_type, α = 1/4 over a trailing 12-day horizon — the smoothed
    * trend line read next to trend_wow_growth's step ratios. EWMA is the
    * classic order-dependent recurrence; here it is EXACT integer math:
    * with α = 1/4 the age-k weight is 3^k·4^(11−k) (a fixed 12-entry
    * BIGINT table), so each data day just EMITS its 12 weighted forward
    * contributions (a bounded explode riding the daily aggregate — fan-out
    * 12 on days×types rows, never on raw events), one groupBy sums them,
    * and the normalizer is the closed form Σ = 4^12 − 3^12. Trailing
    * horizon truncation (pre-history = 0) is the declared semantics, so
    * the denominator is constant and everything divides exactly in
    * per-mille. Missing days count 0 via the min..max day grid (the
    * resample_ffill pattern) and still receive trailing mass from
    * earlier days' contributions.
    */
  /** The one weight table (3^k·4^(11−k)) and normalizer (4^12 − 3^12) —
    * OWNED by the speed layer and referenced here so the batch query and
    * [[graft.streaming.StreamEwma]] cannot drift (the stream ≡ batch
    * parity contract is true by construction, not by test alone). */
  private def EwmaWeights: Seq[Long] = graft.streaming.StreamEwma.Weights

  private val tsEwma = Q(
    "ts_ewma",
    (s, dir) => {
      val norm = EwmaWeights.sum // 4^12 − 3^12 = 16245775
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_no"))
        .groupBy(col("event_type"), col("day_no"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(eager = true) // grid bounds + contributions + readout
      val grid = daily.groupBy(col("event_type"))
        .agg(min(col("day_no")).as("d0"), max(col("day_no")).as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1)")).as("day_no"))
      val contrib = daily
        .select(col("event_type"), col("day_no"), col("cnt"),
          explode(expr("sequence(0, 11)")).as("k"))
        .select(col("event_type"), (col("day_no") + col("k")).as("day_no"),
          expr(s"cnt * element_at(array(${EwmaWeights.mkString("L,")}L), " +
            "CAST(k + 1 AS INT))").as("w"))
        .groupBy(col("event_type"), col("day_no"))
        .agg(sum(col("w")).as("sw"))
      grid
        .join(daily, Seq("event_type", "day_no"), "left")
        .join(contrib, Seq("event_type", "day_no"), "left")
        .select(col("event_type"), col("day_no"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          expr(s"1000 * coalesce(sw, 0L) div $norm").as("ewma_milli"))
    },
    Some {
      val w = EwmaWeights.mkString("[", ", ", "]")
      val norm = EwmaWeights.sum
      s"""WITH daily AS (
            SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day_no,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2),
          grid AS (
            SELECT event_type, unnest(range(min(day_no), max(day_no) + 1))
                     AS day_no
            FROM daily GROUP BY event_type),
          contrib AS (
            SELECT event_type, day_no + k AS day_no,
                   CAST(sum(cnt * ($w)[k + 1]) AS BIGINT) AS sw
            FROM (SELECT event_type, day_no, cnt,
                         unnest(range(0, 12)) AS k
                  FROM daily)
            GROUP BY 1, 2)
          SELECT g.event_type, g.day_no,
                 coalesce(d.cnt, 0) AS cnt,
                 CAST(1000 * coalesce(c.sw, 0) // $norm AS BIGINT) AS ewma_milli
          FROM grid g
          LEFT JOIN daily d ON d.event_type = g.event_type AND d.day_no = g.day_no
          LEFT JOIN contrib c ON c.event_type = g.event_type AND c.day_no = g.day_no"""
    })

  /** One-sided CUSUM change detection (Page 1954) on the daily count
    * per event_type — the sequential drift alarm next to ts_ewma/
    * ts_holt's smoothers and trend_dow_anomaly's pointwise z-score: a
    * slow upward shift too small for any single day to flag accumulates
    * in S_t = max(0, S_{t−1} + x_t − (μ + κ)) until it crosses h. The
    * max() makes this recurrence NON-linear — no weight-table recast
    * exists (the ts_ewma/ts_holt trick is linearity) — so the engine
    * folds it: per type ONE sorted day array (the min..max grid, gaps
    * at 0) and a codegen `aggregate` that carries the running S, with
    * μ from the type's own day mean, κ = μ/4 (slack) and h = μ (alarm
    * at one mean-day of accumulated excess), all exact integer milli.
    * Scale: one daily aggregate (the shuffle) then one row per type
    * holding a day-span-bounded array (~365·years entries — the
    * window_rolling_median boundedness stance); the oracle replays the
    * fold as a per-type recursive CTE. */
  private val tsCusum = Q(
    "ts_cusum",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_no"))
        .groupBy(col("event_type"), col("day_no"))
        .agg(count(lit(1)).as("cnt"))
      val series = daily.groupBy(col("event_type"))
        .agg(min(col("day_no")).as("d0"), max(col("day_no")).as("d1"),
          sum(col("cnt")).as("tot"),
          map_from_entries(collect_list(struct(col("day_no"), col("cnt"))))
            .as("m"))
        .select(col("event_type"), col("d0"),
          expr("tot * 1000 div (d1 - d0 + 1)").as("mu_milli"),
          expr("""transform(sequence(d0, d1),
                 d -> coalesce(element_at(m, d), 0L))""").as("cnts"))
      series
        .withColumn("states", expr(
          """aggregate(cnts, array(CAST(0 AS BIGINT)),
               (acc, x) -> array_append(acc,
                 greatest(0L, element_at(acc, CAST(size(acc) AS INT))
                   + x * 1000 - (mu_milli + mu_milli div 4))))"""))
        .select(col("event_type"), col("d0"), col("mu_milli"),
          explode(expr(
            """transform(sequence(1, CAST(size(cnts) AS INT)),
                 i -> named_struct('i', i, 'cnt', element_at(cnts, i),
                   's', element_at(states, i + 1)))""")).as("p"))
        .select(col("event_type"),
          (col("d0") + col("p.i") - 1).as("day_no"),
          col("p.cnt").as("cnt"),
          col("p.s").as("cusum_milli"),
          (col("p.s") > col("mu_milli")).as("alarm"))
    },
    Some("""WITH RECURSIVE daily AS (
              SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day_no,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1, 2),
            stats AS (
              SELECT event_type, min(day_no) AS d0, max(day_no) AS d1,
                CAST(sum(cnt) * 1000 // (max(day_no) - min(day_no) + 1)
                  AS BIGINT) AS mu_milli
              FROM daily GROUP BY event_type),
            gdays AS (
              SELECT event_type, mu_milli, d0,
                unnest(range(d0, d1 + 1)) AS day_no
              FROM stats),
            grid AS (
              SELECT g.event_type, g.mu_milli,
                g.day_no,
                CAST(g.day_no - g.d0 + 1 AS BIGINT) AS rn,
                coalesce(d.cnt, 0) AS cnt
              FROM gdays g
              LEFT JOIN daily d
                ON d.event_type = g.event_type AND d.day_no = g.day_no),
            c AS (
              SELECT event_type, mu_milli, rn, day_no, cnt,
                greatest(0, cnt * 1000 - (mu_milli + mu_milli // 4)) AS s
              FROM grid WHERE rn = 1
              UNION ALL
              SELECT g.event_type, g.mu_milli, g.rn, g.day_no, g.cnt,
                greatest(0, c.s + g.cnt * 1000
                  - (g.mu_milli + g.mu_milli // 4))
              FROM c JOIN grid g
                ON g.event_type = c.event_type AND g.rn = c.rn + 1)
            SELECT event_type, day_no, cnt,
              CAST(s AS BIGINT) AS cusum_milli,
              s > mu_milli AS alarm
            FROM c"""))

  /** k-anonymity audit of a quasi-identifier release (Sweeney 2002) —
    * the privacy check run BEFORE publishing any per-user extract: under
    * QI = (nation, market segment, account balance rounded to hundreds),
    * how many customers sit in equivalence classes smaller than k? A
    * row in a size-1 class is re-identifiable by anyone who knows those
    * three attributes; the release gate is "suppress or generalize until
    * rows_below_ppm = 0 at the chosen k". One row per policy threshold
    * k ∈ {2, 5, 10, 20} with the class-size floor and total class count
    * carried for context. The balance bucket FLOORS BEFORE CASTING on a
    * SHIFTED non-negative value (TPC-H acctbal ∈ [−999.99, 9999.99]):
    * the shift keeps Spark's truncating div and DuckDB's flooring //
    * in agreement, and the explicit floor() closes the second, sneakier
    * divergence — Spark's double→BIGINT cast truncates where DuckDB's
    * ROUNDS to nearest (6299.83 + 1000 → 7299 vs 7300), which moves
    * boundary customers across buckets while the threshold aggregates
    * can coincidentally still match. Scale: ONE QI-keyed aggregate;
    * the threshold explode (×4) and all readouts live on the
    * class-sized frame. */
  private val privacyKAnonymity = Q(
    "privacy_k_anonymity",
    (s, dir) => {
      val classes = Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(floor(c_acctbal + 1000.0) AS BIGINT) div 100").as("bal_bucket"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
        .agg(count(lit(1)).as("cs"))
        .localCheckpoint(eager = true) // totals + threshold rollup: ONE scan
      val tot = classes.agg(sum(col("cs")).as("n_rows"),
        count(lit(1)).as("n_classes"), min(col("cs")).as("min_class_size"))
      classes
        .select(explode(expr("array(2L, 5L, 10L, 20L)")).as("k"), col("cs"))
        .groupBy(col("k"))
        .agg(sum(expr("CASE WHEN cs < k THEN cs ELSE 0L END")).as("rows_below"),
          sum(expr("CAST(cs < k AS LONG)")).as("classes_below"))
        .crossJoin(broadcast(tot)) // 1-row totals
        .select(col("k"), col("n_classes"), col("classes_below"),
          col("rows_below"),
          expr("rows_below * 1000000 div n_rows").as("rows_below_ppm"),
          col("min_class_size"))
    },
    Some("""WITH classes AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal + 1000.0) AS BIGINT) // 100 AS bal_bucket,
                CAST(count(*) AS BIGINT) AS cs
              FROM customer GROUP BY 1, 2, 3),
            tot AS (
              SELECT CAST(sum(cs) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_classes,
                CAST(min(cs) AS BIGINT) AS min_class_size
              FROM classes),
            th AS (
              SELECT k, CAST(sum(CASE WHEN cs < k THEN cs ELSE 0 END) AS BIGINT)
                  AS rows_below,
                CAST(sum(CASE WHEN cs < k THEN 1 ELSE 0 END) AS BIGINT)
                  AS classes_below
              FROM classes, (SELECT unnest([2, 5, 10, 20]) AS k)
              GROUP BY k)
            SELECT CAST(k AS BIGINT) AS k, n_classes, classes_below, rows_below,
              CAST(rows_below * 1000000 // n_rows AS BIGINT) AS rows_below_ppm,
              min_class_size
            FROM th, tot"""))

  private val FdrB = 200
  private val FdrAlphaPpm = 50000L // α = 0.05

  /** Benjamini–Hochberg FDR across the A/B metric family — the
    * multiple-comparisons gate every experimentation platform runs on
    * top of per-metric tests (experiment_ttest reads K metrics; at
    * α = 0.05, ~K/20 false "significant" lines are EXPECTED under the
    * null, and BH is the standard correction). Per-metric p-values come
    * from RE-RANDOMIZATION inference (Fisher-style randomization test —
    * exact for a randomized assignment, no normality assumption): the
    * test statistic is the signed sum D = Σ x_u·(±1 by the md5 arm),
    * and the null re-draws the assignment with a seeded fair coin per
    * (user, replica) — the SAME relabeling across all metrics within a
    * replica, so the joint null preserves cross-metric correlation
    * (the property BH's validity under dependence leans on). B = 200,
    * add-one p; then BH: rank p ascending, k_max = max k with
    * p_(k)·m ≤ k·α, decided on the EXACT rational p = (n_extreme+1)/(B+1)
    * by integer cross-multiplication ((n_extreme+1)·10⁶·m ≤
    * k·α_ppm·(B+1)) — the ppm-floored p_ppm column is display-only,
    * since its floor understates p and could reject a boundary
    * hypothesis exact BH accepts. INTEGER END TO END. Scale
    * shape: the user×metric grid rides one checkpointed frame; the ×B
    * explode fans out 3-long rows and map-side combines to metrics × B;
    * ranking and the BH sweep live on the ≤ #metrics frame. */
  private val abFdrBh = Q(
    "ab_fdr_bh",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vq"))
      val users = ev.select(col("user_id")).distinct()
        .withColumn("sgn", expr(
          s"CASE WHEN (${md5Arm("CAST(user_id AS STRING)")}) = 0 THEN 1L ELSE -1L END"))
      val types = ev.select(col("event_type")).distinct()
      val cells = ev.groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("vq")).as("cents"))
      val metric = users.crossJoin(broadcast(types))
        .join(cells, Seq("user_id", "event_type"), "left")
        .select(col("user_id"), col("event_type"), col("sgn"),
          coalesce(col("cents"), lit(0L)).as("x"))
        .localCheckpoint(eager = true) // observed stat + B-replica explode
      val obs = metric.groupBy(col("event_type"))
        .agg(sum(col("sgn") * col("x")).as("d_obs"))
      val coin = graft.queries.PortableHash.md5Byte(
        "concat(CAST(user_id AS STRING), '|', CAST(r AS STRING))")
      val reps = metric
        .select(col("user_id"), col("event_type"), col("x"),
          explode(expr(s"sequence(0, ${FdrB - 1})")).as("r"))
        .select(col("event_type"), col("r"),
          expr(s"CASE WHEN (($coin) % 2) = 0 THEN x ELSE -x END").as("sd"))
        .groupBy(col("event_type"), col("r")).agg(sum(col("sd")).as("ps"))
      val pvals = reps.join(obs, "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("d_obs")).as("d_obs"),
          sum(expr("CAST(abs(ps) >= abs(d_obs) AS LONG)")).as("n_extreme"))
        .select(col("event_type"), col("d_obs"), col("n_extreme"),
          expr(s"((n_extreme + 1) * 1000000) div (${FdrB + 1})").as("p_ppm"))
      val m1 = pvals.agg(count(lit(1)).as("m"))
      val ranked = pvals.crossJoin(broadcast(m1)) // 1-row hypothesis count
        .withColumn("rk", row_number().over(
          Window.orderBy(col("p_ppm"), col("event_type"))).cast("long"))
      // BH decision on the EXACT p = (n_extreme+1)/(B+1) via integer
      // cross-multiplication (ADVICE r08 #2): the ppm FLOOR understates
      // p, so a boundary hypothesis could be rejected that exact BH
      // accepts. p_ppm stays display-only. (Ordering by p_ppm is still
      // ordering by exact p: the floor is injective over n_extreme —
      // steps of ~1e6/(B+1) ≫ 1.)
      val kmax = ranked.agg(coalesce(max(
        when((col("n_extreme") + 1) * lit(1000000L) * col("m")
            <= col("rk") * lit(FdrAlphaPpm) * lit(FdrB + 1L),
          col("rk"))), lit(0L)).as("k_max"))
      ranked.crossJoin(broadcast(kmax)) // 1-row BH cutoff
        .select(col("event_type"), col("d_obs"), col("p_ppm"), col("rk"),
          expr(s"rk * $FdrAlphaPpm div m").as("bh_thresh_ppm"),
          (col("rk") <= col("k_max")).as("rejected"))
    },
    Some {
      val coin = graft.queries.PortableHash.md5Byte(
        "CAST(user_id AS VARCHAR) || '|' || CAST(r AS VARCHAR)")
      s"""WITH ev AS (
            SELECT user_id, event_type,
              CAST(round(value * 100.0, 0) AS BIGINT) AS vq
            FROM events),
          users AS (
            SELECT user_id,
              CASE WHEN (${md5Arm("CAST(user_id AS VARCHAR)")}) = 0
                   THEN 1 ELSE -1 END AS sgn
            FROM (SELECT DISTINCT user_id FROM ev)),
          types AS (SELECT DISTINCT event_type FROM ev),
          cells AS (
            SELECT user_id, event_type, CAST(sum(vq) AS BIGINT) AS cents
            FROM ev GROUP BY user_id, event_type),
          metric AS (
            SELECT u.user_id, t.event_type, u.sgn, coalesce(c.cents, 0) AS x
            FROM users u CROSS JOIN types t
            LEFT JOIN cells c
              ON c.user_id = u.user_id AND c.event_type = t.event_type),
          obs AS (
            SELECT event_type, CAST(sum(sgn * x) AS BIGINT) AS d_obs
            FROM metric GROUP BY event_type),
          reps AS (
            SELECT event_type, r,
              CAST(sum(CASE WHEN (($coin) % 2) = 0 THEN x ELSE -x END)
                AS BIGINT) AS ps
            FROM (SELECT user_id, event_type, x,
                    unnest(range(0, $FdrB)) AS r
                  FROM metric)
            GROUP BY event_type, r),
          pvals AS (
            SELECT o.event_type, o.d_obs,
              CAST(sum(CASE WHEN abs(r.ps) >= abs(o.d_obs)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
              ((CAST(sum(CASE WHEN abs(r.ps) >= abs(o.d_obs)
                    THEN 1 ELSE 0 END) AS BIGINT) + 1) * 1000000)
                // ${FdrB + 1} AS p_ppm
            FROM reps r JOIN obs o ON o.event_type = r.event_type
            GROUP BY o.event_type, o.d_obs),
          m1 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pvals),
          ranked AS (
            SELECT p.event_type, p.d_obs, p.n_extreme, p.p_ppm, m1.m,
              CAST(row_number() OVER (ORDER BY p.p_ppm, p.event_type)
                AS BIGINT) AS rk
            FROM pvals p, m1),
          kmax AS (
            SELECT coalesce(max(CASE WHEN
                (n_extreme + 1) * 1000000 * m
                  <= rk * $FdrAlphaPpm * ${FdrB + 1}
                THEN rk END), 0) AS k_max
            FROM ranked)
          SELECT event_type, d_obs, p_ppm, rk,
            CAST(rk * $FdrAlphaPpm // m AS BIGINT) AS bh_thresh_ppm,
            rk <= k_max AS rejected
          FROM ranked, kmax"""
    })

  /** l-diversity audit — the release gate k-anonymity alone cannot give:
    * a class can be large (k-anonymous) yet carry ONE sensitive value,
    * so membership still discloses the attribute (the homogeneity
    * attack). Quasi-identifiers here are (nation, balance bucket); the
    * sensitive attribute is the market segment; a class is l-diverse
    * when it carries ≥ l DISTINCT sensitive values. One row per policy
    * threshold l ∈ {2, 3, 5} with rows/classes below, plus the corpus
    * floor. The balance bucket reuses privacy_k_anonymity's
    * shift-floor-then-cast discipline (Spark truncating div vs DuckDB
    * flooring //, double→BIGINT cast truncation vs rounding). Scale:
    * ONE QI-keyed aggregate carrying a distinct-count (partial-aggregable
    * per class since segments per class ≤ 5); thresholds explode (×3)
    * on the class-sized frame. */
  private val privacyLDiversity = Q(
    "privacy_l_diversity",
    (s, dir) => {
      val classes = Tables.customer(s, dir)
        .select(col("c_nationkey"),
          expr("CAST(floor(c_acctbal + 1000.0) AS BIGINT) div 100").as("bal_bucket"),
          col("c_mktsegment"))
        .groupBy(col("c_nationkey"), col("bal_bucket"))
        .agg(count(lit(1)).as("cs"),
          countDistinct(col("c_mktsegment")).as("ds"))
        .localCheckpoint(eager = true) // totals + threshold rollup: ONE scan
      val tot = classes.agg(sum(col("cs")).as("n_rows"),
        count(lit(1)).as("n_classes"), min(col("ds")).as("min_distinct"))
      classes
        .select(explode(expr("array(2L, 3L, 5L)")).as("l"), col("cs"), col("ds"))
        .groupBy(col("l"))
        .agg(sum(expr("CASE WHEN ds < l THEN cs ELSE 0L END")).as("rows_below"),
          sum(expr("CAST(ds < l AS LONG)")).as("classes_below"))
        .crossJoin(broadcast(tot)) // 1-row totals
        .select(col("l"), col("n_classes"), col("classes_below"),
          col("rows_below"),
          expr("rows_below * 1000000 div n_rows").as("rows_below_ppm"),
          col("min_distinct"))
    },
    Some("""WITH classes AS (
              SELECT c_nationkey,
                CAST(floor(c_acctbal + 1000.0) AS BIGINT) // 100 AS bal_bucket,
                CAST(count(*) AS BIGINT) AS cs,
                CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS ds
              FROM customer GROUP BY 1, 2),
            tot AS (
              SELECT CAST(sum(cs) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_classes,
                CAST(min(ds) AS BIGINT) AS min_distinct
              FROM classes),
            th AS (
              SELECT l, CAST(sum(CASE WHEN ds < l THEN cs ELSE 0 END) AS BIGINT)
                  AS rows_below,
                CAST(sum(CASE WHEN ds < l THEN 1 ELSE 0 END) AS BIGINT)
                  AS classes_below
              FROM classes, (SELECT unnest([2, 3, 5]) AS l)
              GROUP BY l)
            SELECT CAST(l AS BIGINT) AS l, n_classes, classes_below, rows_below,
              CAST(rows_below * 1000000 // n_rows AS BIGINT) AS rows_below_ppm,
              min_distinct
            FROM th, tot"""))

  /** Kaplan–Meier survival over user lifetimes — the censoring-aware
    * churn curve cohort_retention cannot give (a user still active at
    * observation end is EVIDENCE of survival ≥ t, not of churn at t;
    * naive retention counts them as churned). Lifetime = last − first
    * event day; users with last_day within 2 days of the corpus max are
    * right-censored (still active). At each distinct lifetime t:
    * n_risk = users with lifetime ≥ t (suffix sum), n_deaths = uncensored
    * users ending exactly at t, and Ŝ(t) = Π (n−d)/n over u ≤ t.
    * Determinism for the order-dependent product: per-STEP micro-nat
    * quantization round(ln((n−d)/n)·10⁶) (the §7.4.1 per-row rule — both
    * engines take ln of the identical rational double), then exact
    * integer cumulative sum, then ONE exp readout rounded to ppm. A step
    * where everyone at risk dies (ln 0) sets a cumulative dead-end flag
    * instead of propagating −∞. Scale: ONE user-keyed aggregate over the
    * scan (the shuffle), then everything lives on the lifetime-keyed
    * frame — bounded by the day span, so the unpartitioned suffix/prefix
    * windows sort a few-thousand-row frame at any corpus size. */
  private val survivalKm = Q(
    "survival_km",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val users = Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .localCheckpoint(eager = true) // observation end + lifetimes: ONE scan
      val mx = users.agg(max(col("d1")).as("mx"))
      val byT = users.crossJoin(broadcast(mx)) // 1-row observation end
        .select((col("d1") - col("d0")).as("t"),
          expr("CAST(d1 >= mx - 2 AS LONG)").as("cens"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("n_ending"), sum(col("cens")).as("n_censored"),
          (count(lit(1)) - sum(col("cens"))).as("n_deaths"))
      val suffix = Window.orderBy(col("t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT
        .withColumn("n_risk", sum(col("n_ending")).over(suffix))
        .withColumn("step_micro", expr(
          """CASE WHEN n_deaths = 0 OR n_deaths >= n_risk THEN 0L
               ELSE CAST(round(ln(CAST(n_risk - n_deaths AS DOUBLE)
                    / CAST(n_risk AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
             END"""))
        .withColumn("dead", expr("CAST(n_deaths >= n_risk AS INT)"))
        .withColumn("cum_micro", sum(col("step_micro")).over(prefix))
        .withColumn("dead_end", max(col("dead")).over(prefix))
        .select(col("t"), col("n_risk"), col("n_deaths"), col("n_censored"),
          expr("""CASE WHEN dead_end = 1 THEN 0L
                    ELSE CAST(round(exp(CAST(cum_micro AS DOUBLE) / 1000000.0)
                         * 1000000.0, 0) AS BIGINT) END""").as("surv_ppm"))
    },
    Some("""WITH users AS (
              SELECT user_id, min(epoch_ns(ts) // 1000 // 86400000000) AS d0,
                     max(epoch_ns(ts) // 1000 // 86400000000) AS d1
              FROM events GROUP BY user_id),
            byt AS (
              SELECT d1 - d0 AS t, CAST(count(*) AS BIGINT) AS n_ending,
                     CAST(sum(CAST(d1 >= mx - 2 AS BIGINT)) AS BIGINT) AS n_censored,
                     CAST(count(*) - sum(CAST(d1 >= mx - 2 AS BIGINT)) AS BIGINT)
                       AS n_deaths
              FROM users, (SELECT max(d1) AS mx FROM users)
              GROUP BY d1 - d0),
            risk AS (
              SELECT t, n_ending, n_censored, n_deaths,
                CAST(sum(n_ending) OVER (ORDER BY t
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                  AS n_risk
              FROM byt),
            step AS (
              SELECT t, n_risk, n_deaths, n_censored,
                CASE WHEN n_deaths = 0 OR n_deaths >= n_risk THEN 0
                  ELSE CAST(round(ln(CAST(n_risk - n_deaths AS DOUBLE)
                       / CAST(n_risk AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
                END AS step_micro,
                CASE WHEN n_deaths >= n_risk THEN 1 ELSE 0 END AS dead
              FROM risk),
            cum AS (
              SELECT t, n_risk, n_deaths, n_censored,
                CAST(sum(step_micro) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_micro,
                max(dead) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead_end
              FROM step)
            SELECT t, n_risk, n_deaths, n_censored,
              CASE WHEN dead_end = 1 THEN 0
                ELSE CAST(round(exp(CAST(cum_micro AS DOUBLE) / 1000000.0)
                     * 1000000.0, 0) AS BIGINT) END AS surv_ppm
            FROM cum"""))

  /** The Holt coefficient tables and constants — OWNED by the speed
    * layer ([[graft.streaming.StreamHolt]], where the symbolic BigInt
    * derivation and its exactness asserts live) and referenced here so
    * the batch query and the stream layer cannot drift (the
    * EwmaWeights/StreamEwma ownership pattern — stream ≡ batch parity
    * on the tables is true by construction, not by test alone). */
  private[graft] def HoltScale: Long = graft.streaming.StreamHolt.Scale
  private[graft] def HoltHorizon: Int = graft.streaming.StreamHolt.Horizon
  private[graft] def holtLevelW: Seq[Long] =
    graft.streaming.StreamHolt.LevelWeights
  private[graft] def holtTrendW: Seq[Long] =
    graft.streaming.StreamHolt.TrendWeights

  /** Holt's linear-trend smoothing (Holt 1957, double exponential
    * smoothing) of the daily event count per event_type — the
    * level + slope companion of ts_ewma's level-only line, and the
    * simplest forecast a capacity planner reads (`forecast = l + b`).
    * The order-dependent recurrence l' = αy + (1−α)(l+b),
    * b' = β(l'−l) + (1−β)b is made EXACT and order-free the same way
    * ts_ewma is: α = β = 1/2 over a trailing 12-day horizon seeded at
    * zero means every observation's coefficient in (l, b) is a fixed
    * dyadic rational — two 12-entry BIGINT tables over 2^24, derived
    * symbolically at class-init ([[holtLevelW]]) — so each data day
    * just EMITS its 12 weighted forward contributions (bounded fan-out
    * riding the daily aggregate, never the raw events) and ONE groupBy
    * sums exact integers. Missing days count 0 via the min..max grid
    * and still receive trailing mass. Trend sums can be NEGATIVE, where
    * Spark's `div` (truncates) and DuckDB's `//` (floors) diverge — the
    * readout instead floors ONE double quotient computed from identical
    * integer inputs on both engines (the eval_agreement κ pattern).
    * Scale: one shuffle on (type, day) partial aggregates; the weight
    * explode fans out 12× on the days×types frame only. */
  private val tsHolt = Q(
    "ts_holt",
    (s, dir) => {
      val wl = holtLevelW.mkString("L,") + "L"
      val wb = holtTrendW.mkString("L,") + "L"
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_no"))
        .groupBy(col("event_type"), col("day_no"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(eager = true) // grid bounds + contributions + readout
      val grid = daily.groupBy(col("event_type"))
        .agg(min(col("day_no")).as("d0"), max(col("day_no")).as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1)")).as("day_no"))
      val contrib = daily
        .select(col("event_type"), col("day_no"), col("cnt"),
          explode(expr(s"sequence(0, ${HoltHorizon - 1})")).as("k"))
        .select(col("event_type"), (col("day_no") + col("k")).as("day_no"),
          expr(s"cnt * element_at(array($wl), CAST(k + 1 AS INT))").as("cl"),
          expr(s"cnt * element_at(array($wb), CAST(k + 1 AS INT))").as("cb"))
        .groupBy(col("event_type"), col("day_no"))
        .agg(sum(col("cl")).as("sl"), sum(col("cb")).as("sb"))
      grid
        .join(daily, Seq("event_type", "day_no"), "left")
        .join(contrib, Seq("event_type", "day_no"), "left")
        .select(col("event_type"), col("day_no"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          expr(s"CAST(floor(CAST(1000 * coalesce(sl, 0L) AS DOUBLE) / $HoltScale.0) AS BIGINT)")
            .as("level_milli"),
          expr(s"CAST(floor(CAST(1000 * coalesce(sb, 0L) AS DOUBLE) / $HoltScale.0) AS BIGINT)")
            .as("trend_milli"),
          expr(s"CAST(floor(CAST(1000 * (coalesce(sl, 0L) + coalesce(sb, 0L)) AS DOUBLE) / $HoltScale.0) AS BIGINT)")
            .as("forecast_milli"))
    },
    Some {
      val wl = holtLevelW.mkString("[", ", ", "]")
      val wb = holtTrendW.mkString("[", ", ", "]")
      s"""WITH daily AS (
            SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day_no,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2),
          grid AS (
            SELECT event_type, unnest(range(min(day_no), max(day_no) + 1))
                     AS day_no
            FROM daily GROUP BY event_type),
          contrib AS (
            SELECT event_type, day_no + k AS day_no,
                   CAST(sum(cnt * ($wl)[k + 1]) AS BIGINT) AS sl,
                   CAST(sum(cnt * ($wb)[k + 1]) AS BIGINT) AS sb
            FROM (SELECT event_type, day_no, cnt,
                         unnest(range(0, $HoltHorizon)) AS k
                  FROM daily)
            GROUP BY 1, 2)
          SELECT g.event_type, g.day_no,
                 coalesce(d.cnt, 0) AS cnt,
                 CAST(floor(CAST(1000 * coalesce(c.sl, 0) AS DOUBLE) / $HoltScale.0) AS BIGINT)
                   AS level_milli,
                 CAST(floor(CAST(1000 * coalesce(c.sb, 0) AS DOUBLE) / $HoltScale.0) AS BIGINT)
                   AS trend_milli,
                 CAST(floor(CAST(1000 * (coalesce(c.sl, 0) + coalesce(c.sb, 0)) AS DOUBLE) / $HoltScale.0) AS BIGINT)
                   AS forecast_milli
          FROM grid g
          LEFT JOIN daily d ON d.event_type = g.event_type AND d.day_no = g.day_no
          LEFT JOIN contrib c ON c.event_type = g.event_type AND c.day_no = g.day_no"""
    })

  /** Differentially-private release of per-(event_type, day) counts —
    * the privacy-preserving usage report a training-data platform
    * publishes about its corpus: Laplace(b = 20) noise on each count
    * (ε = 1/20 per cell at sensitivity 1) plus a minimum-count
    * suppression gate (true count ≥ 10) so small cohorts are withheld
    * entirely rather than released noisily. The noise is SEEDED, not
    * sampled: u ∈ (0,1) derives from the md5 of the cell key (the
    * engine-portable uniform), and Laplace comes out of the inverse CDF
    * −b·sign(u−½)·ln(1−2|u−½|) — deterministic across runs/engines (so
    * the oracle can hash-match) while preserving the exact Laplace shape
    * over the key population; a production deployment swaps the seed
    * derivation for a secret-keyed PRF, changing nothing structural.
    * Noise can be negative and the release is NOT clamped — clamping
    * would bias the estimator. Scale: one partial aggregate over the
    * scan, then per-row codegen math on the (types × days)-bounded frame.
    */
  private val privacyDpCounts = Q(
    "privacy_dp_counts",
    (s, dir) => {
      val u16 = PortableHash.md5Hex4("concat(event_type, '|', CAST(day_no AS STRING))")
      Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_no"))
        .groupBy(col("event_type"), col("day_no"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") >= 10L)
        .withColumn("u2", expr(
          s"(CAST(($u16) AS DOUBLE) + 0.5) / 65536.0 - 0.5"))
        .select(col("event_type"), col("day_no"),
          (col("c") + expr(
            """CAST(round(-20.0 * (CASE WHEN u2 >= 0.0 THEN 1.0 ELSE -1.0 END)
                 * ln(1.0 - 2.0 * abs(u2)), 0) AS BIGINT)"""))
            .as("noisy_count"))
    },
    Some {
      val u16 = PortableHash.md5Hex4("event_type || '|' || CAST(day_no AS VARCHAR)")
      s"""WITH cells AS (
            SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day_no,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
            HAVING count(*) >= 10),
          seeded AS (
            SELECT event_type, day_no, c,
                   (CAST(($u16) AS DOUBLE) + 0.5) / 65536.0 - 0.5 AS u2
            FROM cells)
          SELECT event_type, day_no,
                 c + CAST(round(-20.0 * (CASE WHEN u2 >= 0.0 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * abs(u2)), 0) AS BIGINT) AS noisy_count
          FROM seeded"""
    })

  /** Rolling ORDER statistics — the holistic companion of
    * window_rolling_stats' algebraic sums: per user, the exact LOWER
    * median / min / max of the last 7 observations (integer cents). The
    * median is robust where the mean is spike-dominated — the metric a
    * billing-anomaly baseline actually wants. Exactness is affordable
    * BECAUSE the frame is row-bounded: collect the ≤ 7-element frame
    * list, sort in-core, index (n+1)/2 — O(w log w) per row at w = 7,
    * and the declared scale path past large w is a mergeable quantile
    * sketch (the rolling_active_hll precedent), not a bigger list. The
    * window orders by (us, event_id) — a bare us ties at identical
    * timestamps and would make a ROWS frame engine-dependent; the lower
    * median (not interpolated) keeps every output an exact BIGINT.
    */
  private val windowRollingMedian = Q(
    "window_rolling_median",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // NULL observations are excluded from the series entirely (a NULL
      // must not occupy a frame slot): Spark's collect_list silently
      // drops NULLs while DuckDB's list() keeps them, so without this
      // filter one NULL value would desynchronize the engines
      val ev = Tables.events(s, dir)
        .where(col("value").isNotNull)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      ev.select(col("event_id"), col("user_id"),
          collect_list(col("vc")).over(w).as("vals"))
        .select(col("event_id"), col("user_id"),
          size(col("vals")).cast("long").as("n_win"),
          expr("element_at(array_sort(vals), CAST((size(vals) + 1) div 2 AS INT))")
            .as("med_cents"),
          expr("array_min(vals)").as("min_cents"),
          expr("array_max(vals)").as("max_cents"))
    },
    Some("""SELECT event_id, user_id, CAST(len(vals) AS BIGINT) AS n_win,
              list_sort(vals)[(len(vals) + 1) // 2] AS med_cents,
              list_min(vals) AS min_cents, list_max(vals) AS max_cents
            FROM (SELECT event_id, user_id, list(vc) OVER w AS vals
                  FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
                          CAST(round(value * 100.0, 0) AS BIGINT) AS vc
                        FROM events WHERE value IS NOT NULL)
                  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))"""))

  /** Linear gap interpolation — the bidirectional companion of
    * resample_ffill's carry-forward: each missing day in a per-type
    * daily revenue series takes the exact line between its nearest
    * known neighbors, val(d) = (pc·(nd−d) + nc·(d−pd)) div (nd−pd) in
    * integer milli-cents — the gap-repair shape a metrics warehouse
    * runs before any trend math (ffill biases a rising series down;
    * interpolation doesn't). Anchors come from two ignoreNulls window
    * passes (last-known backward, first-known forward) over the SAME
    * (partition, order) — Spark plans both frames into one Window exec,
    * one sort, one shuffle. Grid endpoints are known days by
    * construction (min/max over the data), so interior gaps always have
    * both anchors; the value ≥ 0 filter makes every operand a
    * non-negative exact integer BY CONSTRUCTION, so Spark's truncating
    * `div` and DuckDB's flooring `//` agree.
    */
  private val resampleInterpolate = Q(
    "resample_interpolate",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the 0.5% user sliver makes the daily series SPARSE at every SF —
      // a dense series never exercises the interpolation path (the full
      // corpus has events for every (type, day) cell even at sf0.001);
      // this is also the realistic shape: gap repair exists for
      // low-traffic per-entity series, not corpus totals
      // value >= 0 ENFORCES the non-negativity the truncating-div/
      // flooring-// agreement below depends on (nothing in the schema
      // forbids a negative correction row, and one negative anchor would
      // make the two engines' integer divisions differ by 1); NULLs are
      // excluded with it
      val ev = Tables.events(s, dir)
        .where(col("user_id") % 199L === 0L &&
          col("value").isNotNull && col("value") >= 0.0)
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_no"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      val daily = ev.groupBy(col("event_type"), col("day_no"))
        .agg(sum(col("vc")).as("c"))
      val grid = ev.groupBy(col("event_type"))
        .agg(min(col("day_no")).as("mn"), max(col("day_no")).as("mx"))
        .select(col("event_type"),
          explode(expr("sequence(mn, mx)")).as("day_no"))
      val wp = Window.partitionBy(col("event_type")).orderBy(col("day_no"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy(col("event_type")).orderBy(col("day_no"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(daily, Seq("event_type", "day_no"), "left")
        .withColumn("pd", last(when(col("c").isNotNull, col("day_no")),
          ignoreNulls = true).over(wp))
        .withColumn("pc", last(col("c"), ignoreNulls = true).over(wp))
        .withColumn("nd", first(when(col("c").isNotNull, col("day_no")),
          ignoreNulls = true).over(wn))
        .withColumn("nc", first(col("c"), ignoreNulls = true).over(wn))
        .select(col("event_type"), col("day_no"),
          col("c").isNull.as("interpolated"),
          expr("""CASE WHEN c IS NOT NULL THEN c * 1000
                  ELSE (pc * (nd - day_no) + nc * (day_no - pd)) * 1000
                       div (nd - pd) END""").as("val_milli"))
    },
    Some("""WITH ev AS (
              SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day_no,
                CAST(round(value * 100.0, 0) AS BIGINT) AS vc
              FROM events
              WHERE user_id % 199 = 0 AND value IS NOT NULL AND value >= 0),
            daily AS (
              SELECT event_type, day_no, CAST(sum(vc) AS BIGINT) AS c
              FROM ev GROUP BY 1, 2),
            grid AS (
              SELECT event_type, unnest(generate_series(mn, mx)) AS day_no
              FROM (SELECT event_type, min(day_no) AS mn, max(day_no) AS mx
                    FROM ev GROUP BY event_type)),
            j AS (
              SELECT g.event_type, g.day_no, d.c
              FROM grid g LEFT JOIN daily d
                ON d.event_type = g.event_type AND d.day_no = g.day_no),
            a AS (
              SELECT event_type, day_no, c,
                last_value(CASE WHEN c IS NOT NULL THEN day_no END IGNORE NULLS)
                  OVER wp AS pd,
                last_value(c IGNORE NULLS) OVER wp AS pc,
                first_value(CASE WHEN c IS NOT NULL THEN day_no END IGNORE NULLS)
                  OVER wn AS nd,
                first_value(c IGNORE NULLS) OVER wn AS nc
              FROM j
              WINDOW wp AS (PARTITION BY event_type ORDER BY day_no
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wn AS (PARTITION BY event_type ORDER BY day_no
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
            SELECT event_type, day_no, (c IS NULL) AS interpolated,
              CASE WHEN c IS NOT NULL THEN c * 1000
                   ELSE (pc * (nd - day_no) + nc * (day_no - pd)) * 1000
                        // (nd - pd) END AS val_milli
            FROM a"""))

  val all: Seq[Q] =
    Seq(funnelSteps, cohortRetention, sessionWindowAgg, eventTransitions,
      windowRollingStats, cdcScd2, resampleFfill, rfmSegments,
      rollingActiveUsers, rollingActiveHll, rollingActiveHllFrame,
      attributionMultitouch,
      experimentTtest, cdcLogCompact, abSrmCheck, abFdrBh, funnelWindow,
      joinScd2Pit, streakIslands, trendWowGrowth, trendDowAnomaly,
      eventsConcentration, tsEwma, tsHolt, tsCusum, survivalKm,
      privacyDpCounts, privacyKAnonymity, privacyLDiversity, windowRollingMedian,
      resampleInterpolate, eventsPathTopk, eventsMarkovStationary)

  /** Top user paths — the "what journeys do users actually take"
    * product-analytics readout next to event_transitions' single-step
    * Markov pairs: per (user, day) session, the first 5 events in
    * (ts, event_id) order joined as a path string, counted across all
    * sessions, top-20 by (count, path). Scale shape: one per-user-day
    * rank window (the sessionize partitioning), the path assembly rides
    * the session aggregate (sorted ≤ 5-element array, no string shuffle
    * until paths are already session-sized), and the final count is a
    * low-cardinality aggregate + TakeOrderedAndProject. The event_id
    * tiebreak makes same-microsecond events deterministic on both
    * engines.
    */
  private lazy val eventsPathTopk = Q(
    "events_path_topk",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("day_no"))
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day_no"),
          unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5)
        .groupBy(col("user_id"), col("day_no"))
        .agg(sort_array(collect_list(struct(col("rk"), col("event_type"))))
          .as("es"))
        .select(expr("array_join(transform(es, e -> e.event_type), '>')")
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    },
    Some("""WITH f AS (
              SELECT user_id, day_no, event_type,
                row_number() OVER (PARTITION BY user_id, day_no
                  ORDER BY us, event_id) AS rk
              FROM (SELECT user_id,
                      epoch_ns(ts) // 1000 // 86400000000 AS day_no,
                      epoch_ns(ts) // 1000 AS us, event_id, event_type
                    FROM events)),
            p AS (
              SELECT string_agg(event_type, '>' ORDER BY rk) AS path
              FROM f WHERE rk <= 5 GROUP BY user_id, day_no)
            SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
            FROM p GROUP BY path
            ORDER BY n_sessions DESC, path
            LIMIT 20"""))
}
