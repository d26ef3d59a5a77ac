package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshaping / OLAP operators the reference lacks entirely (SURVEY.md §2
  * "Not present" row) — pivot, unpivot (melt), and value histograms —
  * expressed with Spark's native operators so Catalyst keeps them inside
  * whole-stage codegen:
  *
  *  - pivot: one hash aggregate over (user_id), conditional sums per
  *    pivot value — a single shuffle regardless of pivot-domain size;
  *  - unpivot: a generate-style expand (no shuffle at all);
  *  - histogram: integer bucket math + one hash aggregate.
  *
  * Determinism (oracle hash-match): double sums are rounded to 2 decimals,
  * integer outputs cast BIGINT on both engines, bucket math is identical
  * IEEE `floor(value / width)` on both.
  */
object OlapQueries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  // Wide per-user metric matrix from the long event stream — pivot with an
  // EXPLICIT value list: Spark then skips the extra distinct-values job and
  // the aggregate stays one pass (the 100 TB shape; an unlisted pivot would
  // first scan the corpus just to learn the domain).
  private val pivotEventType = Q(
    "pivot_event_type",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(sum(col("value")))
        .select(col("user_id") +:
          EventTypes.map(t => round(coalesce(col(t), lit(0.0)), 2).as(s"v_$t")): _*),
    Some {
      val cols = EventTypes.map(t =>
        s"round(coalesce(sum(CASE WHEN event_type = '$t' THEN value END), 0), 2) AS v_$t")
        .mkString(",\n              ")
      s"""SELECT user_id,
              $cols
          FROM events GROUP BY user_id"""
    })

  // Long metric stream from the wide lineitem row — Spark's native unpivot
  // (an Expand node: zero shuffles, each input row fans out to 4).
  private val unpivotMelt = Q(
    "unpivot_melt",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "val"),
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   'l_quantity' AS metric, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount FROM lineitem
            UNION ALL
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_tax', l_tax FROM lineitem"""))

  // Fixed-width value histogram per event type; `floor(value / 10)` is the
  // same IEEE double op on both engines, so buckets match bit-exactly.
  private val histogramBins = Q(
    "histogram_bins",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), floor(col("value") / 10).cast("long").as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("n")),
    Some("""SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, CAST(floor(value / 10) AS BIGINT)"""))

  // Custom typed Aggregator through the official UDAF surface — exercises
  // partial aggregation (reduce per partition, merge at the exchange); the
  // shuffle carries one (sum, weight) buffer per group per partition.
  // Aggregated doubles are rounded to 2 on output (the engine's
  // cross-engine rule for non-ordered double sums).
  private val udafWeightedMean = Q(
    "udaf_weighted_mean",
    (s, dir) => {
      import org.apache.spark.sql.Encoders
      val wm = udaf(graft.functions.WeightedMean,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      Tables.events(s, dir)
        .withColumn("w", (col("user_id") % 10 + 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(round(wm(col("value"), col("w")), 2).as("wavg"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT event_type, round(sum(value * w) / sum(w), 2) AS wavg,
                   CAST(count(*) AS BIGINT) AS n
            FROM (SELECT event_type, value, user_id % 10 + 1 AS w FROM events)
            GROUP BY event_type"""))

  // Shuffle-skew diagnostics: the keys a 100 TB groupBy/join would
  // stall on, with the integer salt factor that would rebalance them
  // (cnt div avg-per-key). One partial-aggregated count pass, a
  // broadcast scalar for totals, and a TakeOrderedAndProject top-10 —
  // the rank window runs over the 10 survivors only (the topk_users
  // lesson). share uses round(cnt/total, 4): IEEE double division of
  // exact longs, identical on both engines.
  private val skewDiagnose = Q(
    "skew_diagnose",
    (s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum(col("cnt")).as("total"),
        count(lit(1)).as("n_keys"))
      val top = counts.crossJoin(broadcast(tot))
        .select(col("user_id"), col("cnt"),
          round(col("cnt") / col("total"), 4).as("share"),
          greatest(lit(1L),
            expr("cnt div greatest(total div n_keys, 1)")).as("salt"))
        .orderBy(col("cnt").desc, col("user_id")).limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("user_id"))
      top.withColumn("rk", row_number().over(w).cast("long"))
    },
    Some("""WITH counts AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY user_id),
            tot AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_keys
              FROM counts),
            top AS (
              SELECT user_id, cnt, round(cnt / total, 4) AS share,
                CAST(greatest(1, cnt // greatest(total // n_keys, 1)) AS BIGINT) AS salt
              FROM counts, tot ORDER BY cnt DESC, user_id LIMIT 10)
            SELECT user_id, cnt, share, salt,
              CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS rk
            FROM top"""))

  // Arg-max/arg-min battery (first/last-touch attribution): per event
  // type, the value and user of the FIRST and LAST event. `max_by`/
  // `min_by` keep partial aggregation — each partition reduces to one
  // (ord, val) candidate, merges at the exchange — so the shuffle carries
  // one row per (group × partition), never the event stream. Ordering key
  // is event_id (unique), so the arg picked is total-order deterministic
  // on both engines; ts would tie.
  private val aggMinmaxBy = Q(
    "agg_minmax_by",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          min_by(col("value"), col("event_id")).as("first_value"),
          max_by(col("value"), col("event_id")).as("last_value"),
          max_by(col("user_id"), col("event_id")).as("last_user"),
          count(lit(1)).as("n")),
    Some("""SELECT event_type,
                   arg_min(value, event_id) AS first_value,
                   arg_max(value, event_id) AS last_value,
                   arg_max(user_id, event_id) AS last_user,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type"""))

  // Equi-depth histogram, scale-shaped: exact quartile BOUNDARIES come
  // from one percentile aggregate (5 rows — one per event type), which
  // then broadcast back onto the stream for integer bucket assignment +
  // one hash aggregate. The corpus itself never sorts: the only
  // per-group ordered pass is inside percentile() over each group, and
  // the row->bucket mapping is a broadcast-join predicate chain that
  // rides the scan. (An ntile() window would funnel every group through
  // one task — the topk_users lesson.) Boundaries are interpolated
  // doubles; comparisons against them are exact IEEE on both engines.
  private val histogramEquidepth = Q(
    "histogram_equidepth",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val bounds = ev.groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.50)").as("q2"),
          expr("percentile(value, 0.75)").as("q3"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_type"), col("value"),
          when(col("value") <= col("q1"), lit(1L))
            .when(col("value") <= col("q2"), lit(2L))
            .when(col("value") <= col("q3"), lit(3L))
            .otherwise(lit(4L)).as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 2).as("lo"),
          round(max(col("value")), 2).as("hi"))
    },
    Some("""WITH bounds AS (
              SELECT event_type,
                quantile_cont(value, 0.25) AS q1,
                quantile_cont(value, 0.50) AS q2,
                quantile_cont(value, 0.75) AS q3
              FROM events GROUP BY event_type)
            SELECT e.event_type,
                   CAST(CASE WHEN value <= q1 THEN 1
                             WHEN value <= q2 THEN 2
                             WHEN value <= q3 THEN 3
                             ELSE 4 END AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   round(min(value), 2) AS lo,
                   round(max(value), 2) AS hi
            FROM events e JOIN bounds b USING (event_type)
            GROUP BY 1, 2"""))

  // Interval-overlap join WITHOUT a shared equi key, made scalable by
  // day-bucketing: per-user daily activity intervals × the 10 busiest
  // days' 48-hour promo windows. A naive engine plans interval overlap
  // as a cross product (n×m predicate evaluations); here each promo
  // window explodes to the epoch-days it covers (bounded fan-out: a
  // 48h window spans ≤ 3 day buckets) and the join is EQUI on day_no —
  // it shuffles on the bucket and the overlap predicate filters inside.
  // Each activity interval lives in exactly one bucket, so bucket
  // matches are already distinct pairs (no post-join dedup shuffle). At
  // 100 TB a hot bucket (everyone active on launch day) composes with
  // SkewJoin.saltedEquiJoin. All arithmetic is integer microseconds.
  private val joinIntervalOverlap = Q(
    "join_interval_overlap",
    (s, dir) => {
      val DayUs = 86400000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val act = ev
        .groupBy(col("user_id"), expr(s"us div $DayUs").as("day_no"))
        .agg(min(col("us")).as("a_start"), max(col("us")).as("a_end"))
      val busy = ev
        .groupBy(expr(s"us div $DayUs").as("day_no"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("day_no")).limit(10)
        .select(col("day_no").as("promo_day"),
          (col("day_no") * DayUs - 12L * 3600000000L).as("b_start"),
          (col("day_no") * DayUs + 36L * 3600000000L - 1L).as("b_end"))
      val buckets = busy.select(col("promo_day"), col("b_start"), col("b_end"),
        explode(expr(s"sequence(b_start div $DayUs, b_end div $DayUs)")).as("day_no"))
      act.join(broadcast(buckets), "day_no")
        .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
        .select(col("user_id"), col("day_no").as("a_day"), col("promo_day"),
          (least(col("a_end"), col("b_end")) -
            greatest(col("a_start"), col("b_start")) + 1L).as("overlap_us"))
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
            act AS (
              SELECT user_id, us // 86400000000 AS day_no,
                min(us) AS a_start, max(us) AS a_end
              FROM ev GROUP BY 1, 2),
            busy AS (
              SELECT day_no AS promo_day,
                day_no * 86400000000 - 12 * 3600000000 AS b_start,
                day_no * 86400000000 + 36 * 3600000000 - 1 AS b_end
              FROM (SELECT us // 86400000000 AS day_no, count(*) AS cnt
                    FROM ev GROUP BY 1
                    ORDER BY cnt DESC, day_no LIMIT 10))
            SELECT user_id, act.day_no AS a_day, promo_day,
              least(a_end, b_end) - greatest(a_start, b_start) + 1 AS overlap_us
            FROM act JOIN busy
              ON act.a_start <= busy.b_end AND busy.b_start <= act.a_end"""))

  // Data profiling: per-column row/null/distinct counts and min/max — the
  // health check every ingest pipeline runs before trusting a table. ONE
  // INDEPENDENT single-column aggregate per profiled column, unioned: each
  // branch's parquet scan prunes to just its column, and mixing exactly
  // one distinct agg with the plain ones costs a ×2 expand per branch.
  // (The previous all-columns-in-one-pass form paid a ×(k+1) expand of
  // every FULL-width row for k distinct columns — one fat scan beats k
  // thin ones only when the scan dominates, and with columnar parquet it
  // never does; 4.0 s → ~1 s at sf0.1.) Branches run as independent
  // stages of one job. At 100 TB the exact distincts swap for
  // approx_count_distinct — same plan shape, sketch merge instead of
  // expand (approx_stats demonstrates that path).
  private val profileTable = Q(
    "profile_table",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // min/max aggregate the RAW column; the string rendering applies to
      // the aggregated scalar (lexicographic min of rendered strings would
      // order "10" < "9").
      def prof(name: String, render: Column => Column): DataFrame =
        ev.select(col(name))
          .agg(
            count(lit(1)).as("n_rows"),
            count(when(col(name).isNull, 1)).as("n_null"),
            countDistinct(col(name)).as("n_distinct"),
            render(min(col(name))).as("min_s"),
            render(max(col(name))).as("max_s"))
          .select(lit(name).as("column"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      prof("event_id", _.cast("string"))
        .unionAll(prof("user_id", _.cast("string")))
        .unionAll(prof("event_type", c => c))
        .unionAll(prof("value", c => format_string("%.2f", c)))
    },
    Some("""SELECT 'event_id' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) FILTER (event_id IS NULL) AS BIGINT) AS n_null,
              CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
              CAST(min(event_id) AS VARCHAR) AS min_s,
              CAST(max(event_id) AS VARCHAR) AS max_s
            FROM events
            UNION ALL
            SELECT 'user_id', CAST(count(*) AS BIGINT),
              CAST(count(*) FILTER (user_id IS NULL) AS BIGINT),
              CAST(count(DISTINCT user_id) AS BIGINT),
              CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'event_type', CAST(count(*) AS BIGINT),
              CAST(count(*) FILTER (event_type IS NULL) AS BIGINT),
              CAST(count(DISTINCT event_type) AS BIGINT),
              min(event_type), max(event_type)
            FROM events
            UNION ALL
            SELECT 'value', CAST(count(*) AS BIGINT),
              CAST(count(*) FILTER (value IS NULL) AS BIGINT),
              CAST(count(DISTINCT value) AS BIGINT),
              printf('%.2f', min(value)), printf('%.2f', max(value))
            FROM events"""))

  // Per-key top-k WITHOUT a rank window: the k-bounded TopKByValue
  // Aggregator (functions/TopKByValue.scala) reduces each partition to at
  // most k (value, id) pairs per user map-side and merges buffers at the
  // exchange — the shuffle carries ≤ k rows per (key × partition), and
  // nothing is ever sorted per key. The window idiom this replaces
  // (`row_number() OVER (PARTITION BY user ORDER BY value DESC)`)
  // shuffles and sorts EVERY event to keep 3 per user — at 100 TB that
  // is the whole corpus through per-key sorts. Explode of the ≤3-element
  // result array restores the (row, rk) shape the window would emit;
  // ordering (value DESC, event_id ASC) is total, so ties are
  // deterministic and the oracle's window agrees row-for-row.
  private val topkPerKey = Q(
    "topk_per_key",
    (s, dir) => {
      val tk = udaf(new graft.functions.TopKByValue(3),
        graft.functions.TopKByValue.inputEncoder)
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(tk(col("value"), col("event_id")).as("top"))
        .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("user_id"), col("e._2").as("event_id"),
          col("e._1").as("value"), (col("pos") + 1).cast("long").as("rk"))
    },
    Some("""SELECT user_id, event_id, value, rk FROM (
              SELECT user_id, event_id, value,
                CAST(row_number() OVER (
                  PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rk
              FROM events)
            WHERE rk <= 3"""))

  // One-pass heavy hitters via a Misra-Gries summary Aggregator
  // (functions/MisraGries.scala): per-partition state is a k-bounded
  // counter map regardless of how many DISTINCT keys stream past —
  // the `groupBy(key).count().orderBy.limit` it replaces carries one
  // group state per distinct key (billions, at corpus scale) through
  // the aggregation just to read off the top 10. At k=256 ≥ |distinct
  // user_id| on this corpus the summary provably never evicts, so the
  // estimates are EXACT counts and the oracle checks them like any
  // aggregate; the eviction regime (est within N/(k+1) of true, every
  // true heavy hitter present) is stressed on synthetic zipf data by
  // MisraGriesSpec — the guarantee that holds when capacity ≪ distincts.
  private val approxHeavyHitters = Q(
    "approx_heavy_hitters",
    (s, dir) => {
      import org.apache.spark.sql.Encoders
      val mg = udaf(new graft.functions.MisraGries(256), Encoders.scalaLong)
      Tables.events(s, dir)
        .agg(mg(col("user_id")).as("summary"))
        .select(explode(col("summary")).as(Seq("user_id", "est_count")))
        .orderBy(col("est_count").desc, col("user_id")).limit(10)
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS est_count
            FROM events GROUP BY user_id
            ORDER BY est_count DESC, user_id LIMIT 10"""))

  // Count-Min sketch — the MERGEABLE frequency summary (the alternative
  // to Misra-Gries when you need point estimates for ARBITRARY keys, not
  // just the top-k): depth 4 × width 256 integer cell matrix built from
  // the vocabulary COUNT aggregate (never the raw occurrence list — the
  // checkpoint-the-pre-aggregate rule; cell totals are identical either
  // way), probed for 10 deterministic tokens with the CMS estimate
  // est = min_j cell[j][h_j(t)] ≥ true count. Scale shape: the sketch is
  // ≤ 1024 cells no matter the corpus (it broadcasts to the probe join);
  // partial aggregation combines map-side; per-shard sketches would merge
  // by cell-wise addition — that mergeability is WHY warehouses ship CMS.
  // The ≥-true guarantee and the bounded overcount ride the oracle check
  // (both engines compute the same integer sketch) plus SketchSpec.
  private val sketchCountmin = Q(
    "sketch_countmin",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      def bucket(cast: String) =
        s"""(instr('0123456789abcdef', substr(md5(concat('cms', CAST(j AS $cast),
              '_', token)), 1, 1)) - 1) * 16 +
            (instr('0123456789abcdef', substr(md5(concat('cms', CAST(j AS $cast),
              '_', token)), 2, 1)) - 1)"""
      // session-shared vocabulary checkpoint feeds cells + probes
      val counts = graft.text.TextArtifacts.vocab(s, dir)
        .select(col("token"), col("freq").as("cnt"))
      val cells = counts
        .select(col("token"), col("cnt"), explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("bucket", expr(bucket("STRING")).cast("long"))
        .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cell"))
      counts
        .withColumn("h", md5(col("token")))
        .orderBy(col("h"), col("token")).limit(10)
        .select(col("token"), col("cnt").as("true_cnt"))
        .select(col("token"), col("true_cnt"),
          explode(expr("sequence(0, 3)")).as("j"))
        .withColumn("bucket", expr(bucket("STRING")).cast("long"))
        .join(broadcast(cells), Seq("j", "bucket"))
        .groupBy(col("token"), col("true_cnt"))
        .agg(min(col("cell")).as("est"))
        .select(col("token"), col("true_cnt"), col("est"),
          (col("est") - col("true_cnt")).as("overcount"))
    },
    Some {
      def bucket(cast: String) =
        s"""(instr('0123456789abcdef', substr(md5('cms' || CAST(j AS $cast)
              || '_' || token), 1, 1)) - 1) * 16 +
            (instr('0123456789abcdef', substr(md5('cms' || CAST(j AS $cast)
              || '_' || token), 2, 1)) - 1)"""
      s"""WITH counts AS (
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
                    '[^a-z]+'), t -> t <> '')) AS token FROM documents)
            GROUP BY token),
          cells AS (
            SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS cell
            FROM (SELECT r.j, ${bucket("VARCHAR")} AS bucket, cnt
                  FROM counts, range(4) AS r(j))
            GROUP BY j, bucket),
          probes AS (
            SELECT token, cnt AS true_cnt FROM counts
            ORDER BY md5(token), token LIMIT 10),
          probed AS (
            SELECT token, true_cnt, r.j, ${bucket("VARCHAR")} AS bucket
            FROM probes, range(4) AS r(j))
          SELECT p.token, p.true_cnt, CAST(min(c.cell) AS BIGINT) AS est,
            CAST(min(c.cell) - p.true_cnt AS BIGINT) AS overcount
          FROM probed p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
          GROUP BY p.token, p.true_cnt"""
    })

  // Incremental rollup maintenance — the contract that lets a 100 TB
  // warehouse serve daily aggregates WITHOUT rescanning history: the
  // already-loaded days persist as per-(day, type) PARTIALS (count,
  // integer-cent sum — algebraic, so partials re-aggregate exactly),
  // each new day aggregates only its own delta, and the serving rollup
  // is a union of partial rows re-summed. Here the watermark split is
  // simulated on the events table (history = day < 15, delta = the
  // rest); the oracle is the full-rescan aggregate — equality IS the
  // incremental-maintenance correctness claim. Work per refresh is
  // O(delta) + O(days × types), never O(history).
  private val incrementalAggMerge = Q(
    "incremental_agg_merge",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(expr("unix_micros(ts) div 86400000000").as("day_no"),
          col("event_type"),
          expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      val daily = (df: org.apache.spark.sql.DataFrame) =>
        df.groupBy(col("day_no"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_c"))
      val history = daily(ev.where(col("day_no") < 15))   // the stored partials
      val delta = daily(ev.where(col("day_no") >= 15))    // today's refresh work
      history.union(delta)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_cents"),
          count(lit(1)).as("n_days"))
    },
    Some("""WITH ev AS (
              SELECT epoch_ns(ts) // 1000 // 86400000000 AS day_no, event_type,
                     CAST(round(value * 100.0, 0) AS BIGINT) AS vc
              FROM events)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(vc) AS BIGINT) AS sum_cents,
                   CAST(count(DISTINCT day_no) AS BIGINT) AS n_days
            FROM ev GROUP BY event_type"""))

  // The SQL gateway, proven the strongest way available: ONE literal ANSI
  // SQL string is both the Spark implementation (registered temp views +
  // `spark.sql(text)`) and, verbatim, the DuckDB oracle. A reference user
  // who writes plain SQL instead of the DataFrame API gets the identical
  // engine — same Catalyst plan machinery, same pushdown/broadcast
  // behavior (`spark.sql` and the DataFrame API meet in the same logical
  // plan). Determinism is the usual per-row integer-cent quantization
  // (§7.4.1), spelled so both parsers accept the same text.
  private val SqlParityText =
    """SELECT c_mktsegment, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
                AS total_cents,
              CAST(max(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT)
                AS max_cents
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
       GROUP BY c_mktsegment, o_orderpriority"""

  private val sqlTextParity = Q(
    "sql_text_parity",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(SqlParityText)
    },
    Some(SqlParityText))

  /** KMV theta sketch over distinct users per event type + the set
    * algebra HLL cannot do: union AND intersection estimates from the
    * same sketches (the Apache DataSketches theta-sketch capability).
    * The sketch is the k = 64 smallest DISTINCT md5-derived 48-bit user
    * hashes — distinctness lives inside the Aggregator buffer
    * ([[graft.functions.KmvSketch]]), so no corpus-wide pre-distinct
    * shuffle; state is ≤ 64 longs per type at any corpus size.
    * Estimates are pure integer: est = 63·2⁴⁸ div θ (θ = 64th hash),
    * union = bottom-64 of two merged buffers, intersection = shared
    * hashes inside the union sample scaled by est_union/64. Everything
    * is deterministic (fixed hash, no sampling), so the sketch VALUES
    * hash-match the DuckDB oracle exactly — rsd bounds vs exact counts
    * are pinned separately by SketchSpec. */
  private val sketchKmvDistinct = Q(
    "sketch_kmv_distinct",
    (s, dir) => {
      val hex12 = (1 to 12).map { i =>
        val pow = 1L << (4 * (12 - i))
        s"(instr('0123456789abcdef', substr(hs, $i, 1)) - 1) * ${pow}L"
      }.mkString("(", " + ", ")")
      val kmv = udaf(new graft.functions.KmvSketch(64),
        graft.functions.KmvSketch.inputEncoder)
      val sk = Tables.events(s, dir)
        .select(col("event_type"),
          md5(concat(lit("kmv"), col("user_id").cast("string"))).as("hs"))
        .withColumn("hv", expr(hex12))
        .groupBy(col("event_type"))
        .agg(kmv(col("hv")).as("ks"))
      val est = (arr: String) =>
        s"""CASE WHEN size($arr) < 64 THEN CAST(size($arr) AS BIGINT)
            ELSE (63L * 281474976710656L) div element_at($arr, 64) END"""
      val types = sk.select(col("event_type").as("name"),
        lit("type").as("kind"),
        expr("CAST(size(ks) AS BIGINT)").as("n"), expr(est("ks")).as("est"))
      val pair = sk.where(col("event_type") === "click").select(col("ks").as("ka"))
        .crossJoin(
          sk.where(col("event_type") === "purchase").select(col("ks").as("kb")))
        .withColumn("u",
          expr("slice(array_sort(array_distinct(concat(ka, kb))), 1, 64)"))
        .withColumn("est_u", expr(est("u")))
        .withColumn("m", expr(
          "CAST(size(filter(array_intersect(ka, kb), x -> array_contains(u, x))) AS BIGINT)"))
      val unionRow = pair.select(lit("click+purchase").as("name"),
        lit("union").as("kind"), expr("CAST(size(u) AS BIGINT)").as("n"),
        col("est_u").as("est"))
      val interRow = pair.select(lit("click&purchase").as("name"),
        lit("intersect").as("kind"), col("m").as("n"),
        expr("(m * est_u) div 64").as("est"))
      types.union(unionRow).union(interRow)
    },
    Some {
      val hex12 = (1 to 12).map { i =>
        val pow = 1L << (4 * (12 - i))
        s"(instr('0123456789abcdef', substr(hs, $i, 1)) - 1) * $pow"
      }.mkString("(", " + ", ")")
      def est(arr: String) =
        s"""CASE WHEN len($arr) < 64 THEN CAST(len($arr) AS BIGINT)
            ELSE (63 * 281474976710656) // $arr[64] END"""
      s"""WITH ev AS (
            SELECT event_type,
              CAST($hex12 AS BIGINT) AS hv
            FROM (SELECT event_type,
                    md5(concat('kmv', CAST(user_id AS VARCHAR))) AS hs
                  FROM events)),
          d AS (SELECT DISTINCT event_type, hv FROM ev),
          rk AS (SELECT event_type, hv,
                   row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
                 FROM d),
          sk AS (SELECT event_type, list(hv ORDER BY hv) AS ks
                 FROM rk WHERE rk <= 64 GROUP BY event_type),
          types AS (
            SELECT event_type AS name, 'type' AS kind,
              CAST(len(ks) AS BIGINT) AS n, ${est("ks")} AS est
            FROM sk),
          pair AS (
            SELECT a.ks AS ka, b.ks AS kb FROM sk a, sk b
            WHERE a.event_type = 'click' AND b.event_type = 'purchase'),
          uu AS (
            SELECT ka, kb,
              list_sort(list_distinct(list_concat(ka, kb)))[1:64] AS u
            FROM pair),
          uest AS (
            SELECT ka, kb, u, ${est("u")} AS est_u,
              CAST(len(list_filter(list_intersect(ka, kb),
                x -> list_contains(u, x))) AS BIGINT) AS m
            FROM uu)
          SELECT name, kind, n, est FROM types
          UNION ALL
          SELECT 'click+purchase', 'union', CAST(len(u) AS BIGINT), est_u
          FROM uest
          UNION ALL
          SELECT 'click&purchase', 'intersect', m, (m * est_u) // 64
          FROM uest"""
    })

  val all: Seq[Q] = Seq(pivotEventType, unpivotMelt, histogramBins,
    udafWeightedMean, skewDiagnose, aggMinmaxBy, histogramEquidepth,
    joinIntervalOverlap, profileTable, topkPerKey, approxHeavyHitters,
    incrementalAggMerge, sqlTextParity, sketchCountmin, sketchKmvDistinct)
}
