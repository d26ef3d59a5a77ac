package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.transform.EventTransforms

/** The relational core of the engine (SURVEY.md §2.1): every scan, filter,
  * projection, aggregation, join, sort, and scalar-function capability of the
  * reference pipeline, re-expressed as declarative DataFrame plans so
  * Catalyst handles pushdown/pruning/join-selection/codegen.
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §7.4):
  *  - integer-valued outputs are cast to BIGINT on both sides (DuckDB
  *    `length`/`instr`/`year` return BIGINT; Spark returns INT);
  *  - doubles entering strings go through `%.2f` printf on both sides;
  *  - aggregated doubles are `round(_, 2)`;
  *  - `events.ts` is parquet TIMESTAMP(NANOS): Spark floor-truncates to
  *    microseconds (Tables.events), the oracle uses `epoch_ns(ts) // 1000`
  *    (same floor) wherever sub-second precision matters, and plain
  *    `strftime` at second granularity elsewhere;
  *  - every non-aggregate query carries a unique key column so the driver's
  *    set-compare is well-defined.
  */
object CoreQueries {

  private def events(s: SparkSession, dir: String)    = Tables.events(s, dir)
  private def orders(s: SparkSession, dir: String)    = Tables.orders(s, dir)
  private def customer(s: SparkSession, dir: String)  = Tables.customer(s, dir)
  private def lineitem(s: SparkSession, dir: String)  = Tables.lineitem(s, dir)
  private def documents(s: SparkSession, dir: String) = Tables.documents(s, dir)

  private val tsSecond: Column = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")

  // O4/O5 scan + projection: column pruning reaches the parquet reader
  // (ReadSchema carries only the 5 referenced columns).
  private val scanProject = Q(
    "scan_project",
    (s, dir) =>
      events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        tsSecond.as("ts_s")),
    Some("""SELECT event_id, user_id, event_type, value,
            strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM events"""))

  // F2 equality predicate (reference `_p2 != ''` alias-event filter,
  // /root/reference/src/KissmetricsToDatabase.php:567).
  private val filterAlias = Q(
    "filter_alias_events",
    (s, dir) =>
      events(s, dir).filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("value")),
    Some("SELECT event_id, user_id, value FROM events WHERE event_type = 'signup'"))

  // F3 LIKE predicate (reference LIKE 'updated email' / LIKE '%x%',
  // /root/reference/src/KissmetricsToDatabase.php:587, teste.php:59-64).
  private val filterLike = Q(
    "filter_like",
    (s, dir) =>
      documents(s, dir)
        .filter(col("text").like("%merge%") && col("lang").like("e%"))
        .select(col("doc_id"), col("lang"), col("n_chars")),
    Some("""SELECT doc_id, lang, n_chars FROM documents
            WHERE text LIKE '%merge%' AND lang LIKE 'e%'"""))

  // F4 IN-list + F5 NOT-contains (reference isin + skip-identities-with-@,
  // /root/reference/src/Operations/FileImporter.php:104-107, KissmetricsToDatabase.php:414).
  private val filterInNotContains = Q(
    "filter_in_notcontains",
    (s, dir) =>
      customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
          !col("c_name").contains("9"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
              AND NOT contains(c_name, '9')"""))

  // O12 coalesce-to-empty, O13 empty->NULL, O14 epoch<->ts, O15 md5 row
  // fingerprint — the reference's per-row derivation chain in one projection.
  private val deriveEventColumns = Q(
    "derive_event_columns",
    (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        EventTransforms.notNull(col("event_type")).as("n_not_null"),
        EventTransforms.emptyToNull(col("event_type")).as("n_nullable"),
        tsSecond.as("ts_s"),
        unix_timestamp(col("ts")).as("epoch_s"),
        md5(concat_ws("",
          col("event_id"), col("event_type"), col("user_id"),
          format_string("%.2f", col("value")),
          unix_timestamp(col("ts")))).as("md5hash")),
    Some("""SELECT event_id,
            coalesce(event_type, '') AS n_not_null,
            nullif(trim(event_type), '') AS n_nullable,
            strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
            epoch_ns(ts) // 1000000000 AS epoch_s,
            md5(concat_ws('', event_id, event_type, user_id,
                printf('%.2f', value), epoch_ns(ts) // 1000000000)) AS md5hash
            FROM events"""))

  // O11 key sanitization: `-`, `_`, ` ` runs -> `_`; metadata-only rename.
  private val sanitizeColumns = Q(
    "sanitize_columns",
    (s, dir) =>
      EventTransforms.sanitizeColumnNames(
        events(s, dir).select(
          col("event_id").as("event-id"),
          col("event_type").as("event type"),
          col("user_id").as("user__id"))),
    Some("SELECT event_id, event_type AS event_type, user_id FROM events"))

  // A1 counts (reference before/after COUNT(*) deltas).
  private val aggCounts = Q(
    "agg_counts",
    (s, dir) =>
      events(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("n_users")),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type"""))

  // A2 max-length-per-key (reference pass-1 schema sizing).
  private val aggMaxLength = Q(
    "agg_max_length",
    (s, dir) =>
      documents(s, dir).groupBy(col("lang"))
        .agg(max(length(col("text"))).cast("long").as("max_len"),
          min(length(col("text"))).cast("long").as("min_len"),
          count(lit(1)).as("cnt")),
    Some("""SELECT lang, CAST(max(length(text)) AS BIGINT) AS max_len,
            CAST(min(length(text)) AS BIGINT) AS min_len,
            CAST(count(*) AS BIGINT) AS cnt
            FROM documents GROUP BY lang"""))

  // A3 distinct key-set union — the reference's dynamic-schema discovery,
  // over the JSON props column.
  private val schemaKeysUnion = Q(
    "schema_keys_union",
    (s, dir) =>
      events(s, dir)
        .select(explode(expr("json_object_keys(props)")).as("jkey"))
        .distinct(),
    Some("""SELECT DISTINCT unnest(json_keys(props)) AS jkey FROM events"""))

  // A4/O15 exact dedup via row fingerprint, deterministic because surviving
  // values are identical across any choice of survivor.
  private val dedupExact = Q(
    "dedup_exact",
    (s, dir) =>
      // distinct on the natural columns FIRST (map-side partial agg, tiny
      // shuffle), fingerprint only the survivors — md5hash is a pure
      // function of the three columns so the result is identical to
      // dropDuplicates("md5hash"), minus 600k row-level hashes
      lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
        .distinct()
        .withColumn("md5hash", md5(concat_ws("",
          col("l_returnflag"), col("l_linestatus"),
          format_string("%.2f", col("l_quantity"))))),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus, l_quantity,
            md5(concat_ws('', l_returnflag, l_linestatus,
                printf('%.2f', l_quantity))) AS md5hash
            FROM lineitem"""))

  // A4 dedup via window keep-first rule: first event per user by (ts, id).
  private val dedupWindow = Q(
    "dedup_window",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), tsSecond.as("ts_s"))
    },
    Some("""SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
            FROM (SELECT user_id, event_id, ts,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY epoch_ns(ts) // 1000, event_id) AS rn
                  FROM events) WHERE rn = 1"""))

  // J1 equi-join; the dimension side is explicitly broadcast — at 100 TB the
  // fact side never shuffles for this join.
  private val joinAliasLookup = Q(
    "join_alias_lookup",
    (s, dir) =>
      orders(s, dir)
        .join(broadcast(customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment")),
    Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey"""))

  // J3 anti-join (reference "pair already known -> skip"): customers with
  // no event activity (every customer has orders, so the orders variant
  // would be vacuous).
  private val joinAntiNew = Q(
    "join_anti_new",
    (s, dir) =>
      customer(s, dir)
        .join(events(s, dir), col("c_custkey") === col("user_id"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)"""))

  // Semi-join complement of J3.
  private val joinSemi = Q(
    "join_semi",
    (s, dir) =>
      customer(s, dir)
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"""))

  // S1/S2/S3 natural sort + limit (reference natsort file ordering): the
  // full strnatcmp-equivalent key (graft.ingest.NdjsonReader.natSortKey)
  // over mixed alpha/numeric names — 'img2' < 'img10' where a plain string
  // sort would invert them. sort+limit fuses to TakeOrderedAndProject
  // (partial per-partition top-k).
  private val sortNaturalLimit = Q(
    "sort_natural_limit",
    (s, dir) =>
      orders(s, dir)
        .select(concat(
          when(col("o_orderkey") % 3 === 0, lit("img"))
            .when(col("o_orderkey") % 3 === 1, lit("rev"))
            .otherwise(lit("file")),
          col("o_orderkey").cast("string"), lit(".json")).as("fname"))
        .withColumn("natkey", graft.ingest.NdjsonReader.natSortKey(col("fname")))
        .orderBy(col("natkey"))
        .limit(100),
    Some("""SELECT fname, natkey
            FROM (SELECT fname,
                    array_to_string(list_transform(
                      string_split(regexp_replace(fname, '([0-9]+)',
                        chr(1) || '\1' || chr(1), 'g'), chr(1)),
                      s -> CASE
                        WHEN NOT regexp_matches(s, '^[0-9]+$') THEN s
                        WHEN s LIKE '0%' THEN s
                        WHEN length(s) < 9 THEN chr(CAST(48 + length(s) AS INTEGER)) || s
                        ELSE '9' || lpad(s, 30, '0') END), '') AS natkey
                  FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'img'
                                    WHEN o_orderkey % 3 = 1 THEN 'rev'
                                    ELSE 'file' END
                          || CAST(o_orderkey AS VARCHAR) || '.json' AS fname
                        FROM orders))
            ORDER BY natkey LIMIT 100"""))

  // X1-X7 scalar string functions in one projection.
  private val stringFuncs = Q(
    "string_funcs",
    (s, dir) =>
      customer(s, dir).select(
        col("c_custkey"),
        md5(col("c_name")).as("md5_name"),
        concat_ws("-", col("c_name"), col("c_mktsegment")).as("cat"),
        length(col("c_name")).cast("long").as("len"),
        trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        instr(col("c_name"), "1").cast("long").as("pos1"),
        split_part(col("c_name"), lit("#"), lit(2)).as("numpart")),
    Some("""SELECT c_custkey, md5(c_name) AS md5_name,
            concat_ws('-', c_name, c_mktsegment) AS cat,
            CAST(length(c_name) AS BIGINT) AS len,
            trim(concat('  ', c_name, '  ')) AS trimmed,
            regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
            CAST(instr(c_name, '1') AS BIGINT) AS pos1,
            split_part(c_name, '#', 2) AS numpart
            FROM customer"""))

  // X9/X10 date functions.
  private val dateFuncs = Q(
    "date_funcs",
    (s, dir) =>
      orders(s, dir).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3mo")),
    Some("""SELECT o_orderkey,
            strftime(o_orderdate, '%Y-%m-%d') AS od,
            CAST(year(o_orderdate) AS BIGINT) AS yr,
            CAST(month(o_orderdate) AS BIGINT) AS mo,
            strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
            CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
            strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo
            FROM orders"""))

  // X11 rate arithmetic (reference rows/sec ETA display, recast as a query).
  private val etaRate = Q(
    "eta_rate",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          min(unix_timestamp(col("ts"))).as("min_s"),
          max(unix_timestamp(col("ts"))).as("max_s"))
        .select(col("event_type"), col("cnt"), col("min_s"), col("max_s"),
          round(col("cnt").cast("double") / (col("max_s") - col("min_s")), 6)
            .as("rows_per_sec")),
    Some("""SELECT event_type, cnt, min_s, max_s,
            round(CAST(cnt AS DOUBLE) / (max_s - min_s), 6) AS rows_per_sec
            FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                    min(epoch_ns(ts) // 1000000000) AS min_s,
                    max(epoch_ns(ts) // 1000000000) AS max_s
                  FROM events GROUP BY event_type)"""))

  // O3 incremental high-watermark: synthetic revision-file key > watermark.
  private val incrementalWatermark = Q(
    "incremental_watermark",
    (s, dir) =>
      events(s, dir)
        .withColumn("fname",
          concat(lit("rev_"), floor(col("event_id") / 100).cast("long")))
        .withColumn("natkey",
          regexp_extract(col("fname"), "[0-9]+", 0).cast("long"))
        .filter(col("natkey") > 3)
        .groupBy(col("fname"), col("natkey"))
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT fname, natkey, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT concat('rev_', CAST(floor(event_id / 100) AS BIGINT)) AS fname,
                    CAST(floor(event_id / 100) AS BIGINT) AS natkey
                  FROM events)
            WHERE natkey > 3 GROUP BY fname, natkey"""))

  // Gap sessionization (30-min inactivity) — lag + running sum windows.
  private val eventsSessionize = Q(
    "events_sessionize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
    },
    Some("""SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
            CAST(count(*) AS BIGINT) AS n_events
            FROM (SELECT user_id,
                    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
                  FROM (SELECT user_id, event_id, us,
                          CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                               THEN 1 ELSE 0 END AS new_sess
                        FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
                                lag(epoch_ns(ts) // 1000, 1) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_us
                              FROM events)))
            GROUP BY user_id"""))

  // JSON path extraction from the props column.
  private val jsonPropsExtract = Q(
    "json_props_extract",
    (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")),
    Some("""SELECT event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events"""))

  // Top-k by aggregate; rank on the exact double, output rounded, user_id
  // tiebreak for determinism. sort+limit fuses to TakeOrderedAndProject
  // (per-partition partial top-k, k rows to the driver-side reduce) — the
  // rank window then runs over only the 10 survivors, never funneling the
  // full aggregate through one task like a global row_number would.
  private val topkUsers = Q(
    "topk_users",
    (s, dir) => {
      val agg = events(s, dir).groupBy(col("user_id"))
        .agg(sum(col("value")).as("total_raw"), count(lit(1)).as("cnt"))
      val top = agg.orderBy(col("total_raw").desc, col("user_id")).limit(10)
      val w = Window.orderBy(col("total_raw").desc, col("user_id"))
      top.withColumn("rk", row_number().over(w).cast("long"))
        .select(col("user_id"), round(col("total_raw"), 2).as("total"),
          col("cnt"), col("rk"))
    },
    Some("""SELECT user_id, round(total_raw, 2) AS total, cnt, rk
            FROM (SELECT user_id, total_raw, cnt,
                    CAST(row_number() OVER (ORDER BY total_raw DESC, user_id) AS BIGINT) AS rk
                  FROM (SELECT user_id, sum(value) AS total_raw,
                          CAST(count(*) AS BIGINT) AS cnt
                        FROM events GROUP BY user_id))
            WHERE rk <= 10"""))

  /** Salted skew join — the hot-key mitigation as a first-class,
    * result-invariant operator: the fact side gets a deterministic salt
    * in [0, 8), the (small) dimension side is replicated across all 8
    * salt values, and the join keys on (user_id, salt) — a hot user's
    * rows now spread over 8 reducers instead of one. The ORACLE is the
    * PLAIN UNSALTED JOIN: salting must never change results, so the
    * DuckDB twin knows nothing about salt. (AQE's skew-join handles
    * mid-shuffle skew at runtime; explicit salting is the plan-level
    * tool when a hot key is known in advance — e.g. the null/default
    * user every clickstream has.)
    */
  private val joinSkewSalted = Q(
    "join_skew_salted",
    (s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("value"))
      val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      SkewJoin.saltedEquiJoin(ev, dim, "user_id", saltBuckets = 8)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("total"),
          max(col("n_events")).as("n_events"))
    },
    Some("""SELECT e.user_id, round(sum(e.value), 2) AS total,
              max(d.n_events) AS n_events
            FROM events e
            JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                  FROM events GROUP BY user_id) d
              ON d.user_id = e.user_id
            GROUP BY e.user_id"""))

  /** Exact COUNT(DISTINCT) under key skew — the two-stage salted
    * rewrite: stage 1 groups on (key, salt) where salt is a hash OF THE
    * VALUE (so one user lands in exactly one salt bucket and partial
    * distinct sets are disjoint by construction), stage 2 sums the
    * partials. A hot key's distinct set splits across 8 reducers instead
    * of funnelling one; the sum stage sees 8 rows per key. Like
    * join_skew_salted, the ORACLE is the plain unsalted COUNT(DISTINCT)
    * — salting must never change the answer, so the DuckDB twin knows
    * nothing about salt.
    */
  private val aggDistinctSalted = Q(
    "agg_distinct_salted",
    (s, dir) =>
      events(s, dir).select(col("event_type"), col("user_id"))
        .groupBy(col("event_type"), pmod(xxhash64(col("user_id")), lit(8)).as("salt"))
        .agg(countDistinct(col("user_id")).as("pd"), count(lit(1)).as("pc"))
        .groupBy(col("event_type"))
        .agg(sum(col("pd")).as("n_users"), sum(col("pc")).as("n_events")),
    Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type"""))

  /** Per-user outlier detection — z-score each event's value against its
    * user's own distribution, the anomaly flag a metrics warehouse runs
    * nightly. Determinism: values are quantized to integer cents per ROW
    * (exact), so n/Σ/Σ² are exact BIGINT partial aggregates in any order;
    * mean, variance, and z then come from identical integer inputs
    * through the textually identical expression on both engines, and a
    * zero-variance user's z is defined 0 (nullif guard). Scale: one
    * partial-agg groupBy + a broadcast-or-shuffle join back on user_id —
    * no window, no sort.
    */
  private val anomalyZscore = Q(
    "anomaly_zscore",
    (s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vq"))
      val stats = ev.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"), sum(col("vq")).as("sv"),
        sum(expr("vq * vq")).as("svv"))
      // the trailing `+ 0.0` folds IEEE negative zero into +0.0: a tiny
      // negative residual rounds to -0.0, which one engine may render as
      // 0.0 and the other as -0.0 (caught by the sf0.1 oracle run)
      ev.join(stats, "user_id")
        .withColumn("z", expr(
          """round((CAST(vq AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
               / nullif(sqrt((CAST(svv AS DOUBLE)
                   - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(n AS DOUBLE)), 0.0), 4) + 0.0"""))
        .select(col("user_id"), col("event_type"), col("vq"),
          coalesce(col("z"), lit(0.0)).as("z"),
          (abs(coalesce(col("z"), lit(0.0))) > 2.0).as("anomaly"))
    },
    Some("""WITH ev AS (
              SELECT user_id, event_type,
                CAST(round(value * 100.0, 0) AS BIGINT) AS vq
              FROM events),
            stats AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(vq) AS BIGINT) AS sv,
                CAST(sum(vq * vq) AS BIGINT) AS svv
              FROM ev GROUP BY user_id)
            SELECT user_id, event_type, vq,
              coalesce(z, 0.0) AS z,
              abs(coalesce(z, 0.0)) > 2.0 AS anomaly
            FROM (SELECT e.user_id, e.event_type, e.vq,
                    round((CAST(vq AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                      / nullif(sqrt((CAST(svv AS DOUBLE)
                          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)), 0.0), 4) + 0.0 AS z
                  FROM ev e JOIN stats USING (user_id))"""))

  // ROLLUP grouping-sets extension (absent from the reference; §2 gap fill).
  private val cubeEventDay = Q(
    "cube_event_day",
    (s, dir) =>
      events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("day"), lit("ALL")).as("day"),
          col("cnt"), col("total")),
    Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
            coalesce(day, 'ALL') AS day,
            CAST(count(*) AS BIGINT) AS cnt, round(sum(value), 2) AS total
            FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value
                  FROM events)
            GROUP BY ROLLUP(event_type, day)"""))

  // Set operations (a §2 "not present" gap, filled natively): long English
  // docs minus one source. (Defined on documents — every user emits every
  // event type, so user-based sets would be vacuously empty.)
  private val setOps = Q(
    "set_ops",
    (s, dir) => {
      val d = documents(s, dir)
      d.filter(col("lang") === "en").select(col("doc_id"))
        .intersect(d.filter(col("n_chars") > 200).select(col("doc_id")))
        .except(d.filter(col("source") === "src0").select(col("doc_id")))
    },
    Some("""SELECT doc_id FROM documents WHERE lang = 'en'
            INTERSECT SELECT doc_id FROM documents WHERE n_chars > 200
            EXCEPT SELECT doc_id FROM documents WHERE source = 'src0'"""))

  // As-of join: for each purchase, the most recent strictly-earlier click
  // of the same user — expressed as an IGNORE NULLS running last over the
  // per-user event sequence (one shuffle on user_id, no self-join).
  private val asofJoin = Q(
    "asof_join",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("last_click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          coalesce(col("last_click_id"), lit(-1L)).as("last_click_id"))
    },
    Some("""SELECT event_id, user_id, coalesce(last_click_id, -1) AS last_click_id
            FROM (SELECT event_id, user_id, event_type,
                    last_value(CASE WHEN event_type = 'click' THEN event_id END
                      IGNORE NULLS) OVER (PARTITION BY user_id
                        ORDER BY epoch_ns(ts) // 1000, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS last_click_id
                  FROM events)
            WHERE event_type = 'purchase'"""))

  // The NATIVE as-of join — the same "latest earlier click per purchase"
  // semantics as `asof_join`, but over TWO relations through the custom
  // whole-operator extension (graft.plans.AsOfJoinExec): logical node →
  // planner strategy → sort-merge exec with O(1) merge state. The
  // composed single-table trick above can't express the two-relation
  // case without an exploding inequality join or a schema-padded union;
  // this one shuffles each side once on user_id and streams the merge.
  // Strict (<) time semantics; timestamp ties among clicks break on the
  // larger event_id (rightTiebreak), mirrored by the oracle's ORDER BY.
  private val asofJoinNative = Q(
    "asof_join_native",
    (s, dir) => {
      val ev = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("us").as("c_us"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      graft.plans.AsOf.joinBackward(purchases, clicks,
          Seq("user_id"), Seq("c_user_id"), "us", "c_us",
          strict = true, rightTiebreak = Seq("click_id"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("click_id"), lit(-1L)).as("last_click_id"),
          coalesce(col("us") - col("c_us"), lit(-1L)).as("gap_us"))
    },
    Some("""WITH c AS (SELECT user_id AS c_user_id, epoch_ns(ts) // 1000 AS c_us,
                         event_id AS click_id
                       FROM events WHERE event_type = 'click'),
                 p AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
                       FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id,
                   coalesce(t.click_id, -1) AS last_click_id,
                   coalesce(p.us - t.c_us, -1) AS gap_us
            FROM p LEFT JOIN LATERAL (
              SELECT c.click_id, c.c_us FROM c
              WHERE c.c_user_id = p.user_id AND c.c_us < p.us
              ORDER BY c.c_us DESC, c.click_id DESC LIMIT 1) t ON TRUE"""))

  // The forward direction of the same operator: for each click, the
  // EARLIEST later purchase of the same user — click→conversion
  // attribution with time-to-convert. Ties break to the smaller
  // purchase id (forward tiebreak = ascending minimum).
  private val asofJoinForward = Q(
    "asof_join_forward",
    (s, dir) => {
      val ev = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("us").as("p_us"),
          col("event_id").as("purchase_id"))
      graft.plans.AsOf.joinForward(clicks, purchases,
          Seq("user_id"), Seq("p_user_id"), "us", "p_us",
          strict = true, rightTiebreak = Seq("purchase_id"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("next_purchase_id"),
          coalesce(col("p_us") - col("us"), lit(-1L)).as("wait_us"))
    },
    Some("""WITH p AS (SELECT user_id AS p_user_id, epoch_ns(ts) // 1000 AS p_us,
                         event_id AS purchase_id
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
                       FROM events WHERE event_type = 'click')
            SELECT c.event_id, c.user_id,
                   coalesce(t.purchase_id, -1) AS next_purchase_id,
                   coalesce(t.p_us - c.us, -1) AS wait_us
            FROM c LEFT JOIN LATERAL (
              SELECT p.purchase_id, p.p_us FROM p
              WHERE p.p_user_id = c.user_id AND p.p_us > c.us
              ORDER BY p.p_us ASC, p.purchase_id ASC LIMIT 1) t ON TRUE"""))

  // The nearest direction of the native operator (pandas merge_asof
  // direction='nearest'): for each purchase, the click of the same user
  // closest in time on EITHER side; equidistant → the earlier click
  // wins; same-time clicks break max-id when the earlier side wins,
  // min-id when the later side does (the exec's documented tie ladder).
  private val asofJoinNearest = Q(
    "asof_join_nearest",
    (s, dir) => {
      val ev = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("us").as("c_us"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      graft.plans.AsOf.joinNearest(purchases, clicks,
          Seq("user_id"), Seq("c_user_id"), "us", "c_us",
          rightTiebreak = Seq("click_id"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("click_id"), lit(-1L)).as("nearest_click_id"),
          coalesce(col("c_us") - col("us"), lit(0L)).as("delta_us"))
    },
    Some("""WITH c AS (SELECT user_id AS c_user_id, epoch_ns(ts) // 1000 AS c_us,
                         event_id AS click_id
                       FROM events WHERE event_type = 'click'),
                 p AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
                       FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id,
                   coalesce(t.click_id, -1) AS nearest_click_id,
                   coalesce(t.c_us - p.us, 0) AS delta_us
            FROM p LEFT JOIN LATERAL (
              SELECT c.click_id, c.c_us FROM c
              WHERE c.c_user_id = p.user_id
              ORDER BY abs(c.c_us - p.us) ASC,
                       (c.c_us > p.us) ASC,
                       CASE WHEN c.c_us <= p.us THEN -c.click_id
                            ELSE c.click_id END ASC
              LIMIT 1) t ON TRUE"""))

  // The tolerance knob of the native operator (pandas
  // merge_asof(tolerance=…)): attribution with a finite lookback — each
  // purchase pairs with the latest earlier click of the same user ONLY if
  // it happened within the last day; older clicks no longer count. The
  // gate is applied at emit time in the O(1)-state merge (the cursor scan
  // is unchanged — a click too old for this purchase may still be within
  // tolerance of the user's earlier purchase), so the plan is identical
  // to the unbounded backward join: two shuffles, streaming merge.
  private val asofJoinTolerance = Q(
    "asof_join_tolerance",
    (s, dir) => {
      val ev = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("us").as("c_us"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      graft.plans.AsOf.joinBackward(purchases, clicks,
          Seq("user_id"), Seq("c_user_id"), "us", "c_us",
          strict = true, rightTiebreak = Seq("click_id"),
          tolerance = Some(86400000000L)) // 1 day in µs
        .select(col("event_id"), col("user_id"),
          coalesce(col("click_id"), lit(-1L)).as("last_click_id"),
          coalesce(col("us") - col("c_us"), lit(-1L)).as("gap_us"))
    },
    Some("""WITH c AS (SELECT user_id AS c_user_id, epoch_ns(ts) // 1000 AS c_us,
                         event_id AS click_id
                       FROM events WHERE event_type = 'click'),
                 p AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
                       FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id,
                   coalesce(t.click_id, -1) AS last_click_id,
                   coalesce(p.us - t.c_us, -1) AS gap_us
            FROM p LEFT JOIN LATERAL (
              SELECT c.click_id, c.c_us FROM c
              WHERE c.c_user_id = p.user_id AND c.c_us < p.us
                AND p.us - c.c_us <= 86400000000
              ORDER BY c.c_us DESC, c.click_id DESC LIMIT 1) t ON TRUE"""))

  // MERGE INTO (upsert) semantics as a batch operator — the Delta/Iceberg
  // `MERGE` a warehouse maintains dimensions with, expressed engine-
  // natively as ONE full-outer join on the merge key: matched rows
  // update (balance += order revenue, integer cents), target-only rows
  // carry over, source-only rows insert. The source derives a batch of
  // "new customer" keys (custkey+1000000 for custkey%7=0) so all three
  // MERGE branches are exercised. Scale: one shuffle per side on the
  // merge key — with a bucketed target (sink.BucketedTables) the target
  // side pre-locates and only the delta shuffles.
  private val mergeUpsert = Q(
    "merge_upsert",
    (s, dir) => {
      val cust = customer(s, dir).select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100.0, 0) AS BIGINT)").as("bal_c"))
      val delta = orders(s, dir).groupBy(col("o_custkey"))
        .agg(expr("CAST(round(sum(o_totalprice) * 100.0, 0) AS BIGINT)").as("rev_c"))
      val source = delta
        .union(delta.where(pmod(col("o_custkey"), lit(7)) === 0)
          .select(col("o_custkey") + 1000000L, col("rev_c")))
      cust.join(source, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "updated")
            .when(col("o_custkey").isNull, "kept")
            .otherwise("inserted").as("action"),
          (coalesce(col("bal_c"), lit(0L)) + coalesce(col("rev_c"), lit(0L)))
            .as("balance_cents"))
    },
    Some("""WITH cust AS (
              SELECT c_custkey, CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS bal_c
              FROM customer),
            delta AS (
              SELECT o_custkey, CAST(round(sum(o_totalprice) * 100.0, 0) AS BIGINT) AS rev_c
              FROM orders GROUP BY o_custkey),
            source AS (
              SELECT o_custkey, rev_c FROM delta
              UNION ALL
              SELECT o_custkey + 1000000, rev_c FROM delta WHERE o_custkey % 7 = 0)
            SELECT coalesce(c_custkey, o_custkey) AS custkey,
              CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'updated'
                   WHEN o_custkey IS NULL THEN 'kept'
                   ELSE 'inserted' END AS action,
              coalesce(bal_c, 0) + coalesce(rev_c, 0) AS balance_cents
            FROM cust FULL OUTER JOIN source ON c_custkey = o_custkey"""))

  // Equi + range join: lineitems shipped within 60 days of their order.
  private val rangeJoin = Q(
    "range_join",
    (s, dir) =>
      lineitem(s, dir)
        .join(orders(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("qty")),
    Some("""SELECT o_orderkey, CAST(count(*) AS BIGINT) AS cnt,
            round(sum(l_quantity), 2) AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             AND l_shipdate >= o_orderdate
             AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
            GROUP BY o_orderkey"""))

  // Window-function battery: rank family + lag/lead in one pass.
  private val windowFuncs = Q(
    "window_funcs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .select(
          col("event_id"),
          col("user_id"),
          rank().over(w).cast("long").as("rk"),
          ntile(4).over(w).cast("long").as("quartile"),
          coalesce(lag(col("value"), 1).over(w), lit(-1.0)).as("prev_value"),
          coalesce(lead(col("value"), 1).over(w), lit(-1.0)).as("next_value"))
    },
    Some("""SELECT event_id, user_id,
            CAST(rank() OVER w AS BIGINT) AS rk,
            CAST(ntile(4) OVER w AS BIGINT) AS quartile,
            coalesce(lag(value, 1) OVER w, -1.0) AS prev_value,
            coalesce(lead(value, 1) OVER w, -1.0) AS next_value
            FROM (SELECT event_id, user_id, value, epoch_ns(ts) // 1000 AS us
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)"""))

  // Exact interpolated percentiles: Spark's percentile and DuckDB's
  // quantile_cont share the linear-interpolation formula over the same
  // sorted values, so round(_, 4) matches exactly.
  private val exactPercentiles = Q(
    "exact_percentiles",
    (s, dir) =>
      events(s, dir).groupBy(col("event_type")).agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        round(min(col("value")), 4).as("vmin"),
        round(max(col("value")), 4).as("vmax")),
    Some("""SELECT event_type,
            round(quantile_cont(value, 0.5), 4) AS p50,
            round(quantile_cont(value, 0.95), 4) AS p95,
            round(min(value), 4) AS vmin,
            round(max(value), 4) AS vmax
            FROM events GROUP BY event_type"""))

  // Sketch aggregates (HLL distinct, GK quantiles): Spark's sketch
  // algorithms are not DuckDB's, so this is deliberately registered
  // WITHOUT an oracle (driver records the weaker rows-only check); the
  // exact twins above cover value correctness. At 100 TB the sketches are
  // the ones you actually run — fixed-size state, single pass, mergeable.
  private val approxStats = Q(
    "approx_stats",
    (s, dir) =>
      events(s, dir).groupBy(col("event_type")).agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        expr("approx_percentile(value, 0.5)").as("approx_p50"),
        count(lit(1)).as("cnt")),
    None)

  // Deterministic companion for the rows-only sketch query above: the
  // SAME pipeline's output, projected to its deterministic columns
  // (group keys + exact count) and hash-compared against DuckDB — a
  // wiring regression in approx_stats (wrong table, wrong group key,
  // dropped rows) now fails a real oracle instead of hiding behind
  // "sketch output is engine-specific". The sketch VALUES stay pinned by
  // their error-bound spec.
  private val approxStatsFrame = Q(
    "approx_stats_frame",
    (s, dir) => approxStats.run(s, dir).select(col("event_type"), col("cnt")),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY event_type"""))

  val all: Seq[Q] = Seq(
    scanProject, filterAlias, filterLike, filterInNotContains,
    deriveEventColumns, sanitizeColumns, aggCounts, aggMaxLength,
    schemaKeysUnion, dedupExact, dedupWindow, joinAliasLookup, joinAntiNew,
    joinSemi, sortNaturalLimit, stringFuncs, dateFuncs, etaRate,
    incrementalWatermark, eventsSessionize, jsonPropsExtract, topkUsers,
    joinSkewSalted, aggDistinctSalted, anomalyZscore, cubeEventDay, setOps,
    asofJoin, asofJoinNative, asofJoinForward, asofJoinNearest,
    asofJoinTolerance, mergeUpsert,
    rangeJoin,
    windowFuncs, exactPercentiles, approxStats, approxStatsFrame)
}
