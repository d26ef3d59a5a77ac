package graft.queries

import org.apache.spark.sql.functions._

/** Data-layout and join-pruning operators — the pieces that decide how
  * much of a 100 TB lake a query has to TOUCH, rather than how fast it
  * processes what it touched.
  *
  *  - `zorder_layout`: the Morton (Z-order) clustering key used to sort a
  *    table so that parquet row-group min/max stats prune on TWO columns
  *    at once (the Delta/Iceberg `OPTIMIZE ZORDER BY` layout). The query
  *    materializes the proof, not just the key: grouping by the code's
  *    top bits shows each storage block covering a tight (x, y)
  *    rectangle — which is exactly why a 2-D filter skips most blocks.
  *  - `join_bloom_pruned`: fact⋈dim where the dim key set rides to the
  *    fact scan as a bloom filter, so non-matching fact rows die BEFORE
  *    the shuffle. False positives pass through to the real join, which
  *    keeps the result exact — the oracle is the UNPRUNED join.
  */
object LayoutQueries {

  // z = interleave(bits of x, bits of y), 8 bits each -> 16-bit code.
  // Pure integer shift/mask arithmetic: identical on both engines, stays
  // in whole-stage codegen, and — the point at 100 TB — is computed
  // per-row at WRITE time, so the sort that clusters the table happens
  // once, not per query.
  private def mortonSql(x: String, y: String): String =
    (0 until 8).map { i =>
      s"(shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1}))"
    }.mkString(" + ")

  // Per-block locality audit: 16 consecutive Z values = one "storage
  // block"; the x/y spans per block stay narrow (Z-order's guarantee),
  // which the oracle verifies numerically. One projection + one hash
  // aggregate over 4096 blocks max — no sort, no window, no shuffle
  // beyond the 4096-row aggregate.
  private val zorderLayout = Q(
    "zorder_layout",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        // integer `div`, never `/`: Column `/` on longs is DOUBLE division
        .select(expr("user_id % 256").as("x"),
          expr("(us div 86400000000) % 256").as("y"))
        .select(col("x"), col("y"), expr(mortonSql("x", "y")).as("z"))
        .groupBy(expr("z div 16").as("z_block"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_lo"), max(col("x")).as("x_hi"),
          min(col("y")).as("y_lo"), max(col("y")).as("y_hi")),
    Some {
      val z = (0 until 8).map { i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""WITH pts AS (
            SELECT user_id % 256 AS x,
                   ((epoch_ns(ts) // 1000) // 86400000000) % 256 AS y
            FROM events),
          coded AS (SELECT x, y, $z AS z FROM pts)
          SELECT CAST(z // 16 AS BIGINT) AS z_block,
                 CAST(count(*) AS BIGINT) AS n,
                 min(x) AS x_lo, max(x) AS x_hi,
                 min(y) AS y_lo, max(y) AS y_hi
          FROM coded GROUP BY 1"""
    })

  // Zone-map skipping audit — the number that justifies paying for a
  // layout: for a SECONDARY-column predicate (y ∈ [64, 79]; the dimension
  // the table was NOT primarily sorted by), how many of 16 files can
  // min/max zone maps prove empty under three layouts?
  //   linear_x  (files stripe x)  — prunes nothing on y: every file
  //                                 spans the full y domain;
  //   linear_y  (files stripe y)  — the perfect single-column layout:
  //                                 prunes all but the one matching stripe;
  //   zorder    (files stripe z)  — prunes most files on y AND would do
  //                                 the same for x: the two-dimensional
  //                                 compromise Delta/Iceberg OPTIMIZE buys.
  // The layouts are hypothetical file assignments via pure column math
  // (range-striping a known key domain — at write time a range partitioner
  // does this distributed), so the audit is scan + three bounded
  // aggregates; rows_matched rides in as a one-row cross join. No sort,
  // no window, nothing corpus-sized shuffles.
  private val layoutSkipStats = Q(
    "layout_skip_stats",
    (s, dir) => {
      val pts = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        // y = hour-number mod 256: covers the full 0..255 domain at every
        // test SF (day-number only spans ~30 values — a predicate tile
        // would miss it entirely at small SFs)
        .select(expr("user_id % 256").as("x"),
          expr("(us div 3600000000) % 256").as("y"))
        .select(col("x"), col("y"), expr(mortonSql("x", "y")).as("z"))
      def audit(layout: String, fileExpr: String) =
        pts.withColumn("file", expr(fileExpr))
          .groupBy(col("file"))
          .agg(count(lit(1)).as("n"),
            min(col("y")).as("y_lo"), max(col("y")).as("y_hi"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("y_hi") < 64 || col("y_lo") > 79, 1L).otherwise(0L))
              .as("n_pruned"),
            coalesce(sum(when(!(col("y_hi") < 64 || col("y_lo") > 79),
              col("n"))), lit(0L)).as("rows_scanned"))
          .select(lit(layout).as("layout"), col("n_files"), col("n_pruned"),
            col("rows_scanned"))
      val audits = audit("linear_x", "x div 16")
        .unionAll(audit("linear_y", "y div 16"))
        .unionAll(audit("zorder", "z div 4096"))
      val matched = pts.where(col("y").between(64, 79))
        .agg(count(lit(1)).as("rows_matched"))
      audits.crossJoin(broadcast(matched))
    },
    Some {
      val z = (0 until 8).map { i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"""WITH pts AS (
            SELECT x, y, $z AS z
            FROM (SELECT user_id % 256 AS x,
                         ((epoch_ns(ts) // 1000) // 3600000000) % 256 AS y
                  FROM events)),
          audits AS (
            SELECT 'linear_x' AS layout, x // 16 AS file, y FROM pts
            UNION ALL
            SELECT 'linear_y', y // 16, y FROM pts
            UNION ALL
            SELECT 'zorder', z // 4096, y FROM pts),
          zones AS (
            SELECT layout, file, CAST(count(*) AS BIGINT) AS n,
              min(y) AS y_lo, max(y) AS y_hi
            FROM audits GROUP BY layout, file),
          summary AS (
            SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
              CAST(sum(CASE WHEN y_hi < 64 OR y_lo > 79 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
              CAST(coalesce(sum(CASE WHEN NOT (y_hi < 64 OR y_lo > 79)
                THEN n END), 0) AS BIGINT) AS rows_scanned
            FROM zones GROUP BY layout),
          matched AS (
            SELECT CAST(count(*) AS BIGINT) AS rows_matched
            FROM pts WHERE y BETWEEN 64 AND 79)
          SELECT layout, n_files, n_pruned, rows_scanned, rows_matched
          FROM summary, matched"""
    })

  // Bloom-pruned join: urgent orders' key set (built distributed, merged
  // via the sketch aggregate) broadcasts as ~1 MB of bits; the lineitem
  // scan probes it with the native `bloom_might_contain` expression
  // inside codegen and drops ~4/5 of the fact table before the join
  // shuffle. The join itself then removes bloom false positives, so the
  // result — and the oracle — is the plain join.
  private val joinBloomPruned = Q(
    "join_bloom_pruned",
    (s, dir) => {
      val dim = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val fact = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      BloomPrune.prune(fact, "l_orderkey", dim, "o_orderkey")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
    },
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   round(sum(l_extendedprice), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag"""))

  val all: Seq[Q] = Seq(zorderLayout, joinBloomPruned, layoutSkipStats)
}
