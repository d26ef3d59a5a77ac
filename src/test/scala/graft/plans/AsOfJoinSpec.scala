package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics + plan-shape pins for the native as-of join
  * (graft.plans.AsOfJoinExec). The semantic tests verify against a
  * brute-force per-row maximum computed with an (exploding) inequality
  * join — the formulation the operator exists to avoid, safe at spec
  * scale and independent of the operator's own merge logic.
  */
class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  /** (id, key, t, payload) left rows. */
  private def leftDf(rows: Seq[(Long, String, Long, String)]): DataFrame =
    rows.toDF("l_id", "l_key", "l_t", "l_pay")

  /** (id, key, t) right rows. */
  private def rightDf(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("r_id", "r_key", "r_t")

  /** Brute-force expected: latest strictly-earlier right (ties → max r_id). */
  private def bruteBackward(l: DataFrame, r: DataFrame, strict: Boolean): DataFrame = {
    val cond = if (strict) col("r_t") < col("l_t") else col("r_t") <= col("l_t")
    l.join(r, col("l_key") === col("r_key") && cond, "left")
      .groupBy(col("l_id"))
      .agg(max(struct(col("r_t"), col("r_id"))).as("m"))
      .select(col("l_id"), col("m.r_id").as("exp_r_id"))
  }

  /** Brute-force expected, forward: earliest strictly-later (ties → min r_id). */
  private def bruteForward(l: DataFrame, r: DataFrame, strict: Boolean): DataFrame = {
    val cond = if (strict) col("r_t") > col("l_t") else col("r_t") >= col("l_t")
    l.join(r, col("l_key") === col("r_key") && cond, "left")
      .groupBy(col("l_id"))
      .agg(min(struct(col("r_t"), col("r_id"))).as("m"))
      .select(col("l_id"), col("m.r_id").as("exp_r_id"))
  }

  private def native(l: DataFrame, r: DataFrame, strict: Boolean): DataFrame =
    AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
      strict = strict, rightTiebreak = Seq("r_id"))

  private def nativeFwd(l: DataFrame, r: DataFrame, strict: Boolean): DataFrame =
    AsOf.joinForward(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
      strict = strict, rightTiebreak = Seq("r_id"))

  private def assertMatchesBrute(l: DataFrame, r: DataFrame, strict: Boolean): Unit = {
    val got = native(l, r, strict)
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    val exp = bruteBackward(l, r, strict)
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(got == exp)
  }

  private def randCase(seed: Long): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val keys = Vector("a", "b", "c", "d")
    val l = (1L to 200L).map(i =>
      (i, keys(rnd.nextInt(keys.size)), rnd.nextInt(50).toLong, s"p$i"))
    val r = (1L to 300L).map(i =>
      (i, keys(rnd.nextInt(keys.size + 1) % keys.size), rnd.nextInt(50).toLong))
    (leftDf(l), rightDf(r))
  }

  test("matches the brute-force inequality join on random data (strict)") {
    for (seed <- 1L to 3L) {
      val (l, r) = randCase(seed)
      assertMatchesBrute(l, r, strict = true)
    }
  }

  test("matches the brute-force inequality join on random data (inclusive)") {
    for (seed <- 4L to 6L) {
      val (l, r) = randCase(seed)
      assertMatchesBrute(l, r, strict = false)
    }
  }

  test("forward direction matches brute force on random data (strict + inclusive)") {
    for (seed <- 10L to 12L) {
      val (l, r) = randCase(seed)
      for (strict <- Seq(true, false)) {
        val got = nativeFwd(l, r, strict).select(col("l_id"), col("r_id"))
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
        val exp = bruteForward(l, r, strict)
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
        assert(got == exp, s"seed=$seed strict=$strict")
      }
    }
  }

  test("forward timestamp ties break to the tiebreak minimum") {
    val l = leftDf(Seq((1L, "k", 10L, "x")))
    val r = rightDf(Seq((9L, "k", 11L), (3L, "k", 11L), (6L, "k", 11L)))
    assert(nativeFwd(l, r, strict = true).select("r_id").collect()(0).getLong(0) == 3L)
  }

  test("strict excludes the exact-timestamp row, inclusive takes it") {
    val l = leftDf(Seq((1L, "k", 10L, "x")))
    val r = rightDf(Seq((7L, "k", 10L), (5L, "k", 9L)))
    val s = native(l, r, strict = true).select("r_id").collect()(0).getLong(0)
    val i = native(l, r, strict = false).select("r_id").collect()(0).getLong(0)
    assert(s == 5L && i == 7L)
  }

  test("timestamp ties on the right break to the tiebreak maximum") {
    val l = leftDf(Seq((1L, "k", 10L, "x")))
    val r = rightDf(Seq((3L, "k", 9L), (9L, "k", 9L), (6L, "k", 9L)))
    assert(native(l, r, strict = true).select("r_id").collect()(0).getLong(0) == 9L)
  }

  test("unmatched left rows keep null right columns (left-outer)") {
    val l = leftDf(Seq((1L, "k", 10L, "x"), (2L, "nope", 10L, "y"), (3L, "k", 1L, "z")))
    val r = rightDf(Seq((5L, "k", 5L)))
    val got = native(l, r, strict = true).select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(got == Map(1L -> Some(5L), 2L -> None, 3L -> None))
  }

  test("null keys and null times never match, on either side") {
    val l = Seq((1L, Some("k"), Some(10L)), (2L, None, Some(10L)), (3L, Some("k"), None))
      .toDF("l_id", "l_key", "l_t")
    val r = Seq((5L, Some("k"), Some(5L)), (6L, None, Some(1L)), (7L, Some("k"), None))
      .toDF("r_id", "r_key", "r_t")
    val got = AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        rightTiebreak = Seq("r_id"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(got == Map(1L -> Some(5L), 2L -> None, 3L -> None))
  }

  test("empty right side yields all-null matches, not a crash") {
    val l = leftDf(Seq((1L, "k", 10L, "x")))
    val r = rightDf(Seq.empty)
    val got = native(l, r, strict = true).select("r_id").collect()
    assert(got.length == 1 && got(0).isNullAt(0))
  }

  test("plan shape: AsOfJoin exec, one exchange per side, no Window/CartesianProduct") {
    val (l, r) = randCase(42L)
    val df = native(l, r, strict = true)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.size == 1)
    val s = plan.toString
    assert(!s.contains("Window") && !s.contains("CartesianProduct"))
    assert(collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size == 2)
  }

  test("optimizer rule: left-only filters push below the join, right-side filters stay") {
    val (l, r) = randCase(7L)
    val df = native(l, r, strict = true)
      .where(col("l_id") > 100L && col("r_id") =!= 999L)
    val opt = df.queryExecution.optimizedPlan
    val node = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    // The left-only conjunct pushed below the join: whatever Filter
    // remains ABOVE the node no longer mentions l_id (here the pushed
    // half even folded into the LocalRelation)...
    val aboveFilters = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.find(_ eq node).isDefined => f.condition.sql
    }
    assert(aboveFilters.forall(!_.contains("l_id")), s"not pushed: $opt")
    // ...and the right-side conjunct must NOT be pushed into the right
    // subtree (outer side: pre-filtering changes which row is latest) —
    // it still filters, above the join.
    val rightFilters = node.right.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition.sql
    }
    assert(!rightFilters.exists(_.contains("999")), s"unsound push: $opt")
    assert(aboveFilters.exists(_.contains("999")), s"right filter lost: $opt")
    // and pushing did not change the answer: same rows as filtering the
    // unoptimized-equivalent (filter left input first, join, filter after)
    val expected = native(l.where(col("l_id") > 100L), r, strict = true)
      .where(col("r_id") =!= 999L).count()
    assert(df.count() == expected)
  }

  test("optimizer rule: filter over a parquet-backed as-of join reaches PushedFilters") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val df = graft.queries.Registry.queries("asof_join_native")(spark, dir)
      .where(col("event_id") > 1000L)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the conjunct reaches the scan's DataFilters, BELOW the AsOfJoin node
    assert(s.contains("(event_id") && s.contains("> 1000)"), s.take(2000))
    assert(s.indexOf("> 1000") > s.indexOf("AsOfJoin"), s.take(2000))
  }

  test("optimizer rule: projection prunes unused columns out of both join sides") {
    val (l, r) = randCase(8L)
    val df = native(l, r, strict = true).select(col("l_id"), col("r_id"))
    val node = df.queryExecution.optimizedPlan.collectFirst { case a: AsOfJoinPlan => a }.get
    assert(!node.left.output.map(_.name).contains("l_pay"))
    // keys/time survive pruning — the exec still needs them
    assert(node.left.output.map(_.name).toSet == Set("l_id", "l_key", "l_t"))
    assert(node.right.output.map(_.name).toSet == Set("r_id", "r_key", "r_t"))
  }

  test("TimestampType time columns order correctly through the merge") {
    val l = Seq((1L, "k", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
        (2L, "k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("l_id", "l_key", "l_ts")
    val r = Seq((5L, "k", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")),
        (6L, "k", java.sql.Timestamp.valueOf("2023-12-31 00:00:00")))
      .toDF("r_id", "r_key", "r_ts")
    val got = AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"), "l_ts", "r_ts",
        rightTiebreak = Seq("r_id"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == Map(1L -> 5L, 2L -> 6L))
  }

  test("works with AQE disabled (plain EnsureRequirements co-partitioning)") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val (l, r) = randCase(21L)
      assertMatchesBrute(l, r, strict = true)
    } finally spark.conf.set(key, prev)
  }

  test("disjoint-name and type-mismatch guards reject bad inputs") {
    val l = leftDf(Seq((1L, "k", 10L, "x")))
    intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, l, Seq("l_key"), Seq("l_key"), "l_t", "l_t")
    }
    val r = Seq((5L, "k", "not-a-long")).toDF("r_id", "r_key", "r_t")
    intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t")
    }
  }

  /** Brute-force nearest: min |r_t − l_t|; equidistant → earlier side;
    * same-(side, time) → tiebreak max when earlier wins, min when later.
    * Encoded as one argmin struct: (distance, is_later, side-signed id). */
  private def bruteNearest(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, col("l_key") === col("r_key"), "left")
      .groupBy(col("l_id"))
      .agg(min(when(col("r_id").isNotNull, struct(
        abs(col("r_t") - col("l_t")).as("d"),
        (col("r_t") > col("l_t")).cast("int").as("later"),
        when(col("r_t") <= col("l_t"), -col("r_id")).otherwise(col("r_id"))
          .as("sid")))).as("m"))
      .select(col("l_id"), abs(col("m.sid")).as("exp_r_id"))

  test("nearest matches brute force on random data") {
    Seq(7L, 21L, 99L).foreach { seed =>
      val (l, r) = randCase(seed)
      val got = AsOf.joinNearest(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
          rightTiebreak = Seq("r_id"))
        .select(col("l_id"), col("r_id"))
        .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
      val exp = bruteNearest(l, r)
        .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
      assert(got == exp, s"seed $seed")
    }
  }

  test("nearest picks the closer side; equidistant resolves to the earlier row") {
    val l = leftDf(Seq((1L, "k", 10L, "p"), (2L, "k", 14L, "p"), (3L, "k", 23L, "p")))
    val r = rightDf(Seq((101L, "k", 7L), (102L, "k", 18L), (103L, "k", 30L)))
    val got = AsOf.joinNearest(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        rightTiebreak = Seq("r_id"))
      .select(col("l_id"), col("r_id")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // l=10: dist 3 back (7) vs 8 fwd (18) → 101; l=14: 7 vs 4 → 102
    // l=23: 5 back (18) vs 7 fwd (30) → 102
    assert(got == Map(1L -> 101L, 2L -> 102L, 3L -> 102L))
    val tie = leftDf(Seq((1L, "k", 10L, "p")))
    val rTie = rightDf(Seq((7L, "k", 8L), (9L, "k", 12L)))
    val gotTie = AsOf.joinNearest(tie, rTie, Seq("l_key"), Seq("r_key"),
        "l_t", "r_t", rightTiebreak = Seq("r_id"))
      .select(col("r_id")).collect().head.getLong(0)
    assert(gotTie == 7L, "equidistant candidates must resolve to the earlier row")
  }

  test("nearest: exact match wins at distance zero with tiebreak max") {
    val l = leftDf(Seq((1L, "k", 10L, "p")))
    val r = rightDf(Seq((5L, "k", 10L), (6L, "k", 10L), (8L, "k", 11L)))
    val got = AsOf.joinNearest(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        rightTiebreak = Seq("r_id"))
      .select(col("r_id")).collect().head.getLong(0)
    assert(got == 6L, "same-time run buffers backward, so the tiebreak MAX wins")
  }

  test("nearest: null keys and times never match, on either side") {
    val l = Seq((1L, Option("k"), Option(10L), "p"),
                (2L, None: Option[String], Option(10L), "p"),
                (3L, Option("k"), None: Option[Long], "p"))
      .toDF("l_id", "l_key", "l_t", "l_pay")
    val r = Seq((5L, Option("k"), Option(9L)),
                (6L, None: Option[String], Option(9L)),
                (7L, Option("k"), None: Option[Long]))
      .toDF("r_id", "r_key", "r_t")
    val got = AsOf.joinNearest(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        rightTiebreak = Seq("r_id"))
      .select(col("l_id"), col("r_id")).collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(got == Map(1L -> Some(5L), 2L -> None, 3L -> None),
      "null left key/time must not match; null right rows must never be candidates")
  }

  test("nearest rejects non-integral time columns") {
    val l = Seq((1L, "k", "x")).toDF("l_id", "l_key", "l_t")
    val r = Seq((5L, "k", "y")).toDF("r_id", "r_key", "r_t")
    intercept[IllegalArgumentException] {
      AsOf.joinNearest(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t")
    }
  }

  // --- merge_asof tolerance ---

  /** Brute-force backward with tolerance: latest earlier right within
    * `tol` time units (ties → max r_id). */
  private def bruteBackwardTol(l: DataFrame, r: DataFrame, strict: Boolean,
      tol: Long): DataFrame = {
    val cond = (if (strict) col("r_t") < col("l_t") else col("r_t") <= col("l_t")) &&
      col("l_t") - col("r_t") <= lit(tol)
    l.join(r, col("l_key") === col("r_key") && cond, "left")
      .groupBy(col("l_id"))
      .agg(max(struct(col("r_t"), col("r_id"))).as("m"))
      .select(col("l_id"), col("m.r_id").as("exp_r_id"))
  }

  test("tolerance matches brute force on random data (backward + forward)") {
    Seq(11L, 42L).foreach { seed =>
      val (l, r) = randCase(seed)
      Seq(0L, 3L, 10L).foreach { tol =>
        val gotB = AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"),
            "l_t", "r_t", strict = true, rightTiebreak = Seq("r_id"),
            tolerance = Some(tol))
          .select(col("l_id"), col("r_id"))
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
        val expB = bruteBackwardTol(l, r, strict = true, tol)
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
        assert(gotB == expB, s"backward seed $seed tol $tol")

        val condF = col("r_t") > col("l_t") && col("r_t") - col("l_t") <= lit(tol)
        val gotF = AsOf.joinForward(l, r, Seq("l_key"), Seq("r_key"),
            "l_t", "r_t", strict = true, rightTiebreak = Seq("r_id"),
            tolerance = Some(tol))
          .select(col("l_id"), col("r_id"))
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
        val expF = l.join(r, col("l_key") === col("r_key") && condF, "left")
          .groupBy(col("l_id"))
          .agg(min(struct(col("r_t"), col("r_id"))).as("m"))
          .select(col("l_id"), col("m.r_id"))
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
        assert(gotF == expF, s"forward seed $seed tol $tol")
      }
    }
  }

  test("tolerance nulls too-distant matches without disturbing later left rows") {
    // clicks at t=1 and t=20; purchases at t=10 (gap 9 > tol) and t=22
    // (gap 2 ≤ tol). The t=1 click is out of range for BOTH; the cursor
    // must still have consumed it so the t=20 click matches l_t=22.
    val l = leftDf(Seq((1L, "k", 10L, "p"), (2L, "k", 22L, "p")))
    val r = rightDf(Seq((101L, "k", 1L), (102L, "k", 20L)))
    val got = AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        strict = true, rightTiebreak = Seq("r_id"), tolerance = Some(5L))
      .select(col("l_id"), col("r_id")).collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some(102L)))
  }

  test("nearest honors tolerance: both-side candidates beyond it yield null") {
    val l = leftDf(Seq((1L, "k", 10L, "p"), (2L, "k", 17L, "p")))
    val r = rightDf(Seq((101L, "k", 2L), (102L, "k", 19L)))
    val got = AsOf.joinNearest(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        rightTiebreak = Seq("r_id"), tolerance = Some(4L))
      .select(col("l_id"), col("r_id")).collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // l=10: back dist 8, fwd dist 9 — both > 4 → null
    // l=17: back dist 15, fwd dist 2 → 102
    assert(got == Map(1L -> None, 2L -> Some(102L)))
  }

  test("tolerance rejects negative values and non-integral time columns") {
    val l = leftDf(Seq((1L, "k", 10L, "p")))
    val r = rightDf(Seq((5L, "k", 9L)))
    intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, r, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        tolerance = Some(-1L))
    }
    val ls = Seq((1L, "k", "x")).toDF("l_id", "l_key", "l_t")
    val rs = Seq((5L, "k", "y")).toDF("r_id", "r_key", "r_t")
    intercept[IllegalArgumentException] {
      AsOf.joinBackward(ls, rs, Seq("l_key"), Seq("r_key"), "l_t", "r_t",
        tolerance = Some(1L))
    }
  }
}
