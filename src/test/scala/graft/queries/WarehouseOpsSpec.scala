package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants the DuckDB oracle CANNOT check: the oracle mirrors
  * the same formulation, so a bug shared by both engines passes the
  * hash gate. These specs assert what the OPERATOR means instead —
  * SCD2's interval algebra, and bucketized-overlap ≡ direct-predicate
  * equivalence on adversarial random intervals.
  */
class WarehouseOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cdc_scd2: per-user validity intervals partition time — no overlap, no gap, one current") {
    val rows = graft.SparkEntry.queries("cdc_scd2")(spark, dir)
      .select(col("user_id"), col("tier"), col("valid_from"), col("valid_to"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (user, ivs) =>
      val sorted = ivs.toList.sortBy(_._3)
      // exactly one open (current) interval, and it is the last
      assert(sorted.count(_._4 == Long.MaxValue) == 1, s"user $user current-count != 1")
      assert(sorted.last._4 == Long.MaxValue, s"user $user current interval not last")
      // adjacent intervals: next.valid_from == prev.valid_to + 1 (no gap, no overlap)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._3 == a._4 + 1L,
            s"user $user: interval [${b._3},...] does not abut [${a._3},${a._4}]")
        case _ => ()
      }
      // consecutive intervals always change tier (else the row is redundant)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 != b._2, s"user $user: consecutive equal tiers")
        case _ => ()
      }
    }
  }

  test("window_rolling_stats: RANGE frame equals brute-force trailing-7d recompute") {
    val SevenDaysUs = 7L * 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("us"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val got = graft.SparkEntry.queries("window_rolling_stats")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == ev.length)
    // brute force: for every event, scan the user's events in [t-7d+1, t]
    ev.foreach { case (eid, user, us, _) =>
      val peers = byUser(user).filter(e => e._3 > us - SevenDaysUs && e._3 <= us)
      val (n, sum) = (peers.length.toLong, peers.map(_._4).sum)
      val (gn, gs) = got(eid)
      assert(gn == n, s"event $eid: n_7d $gn != brute $n")
      assert(math.abs(gs - sum / 100.0) < 1e-9, s"event $eid: sum_7d $gs != brute ${sum / 100.0}")
    }
  }

  test("join_interval_overlap: bucketized join ≡ direct overlap predicate on random intervals") {
    import spark.implicits._
    val DayUs = 86400000000L
    val rnd = new scala.util.Random(42)
    // adversarial intervals: some inside one day, some straddling
    // midnight, some exactly bucket-aligned, some zero-length
    val as = (0 until 400).map { i =>
      val start = rnd.nextInt(30).toLong * DayUs + rnd.nextInt(86400) * 1000000L
      val len = rnd.nextInt(3) match {
        case 0 => 0L
        case 1 => rnd.nextInt(3600) * 1000000L
        case _ => DayUs - 1L
      }
      (i.toLong, start, start + len)
    }.toDF("a_id", "a_start", "a_end")
    val bs = (0 until 40).map { j =>
      val day = rnd.nextInt(30).toLong
      val start = day * DayUs - 12L * 3600000000L
      (j.toLong, start, start + 48L * 3600000000L - 1L)
    }.toDF("b_id", "b_start", "b_end")

    val direct = as.join(bs,
        col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val aDays = as.withColumn("day_no",
      explode(expr(s"sequence(a_start div $DayUs, a_end div $DayUs)")))
    val bDays = bs.withColumn("day_no",
      explode(expr(s"sequence(b_start div $DayUs, b_end div $DayUs)")))
    val bucketized = aDays.join(bDays, "day_no")
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("a_id"), col("b_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketized == direct,
      s"bucketized overlap diverges: missing=${(direct -- bucketized).take(5)} " +
        s"extra=${(bucketized -- direct).take(5)}")
    assert(direct.nonEmpty, "degenerate test: no overlapping pairs generated")
  }

  test("experiment_ttest: arms partition the user base; t matches a Welch recompute") {
    val out = graft.SparkEntry.queries("experiment_ttest")(spark, dir).cache()
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100.0, 0) AS BIGINT)").as("vq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = ev.map(_._1).distinct.sorted
    def arm(u: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      (((hex(0) >> 4) & 0xF) * 16 + (hex(0) & 0xF)) % 2
    }
    val rows = out.collect()
    assert(rows.nonEmpty)
    // arms partition the exposed population identically for every metric row
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == users.length,
        s"${r.getString(0)}: n0+n1 must cover every distinct user")
      assert(r.getLong(1) == users.count(arm(_) == 0), "n0 is the md5-even arm")
    }
    // independent Welch recompute per event type (zeros included)
    rows.foreach { r =>
      val et = r.getString(0)
      val byUser = ev.filter(_._2 == et).groupBy(_._1)
        .map { case (u, xs) => u -> xs.map(_._3).sum }
      val x = users.map(u => (arm(u), byUser.getOrElse(u, 0L).toDouble))
      val (a0, a1) = (x.filter(_._1 == 0).map(_._2), x.filter(_._1 == 1).map(_._2))
      def meanVar(a: Seq[Double]) = {
        val m = a.sum / a.length
        (m, a.map(v => (v - m) * (v - m)).sum / (a.length - 1))
      }
      val ((m0, v0), (m1, v1)) = (meanVar(a0.toSeq), meanVar(a1.toSeq))
      val t = (m1 - m0) / math.sqrt(v0 / a0.length + v1 / a1.length)
      assert(math.abs(r.getDouble(5) - t) < 1e-3,
        s"$et: t=${r.getDouble(5)} vs recomputed $t")
      assert(r.getBoolean(6) == (math.abs(r.getDouble(5)) > 1.96),
        s"$et: significance flag must follow |t| > 1.96")
    }
  }

  test("cdc_log_compact: equals a sequential replay of the changelog") {
    val out = graft.SparkEntry.queries("cdc_log_compact")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toMap
    // replay the log one record at a time in (seq, event_id) order —
    // the semantics compaction must reproduce without the sort
    val log = graft.queries.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"), expr("CAST(round(value * 100.0, 0) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(r => (r._2, r._3))
    val state = scala.collection.mutable.Map.empty[Long, (Long, Long, String, Long)]
    log.foreach { case (u, seq, id, op, vq) =>
      if (op == "error") state.remove(u) else state(u) = (seq, id, op, vq)
    }
    // a user whose LAST record is a delete must also be absent even if
    // earlier upserts existed — drop-then-reinsert is what replay checks
    assert(out == state.toMap, {
      val onlyOut = out.keySet -- state.keySet
      val onlyReplay = state.keySet -- out.keySet
      s"compaction diverges from replay: extra=$onlyOut missing=$onlyReplay"
    })
  }

  test("attribution_multitouch: credit conserves per purchase, decay halves per day") {
    val rows = graft.SparkEntry.queries("attribution_multitouch")(spark, dir)
      .select(col("purchase_id"), col("age_days"), col("w"),
        col("credit_decay_bp"), col("credit_linear_bp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // weight is exactly 2^(7 - age) for age in [0, 7]
    rows.foreach { case (_, age, w, _, _) =>
      assert(age >= 0 && age <= 7, s"age_days out of lookback: $age")
      assert(w == (1L << (7 - age)), s"w=$w not 2^(7-$age)")
    }
    rows.groupBy(_._1).foreach { case (pid, ps) =>
      val n = ps.length
      // integer floor division loses < 1 bp per click, never over-credits
      val decaySum = ps.map(_._4).sum
      assert(decaySum <= 10000 && decaySum > 10000 - n,
        s"purchase $pid decay credit sum $decaySum outside (10000-$n, 10000]")
      val linearSum = ps.map(_._5).sum
      assert(linearSum <= 10000 && linearSum > 10000 - n,
        s"purchase $pid linear credit sum $linearSum outside (10000-$n, 10000]")
      // every click of one purchase gets the same linear share
      assert(ps.map(_._5).distinct.length == 1)
    }
  }

  test("layout_skip_stats: pruning is sound and ordered linear_y ≥ zorder ≥ linear_x") {
    val rows = Registry.queries("layout_skip_stats")(spark, dir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_pruned"), r.getAs[Long]("rows_scanned"),
          r.getAs[Long]("rows_matched"))).toMap
    val matched = rows.values.head._3
    rows.foreach { case (layout, (_, scanned, m)) =>
      assert(m == matched, "rows_matched must be layout-independent")
      // soundness: zone-map pruning may never drop a matching row
      assert(scanned >= matched, s"$layout pruned away matching rows")
    }
    // the layout argument itself: the y-striped layout serves the y
    // predicate best, z-order is the two-dimensional compromise, the
    // x-striped layout scans everything
    assert(rows("linear_y")._2 <= rows("zorder")._2)
    assert(rows("zorder")._2 <= rows("linear_x")._2)
    assert(rows("linear_x")._1 == 0L, "x stripes cannot prune on y")
  }

  test("shard_manifest: cells partition the corpus; checksum is xor-mergeable") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Registry.queries("shard_manifest")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val docs = graft.queries.Tables.documents(spark, dir)
      .agg(count(lit(1)), sum(col("n_chars"))).collect().head
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.getLong(0))
    assert(rows.map(_.getAs[Long]("n_bytes")).sum == docs.getLong(1))
    rows.foreach { r =>
      assert(r.getAs[Long]("min_doc") <= r.getAs[Long]("max_doc"))
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
    // mergeability: xor of the per-shard checksums = checksum of the union
    // cell a full-corpus manifest would carry (the incremental-load law)
    val whole = rows.map(_.getAs[Long]("checksum")).reduce(_ ^ _)
    val direct = graft.queries.Tables.documents(spark, dir)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rh", expr((1 to 8).map { i =>
        val pow = 1L << (4 * (8 - i))
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * ${pow}L"
      }.mkString("(", " + ", ")")))
      .agg(expr("bit_xor(rh)")).collect().head.getLong(0)
    assert(whole == direct, "per-shard checksums must xor to the corpus checksum")
  }
}
