package graft
import org.apache.spark.sql.SparkSession

/** Empirical scaling audit: run the full registered query set at
  * sf0.001 / sf0.01 / sf0.1 (10× data per step) in one JVM and report
  * each query's time ratio across the 10× steps. A query whose
  * t(sf0.1)/t(sf0.01) ratio materially exceeds 10 is super-linear —
  * the local-mode smoking gun for a plan that won't survive 100 TB
  * (quadratic pair joins, global sorts, driver funnels). Fixed per-query
  * overhead (~0.1-0.3 s of job setup at local[32]) deflates ratios for
  * genuinely linear queries, so only the HIGH side of the ratio is
  * meaningful — this is a tripwire for scale bugs, not a throughput
  * model.
  *
  * Prints one JSON line:
  *   {"metric":"max_ratio","value":…,"queries":{name:{"t001":…,"t01":…,
  *    "t1":…,"ratio":…},…}}
  * where ratio = t(sf0.1) / max(t(sf0.01), floor) guarded against
  * sub-overhead denominators.
  */
object BenchScale {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_BASE", "/root/testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    val sfs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s -> s"$base/$s")

    // untimed warmup at the smallest SF (JIT, codegen, parquet readers)
    SparkEntry.queries.foreach { case (_, fn) =>
      try consume(fn(spark, sfs.head._2)) catch { case _: Throwable => () }
    }

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt).getOrElse(2)
    val selected = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // times(query)(sfLabel) = best-of-`repeat` seconds
    val times: Map[String, Map[String, Double]] = selected.map { case (name, fn) =>
      name -> sfs.map { case (label, dir) =>
        val best = (1 to repeat).map { _ =>
          val t0 = System.nanoTime()
          try consume(fn(spark, dir)) catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }.min
        System.gc()
        label -> best
      }.toMap
    }

    // guard the denominator: a 0.05 s sf0.01 time is pure overhead and
    // would turn a healthy 0.5 s sf0.1 run into a fake ratio of 10
    val floor = 0.15
    def toRow(t: Map[String, Double]) = {
      val (t001, t01, t1) = (t("sf0.001"), t("sf0.01"), t("sf0.1"))
      (t001, t01, t1, t1 / math.max(t01, floor))
    }
    val firstPass = times.map { case (name, t) => name -> toRow(t) }
    // noise recheck: by the tail of a ~200-query × 3-SF sweep the JVM
    // carries every query's checkpoint RDDs and GC pressure spikes —
    // a query can draw a 2-4x-inflated sample in both reps (observed:
    // corpus_clean 0.38 s isolated vs 2.0 s at sweep position ~150).
    // Re-measure any apparent super-linear outlier at the end and keep
    // the better (min) of the two samples per SF: a REAL super-linear
    // plan stays super-linear under re-measurement; a noise spike doesn't.
    val rows = firstPass.map { case (name, first @ (_, _, _, ratio)) =>
      if (ratio <= 8.0) name -> first
      else {
        val fn = SparkEntry.queries(name)
        val re = sfs.map { case (label, dir) =>
          // a FAILED rep must not contribute a (fast) elapsed time — a
          // transient OOM would otherwise let min() erase a genuine
          // super-linear sample
          val best = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            val ok = try { consume(fn(spark, dir)); true }
              catch { case _: Throwable => false }
            if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
          }.min
          label -> math.min(best, times(name)(label))
        }.toMap
        name -> toRow(re)
      }
    }
    val qs = rows.map { case (n, (a, b, c, r)) =>
      f""""$n":{"t001":$a%.3f,"t01":$b%.3f,"t1":$c%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val maxRatio = if (rows.nonEmpty) rows.values.map(_._4).max else 0.0
    println(f"""{"metric":"max_ratio","value":$maxRatio%.2f,"unit":"x_per_10x_data","queries":$qs}""")
    spark.stop()
  }
}
