package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third scale decade for the heavy tail (VERDICT r09 task 3): the
  * per-query scale audit ([[BenchScale]], SCALE_AUDIT.json) spans
  * sf0.001 → sf0.1 — two decades that can hide a super-linear tail.
  * This probe GENERATES a 10×-sf0.1-equivalent corpus (the driver's
  * testdata is read-only and tops out at sf0.1) with the Bench-probe
  * generator style — xxhash-deterministic, distribution-matched to the
  * driver tables it extends — and re-times the heaviest queries across
  * sf0.1 → 10× sf0.1, reporting the third-decade ratio per query.
  *
  * Generated tables (under the target dir):
  *  - `documents.parquet` — 50 000 docs (10× sf0.1): token bags drawn
  *    from sf0.1's OWN vocabulary with per-token weights sampled off
  *    the real table, lengths 10–100 (the sf0.1 range), the real
  *    lang/source key sets;
  *  - `embeddings.parquet` — 20 000 64-dim vectors (10× sf0.1),
  *    clustered like the ANN probes (corpus/100 centers + noise);
  *  - `events.parquet` — 1 000 000 rows (10×): the sf0.1 schema
  *    (event_id, ts over the same 30-day window, user_id 10× keyspace,
  *    the five event types, value, `{"k": n}` props).
  *
  * Like BenchScale this is a TRIPWIRE, not a throughput model: only the
  * high side of the ratio means anything — a ratio materially above 10
  * per 10× data marks a plan that won't survive the next two decades.
  *
  * Prints ONE JSON line:
  *   {"metric":"decade3_max_ratio","value":…,"queries":{name:
  *     {"t1":…,"t10":…,"ratio":…},…},"rows":{…}}
  *
  * Usage: graft.BenchScaleDecade [genDir] [query,query,…]
  *   (default: tmp dir; the r9 scale-audit top-20 by sf0.1 time)
  */
object BenchScaleDecade {

  /** The 20 heaviest queries of SCALE_AUDIT.json round 9 by t(sf0.1),
    * plus the round-10 additions that extend those families. */
  private val DefaultHeavy = Seq(
    "sim_knn_descent_converged", "sim_graph_search", "sim_graph_incremental",
    "sim_graph_compact", "sim_graph_delete", "sim_graph_sweep",
    "ab_fdr_bh", "sim_ivfadc_topk", "eval_bootstrap_ci", "dedup_lines",
    "dedup_multimodal_clusters", "quality_dsir", "mine_training_dynamics",
    "multimodal_audio_energy", "dedup_minhash_est", "eval_rouge_l",
    "eval_permutation_test", "tokenizer_wordpiece", "mix_domain_similarity",
    "quality_ppl_buckets", "doc_chunking_cdc", "text_novelty", "bpe_train",
    "text_bm25_served")

  private[graft] def generate(spark: SparkSession, srcDir: String,
      outDir: String): Unit = {
    // --- documents: vocabulary + weights OFF THE REAL sf0.1 TABLE ---
    val vocabRows = graft.queries.Tables.documents(spark, srcDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(vocabRows.nonEmpty, s"no vocabulary in $srcDir/documents.parquet")
    // 1024 weighted slots: token share of slots = token share of mass
    val mass = vocabRows.map(_._2).sum.toDouble
    val slots = {
      val s = vocabRows.flatMap { case (t, c) =>
        Seq.fill(math.max(1, math.round(c / mass * 1024).toInt))(t)
      }
      (s ++ Seq.fill(1024)(vocabRows.head._1)).take(1024)
    }
    val langs = graft.queries.Tables.documents(spark, srcDir)
      .select(col("lang")).distinct().collect().map(_.getString(0)).sorted
    val sources = graft.queries.Tables.documents(spark, srcDir)
      .select(col("source")).distinct().collect().map(_.getString(0)).sorted
    // Escape single quotes — documents text is split only on spaces, so
    // punctuation (including ') survives into the vocabulary, and an
    // unescaped token would break the generated selectExpr (ADVICE r10).
    def arrLit(xs: Seq[String]) =
      xs.map(x => s"'${x.replace("'", "\\'")}'").mkString("array(", ", ", ")")
    val nDocs = 50000L
    spark.range(nDocs).selectExpr(
        "id AS doc_id",
        s"""array_join(transform(sequence(1, 10 + CAST(pmod(xxhash64(id * 13 + 5), 91) AS INT)),
             i -> element_at(${arrLit(slots.toSeq)},
               CAST(pmod(xxhash64(id * 131071 + i), 1024) AS INT) + 1)), ' ')
           AS text""",
        s"element_at(${arrLit(langs.toSeq)}, CAST(pmod(xxhash64(id * 7 + 3), ${langs.length}) AS INT) + 1) AS lang",
        s"element_at(${arrLit(sources.toSeq)}, CAST(pmod(xxhash64(id * 11 + 9), ${sources.length}) AS INT) + 1) AS source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // --- embeddings: the ANN-probe generator (clustered + noise) ---
    val nVec = 20000L
    val nClusters = math.max(nVec / 100L, 1L)
    val dims = (0 until 64).map { d =>
      val center = s"pmod(xxhash64(vec_id % $nClusters * 64 + $d), 1000) / 500.0 - 1.0"
      val noise = s"pmod(xxhash64(vec_id * 64 + $d + 7777777), 1000) / 4000.0"
      expr(s"CAST($center + $noise AS FLOAT)")
    }
    spark.range(nVec).select(col("id").as("vec_id"), array(dims: _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // --- events: sf0.1 schema, 10× rows, same 30-day window ---
    val nEvents = 1000000L
    spark.range(nEvents).selectExpr(
        "id AS event_id",
        // microseconds across [2024-01-01, 2024-01-31)
        """timestamp_micros(CAST(1704067200000000 + pmod(xxhash64(id * 17 + 1), 2592000000000) AS BIGINT)) AS ts""",
        "CAST(pmod(xxhash64(id * 19 + 2), 15000) AS BIGINT) AS user_id",
        """element_at(array('click','view','signup','error','purchase'),
           CAST(pmod(xxhash64(id * 23 + 4), 5) AS INT) + 1) AS event_type""",
        "round(CAST(pmod(xxhash64(id * 29 + 6), 56021) AS DOUBLE) / 100.0, 2) AS value",
        """concat('{"k": ', CAST(pmod(xxhash64(id * 31 + 8), 100) AS STRING), '}') AS props""")
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  def main(args: Array[String]): Unit = {
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

    val sf01 = "/root/testdata/sf0.1"
    val genDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-sf1").toString)
    val names = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultHeavy)
      .filter(SparkEntry.queries.contains)

    val tGen0 = System.nanoTime()
    if (!new java.io.File(s"$genDir/documents.parquet").exists())
      generate(spark, sf01, genDir)
    val genSec = (System.nanoTime() - tGen0) / 1e9

    def consume(df: DataFrame): Long = df.queryExecution.toRdd.count()
    // untimed warmup (JIT/codegen) at the smallest SF
    names.foreach { n =>
      try consume(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    val dirs = Seq("t1" -> sf01, "t10" -> genDir)
    // BenchScale's discipline: best-of-2 per (query, dir) — the first
    // rep absorbs the per-dir family artifacts, min() reads marginal
    val rows: Seq[(String, Map[String, Double])] = names.map { n =>
      val fn = SparkEntry.queries(n)
      n -> dirs.map { case (label, dir) =>
        val best = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { consume(fn(spark, dir)); true }
            catch { case e: Throwable =>
              System.err.println(s"# decade3_failed $n@$label ${e.getMessage}")
              false
            }
          if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
        }.min
        System.gc()
        label -> best
      }.toMap
    }
    val floor = 0.15
    val qs = rows.map { case (n, t) =>
      val r = t("t10") / math.max(t("t1"), floor)
      f""""$n":{"t1":${t("t1")}%.3f,"t10":${t("t10")}%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val maxRatio = rows.map { case (_, t) =>
      t("t10") / math.max(t("t1"), floor)
    }.foldLeft(0.0)(math.max)
    println(f"""{"metric":"decade3_max_ratio","value":$maxRatio%.2f,""" +
      f""""unit":"x_per_10x_data","gen_sec":$genSec%.1f,""" +
      s""""gen_dir":"$genDir","queries":$qs}""")
    spark.stop()
  }
}
