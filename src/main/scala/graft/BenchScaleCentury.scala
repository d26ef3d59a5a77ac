package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth scale decade for the dedup/identity heavy tail (VERDICT r10
  * task 6): the ANN family has 2 M-vector probes, but the dedup/CC
  * evidence stopped at 10×-sf0.1 — and that decade corpus drew its
  * vocabulary from sf0.1's own (tiny) token set, which is exactly the
  * DEGENERATE regime (`SCALING.md` round 10: band collisions at
  * constant probability → pairs 98.9× per 10× docs). This probe
  * generates 10× and 100×-sf0.1-equivalent corpora with a GROWING
  * vocabulary (Heaps-style: V = nDocs/10, with a small common-word head
  * so line-dedup still finds df-heavy chunks) and a FIXED planted
  * near-dup rate (10%, the LshScaleSpec construction: a dup repeats its
  * base's token stream except the last two slots), so candidate pairs
  * scale with the planted population — the healthy regime — and
  * re-times the dedup/CC tail across x10 → x100, the true fourth
  * decade.
  *
  * Also reports, on the OLD fixed-vocabulary decade corpus (the
  * degenerate regime, regenerated via [[BenchScaleDecade.generate]]),
  * the uncapped vs `DefaultMaxBucket`-capped candidate-pair counts —
  * the SCALING.md evidence that the r11 default cap collapses the
  * quadratic mass while the healthy corpora here are untouched
  * (`lsh_band_stats` over-cap readout printed for both regimes).
  *
  * Like BenchScale this is a TRIPWIRE: only the high side of the ratio
  * means anything — a ratio materially above 10 per 10× data marks a
  * plan that won't survive the next decades.
  *
  * Prints ONE JSON line:
  *   {"metric":"decade4_max_ratio","value":…,
  *    "queries":{name:{"t10":…,"t100":…,"ratio":…}},
  *    "pairs":{"x10":…,"x100":…},"over_cap":{…},"degenerate":{…}}
  *
  * Usage: graft.BenchScaleCentury [baseDir] [query,query,…]
  */
object BenchScaleCentury {

  private val DefaultProbe = Seq(
    "dedup_minhash", "dedup_minhash_pairs", "dedup_minhash_est",
    "dedup_clusters", "dedup_lines", "lsh_band_stats",
    "identity_components", "identity_graph_stats")

  /** Generate a `scale`×-sf0.1-equivalent corpus with growing
    * vocabulary and planted near-dups under `outDir`. */
  private[graft] def generate(spark: SparkSession, outDir: String,
      scale: Long): Unit = {
    val nDocs = 5000L * scale
    val nBase = nDocs * 9 / 10 // last 10% are planted near-dups
    val vocab = math.max(nDocs / 10L, 1024L) // Heaps-ish growth
    // token stream: slot j of doc d hashes (srcId, j); a planted dup
    // replays its base's stream except the last 2 slots (its own id
    // salts them) — shingle Jaccard stays high, the LshScaleSpec shape.
    // 1-in-8 slots draw from a 256-token common head (df-heavy chunks
    // for the line-dedup pass; mild, vocabulary still grows). Tokens
    // are 6-hex-char md5 prefixes of the vocab id — NOT short numeric
    // strings: the LSH shingles are 5 CHARACTERS, so token surface
    // diversity must grow with the vocabulary or random band collisions
    // re-create the degenerate regime one level down (measured: 'w'+id
    // tokens gave 56× pairs per 10× docs from shingle aliasing alone;
    // md5 tokens keep the pair population tracking the planted dups).
    spark.range(nDocs).selectExpr(
        "id AS doc_id",
        s"CASE WHEN id >= $nBase THEN id - $nBase ELSE id END AS src_id",
        s"10 + CAST(pmod(xxhash64(CASE WHEN id >= $nBase THEN id - $nBase ELSE id END * 13 + 5), 91) AS INT) AS len")
      .selectExpr(
        "doc_id",
        s"""array_join(transform(sequence(1, len),
              j -> substr(md5(CAST(
                CASE
                  WHEN j > len - 2 AND doc_id >= $nBase THEN
                    pmod(xxhash64(doc_id * 524287 + j + 33), $vocab)
                  WHEN pmod(xxhash64(src_id * 8191 + j), 8) = 0 THEN
                    pmod(xxhash64(src_id * 131071 + j), 256)
                  ELSE
                    pmod(xxhash64(src_id * 131071 + j), $vocab)
                END AS STRING)), 1, 6)), ' ') AS text""",
        "element_at(array('en','de','es','fr'), CAST(pmod(xxhash64(doc_id * 7 + 3), 4) AS INT) + 1) AS lang",
        "element_at(array('web','wiki','books','code'), CAST(pmod(xxhash64(doc_id * 11 + 9), 4) AS INT) + 1) AS source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // events: sf0.1 schema at scale — signup edges drive the identity
    // graph; the props keyspace grows with the corpus so components
    // stay realistically sized instead of collapsing into one blob
    val nEvents = 100000L * scale
    val users = 1500L * scale
    val keys = 10L * scale
    spark.range(nEvents).selectExpr(
        "id AS event_id",
        """timestamp_micros(CAST(1704067200000000 + pmod(xxhash64(id * 17 + 1), 2592000000000) AS BIGINT)) AS ts""",
        s"CAST(pmod(xxhash64(id * 19 + 2), $users) AS BIGINT) AS user_id",
        """element_at(array('click','view','signup','error','purchase'),
           CAST(pmod(xxhash64(id * 23 + 4), 5) AS INT) + 1) AS event_type""",
        "round(CAST(pmod(xxhash64(id * 29 + 6), 56021) AS DOUBLE) / 100.0, 2) AS value",
        s"""concat('{"k": ', CAST(pmod(xxhash64(id * 31 + 8), $keys) AS STRING), '}') AS props""")
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

    val baseDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-century").toString)
    val names = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultProbe)
      .filter(SparkEntry.queries.contains)

    val tGen0 = System.nanoTime()
    Seq("x10" -> 10L, "x100" -> 100L).foreach { case (label, scale) =>
      if (!new java.io.File(s"$baseDir/$label/documents.parquet").exists())
        generate(spark, s"$baseDir/$label", scale)
    }
    if (!new java.io.File(s"$baseDir/degenerate/documents.parquet").exists())
      BenchScaleDecade.generate(spark, "/root/testdata/sf0.1",
        s"$baseDir/degenerate")
    val genSec = (System.nanoTime() - tGen0) / 1e9

    def consume(df: DataFrame): Long = df.queryExecution.toRdd.count()
    // untimed warmup (JIT/codegen) at the smallest SF
    names.foreach { n =>
      try consume(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    val dirs = Seq("t10" -> s"$baseDir/x10", "t100" -> s"$baseDir/x100")
    val rows: Seq[(String, Map[String, Double])] = names.map { n =>
      val fn = SparkEntry.queries(n)
      n -> dirs.map { case (label, dir) =>
        val best = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { consume(fn(spark, dir)); true }
            catch { case e: Throwable =>
              System.err.println(s"# decade4_failed $n@$label ${e.getMessage}")
              false
            }
          if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
        }.min
        System.gc()
        label -> best
      }.toMap
    }

    // healthy-regime pair counts: must track the planted population
    // (linear), never the corpus square
    def pairCount(dir: String): Long =
      graft.dedup.CandidateArtifacts.pairs(spark, dir).count()
    val pairs10 = pairCount(s"$baseDir/x10")
    val pairs100 = pairCount(s"$baseDir/x100")
    def overCap(dir: String): Long =
      SparkEntry.queries("lsh_band_stats")(spark, dir)
        .where(col("over_cap")).agg(coalesce(sum(col("pairs_bound")), lit(0L)))
        .head().getLong(0)
    val oc10 = overCap(s"$baseDir/x10")
    val oc100 = overCap(s"$baseDir/x100")

    // degenerate regime (the OLD fixed-vocab decade corpus): uncapped vs
    // default-capped candidate pairs + the over-cap band mass
    val dsig = graft.dedup.CandidateArtifacts
      .signatures(spark, s"$baseDir/degenerate")
    val dUncapped = graft.dedup.DedupQueries
      .pairsFromSignatures(dsig).count()
    val dCapped = graft.dedup.DedupQueries
      .pairsFromSignatures(dsig,
        Some(graft.dedup.DedupQueries.DefaultMaxBucket)).count()
    val dOverCap = overCap(s"$baseDir/degenerate")

    val floor = 0.15
    val qs = rows.map { case (n, t) =>
      val r = t("t100") / math.max(t("t10"), floor)
      f""""$n":{"t10":${t("t10")}%.3f,"t100":${t("t100")}%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val maxRatio = rows.map { case (_, t) =>
      t("t100") / math.max(t("t10"), floor)
    }.foldLeft(0.0)(math.max)
    println(f"""{"metric":"decade4_max_ratio","value":$maxRatio%.2f,""" +
      f""""unit":"x_per_10x_data","gen_sec":$genSec%.1f,""" +
      s""""base_dir":"$baseDir",""" +
      s""""pairs":{"x10":$pairs10,"x100":$pairs100},""" +
      s""""over_cap_pairs_bound":{"x10":$oc10,"x100":$oc100},""" +
      s""""degenerate":{"pairs_uncapped":$dUncapped,"pairs_capped":$dCapped,""" +
      s""""over_cap_pairs_bound":$dOverCap},""" +
      s""""queries":$qs}""")
    spark.stop()
  }
}
