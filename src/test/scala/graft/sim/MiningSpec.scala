package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Semantic invariants for the mining queries — checks the DuckDB oracle
  * can't express: margin internals consistency for mine_bitext, and an
  * independent recount of the novelty numerator/denominator.
  */
class MiningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("mine_bitext: one best mate per en doc, mates are de docs, accepted = margin > 1") {
    val out = graft.SparkEntry.queries("mine_bitext")(spark, dir).cache()
    val docs = Tables.documents(spark, dir)
    val en = docs.where(col("lang") === "en").select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val de = docs.where(col("lang") === "de").select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet

    val rows = out.collect()
    assert(rows.length == en.size, s"one row per en doc: ${rows.length} vs ${en.size}")
    assert(rows.map(_.getLong(0)).toSet == en, "src_id set must be exactly the en docs")
    assert(rows.forall(r => de.contains(r.getLong(1))), "every mate must be a de doc")
    rows.foreach { r =>
      val (margin, accepted) = (r.getDouble(3), r.getBoolean(4))
      assert(accepted == (margin > 1.0d) || math.abs(margin - 1.0) < 1e-6,
        s"accepted flag must equal margin > 1 (margin=$margin accepted=$accepted)")
    }
    // the normalization must be data-dependent (per-pair denominators),
    // not a constant rescale of cosine
    val margins = rows.map(_.getDouble(3)).distinct
    assert(margins.length > en.size / 2, "margins should vary per pair")
  }

  test("select_mmr: greedy picks diversify away from the naive relevance top-k") {
    graft.functions.GraftFunctions.register(spark)
    val out = graft.SparkEntry.queries("select_mmr")(spark, dir)
      .orderBy(col("rk")).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L), "ranks must be 1..5")
    val picks = out.map(_.getLong(1)).toSeq
    assert(picks.distinct.size == 5, "a document may be selected once")
    // rank 1 is the pure-relevance argmax (empty selected set → no penalty)
    val relTop = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(
        """CASE WHEN size(word_ngrams(text, 1, false)) = 0 THEN CAST(0 AS BIGINT)
           ELSE (CAST(1000000 AS BIGINT)
                 * CAST(size(array_distinct(word_ngrams(text, 1, false))) AS BIGINT))
                div CAST(size(word_ngrams(text, 1, false)) AS BIGINT) END""")
        .as("r"))
      .orderBy(col("r").desc, col("doc_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(picks.head == relTop.head, "first MMR pick must be the relevance argmax")
    // the diversity penalty must move at least one later pick off the
    // naive top-5 (measured on this corpus: two picks move)
    assert(picks.toSet != relTop.toSet,
      "MMR selected exactly the naive top-k — the penalty did nothing")
  }

  test("quality_ensemble: z-scores center on zero and the flag follows the score") {
    val out = graft.SparkEntry.queries("quality_ensemble")(spark, dir).cache()
    val n = out.count().toDouble
    // population z-scores sum to ~0 by construction (rounding to 4 places
    // leaves at most 5e-5 per row of drift)
    Seq("z_len", "z_lex", "z_alpha").foreach { c =>
      val mean = out.agg(sum(col(c))).collect()(0).getDouble(0) / n
      assert(math.abs(mean) < 1e-3, s"$c mean drifted from 0: $mean")
    }
    out.collect().foreach { r =>
      val (score, keep) = (r.getDouble(7), r.getBoolean(8))
      assert(keep == (score > -0.5), "keep flag must equal score > -0.5")
    }
  }

  test("mine_hard_negatives: brute-force cross-check, label disjointness, flag semantics") {
    graft.functions.GraftFunctions.register(spark)
    val out = graft.SparkEntry.queries("mine_hard_negatives")(spark, dir).cache()
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val labels = emb.map(e => e._1 -> e._2).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qId, qLabel, vecId) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(labels(qId).toLong == qLabel, "q_label must be the query's own label")
      assert(labels(vecId).toLong != qLabel, "a hard negative must have a different label")
      assert(r.getLong(4) >= 1 && r.getLong(4) <= 5, "rk in 1..5")
    }
    // brute-force the top-5 different-label list for every query
    val qs = emb.filter(_._1 < 8)
    qs.foreach { case (qId, qLabel, qEmb) =>
      val qn = math.sqrt(dot(qEmb, qEmb))
      val expect = emb.filter(e => e._1 != qId && e._2 != qLabel)
        .map(e => (e._1, dot(e._3, qEmb) / (math.sqrt(dot(e._3, e._3)) * qn)))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val got = rows.filter(_.getLong(0) == qId).sortBy(_.getLong(4)).map(_.getLong(2)).toSeq
      assert(got == expect, s"q=$qId hard-negative list mismatch: $got vs $expect")
    }
    // outranks_pos == cos > best same-label cosine (recomputed independently)
    qs.foreach { case (qId, qLabel, qEmb) =>
      val qn = math.sqrt(dot(qEmb, qEmb))
      val posBest = emb.filter(e => e._1 != qId && e._2 == qLabel)
        .map(e => dot(e._3, qEmb) / (math.sqrt(dot(e._3, e._3)) * qn)).max
      rows.filter(_.getLong(0) == qId).foreach { r =>
        val neg = emb.find(_._1 == r.getLong(2)).get
        val c = dot(neg._3, qEmb) / (math.sqrt(dot(neg._3, neg._3)) * qn)
        assert(r.getBoolean(6) == (c > posBest),
          s"outranks_pos wrong for q=$qId neg=${r.getLong(2)}")
      }
    }
  }

  test("text_novelty: bounds hold and totals match an independent gram recount") {
    graft.functions.GraftFunctions.register(spark)
    val out = graft.SparkEntry.queries("text_novelty")(spark, dir).cache()
    out.collect().foreach { r =>
      val (n, novel, nov) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel <= n, "novel grams cannot exceed total grams")
      assert(nov >= 0.0 && nov <= 1.0, s"novelty must be in [0,1], got $nov")
    }
    // independent recount straight from the shingler
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(expr("word_ngrams(text, 5, true)")).as("g"))
    val totalInstances = grams.count()
    val uniqueToOneDoc = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("df")).where(col("df") === 1).count()
    val sums = out.agg(sum(col("n_grams")), sum(col("novel"))).collect()(0)
    assert(sums.getLong(0) == totalInstances,
      s"sum(n_grams)=${sums.getLong(0)} must equal gram instances $totalInstances")
    assert(sums.getLong(1) == uniqueToOneDoc,
      s"sum(novel)=${sums.getLong(1)} must equal df=1 gram count $uniqueToOneDoc")
  }

  test("eval_ndcg: bounds, one row per query, dcg capped by the full discount mass") {
    val rows = graft.queries.Registry.queries("eval_ndcg")(spark, dir).collect()
    assert(rows.length == 8, "one row per query vector")
    assert(rows.map(_.getAs[Long]("q_id")).toSet == (0L to 7L).toSet)
    // C_10 = Σ round(1e6 / log2(p+1)) — the same table the query embeds
    val c10 = (1 to 10)
      .map(p => math.round(1e6 / (math.log(p + 1.0) / math.log(2.0)))).sum
    rows.foreach { r =>
      val (nRel, dcg, ndcg) = (r.getAs[Long]("n_rel"),
        r.getAs[Long]("dcg_micro"), r.getAs[Long]("ndcg_ppm"))
      assert(nRel > 0L, "every label class has other members in this corpus")
      assert(dcg >= 0L && dcg <= c10)
      assert(ndcg >= 0L && ndcg <= 1000000L,
        s"NDCG must be a proper ratio, got $ndcg")
    }
  }
}
