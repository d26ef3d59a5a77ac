package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.text.IndexArtifacts

/** Stream ≡ batch for the retrieval-index speed layer: micro-batched
  * documents emit `index_incremental`-shaped deltas, threshold-triggered
  * merges fold them into the served segment, and after N batches + the
  * final merge the served postings are ROW-FOR-ROW the segment a batch
  * rebuild over lake ∪ streamed would write — the same one-definition
  * guarantee StreamAttachSpec pins for the ANN lifecycle.
  */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tf(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        explode(expr(graft.text.TextQueries.tokenizeExpr)).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  private def keyRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[String]("term"), r.getAs[Long]("block")) ->
        ((r.getAs[Long]("df"), r.getAs[Long]("cf"), r.getAs[Long]("df_block"),
          r.getAs[Long]("cf_block"), r.getAs[String]("postings")))
    }.toMap

  test("streamed batches + merges reproduce the batch-built segment exactly") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val lake = docs.where(col("doc_id") % 5 =!= 0)
    val incoming = docs.where(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(incoming.length >= 6, "fixture too small to form 4 batches")
    // four batches sized a, a, a, rest with threshold 2a: batch 2 trips
    // merge 1 (pending ACCUMULATED across two triggers), batches 3+4
    // accumulate again and trip merge 2 against the ALREADY-merged
    // segment — both the delta-log path and the post-merge fold path
    // run, and the final batch always lands inside a merge (rest =
    // len - 3a ≥ 2a since a = ⌊len/5⌋)
    val a = math.max(1, incoming.length / 5)
    val batches = Seq(incoming.slice(0, a), incoming.slice(a, 2 * a),
      incoming.slice(2 * a, 3 * a), incoming.drop(3 * a))

    val lakeSeg = IndexArtifacts.encodeBlocks(tf(lake))
      .localCheckpoint(eager = true)

    val deltas = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[org.apache.spark.sql.Row])]
    val mergeSnaps = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(String, Long), (Long, Long, Long, Long, String)])]
    val source = MemoryStream[(Long, String)]
    val q = StreamIndex.index(
      source.toDF().toDF("doc_id", "text"), lakeSeg,
      maxPendingDocs = 2L * a)(
      sink = (d, id) => deltas += ((id, d.collect())),
      onMerge = (served, n) => mergeSnaps += ((n, keyRows(served))))
    try {
      batches.foreach { b =>
        source.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // every trigger emitted its delta; each delta is batch-vocab-bounded
    assert(deltas.size == batches.size)
    deltas.zip(batches).foreach { case ((_, rows), b) =>
      val batchDocs = b.map(_._1).toSet
      val wantVocab = b.flatMap { case (_, t) =>
        t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty) }.toSet
      assert(rows.map(_.getAs[String]("term")).toSet === wantVocab)
      rows.foreach { r =>
        val ids = r.getAs[String]("postings").split(" ")
          .map(_.split(":")(0).toLong).scanLeft(0L)(_ + _).tail
        assert(ids.length.toLong === r.getAs[Long]("df_batch"))
        ids.foreach(id => assert(batchDocs(id), s"foreign doc $id in delta"))
      }
    }

    // exactly 2 merges fired (post-merge arrivals folded into a merged
    // segment); neither single batch tripped the threshold alone
    assert(mergeSnaps.size == 2, s"merges=${mergeSnaps.size}")

    // the final served segment ≡ a batch rebuild over lake ∪ all streamed
    // docs up to the last merge boundary: with the thresholds above the
    // final merge lands exactly after the last batch, so the rebuild is
    // over the FULL corpus
    val streamedThroughLastMerge = batches.flatten
    val full = lake.unionByName(
      streamedThroughLastMerge.toSeq.toDF("doc_id", "text"))
    val want = keyRows(IndexArtifacts.encodeBlocks(tf(full)))
    val got = mergeSnaps.last._2
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(v === want(k), s"served row $k diverges from batch rebuild") }
  }

  test("CDC stream (adds + deletes): merge sweeps tombstones, served ≡ rebuild over survivors") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val lake = docs.where(col("doc_id") % 5 =!= 0)
    val incoming = docs.where(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(incoming.length >= 4)
    val (adds1, adds2) = incoming.splitAt(incoming.length / 2)
    // tombstones: two standing lake docs + one doc added in batch 1 —
    // the add-then-delete case must never land in the merged segment
    val lakeDel = lake.select("doc_id").as[Long].collect().sorted.take(2)
    val delIds = lakeDel :+ adds1.head._1

    val lakeSeg = IndexArtifacts.encodeBlocks(tf(lake))
      .localCheckpoint(eager = true)
    val mergeSnaps = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(String, Long), (Long, Long, Long, Long, String)])]
    val source = MemoryStream[(Long, String, String)]
    // threshold = everything streamed → exactly one merge, after batch 2
    val q = StreamIndex.indexCdc(
      source.toDF().toDF("doc_id", "text", "op"), lakeSeg,
      maxPendingDocs = (incoming.length + delIds.length).toLong)(
      sink = (_, _) => (),
      onMerge = (served, n) => mergeSnaps += ((n, keyRows(served))))
    try {
      source.addData(adds1.map { case (d, t) => (d, t, "add") }.toIndexedSeq: _*)
      q.processAllAvailable()
      source.addData((adds2.map { case (d, t) => (d, t, "add") } ++
        delIds.map(d => (d, "", "delete"))).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(mergeSnaps.size == 1, s"merges=${mergeSnaps.size}")
    val delSet = delIds.toSet
    val survivors = lake.unionByName(incoming.toSeq.toDF("doc_id", "text"))
      .where(!col("doc_id").isin(delSet.toSeq: _*))
    val want = keyRows(IndexArtifacts.encodeBlocks(tf(survivors)))
    val got = mergeSnaps.last._2
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(v === want(k), s"swept served row $k diverges from survivor rebuild") }
    // tombstoned docs are really gone: no decoded posting mentions them
    val decodedIds = IndexArtifacts.decodeBlocks(
        mergeSnaps.last._2.foldLeft(Seq.empty[(String, Long, Long, Long, Long, Long, String)]) {
          case (acc, ((t, b), (df, cf, dfb, cfb, p))) =>
            acc :+ ((t, b, df, cf, dfb, cfb, p))
        }.toDF("term", "block", "df", "cf", "df_block", "cf_block", "postings"))
      .select("doc_id").as[Long].collect().toSet
    delSet.foreach(d => assert(!decodedIds(d), s"tombstoned doc $d still served"))
  }

  test("CDC delete-then-re-add (update): the NEW version lands, the lake version sweeps") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val lake = docs.where(col("doc_id") % 5 =!= 0)
    // update target: a standing lake doc, re-added with CHANGED text; a
    // second pending doc is added twice (re-add replaces the first
    // pending version — last-writer-wins inside the window)
    val updId = lake.select("doc_id").as[Long].collect().min
    val newText = "updated body rewritten after erasure"
    val (freshId, freshOld) = docs.where(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().minBy(_._1)
    val freshNew = freshOld + " trailing revision token"

    val lakeSeg = IndexArtifacts.encodeBlocks(tf(lake))
      .localCheckpoint(eager = true)
    val mergeSnaps = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[(String, Long), (Long, Long, Long, Long, String)])]
    val source = MemoryStream[(Long, String, String)]
    val q = StreamIndex.indexCdc(
      source.toDF().toDF("doc_id", "text", "op"), lakeSeg,
      maxPendingDocs = 5L)(
      sink = (_, _) => (),
      onMerge = (served, n) => mergeSnaps += ((n, keyRows(served))))
    try {
      // batch 1: tombstone the lake doc, land the fresh doc's v1
      source.addData((updId, "", "delete"), (freshId, freshOld, "add"))
      q.processAllAvailable()
      // batch 2: tombstone the still-pending fresh doc
      source.addData((freshId, "", "delete"))
      q.processAllAvailable()
      // batch 3: re-add BOTH tombstoned docs with new text — trips the
      // merge (5 pending doc events); both new versions must land
      source.addData((freshId, freshNew, "add"), (updId, newText, "add"))
      q.processAllAvailable()
    } finally q.stop()

    assert(mergeSnaps.size == 1, s"merges=${mergeSnaps.size}")
    // rebuild oracle: lake with updId's text REPLACED, plus freshId's v2
    val want = keyRows(IndexArtifacts.encodeBlocks(tf(
      lake.where(col("doc_id") =!= updId)
        .unionByName(Seq((updId, newText), (freshId, freshNew))
          .toDF("doc_id", "text")))))
    val got = mergeSnaps.last._2
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(v === want(k), s"updated served row $k diverges from rebuild") }
  }
}
