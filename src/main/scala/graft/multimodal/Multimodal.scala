package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** One media object: opaque binary payload + typed metadata — the schema
  * shape for image/audio/video columns at 100 TB (payload stays a parquet
  * binary column, metadata is columnar and prunable, decode runs
  * partition-parallel next to the data).
  */
final case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    width: Int,
    height: Int,
    format: String)

final case class MediaFeatures(
    doc_id: Long,
    payload_len: Long,
    width: Int,
    height: Int,
    brightness_raw: Double,
    thumb: String)

final case class MediaResized(
    doc_id: Long,
    new_w: Long,
    new_h: Long,
    resized_len: Long,
    resized_hex: String)

/** Multimodal-column plumbing. The image/audio decode libraries are not in
  * this container, so the DECODE step is a deterministic stand-in (declared
  * stub): it derives "pixels" from the payload bytes themselves. Everything
  * around it — binary columns, typed metadata, per-partition batched decode,
  * feature schema — is the real production shape; swapping in a JPEG decoder
  * changes only the body of [[decodePartition]].
  */
object Multimodal {

  /** Synthesize a binary payload column for the corpus: 16 deterministic
    * bytes (md5 of the text) standing in for encoded image data, plus typed
    * metadata derived from document fields.
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      (lit(64) + (col("doc_id") % 64)).cast("int").as("width"),
      (lit(64) + (col("n_chars") % 64)).cast("int").as("height"),
      lit("fake").as("format"))

  /** STUB decode (real impl would JPEG/PNG-decode `payload` here). The
    * surrounding iterator shape is the contract: one partition in, lazily
    * one feature row per record out, no materialization of the whole
    * partition in memory.
    */
  def decodePartition(it: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    it.map { r =>
      val bytes = r.payload.map(_ & 0xFF)
      MediaFeatures(
        doc_id = r.doc_id,
        payload_len = r.payload.length.toLong,
        width = r.width,
        height = r.height,
        // "brightness": mean byte value — stands in for decoded-pixel stats
        brightness_raw = bytes.sum.toDouble / bytes.length,
        // "thumbnail": first 4 bytes, hex — stands in for a resized frame
        thumb = r.payload.take(4).map("%02X".format(_)).mkString)
    }

  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(decodePartition)
  }

  /** STUB resize (real impl would decode, bilinear-downsample, re-encode).
    * The stand-in keeps every contract a real resizer has: dimensions
    * halve with ceiling rounding, the payload shrinks by the same factor
    * (here: stride-2 byte sampling), and the transform runs lazily per
    * partition next to the data — one record in, one smaller record out.
    */
  def resizePartition(it: Iterator[MediaRecord]): Iterator[MediaResized] =
    it.map { r =>
      val sampled = r.payload.indices.collect {
        case i if i % 2 == 0 => r.payload(i)
      }.toArray
      MediaResized(
        doc_id = r.doc_id,
        new_w = (r.width + 1) / 2,
        new_h = (r.height + 1) / 2,
        resized_len = sampled.length.toLong,
        resized_hex = sampled.map(b => "%02X".format(b & 0xFF)).mkString)
    }

  def resizedFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    attachPayload(Tables.documents(spark, dir))
      .as[MediaRecord].mapPartitions(resizePartition).toDF()
  }

  def featureFrame(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, attachPayload(Tables.documents(spark, dir)))
      .toDF()
      .select(col("doc_id"), col("payload_len"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("brightness_raw"), 4).as("brightness"),
        col("thumb"))
}

object MultimodalQueries {
  // Oracle reproduces the byte math from the md5 hex string: byte i =
  // 16*hexval(2i-1) + hexval(2i); brightness = mean of the 16 bytes.
  private val multimodalDecode = Q(
    "multimodal_decode",
    (s, dir) => Multimodal.featureFrame(s, dir),
    Some("""SELECT doc_id, CAST(16 AS BIGINT) AS payload_len,
            CAST(64 + doc_id % 64 AS BIGINT) AS width,
            CAST(64 + n_chars % 64 AS BIGINT) AS height,
            round(list_sum(list_transform(range(1, 17),
              i -> (instr('0123456789abcdef', substr(h, 2*i - 1, 1)) - 1) * 16
                 + (instr('0123456789abcdef', substr(h, 2*i, 1)) - 1))) / 16.0, 4)
              AS brightness,
            upper(substr(h, 1, 8)) AS thumb
            FROM (SELECT doc_id, n_chars, md5(text) AS h FROM documents)"""))

  /** Frame sampling over the "video" payload: the 16-byte payload splits
    * into 4 frames of 4 bytes (stride = frame size, no overlap); each row
    * out is (doc_id, frame_no, luma, sig) — the one-row-in, k-frames-out
    * explode shape a real video sampler has. Mean-byte "luma" stands in
    * for decoded-pixel stats, hex window for the frame signature; a real
    * decoder changes only the per-frame math, not the plumbing.
    */
  private val multimodalFrames = Q(
    "multimodal_frames",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val media = Multimodal.attachPayload(Tables.documents(s, dir))
        .select(col("doc_id"), lower(hex(col("payload"))).as("h"))
      val hexVal = (c: String) => s"(instr('0123456789abcdef', $c) - 1)"
      media
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, 3), f -> struct(CAST(f AS BIGINT) AS frame_no, substring(h, f * 8 + 1, 8) AS fh))"))
          .as("fr"))
        .select(col("doc_id"), col("fr.frame_no").as("frame_no"),
          // luma_x4 = 4 * mean byte value, kept as the exact integer sum so
          // the cross-engine hash compares BIGINTs, not float formatting.
          expr(
            s"""aggregate(transform(sequence(1, 4),
                  i -> ${hexVal("substr(fr.fh, 2*i - 1, 1)")} * 16
                     + ${hexVal("substr(fr.fh, 2*i, 1)")}),
                0L, (acc, v) -> acc + v)""").as("luma_x4"),
          upper(col("fr.fh")).as("sig"))
    },
    Some("""SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
            CAST(list_sum(list_transform(range(1, 5),
              i -> (instr('0123456789abcdef', substr(fh, 2*i - 1, 1)) - 1) * 16
                 + (instr('0123456789abcdef', substr(fh, 2*i, 1)) - 1))) AS BIGINT)
              AS luma_x4,
            upper(fh) AS sig
            FROM (SELECT doc_id, f, substr(h, f * 8 + 1, 8) AS fh
                  FROM (SELECT doc_id, md5(text) AS h FROM documents),
                       (SELECT unnest(range(0, 4)) AS f))"""))

  /** Resize plumbing: halve dimensions (ceiling), stride-2 byte sampling
    * as the stand-in downsample. Oracle reproduces the even-index byte
    * selection from the md5 hex string — byte i (0-based) occupies hex
    * chars 2i+1..2i+2, so the 8 kept bytes are the chars at 4j+1..4j+2.
    */
  private val multimodalResize = Q(
    "multimodal_resize",
    (s, dir) => Multimodal.resizedFrame(s, dir),
    Some("""SELECT doc_id,
            CAST((64 + doc_id % 64 + 1) // 2 AS BIGINT) AS new_w,
            CAST((64 + n_chars % 64 + 1) // 2 AS BIGINT) AS new_h,
            CAST(8 AS BIGINT) AS resized_len,
            upper(substr(h, 1, 2) || substr(h, 5, 2) || substr(h, 9, 2) ||
                  substr(h, 13, 2) || substr(h, 17, 2) || substr(h, 21, 2) ||
                  substr(h, 25, 2) || substr(h, 29, 2)) AS resized_hex
            FROM (SELECT doc_id, n_chars, md5(text) AS h FROM documents)"""))

  /** Perceptual-hash image near-dup — the multimodal dedup step: aHash
    * over the decoded samples (bit i set iff sample i is strictly above
    * the image mean, as the integer comparison 32·bᵢ > Σb), then
    * HAMMING-LSH banding for candidates: the 32-bit hash splits into 4
    * bands of 8 bits and only images sharing a band bucket pair up —
    * two hashes within Hamming distance 3 agree on ≥1 band by
    * pigeonhole, so the band join finds every near-dup without an
    * all-pairs compare. The verify is bit_count(xor) on the candidate
    * list. A real decoder changes only the sample derivation; the
    * hash/band/verify plumbing is the production shape (the same
    * generate-then-verify discipline as the MinHash text path).
    *
    * Scale: hashes are one BIGINT per image; the band join shuffles
    * (band_no, band_val) pairs — 4 small ints per image. Band WIDTH is
    * the density dial: 8-bit bands give 256 buckets (candidates ≈
    * n²/256 per band on adversarially random hashes — a 4-bit first cut
    * measured 23% of ALL pairs as candidates, the quadratic-blocks trap);
    * at 100 TB you widen to a 64-bit hash with 16-bit bands (65k
    * buckets) — more bands·buckets, same pigeonhole bound, linear pair
    * density on real clustered images. All arithmetic integer.
    */
  /** (a, b, hamming) over the perceptual-hash band-bucketed candidate
    * pairs — the reusable generator [[multimodalPhash]] reports and the
    * cross-modal cluster composition consumes. */
  private[graft] def phashPairs(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val hv = (c: String) => s"(instr('0123456789abcdef', $c) - 1)"
    val ph = Multimodal.attachPayload(docs)
      .select(col("doc_id"), lower(hex(col("payload"))).as("h"))
      // 32 half-byte samples — the 8x4 "pixel grid" of the stub decode
      .withColumn("b", expr(
        s"transform(sequence(1, 32), i -> ${hv("substr(h, i, 1)")})"))
      .withColumn("s", expr("aggregate(b, 0, (acc, v) -> acc + v)"))
      .select(col("doc_id"), expr(
        """CAST(aggregate(transform(sequence(1, 32),
             i -> IF(32 * element_at(b, i) > s, shiftleft(CAST(1 AS BIGINT), 32 - i), CAST(0 AS BIGINT))),
           CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)""").as("ph"))
      .localCheckpoint(eager = true) // feeds the band explode AND both verify sides
    val bands = ph.select(col("doc_id"), col("ph"), explode(expr(
      "transform(sequence(0, 3), j -> named_struct('band_no', j, 'band_val', (ph div shiftleft(CAST(1 AS BIGINT), 8 * j)) % 256))"))
      .as("x"))
      .select(col("doc_id"), col("ph"), col("x.band_no").as("band_no"),
        col("x.band_val").as("band_val"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.ph").as("pa"), col("y.ph").as("pb"))
      .distinct()
    cand.select(col("a"), col("b"),
      expr("CAST(bit_count(pa ^ pb) AS BIGINT)").as("hamming"))
  }

  private val multimodalPhash = Q(
    "multimodal_phash",
    (s, dir) =>
      phashPairs(Tables.documents(s, dir))
        .withColumn("is_dup", col("hamming") <= 3L),
    Some(s"""WITH $phashOracleCte
            SELECT a, b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming,
                   bit_count(xor(pa, pb)) <= 3 AS is_dup
            FROM pcand"""))

  /** CTE chain ending in `pcand(a, b, pa, pb)` — the perceptual-hash
    * candidate pairs; splice after `WITH`. Names are p-prefixed so they
    * compose with DedupQueries.candPairsOracleCte in one statement. */
  private[graft] def phashOracleCte: String =
    """ph AS (
         SELECT doc_id,
           CAST(list_sum(list_transform(range(1, 33),
             i -> CASE WHEN 32 * b[i] > s
                  THEN (CAST(1 AS BIGINT) << (32 - i)) ELSE 0 END))
             AS BIGINT) AS ph
         FROM (SELECT doc_id, b, list_sum(b) AS s
               FROM (SELECT doc_id, list_transform(range(1, 33),
                       i -> instr('0123456789abcdef', substr(h, i, 1)) - 1) AS b
                     FROM (SELECT doc_id, md5(text) AS h FROM documents)))),
       pbands AS (
         SELECT doc_id, ph, j.j AS band_no,
           (ph // (CAST(1 AS BIGINT) << (8 * j.j))) % 256 AS band_val
         FROM ph, (SELECT unnest(range(0, 4)) AS j) j),
       pcand AS (
         SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.ph AS pa, y.ph AS pb
         FROM pbands x JOIN pbands y
           ON x.band_no = y.band_no AND x.band_val = y.band_val
          AND x.doc_id < y.doc_id)"""

  /** Cross-modal near-dup clustering — the composition a multimodal
    * pipeline actually runs: TEXT candidates (MinHash-LSH bands) and
    * IMAGE candidates (perceptual-hash Hamming bands, verified ≤ 3 bits)
    * union into ONE edge set, and connected components assigns each
    * document a cluster spanning both modalities (a re-encoded image
    * with paraphrased alt text still lands in the same cluster through
    * either edge type). Scale: both generators are the banded
    * never-all-pairs shapes proven above; the union is pair-list-sized;
    * the CC is the star-iteration engine with its driver-finish tail.
    */
  private val dedupMultimodalClusters = Q(
    "dedup_multimodal_clusters",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      // spanning band edges, not the pairwise list: connectivity-equal
      // for the CC below, linear in a hot band instead of quadratic
      val textPairs = graft.dedup.CandidateArtifacts.clusterEdges(s, dir)
        .select(col("a"), col("b"))
      val imgPairs = phashPairs(docs)
        .where(col("hamming") <= 3L).select(col("a"), col("b"))
      val edges = textPairs.union(imgPairs).distinct()
      val cc = graft.identity.Components.connectedComponents(edges,
        inputDistinct = true)
      docs.select(col("doc_id"))
        .join(cc, col("doc_id") === col("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster"))
    },
    Some(s"""WITH RECURSIVE ${graft.dedup.DedupQueries.candPairsOracleCte},
             $phashOracleCte,
             pairs AS (
               SELECT a AS u, b AS v FROM cand
               UNION
               SELECT a, b FROM pcand WHERE bit_count(xor(pa, pb)) <= 3),
             und AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
             nodes AS (SELECT DISTINCT u AS node FROM und),
             reach(node, r) AS (
               SELECT node, node FROM nodes
               UNION
               SELECT reach.node, und.v FROM reach JOIN und ON reach.r = und.u),
             comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
             clusters AS (
               SELECT d.doc_id,
                 CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster
               FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
             SELECT doc_id, cluster FROM clusters"""))

  /** Audio-side multimodal plumbing: VAD-style windowed energy over the
    * payload byte stream — the frame-sampling shape for AUDIO (the
    * preprocessing every speech pipeline runs before transcription or
    * segment selection). The 16 payload bytes stand in for PCM samples
    * (the decode stub contract — a real codec changes only the sample
    * derivation); windows of 4 samples at stride 2 give 7 windows per
    * record, each scored by its exact integer energy Σb², and a window
    * is "active" when its energy exceeds the record mean
    * (7·e_w > Σe — pure integer cross-multiplication, no floats).
    * Scale: per-row array math riding the scan; the window explode is a
    * 7× generate with no shuffle anywhere.
    */
  // ---- shared windowed-energy derivation (audio-energy + VAD segments) ----
  // One definition of the window scheme (7 windows of 4 samples, stride 2)
  // and the activity threshold (e·7 > Σe) on BOTH engines, so the
  // segmentation query is structurally derived from the same activity
  // flags the energy query reports (ConcentrationVadSpec cross-checks
  // them row-for-row).

  private def hexVal(c: String) = s"(instr('0123456789abcdef', $c) - 1)"
  private def byteAt(j: String) =
    s"(${hexVal(s"substr(h, 2 * ($j) - 1, 1)")} * 16 + ${hexVal(s"substr(h, 2 * ($j), 1)")})"

  /** Spark frame (doc_id, energies ARRAY<BIGINT>[7], tot) over the
    * hex-encoded payload. */
  private def energyFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    Multimodal.attachPayload(Tables.documents(s, dir))
      .select(col("doc_id"), lower(hex(col("payload"))).as("h"))
      .withColumn("energies", expr(
        s"""transform(sequence(0, 6), w ->
              aggregate(transform(sequence(1, 4),
                i -> CAST(${byteAt("w * 2 + i")} AS BIGINT)
                   * CAST(${byteAt("w * 2 + i")} AS BIGINT)),
              0L, (acc, v) -> acc + v))"""))
      .withColumn("tot", expr("aggregate(energies, 0L, (a, v) -> a + v)"))
  }

  /** Oracle CTE chain ending in `t(doc_id, energies, tot)`. */
  private val energyOracleCte: String =
    s"""m AS (SELECT doc_id, md5(text) AS h FROM documents),
       e AS (
         SELECT doc_id,
           list_transform(range(0, 7), w ->
             CAST(list_sum(list_transform(range(1, 5),
               i -> CAST(${byteAt("w * 2 + i")} AS BIGINT)
                  * CAST(${byteAt("w * 2 + i")} AS BIGINT)))
               AS BIGINT)) AS energies
         FROM m),
       t AS (
         SELECT doc_id, energies,
           CAST(list_sum(energies) AS BIGINT) AS tot
         FROM e)"""

  private val multimodalAudioEnergy = Q(
    "multimodal_audio_energy",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      energyFrame(s, dir)
        .select(col("doc_id"), col("tot"),
          posexplode(col("energies")).as(Seq("win", "energy")))
        .select(col("doc_id"), col("win").cast("long").as("win"),
          expr("CAST(win * 2 AS BIGINT)").as("start_sample"),
          col("energy"), (col("energy") * 7L > col("tot")).as("active"))
    },
    Some(s"""WITH $energyOracleCte
           SELECT doc_id, CAST(w AS BIGINT) AS win,
             CAST(w * 2 AS BIGINT) AS start_sample,
             energies[CAST(w + 1 AS INT)] AS energy,
             energies[CAST(w + 1 AS INT)] * 7 > tot AS active
           FROM t, (SELECT unnest(range(0, 7)) AS w)"""))

  /** Scene-cut detection over the sampled frames — the shot-boundary
    * step video curation runs before captioning/sampling (a cut = the
    * inter-frame luma delta exceeding a threshold). Unlike the
    * explode-then-lag-window formulation, the whole frame sequence lives
    * in ONE row's array math: luma per frame, adjacent deltas, cut count,
    * a cut bitmask, and the max delta — per-row codegen riding the scan,
    * nothing shuffles, no per-doc window sort. A real decoder changes the
    * per-frame luma source, not this shape.
    */
  private val multimodalScenecut = Q(
    "multimodal_scenecut",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val hexVal = (c: String) => s"(instr('0123456789abcdef', $c) - 1)"
      Multimodal.attachPayload(Tables.documents(s, dir))
        .select(col("doc_id"), lower(hex(col("payload"))).as("h"))
        .withColumn("lum", expr(
          s"""transform(sequence(0, 3), f -> aggregate(transform(sequence(1, 4),
                i -> ${hexVal("substr(substring(h, f * 8 + 1, 8), 2*i - 1, 1)")} * 16
                   + ${hexVal("substr(substring(h, f * 8 + 1, 8), 2*i, 1)")}),
              0L, (acc, v) -> acc + v))"""))
        .withColumn("deltas", expr(
          "transform(sequence(1, 3), f -> abs(element_at(lum, f + 1) - element_at(lum, f)))"))
        .select(col("doc_id"),
          element_at(col("lum"), 1).as("luma0_x4"),
          expr("CAST(size(filter(deltas, d -> d > 256)) AS BIGINT)").as("n_cuts"),
          expr("""aggregate(sequence(1, 3), CAST(0 AS BIGINT),
                    (acc, f) -> acc + IF(element_at(deltas, CAST(f AS INT)) > 256,
                      shiftleft(CAST(1 AS BIGINT), CAST(f AS INT)), CAST(0 AS BIGINT)))""")
            .as("cut_mask"),
          expr("CAST(array_max(deltas) AS BIGINT)").as("max_delta"))
    },
    Some("""WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
            l AS (
              SELECT doc_id,
                list_transform(range(0, 4), f -> CAST(list_sum(
                  list_transform(range(1, 5),
                    i -> (instr('0123456789abcdef',
                            substr(substr(h, f * 8 + 1, 8), CAST(2*i - 1 AS INTEGER), 1)) - 1) * 16
                       + (instr('0123456789abcdef',
                            substr(substr(h, f * 8 + 1, 8), CAST(2*i AS INTEGER), 1)) - 1)))
                  AS BIGINT)) AS lum
              FROM m),
            d AS (
              SELECT doc_id, lum[1] AS luma0_x4,
                list_transform(range(1, 4),
                  f -> abs(lum[CAST(f + 1 AS INTEGER)] - lum[CAST(f AS INTEGER)]))
                  AS deltas
              FROM l)
            SELECT doc_id, luma0_x4,
              CAST(len(list_filter(deltas, x -> x > 256)) AS BIGINT) AS n_cuts,
              CAST(list_sum(list_transform(range(1, 4),
                f -> CASE WHEN deltas[CAST(f AS INTEGER)] > 256
                     THEN 1 << f ELSE 0 END)) AS BIGINT) AS cut_mask,
              CAST(list_max(deltas) AS BIGINT) AS max_delta
            FROM d"""))

  /** VAD segmentation — the step after windowed energy: merge consecutive
    * active windows into speech SEGMENTS (what actually feeds a
    * transcriber), reporting per record the segment count, the longest
    * run, and total active windows. The whole run-length analysis is an
    * in-core `aggregate` fold over the 7-window activity array — one row
    * in, one row out, nothing shuffles (the oracle mirrors it as the
    * gaps-and-islands window formulation over the exploded windows; both
    * are exact, which doubles as a cross-formulation check of the
    * islands idiom itself).
    */
  private val multimodalVadSegments = Q(
    "multimodal_vad_segments",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      energyFrame(s, dir)
        .withColumn("act", expr("transform(energies, e -> e * 7 > tot)"))
        .select(col("doc_id"),
          expr("CAST(size(filter(act, a -> a)) AS BIGINT)").as("n_active"),
          expr("""CAST(size(filter(sequence(1, 7), i ->
                    element_at(act, i) AND
                    (i = 1 OR NOT element_at(act, i - 1)))) AS BIGINT)""")
            .as("n_segments"),
          expr("""aggregate(act, named_struct('cur', CAST(0 AS BIGINT),
                                              'best', CAST(0 AS BIGINT)),
                    (acc, a) -> IF(a,
                      named_struct('cur', acc.cur + 1,
                        'best', greatest(acc.best, acc.cur + 1)),
                      named_struct('cur', CAST(0 AS BIGINT), 'best', acc.best)),
                    acc -> acc.best)""").as("longest_segment"))
    },
    Some {
      s"""WITH $energyOracleCte,
           wins AS (
             SELECT doc_id, w,
               energies[CAST(w + 1 AS INT)] * 7 > tot AS active
             FROM t, (SELECT unnest(range(0, 7)) AS w)),
           act AS (SELECT doc_id, w FROM wins WHERE active),
           isl AS (
             SELECT doc_id,
               w - row_number() OVER (PARTITION BY doc_id ORDER BY w) AS grp
             FROM act),
           seg AS (
             SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS len
             FROM isl GROUP BY doc_id, grp),
           roll AS (
             SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_active,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(max(len) AS BIGINT) AS longest_segment
             FROM seg GROUP BY doc_id)
           SELECT t.doc_id,
             coalesce(r.n_active, 0) AS n_active,
             coalesce(r.n_segments, 0) AS n_segments,
             coalesce(r.longest_segment, 0) AS longest_segment
           FROM t LEFT JOIN roll r ON r.doc_id = t.doc_id"""
    })

  val all: Seq[Q] = Seq(multimodalDecode, multimodalFrames, multimodalResize,
    multimodalPhash, dedupMultimodalClusters, multimodalAudioEnergy,
    multimodalScenecut, multimodalVadSegments)
}
