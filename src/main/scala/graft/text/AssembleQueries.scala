package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.{Q, Tables}

/** Training-example assembly operators — the last mile before examples
  * leave the data engine:
  *
  *  - SFT chat-template rendering: pair prompt/response texts, render the
  *    template string, and emit the loss-mask offset (train only on the
  *    assistant span) plus per-role token counts;
  *  - span-level PII offsets: where redaction pipelines need character
  *    spans (for selective masking or labeling), not pre-scrubbed text.
  *
  * Both are per-row column math after at most one bounded window — the
  * response pairing uses a lead() window PARTITIONED by source (the
  * pack_sequences rule: shards rank independently, shard count scales
  * with the corpus).
  */
object AssembleQueries {

  private val tokenizeExpr = "word_ngrams(text, 1, false)"

  /** SFT assembly: prompt = this doc, response = the source's next doc
    * (stand-in for a real prompt/response join — what the engine
    * contributes is the RENDERING shape: template concat, role token
    * counts, and the mask offset where assistant tokens start, all
    * per-row codegen). Last doc per source has no response and is
    * dropped — the inner-join semantic of a real pair table.
    */
  private val sftAssemble = Q(
    "sft_assemble",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("prompt", substring(col("text"), 1, 200))
        .withColumn("response", lead(substring(col("text"), 1, 300), 1).over(w))
        .where(col("response").isNotNull)
        .withColumn("prefix",
          concat(lit("<|user|>\n"), col("prompt"), lit("\n<|assistant|>\n")))
        .withColumn("rendered",
          concat(col("prefix"), col("response"), lit("<|end|>")))
        .select(col("doc_id"), col("source"),
          expr(s"CAST(size(word_ngrams(prompt, 1, false)) AS BIGINT)")
            .as("n_prompt_tok"),
          expr(s"CAST(size(word_ngrams(response, 1, false)) AS BIGINT)")
            .as("n_resp_tok"),
          (length(col("prefix")) + 1).cast("long").as("mask_start"),
          length(col("rendered")).cast("long").as("n_chars"),
          md5(col("rendered")).as("rendered_md5"))
    },
    Some("""WITH paired AS (
              SELECT doc_id, source,
                substr(text, 1, 200) AS prompt,
                lead(substr(text, 1, 300), 1) OVER (PARTITION BY source
                  ORDER BY doc_id) AS response
              FROM documents),
            r AS (
              SELECT doc_id, source, prompt, response,
                '<|user|>' || chr(10) || prompt || chr(10) ||
                  '<|assistant|>' || chr(10) AS prefix
              FROM paired WHERE response IS NOT NULL)
            SELECT doc_id, source,
              CAST(len(list_filter(string_split_regex(lower(prompt), '[^a-z]+'),
                t -> t <> '')) AS BIGINT) AS n_prompt_tok,
              CAST(len(list_filter(string_split_regex(lower(response), '[^a-z]+'),
                t -> t <> '')) AS BIGINT) AS n_resp_tok,
              CAST(length(prefix) + 1 AS BIGINT) AS mask_start,
              CAST(length(prefix || response || '<|end|>') AS BIGINT) AS n_chars,
              md5(prefix || response || '<|end|>') AS rendered_md5
            FROM r"""))

  /** Span-level PII detection: the text_pii_scrub injection (an email +
    * a phone per row) reported as 1-based character offsets + lengths —
    * the output shape span-masking and PII-labeling pipelines consume.
    * Offsets come from `instr(dirty, regexp_extract(...))`: the injected
    * patterns occur exactly once per row, so first-occurrence position IS
    * the match position on both engines (DuckDB has no regexp_instr).
    */
  private val textPiiSpans = Q(
    "text_pii_spans",
    (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("dirty", concat(
          substring(col("text"), 1, 40),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" end")))
        .withColumn("email", regexp_extract(col("dirty"),
          "[a-z0-9]+@[a-z.]+[a-z]", 0))
        .withColumn("phone", regexp_extract(col("dirty"),
          "[+]1-555-[0-9]{4}", 0))
        .select(col("doc_id"),
          instr(col("dirty"), col("email")).cast("long").as("email_start"),
          length(col("email")).cast("long").as("email_len"),
          instr(col("dirty"), col("phone")).cast("long").as("phone_start"),
          length(col("phone")).cast("long").as("phone_len")),
    Some("""WITH d AS (
              SELECT doc_id,
                substr(text, 1, 40) || ' contact user' ||
                CAST(doc_id AS VARCHAR) || '@mail.example.com or +1-555-' ||
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end' AS dirty
              FROM documents),
            m AS (
              SELECT doc_id, dirty,
                regexp_extract(dirty, '[a-z0-9]+@[a-z.]+[a-z]', 0) AS email,
                regexp_extract(dirty, '[+]1-555-[0-9]{4}', 0) AS phone
              FROM d)
            SELECT doc_id,
              CAST(instr(dirty, email) AS BIGINT) AS email_start,
              CAST(length(email) AS BIGINT) AS email_len,
              CAST(instr(dirty, phone) AS BIGINT) AS phone_start,
              CAST(length(phone) AS BIGINT) AS phone_len
            FROM m"""))

  /** First two md5 hex digits as 0..255 (CurationQueries.md5Byte). */
  private def md5Byte(sqlExprStr: String): String =
    s"""(instr('0123456789abcdef', substr(md5($sqlExprStr), 1, 1)) - 1) * 16 +
        (instr('0123456789abcdef', substr(md5($sqlExprStr), 2, 1)) - 1)"""

  /** T5/UL2-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * denoising-objective assembly step: mask token spans, replace each
    * with a numbered sentinel in the input, emit the sentinel→span
    * sequence as the target. Deterministic-by-hash where T5 samples:
    * positions partition into fixed 20-token blocks, each block masks
    * the 3-token span at offset md5(doc_id:block) % 18 (skipped when the
    * span would overrun the document) — exactly 15% corruption, mean
    * span 3, non-overlapping by construction, reproducible across runs
    * and engines. The whole transform is per-row array-HOF math riding
    * the scan: no explode, no shuffle, shard-parallel at any corpus
    * size. Output carries md5 digests of the rendered input/target
    * (byte-sensitive, oracle-hashable) plus span accounting.
    */
  private val pretrainSpanCorrupt = Q(
    "pretrain_span_corrupt",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val hb = md5Byte(
        "concat(CAST(doc_id AS STRING), ':', CAST(b AS STRING))")
      Tables.documents(s, dir)
        .withColumn("t", expr(tokenizeExpr))
        .withColumn("n", expr("size(t)"))
        // n = 0 leaves one degenerate block whose span never fits and
        // whose slices are empty — same '' render as the oracle's empty
        // block list (sequence() cannot express an empty 0-based range)
        .withColumn("blocks", expr(
          "sequence(0, greatest((n + 19) div 20 - 1, 0))"))
        .withColumn("offs", expr(s"transform(blocks, b -> ($hb) % 18)"))
        .withColumn("mb", expr(
          "filter(blocks, b -> b * 20 + element_at(offs, CAST(b + 1 AS INT)) + 3 <= n)"))
        .withColumn("inp", expr(
          """array_join(flatten(transform(blocks, b ->
               CASE WHEN array_position(mb, b) > 0 THEN concat(
                 slice(t, b * 20 + 1, element_at(offs, CAST(b + 1 AS INT))),
                 array(concat('<extra_id_',
                   CAST(array_position(mb, b) - 1 AS STRING), '>')),
                 slice(t, b * 20 + element_at(offs, CAST(b + 1 AS INT)) + 4,
                   least(20, n - b * 20)
                     - element_at(offs, CAST(b + 1 AS INT)) - 3))
               ELSE slice(t, b * 20 + 1, least(20, n - b * 20)) END)), ' ')"""))
        .withColumn("tgt", expr(
          """array_join(flatten(transform(mb, b -> concat(
               array(concat('<extra_id_',
                 CAST(array_position(mb, b) - 1 AS STRING), '>')),
               slice(t, b * 20 + element_at(offs, CAST(b + 1 AS INT)) + 1, 3)))),
             ' ')"""))
        .select(col("doc_id"), col("n").cast("long").as("n_tokens"),
          expr("CAST(size(mb) AS BIGINT)").as("n_spans"),
          md5(col("inp")).as("input_md5"), md5(col("tgt")).as("target_md5"))
    },
    Some {
      val hb = md5Byte(
        "concat(CAST(doc_id AS VARCHAR), ':', CAST(b AS VARCHAR))")
      s"""WITH base AS (
            SELECT doc_id,
              list_filter(string_split_regex(lower(text), '[^a-z]+'),
                x -> x <> '') AS t
            FROM documents),
          sized AS (
            SELECT doc_id, t, len(t) AS n,
              range((len(t) + 19) // 20) AS blocks
            FROM base),
          offd AS (
            SELECT doc_id, t, n, blocks,
              list_transform(blocks, b -> ($hb) % 18) AS offs
            FROM sized),
          masked AS (
            SELECT doc_id, t, n, blocks, offs,
              list_filter(blocks,
                b -> b * 20 + offs[CAST(b + 1 AS INT)] + 3 <= n) AS mb
            FROM offd)
          SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
            CAST(len(mb) AS BIGINT) AS n_spans,
            md5(coalesce(array_to_string(flatten(list_transform(blocks, b ->
              CASE WHEN coalesce(list_position(mb, b), 0) > 0 THEN
                list_concat(list_concat(
                  t[b * 20 + 1 : b * 20 + offs[CAST(b + 1 AS INT)]],
                  ['<extra_id_' ||
                     CAST(list_position(mb, b) - 1 AS VARCHAR) || '>']),
                  t[b * 20 + offs[CAST(b + 1 AS INT)] + 4
                    : b * 20 + least(20, n - b * 20)])
              ELSE t[b * 20 + 1 : b * 20 + least(20, n - b * 20)]
              END)), ' '), '')) AS input_md5,
            md5(coalesce(array_to_string(flatten(list_transform(mb, b ->
              list_concat(
                ['<extra_id_' ||
                   CAST(list_position(mb, b) - 1 AS VARCHAR) || '>'],
                t[b * 20 + offs[CAST(b + 1 AS INT)] + 1
                  : b * 20 + offs[CAST(b + 1 AS INT)] + 3]))), ' '), ''))
              AS target_md5
          FROM masked"""
    })

  val all: Seq[Q] = Seq(sftAssemble, textPiiSpans, pretrainSpanCorrupt)
}
