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

  val all: Seq[Q] = Seq(sftAssemble, textPiiSpans)
}
