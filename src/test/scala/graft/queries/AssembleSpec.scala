package graft.queries

import graft.SparkSpec

/** Offset arithmetic for the assembly operators: the loss mask must point
  * exactly at the assistant span, and PII spans must tile the injected
  * layout ("… contact <email> or <phone> end").
  */
class AssembleSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = Registry.queries(name)(spark, sfDir)

  test("sft_assemble: mask_start points into the rendered string, after the prompt") {
    val rows = run("sft_assemble").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mask = r.getAs[Long]("mask_start")
      val n = r.getAs[Long]("n_chars")
      // prefix = "<|user|>\n" (9) + prompt (<=200) + "\n<|assistant|>\n" (15)
      assert(mask >= 9L + 1L + 15L + 1L, s"mask too early: $mask")
      assert(mask <= 9L + 200L + 15L + 1L, s"mask too late: $mask")
      assert(mask < n, s"mask $mask beyond rendered length $n")
      assert(r.getAs[Long]("n_prompt_tok") > 0L)
      assert(r.getAs[Long]("n_resp_tok") > 0L)
    }
  }

  test("text_pii_spans: spans tile the injected layout exactly") {
    val rows = run("text_pii_spans").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (es, el) = (r.getAs[Long]("email_start"), r.getAs[Long]("email_len"))
      val (ps, pl) = (r.getAs[Long]("phone_start"), r.getAs[Long]("phone_len"))
      // 40-char prefix + " contact " (9 chars) then the email match
      assert(es == 50L, s"email_start $es")
      // email = user<id>@mail.example.com
      assert(el >= 4L + 1L + 17L, s"email_len $el")
      // " or " separates the two spans
      assert(ps == es + el + 4L, s"phone_start $ps != $es+$el+4")
      assert(pl == 11L, s"phone_len $pl")
    }
  }

  test("pretrain_span_corrupt: span count brackets by block math, ~15% corruption") {
    val rows = graft.queries.Registry.queries("pretrain_span_corrupt")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    var (tok, masked) = (0L, 0L)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val spans = r.getAs[Long]("n_spans")
      // every FULL 20-token block masks (offset ≤ 17 always fits); the
      // trailing partial block masks only when its hash offset fits
      assert(spans >= n / 20, s"doc ${r.getAs[Long]("doc_id")}: $spans < ${n / 20}")
      assert(spans <= (n + 19) / 20)
      tok += n; masked += 3 * spans
    }
    val pct = masked.toDouble / tok
    assert(pct > 0.12 && pct < 0.16, s"corruption rate $pct should be ~15%")
    // target of an unmasked doc renders '' — its md5 is the empty digest
    rows.filter(_.getAs[Long]("n_spans") == 0L).foreach { r =>
      assert(r.getAs[String]("target_md5") == "d41d8cd98f00b204e9800998ecf8427e")
    }
  }
}
