package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the 12 MinHash values of a
  * document in ONE pass over its text.
  *
  * The composable-SQL formulation (`transform(shingles, s -> md5(s))` then
  * 12 `array_min(transform(...))`) materializes a |text|-element string
  * array plus 12 intermediate long arrays per row, and higher-order
  * lambdas run interpreted. Here the 5-char shingle window slides over the
  * string directly, each md5 feeds all 12 universal-hash minima held in a
  * stack array, and whole-stage codegen emits a single static call — no
  * per-row allocation beyond the result.
  *
  * Output is bit-identical to the SQL formulation (and so to the DuckDB
  * oracle): md5 hex is the same digest, "first 7 hex digits as an integer"
  * equals taking the top 28 bits of the digest, and the (a*x + b) % p
  * family is exact 64-bit math (max product ~5e16 < 2^63).
  *
  * Mirrors the reference's md5-fingerprint habit
  * (/root/reference/src/KissmetricsToDatabase.php:293,479-486) scaled to
  * set similarity.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSignature.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  val NumHashes = 12
  val BandSize  = 3 // -> 4 LSH bands
  val P         = 2038074743L // prime < 2^31
  // fixed odd multipliers/offsets for the universal-hash family
  val A: Array[Long] = Array(1299709L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L, 141650939L, 160481183L,
    179424673L, 198491317L)
  val B: Array[Long] = Array(977L, 1979L, 2971L, 3967L, 4969L, 5953L, 6959L,
    7951L, 8963L, 9973L, 10979L, 11981L)

  private val digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry point for generated code. One pass: slide the 5-char
    * window, md5 each shingle, fold all 12 minima.
    *
    * Windows are CODE POINTS, not UTF-16 units — SQL substring/length (and
    * the DuckDB oracle) count code points, so a supplementary-plane char
    * (emoji, rare CJK) must occupy one window slot even though it is two
    * Java chars. Strings without surrogate pairs (the overwhelming common
    * case) take the allocation-free char-indexed path.
    */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val md = digest.get()
    val cp = s.codePointCount(0, s.length)
    if (cp < 5) update(mins, md, s)
    else if (cp == s.length) {
      // BMP-only: code-point index == char index
      var i = 0
      val last = s.length - 5
      while (i <= last) { update(mins, md, s.substring(i, i + 5)); i += 1 }
    } else {
      // surrogate pairs present: precompute char offsets per code point
      val offs = new Array[Int](cp + 1)
      var i = 0
      var o = 0
      while (i < cp) { offs(i) = o; o += Character.charCount(s.codePointAt(o)); i += 1 }
      offs(cp) = s.length
      var k = 0
      val last = cp - 5
      while (k <= last) { update(mins, md, s.substring(offs(k), offs(k + 5))); k += 1 }
    }
    new GenericArrayData(mins)
  }

  private def update(mins: Array[Long], md: MessageDigest, shingle: String): Unit = {
    md.reset()
    val d = md.digest(shingle.getBytes(StandardCharsets.UTF_8))
    // first 7 lowercase-hex digits of the digest as an integer == top 28
    // bits: 2 hex digits per byte, so bytes 0-2 fully and byte 3's high
    // nibble.
    val x = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
    var j = 0
    while (j < NumHashes) {
      val h = (A(j) * x + B(j)) % P
      if (h < mins(j)) mins(j) = h
      j += 1
    }
  }
}
