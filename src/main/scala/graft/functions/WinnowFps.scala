package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint expression (Schleimer et al., SIGMOD'03):
  * tokenize, hash every word-n-gram with md5, slide a window of w
  * consecutive gram hashes, keep each window's lexicographic MINIMUM,
  * and return the distinct minima — the whole per-document pipeline in
  * ONE codegen'd pass.
  *
  * Exists because the array-SQL formulation
  * (`transform(sequence(0, size(h)-w), i -> array_min(slice(h, i+1, w)))`
  * over `h = transform(word_ngrams(text, n, false), g -> md5(g))`) is a
  * correctness-equivalent TRAP: CollapseProject can inline the `h` alias
  * into the window lambda, re-running tokenize+md5 of the WHOLE document
  * once per window — observed as a ~40× blowup (22.9 s for a query DuckDB
  * finishes in 0.7 s). A single expression leaves nothing to inline.
  *
  * Semantics are bit-identical to the SQL form and the DuckDB oracle:
  * tokens are maximal `[a-z]+` runs of the lowercased text (same as
  * [[WordNgrams]]), grams join with one space, hashes are lowercase md5
  * hex (what `md5()` returns on both engines), window minimum is
  * lexicographic on the hex strings (ASCII, so String/UTF8String/DuckDB
  * collations agree), distinct keeps first occurrence. Documents with
  * fewer than n + w − 1 tokens (no full window) return an empty array.
  * Pinned against the SQL formulation by WinnowFpsSpec.
  */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires STRING text, got ${first.dataType.catalogString}")
    else if (second.dataType != IntegerType || !second.foldable)
      TypeCheckResult.TypeCheckFailure("winnow_fps n must be an INT literal")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure("winnow_fps w must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(text: Any, n: Any, w: Any): Any =
    WinnowFps.compute(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, w) =>
      s"graft.functions.WinnowFps.compute($t, $n, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFps =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFps {

  /** Static entry point for generated code. */
  def compute(text: UTF8String, n: Int, w: Int): ArrayData = {
    val grams = WordNgrams.compute(text, n, false)
    val count = grams.numElements()
    if (count < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    val hashes = new Array[String](count)
    var i = 0
    while (i < count) {
      val bytes = md.digest(grams.getUTF8String(i).getBytes)
      md.reset()
      val sb = new Array[Char](32)
      var j = 0
      while (j < 16) {
        sb(2 * j) = hex((bytes(j) >> 4) & 0xf)
        sb(2 * j + 1) = hex(bytes(j) & 0xf)
        j += 1
      }
      hashes(i) = new String(sb)
      i += 1
    }
    val out = new mutable.ArrayBuffer[UTF8String]
    val seen = mutable.HashSet.empty[String]
    var k = 0
    val last = count - w
    while (k <= last) {
      var m = hashes(k)
      var j = k + 1
      while (j < k + w) {
        if (hashes(j).compareTo(m) < 0) m = hashes(j)
        j += 1
      }
      if (seen.add(m)) out += UTF8String.fromString(m)
      k += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
