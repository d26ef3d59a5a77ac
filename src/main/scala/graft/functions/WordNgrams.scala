package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram expression: tokenize + n-gram window in ONE
  * codegen'd pass.
  *
  * Replaces the interpreted chain
  * `transform(sequence(...), i -> concat_ws(' ', toks[i-1], ...))` over
  * `filter(split(lower(text), '[^a-z]+'), t -> t <> '')` — which
  * materializes a token array per row and runs every lambda interpreted —
  * with a single scan over the lowercased bytes. Bit-identical to that SQL
  * formulation (and so to the DuckDB oracle): lowercasing is the same
  * Unicode `UTF8String.toLowerCase` Spark's `lower()` uses, tokens are the
  * maximal `[a-z]+` runs `split` produces, windows join with a single
  * space exactly like `concat_ws(' ', ...)`, and `distinct = true` keeps
  * first occurrences in order like `array_distinct`. Pinned by
  * WordNgramsSpec on random strings including non-BMP and empty edges.
  *
  * `word_ngrams(text, 1, false)` is plain tokenization.
  */
case class WordNgrams(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires STRING text, got ${first.dataType.catalogString}")
    else if (second.dataType != IntegerType || !second.foldable)
      TypeCheckResult.TypeCheckFailure("word_ngrams n must be an INT literal")
    else if (third.dataType != BooleanType || !third.foldable)
      TypeCheckResult.TypeCheckFailure("word_ngrams distinct must be a BOOLEAN literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(text: Any, n: Any, distinct: Any): Any =
    WordNgrams.compute(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], distinct.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, d) =>
      s"graft.functions.WordNgrams.compute($t, $n, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WordNgrams =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WordNgrams {

  /** Static entry point for generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toLowerCase.toString
    // tokens = maximal [a-z]+ runs (what split('[^a-z]+') + empty-filter yields)
    val toks = new mutable.ArrayBuffer[String]
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        val start = i
        i += 1
        while (i < len && { val x = s.charAt(i); x >= 'a' && x <= 'z' }) i += 1
        toks += s.substring(start, i)
      } else i += 1
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new mutable.ArrayBuffer[UTF8String]
    val seen = if (distinct) mutable.HashSet.empty[String] else null
    val sb = new java.lang.StringBuilder
    var k = 0
    val last = toks.length - n
    while (k <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(k + j))
        j += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) out += UTF8String.fromString(g)
      k += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
