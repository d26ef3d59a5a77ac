package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lcs_len(a, b)` — length of the longest common subsequence of two
  * token arrays, the ROUGE-L match count.
  *
  * Classic O(|a|·|b|) two-row DP inside whole-stage codegen; token
  * equality is exact UTF8 byte comparison (no hashing — unlike the
  * sorted-merge kernels there is no order to exploit, and the DP touches
  * every (i, j) cell anyway, so hashing would only add a collision
  * caveat without saving work). Callers bound the inputs (the eval
  * queries cap at the first 32 tokens), which bounds the per-row cost at
  * 1024 comparisons — the same declared-semantics capping stance as
  * text_edit_distance's 100-char heads.
  *
  * The DuckDB oracle mirrors the DP as a recursive CTE over the dp ROW
  * (one recursion step per a-token) using the prefix-max reformulation
  * dp_i[j] = max(dp_{i-1}[j], max_{k≤j}(dp_{i-1}[k-1] + eq(b_k, a_i))),
  * which needs no intra-row sequential dependency — validated cell-exact
  * against this implementation (RougeLSpec re-checks on live pairs).
  */
case class LcsLength(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isStringArray(dt: DataType) = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_len requires two ARRAY<STRING>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_len"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LcsLength.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {

  /** Static entry point for generated code. Two-row DP: dp(j) holds the
    * previous a-row's LCS with b's j-prefix; `prev` carries the diagonal. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    // null ELEMENTS (the type checker accepts ARRAY<STRING> with
    // containsNull, and the registry exposes lcs_len to arbitrary SQL)
    // match nothing — SQL equality semantics, and no NPE
    val bt = new Array[UTF8String](nb)
    var j = 0
    while (j < nb) { bt(j) = b.getUTF8String(j); j += 1 }
    val dp = new Array[Int](nb + 1)
    var i = 0
    while (i < na) {
      val ai = a.getUTF8String(i)
      var prev = 0
      j = 1
      while (j <= nb) {
        val cur = dp(j)
        var m = if (dp(j) > dp(j - 1)) dp(j) else dp(j - 1)
        if (ai != null && ai.equals(bt(j - 1)) && prev + 1 > m) m = prev + 1
        dp(j) = m
        prev = cur
        j += 1
      }
      i += 1
    }
    dp(nb).toLong
  }
}
