package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared-L2 distance over two `array<bigint>` columns — the
  * k-means assignment kernel.
  *
  * Replaces the SQL formulation
  * `aggregate(zip_with(a, b, (x,y) -> (x - y) * (x - y)), 0L, (acc,v) -> acc + v)`
  * — which builds a zipped intermediate array and runs its lambdas
  * interpreted for every (vector, centroid) pair — with one fused loop
  * inside whole-stage codegen. Exact integer math, so the result is
  * identical to the HOF version and to the DuckDB
  * `list_sum(list_transform(range(...), i -> (a[i]-b[i])*(a[i]-b[i])))`
  * oracle (inputs are 1e-6-quantized embedding components: |diff|² ≤ 4e12,
  * 64 dims ⇒ ≤ 2.6e14, far inside BIGINT).
  *
  * Mismatched lengths return NULL (zip_with pads with null, nulling the
  * fold), and so does any NULL element on either side.
  */
case class SqDistOrdered(left: Expression, right: Expression) extends BinaryExpression {

  private def isLongArray(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sqdist_ordered requires two ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sqdist_ordered"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistOrdered =
    copy(left = newLeft, right = newRight)
}
