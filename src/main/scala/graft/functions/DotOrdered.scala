package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native ordered-fold dot product over two `array<float>` columns.
  *
  * Replaces the SQL formulation
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *            0.0D, (acc,v) -> acc + v)`
  * with the SAME operation sequence — widen each float to double, multiply,
  * accumulate left-to-right — so the result is bit-identical (ordered IEEE
  * double addition), which is what keeps cosine scores hash-matching the
  * DuckDB `list_sum(list_transform(...))` oracle. The HOF version builds a
  * zipped intermediate array and runs its lambdas interpreted; this is one
  * fused loop inside whole-stage codegen.
  *
  * Mismatched lengths return NULL (zip_with would pad with null, nulling
  * the fold), and so does any NULL element on either side — the HOF
  * formulation's `acc + null` nulls the whole fold, so this must too.
  */
case class DotOrdered(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(dt: DataType) = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_ordered requires two ARRAY<FLOAT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_ordered"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotOrdered =
    copy(left = newLeft, right = newRight)
}
