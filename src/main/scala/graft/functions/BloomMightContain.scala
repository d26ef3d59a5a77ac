package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-membership predicate: `bloom_might_contain(bits, key)`.
  *
  * `bits` is a foldable BINARY literal holding a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (the same shape Spark's own
  * injected runtime row-filters use: filter bits travel in the plan, the
  * filter object deserializes once per executor via the codegen reference
  * array, and the per-row test is a branch-free generated call). Replaces
  * the Scala-UDF membership test, which forced every hot-path row out of
  * whole-stage codegen into a boxed lambda.
  *
  * NULL keys return false (a NULL never joins, so pruning it is correct —
  * mirrors the UDF's `k != null &&` guard).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom bits must be BINARY, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure("bloom bits must be a literal")
    else right.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom key must be LONG/INT/STRING, got ${dt.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) false
    else right.dataType match {
      case StringType  => bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
      case IntegerType => bf.mightContainLong(v.asInstanceOf[Int].toLong)
      case _           => bf.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides the generated class's reference array:
    // one object per executor plan instance, zero per-row deserialization
    val bfRef = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    val keyGen = right.genCode(ctx)
    val call = right.dataType match {
      case StringType  => s"$bfRef.mightContainBinary(${keyGen.value}.getBytes())"
      case IntegerType => s"$bfRef.mightContainLong((long) ${keyGen.value})"
      case _           => s"$bfRef.mightContainLong(${keyGen.value})"
    }
    ev.copy(
      code = code"""
        ${keyGen.code}
        boolean ${ev.value} = false;
        if (!${keyGen.isNull}) { ${ev.value} = $call; }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
