package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash over a document's word tokens, one pass.
  *
  * Semantics identical to the composable-SQL formulation (and the DuckDB
  * oracle): tokens = non-empty pieces of `lower(text)` split on `[^a-z]+`;
  * for token t, md5 hex digit i (1..16) odd contributes +1 to bit i, even
  * contributes -1 (multiplicity-weighted); output = 16 chars, '1' where
  * the sum is positive. Integer sums are order-independent, so fusing the
  * explode + hash-aggregate into one projection changes no values — it
  * removes the |doc|×|tokens| explode and the shuffle entirely.
  *
  * Documents with NO tokens return NULL (the explode formulation emits no
  * row for them; callers filter nulls to match).
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $r =
         |  graft.functions.SimHash16.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {

  private val splitter = Pattern.compile("[^a-z]+")
  private val digest = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry point for generated code; null when the text has no
    * tokens. */
  def compute(text: UTF8String): UTF8String = {
    val sums = new Array[Int](16)
    var any = false
    val md = digest.get()
    val pieces = splitter.split(text.toString.toLowerCase(Locale.ROOT), -1)
    var t = 0
    while (t < pieces.length) {
      val tok = pieces(t)
      if (!tok.isEmpty) {
        any = true
        md.reset()
        val d = md.digest(tok.getBytes(StandardCharsets.UTF_8))
        // hex digit i (1-based, 1..16) = nibble i of the first 8 bytes;
        // parity odd -> +1, even -> -1
        var i = 0
        while (i < 16) {
          val nibble =
            if (i % 2 == 0) (d(i / 2) >> 4) & 0xF
            else d(i / 2) & 0xF
          if ((nibble & 1) == 1) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    if (!any) null
    else {
      val bits = new Array[Char](16)
      var i = 0
      while (i < 16) { bits(i) = if (sums(i) > 0) '1' else '0'; i += 1 }
      UTF8String.fromString(new String(bits))
    }
  }
}
