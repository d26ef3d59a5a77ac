package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the lenient-JSON repair (O4): unlike a
  * Scala `udf()`, it has no encoder/serialization boundary and generates a
  * direct static call inside whole-stage codegen, so the repair sits in the
  * same generated loop as `from_json`.
  *
  * Semantics identical to [[graft.ingest.NdjsonReader.repairLine]] (the
  * reference's addslashes-callback heuristic, `/root/reference/helpers.php:10-22`).
  */
case class RepairJsonLine(child: Expression) extends UnaryExpression {

  // AbstractDataType (and so ExpectsInputTypes) is private[sql]; check by hand
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repair_json requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "repair_json"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      RepairJsonLine.repair(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RepairJsonLine.repair($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): RepairJsonLine =
    copy(child = newChild)
}

object RepairJsonLine {
  /** Static entry point for generated code. */
  def repair(s: String): String = graft.ingest.NdjsonReader.repairLine(s)
}

/** Function registration — usable two ways:
  *  - `GraftFunctions.register(spark)` imperatively (NdjsonReader does this);
  *  - `--conf spark.sql.extensions=graft.functions.GraftExtensions` for
  *    cluster-wide availability including pure-SQL users.
  */
object GraftFunctions {
  private[functions] def extInfo(cls: String, name: String, usage: String) =
    // the non-deprecated full constructor; empty docs fields
    new ExpressionInfo(cls, null, name, usage, "", "", "", "", "", "", "built-in")

  private val repairInfo = extInfo(classOf[RepairJsonLine].getName, "repair_json",
    "_FUNC_(line) - repairs unescaped quotes/backslashes inside flat-JSON string values")

  private val minhashInfo = extInfo(classOf[MinHashSignature].getName, "minhash_sig",
    "_FUNC_(text) - 12 MinHash values over 5-char shingles, one pass, codegen'd")

  private val simhashInfo = extInfo(classOf[SimHash16].getName, "simhash16",
    "_FUNC_(text) - 16-bit SimHash over word tokens, one pass; NULL if no tokens")

  private val dotInfo = extInfo(classOf[DotOrdered].getName, "dot_ordered",
    "_FUNC_(a, b) - ordered-fold double dot product of two float arrays")

  private val bloomInfo = extInfo(classOf[BloomMightContain].getName, "bloom_might_contain",
    "_FUNC_(bits, key) - membership test against a serialized BloomFilter literal")

  private val ngramsInfo = extInfo(classOf[WordNgrams].getName, "word_ngrams",
    "_FUNC_(text, n, distinct) - lowercase [a-z]+ word n-grams in one codegen'd pass")

  private val sqdistInfo = extInfo(classOf[SqDistOrdered].getName, "sqdist_ordered",
    "_FUNC_(a, b) - integer squared-L2 over two BIGINT arrays in one codegen'd loop")

  private val winnowInfo = extInfo(classOf[WinnowFps].getName, "winnow_fps",
    "_FUNC_(text, n, w) - distinct window-min md5 winnowing fingerprints, one pass")

  private val rpInfo = extInfo(classOf[RpProject].getName, "rp_project",
    "_FUNC_(embedding) - 8 signed-random-projection BIGINT sums over floor(x*1000) components")

  private val shingleInfo = extInfo(classOf[CharShingleHashes].getName, "char_shingle_hashes",
    "_FUNC_(text) - sorted distinct xxhash64 of every 5-char shingle, one pass")

  private val gramCntInfo = extInfo(classOf[WordGramHashCounts].getName, "word_gram_hash_counts",
    "_FUNC_(text, n) - struct(gh, cnt, tot): sorted distinct word-n-gram hashes + multiplicities")

  private val interCntInfo = extInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count",
    "_FUNC_(a, b) - |a intersect b| over two sorted BIGINT arrays, linear merge")

  private val summinInfo = extInfo(classOf[SortedSumMin].getName, "sorted_summin",
    "_FUNC_(agh, acnt, bgh, bcnt) - sum of min multiplicities over matching sorted hashes")

  private val lcsInfo = extInfo(classOf[LcsLength].getName, "lcs_len",
    "_FUNC_(a, b) - longest-common-subsequence length of two STRING arrays (ROUGE-L)")

  private val charCntInfo = extInfo(classOf[CharGramHashCounts].getName,
    "char_gram_hash_counts",
    "_FUNC_(text) - struct(gh, cnt, tot): sorted distinct 5-char-shingle hashes + multiplicities")

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_fps"), winnowInfo,
      (exprs: Seq[Expression]) => WinnowFps(exprs(0), exprs(1), exprs(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"), bloomInfo,
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("repair_json"), repairInfo,
      (exprs: Seq[Expression]) => RepairJsonLine(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"), minhashInfo,
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash16"), simhashInfo,
      (exprs: Seq[Expression]) => SimHash16(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_ordered"), dotInfo,
      (exprs: Seq[Expression]) => DotOrdered(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_ngrams"), ngramsInfo,
      (exprs: Seq[Expression]) => WordNgrams(exprs(0), exprs(1), exprs(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sqdist_ordered"), sqdistInfo,
      (exprs: Seq[Expression]) => SqDistOrdered(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rp_project"), rpInfo,
      (exprs: Seq[Expression]) => RpProject(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_shingle_hashes"), shingleInfo,
      (exprs: Seq[Expression]) => CharShingleHashes(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_gram_hash_counts"), gramCntInfo,
      (exprs: Seq[Expression]) => WordGramHashCounts(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_intersect_count"), interCntInfo,
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_summin"), summinInfo,
      (exprs: Seq[Expression]) => SortedSumMin(exprs(0), exprs(1), exprs(2), exprs(3)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lcs_len"), lcsInfo,
      (exprs: Seq[Expression]) => LcsLength(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_gram_hash_counts"), charCntInfo,
      (exprs: Seq[Expression]) => CharGramHashCounts(exprs.head))
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("repair_json"),
      GraftFunctions.extInfo(classOf[RepairJsonLine].getName, "repair_json",
        "_FUNC_(line) - repairs unescaped quotes/backslashes inside flat-JSON string values"),
      (exprs: Seq[Expression]) => RepairJsonLine(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      GraftFunctions.extInfo(classOf[MinHashSignature].getName, "minhash_sig",
        "_FUNC_(text) - 12 MinHash values over 5-char shingles, one pass, codegen'd"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash16"),
      GraftFunctions.extInfo(classOf[SimHash16].getName, "simhash16",
        "_FUNC_(text) - 16-bit SimHash over word tokens, one pass; NULL if no tokens"),
      (exprs: Seq[Expression]) => SimHash16(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_ordered"),
      GraftFunctions.extInfo(classOf[DotOrdered].getName, "dot_ordered",
        "_FUNC_(a, b) - ordered-fold double dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotOrdered(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("rp_project"),
      GraftFunctions.extInfo(classOf[RpProject].getName, "rp_project",
        "_FUNC_(embedding) - 8 signed-random-projection BIGINT sums over floor(x*1000) components"),
      (exprs: Seq[Expression]) => RpProject(exprs.head)))
    // Whole-operator extension: the native as-of join's planner strategy
    // and its pushdown/pruning optimizer rule (graft.plans). AsOf
    // .joinBackward also self-injects both via the runtime experimental
    // hooks for sessions built without extensions.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinRules)
  }
}
