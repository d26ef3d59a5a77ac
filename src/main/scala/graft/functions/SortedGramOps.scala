package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted-merge verification kernels for the LSH family.
  *
  * The generate-then-verify dedup queries spend their time in the VERIFY
  * step: per candidate pair, an exact set-intersection (`dedup_minhash_est`,
  * `dedup_ngram_jaccard`) or a clipped-count match (`eval_bleu`). The SQL
  * formulations (`size(array_intersect(a, b))`, or a pairs×grams join into
  * a re-aggregate) either allocate a hash set + result array per pair or
  * push |pairs|×|grams/doc| rows through a shuffle. These kernels replace
  * both with O(|a|+|b|) allocation-free merges over PRE-SORTED hash
  * arrays, inside whole-stage codegen:
  *
  *  - `char_shingle_hashes(text)`   → sorted distinct xxhash64 of every
  *    5-char window (the `CASE WHEN length < 5 THEN [text]` whole-text
  *    fallback included) — identical VALUES to
  *    `array_distinct(transform(shingles, s -> xxhash64(s)))`, sorted.
  *  - `word_gram_hash_counts(text, n)` → struct(gh, cnt, tot): sorted
  *    distinct xxhash64 of the word n-grams (WordNgrams tokenization),
  *    each hash's multiplicity, and the total (non-distinct) gram count.
  *  - `sorted_intersect_count(a, b)` → |a ∩ b| by linear merge.
  *  - `sorted_summin(agh, acnt, bgh, bcnt)` → Σ min(cnt_a, cnt_b) over
  *    the matching hashes — BLEU's clipped n-gram match count.
  *
  * All hashing is Spark's own `xxhash64` (seed 42) over the exact same
  * UTF8 bytes, so results are bit-identical to the previous SQL chains;
  * the 64-bit-collision stance is unchanged from dedup_ngram_jaccard
  * (documented there). Sortedness is a construction invariant of the two
  * producers above, never checked at merge time.
  */
case class CharShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hashes requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hashes"

  override def nullSafeEval(text: Any): Any =
    CharShingleHashes.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CharShingleHashes.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

object CharShingleHashes {

  private def xx(u: UTF8String): Long =
    XxHash64Function.hash(u, StringType, 42L)

  /** Static entry point for generated code. */
  def compute(text: UTF8String): ArrayData = {
    val n = text.numChars()
    val hashes =
      if (n < 5) Array(xx(text))
      else {
        val out = new Array[Long](n - 4)
        var i = 0
        while (i < n - 4) {
          // substringSQL is 1-based and code-point-exact — the same
          // windows substring(text, i, 5) yields
          out(i) = xx(text.substringSQL(i + 1, 5))
          i += 1
        }
        out
      }
    java.util.Arrays.sort(hashes)
    // dedupe adjacent (sorted) — same set as array_distinct over hashes
    var w = 0
    var r = 0
    while (r < hashes.length) {
      if (w == 0 || hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

case class CharGramHashCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_gram_hash_counts requires STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("gh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cnt", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("tot", LongType, nullable = false)))
  override def prettyName: String = "char_gram_hash_counts"

  override def nullSafeEval(text: Any): Any =
    CharGramHashCounts.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CharGramHashCounts.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashCounts =
    copy(child = newChild)
}

object CharGramHashCounts {

  /** `char_gram_hash_counts(text)` → struct(gh, cnt, tot): sorted
    * distinct xxhash64 of every 5-char window (the CharShingleHashes
    * windowing, including the <5-char whole-text fallback), each hash's
    * MULTIPLICITY, and the total window count — the chrF counterpart of
    * word_gram_hash_counts, feeding sorted_summin's clipped match. */
  def compute(text: UTF8String): InternalRow = {
    val n = text.numChars()
    val hashes =
      if (n < 5) Array(XxHash64Function.hash(text, StringType, 42L))
      else {
        val out = new Array[Long](n - 4)
        var i = 0
        while (i < n - 4) {
          out(i) = XxHash64Function.hash(
            text.substringSQL(i + 1, 5), StringType, 42L)
          i += 1
        }
        out
      }
    java.util.Arrays.sort(hashes)
    val m = hashes.length
    val gh = new Array[Long](m)
    val cnt = new Array[Long](m)
    var w = 0
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && hashes(j) == hashes(i)) j += 1
      gh(w) = hashes(i); cnt(w) = (j - i).toLong; w += 1
      i = j
    }
    InternalRow(
      new GenericArrayData(java.util.Arrays.copyOf(gh, w)),
      new GenericArrayData(java.util.Arrays.copyOf(cnt, w)),
      m.toLong)
  }
}

case class WordGramHashCounts(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_gram_hash_counts requires STRING text, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("word_gram_hash_counts n must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("gh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cnt", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("tot", LongType, nullable = false)))
  override def prettyName: String = "word_gram_hash_counts"

  override def nullSafeEval(text: Any, n: Any): Any =
    WordGramHashCounts.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordGramHashCounts.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGramHashCounts =
    copy(left = newLeft, right = newRight)
}

object WordGramHashCounts {

  /** Static entry point for generated code. */
  def compute(text: UTF8String, n: Int): InternalRow = {
    // same tokenization + windowing as word_ngrams(text, n, false)
    val grams = WordNgrams.compute(text, n, distinct = false)
    val m = grams.numElements()
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = XxHash64Function.hash(grams.getUTF8String(i), StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // run-length encode the sorted hashes → (distinct hash, multiplicity)
    val gh = new Array[Long](m)
    val cnt = new Array[Long](m)
    var w = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m && hashes(j) == hashes(i)) j += 1
      gh(w) = hashes(i); cnt(w) = (j - i).toLong; w += 1
      i = j
    }
    InternalRow(
      new GenericArrayData(java.util.Arrays.copyOf(gh, w)),
      new GenericArrayData(java.util.Arrays.copyOf(cnt, w)),
      m.toLong)
  }
}

case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isLongArray(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two ARRAY<BIGINT>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Linear merge over two strictly-increasing BIGINT arrays. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedSumMin(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  private def isLongArray(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => isLongArray(c.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_summin requires four ARRAY<BIGINT> (agh, acnt, bgh, bcnt)")

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_summin"

  override def nullSafeEval(agh: Any, acnt: Any, bgh: Any, bcnt: Any): Any =
    SortedSumMin.compute(agh.asInstanceOf[ArrayData], acnt.asInstanceOf[ArrayData],
      bgh.asInstanceOf[ArrayData], bcnt.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.SortedSumMin.compute($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SortedSumMin =
    copy(first = f, second = s, third = t, fourth = q)
}

object SortedSumMin {

  /** Σ min(acnt, bcnt) over hashes present in both sorted gh arrays —
    * BLEU's clipped match count in one merge. */
  def compute(agh: ArrayData, acnt: ArrayData, bgh: ArrayData, bcnt: ArrayData): Long = {
    val na = agh.numElements()
    val nb = bgh.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < na && j < nb) {
      val x = agh.getLong(i)
      val y = bgh.getLong(j)
      if (x == y) {
        acc += math.min(acnt.getLong(i), bcnt.getLong(j))
        i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    acc
  }
}
