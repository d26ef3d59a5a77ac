package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftshim.GraftBridge

/** Native as-of join — the whole-operator Catalyst extension (SURVEY §2
  * gap: Spark has no ASOF JOIN; the composed `asof_join` query emulates
  * the single-table case with an IGNORE NULLS running last, but the
  * general two-relation case — match each left row with the latest
  * earlier right row per key, think trades↔quotes — has no efficient
  * DataFrame expression: an inequality join explodes to the per-key
  * cross product and a union+window trick forces both schemas through
  * one padded shuffle).
  *
  * Architecture (the (c) ladder of the build rules): a resolved
  * [[AsOfJoinPlan]] logical node, planned by [[AsOfJoinStrategy]]
  * (runtime-injectable via `spark.experimental.extraStrategies`, or
  * through `GraftExtensions`) into [[AsOfJoinExec]], whose contract does
  * the heavy lifting declaratively: `requiredChildDistribution` clusters
  * both sides on the join keys and `requiredChildOrdering` sorts them by
  * (keys, time), so EnsureRequirements plans the exchanges/sorts (and AQE
  * still re-plans them); the exec itself is then a single zipPartitions
  * merge — O(n+m) per partition with O(1) state: one buffered candidate
  * row, never a per-key group in memory.
  *
  * 100 TB shape: exactly two shuffles (one per side, same as any shuffled
  * equi-join), sorts spill via Spark's external sorter, the merge itself
  * streams. Matches pandas `merge_asof` semantics: backward (latest
  * earlier right row; tiebreak max) or `forward` (earliest later row;
  * tiebreak min), each strict (`<`/`>`) or inclusive (`<=`/`>=`).
  * [[AsOfJoinRules]] adds left-side predicate pushdown and two-sided
  * column pruning through the node.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    forward: Boolean,
    rightTiebreak: Seq[Expression],
    nearest: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict, fwd, tb, near, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict, fwd,
        tb, near, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    forward: Boolean,
    rightTiebreak: Seq[Expression],
    nearest: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def leftOrder: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftOrder, ((rightKeys :+ rightTime) ++ rightTiebreak).map(SortOrder(_, Ascending)))

  // One left row in, one row out, in left order — both properties pass through.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = leftOrder

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val nearestB = nearest
    // nearest scans exactly like an INCLUSIVE backward join (consume every
    // right row at-or-behind the left time, buffering the last one); the
    // cursor row left standing is then the forward candidate. Strict
    // nearest is unsupported by design: the single O(1) cursor cannot skip
    // an equal-time run to find the strictly-later row without losing
    // those rows for subsequent left rows (AsOf.joinNearest rejects it).
    val strictB = strict && !nearest
    val forwardB = forward && !nearest
    // merge_asof tolerance: a candidate only matches within `tolerance`
    // time units of the left row (-1 = unbounded). A pure emit-time gate —
    // the cursor/buffer scan is unchanged, because a row too far for THIS
    // left row may still match a later one.
    val tolB: Long = tolerance.getOrElse(-1L)
    val hasTol = tolerance.isDefined
    // numeric time view for distance comparison (AsOf.joinNearest /
    // tolerance restrict to these types; null for other modes)
    val timeGet: InternalRow => Long =
      if (!nearest && !hasTol) null
      else timeType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => r => r.getLong(0)
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => r => r.getInt(0).toLong
        case org.apache.spark.sql.types.ShortType => r => r.getShort(0).toLong
        case org.apache.spark.sql.types.ByteType => r => r.getByte(0).toLong
        case t => throw new IllegalStateException(
          s"nearest as-of join over non-integral time type $t")
      }
    val rightWidth = rOut.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // Downstream exchanges require UnsafeRow; project the JoinedRow out.
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // Cursor into the right side. rKey/rTime are the projections'
        // REUSED buffers — valid only until the next advance; the one
        // buffered candidate (`matched`/`matchedKey`) is copied out.
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: InternalRow = _
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        private var matchedTime: Long = 0L // numeric time of `matched` (nearest mode)
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            rTime = rTimeProj(rRow)
          } else rRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val lNull = lKey.anyNull || lTime.isNullAt(0)
          // Merge: consume right rows that are unmatchable (null key/time
          // — they sort first) or behind this left position. Backward
          // buffers the latest-so-far candidate as it passes (last copy =
          // the (time, tiebreak) max); forward buffers nothing — after
          // the advance, the cursor row itself is the earliest-later
          // match (first in (time, tiebreak) order = the min).
          var scan = rRow != null
          while (scan) {
            if (rKey.anyNull || rTime.isNullAt(0)) advanceRight()
            else {
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0) advanceRight() // key passed; candidate gate below invalidates
              else if (kc == 0 && !lNull && {
                  val tc = timeOrd.compare(rTime, lTime)
                  if (forwardB) { if (strictB) tc <= 0 else tc < 0 }
                  else { if (strictB) tc < 0 else tc <= 0 }
                }) {
                if (!forwardB) {
                  matched = rRow.copy()
                  matchedKey = rKey.copy()
                  if (nearestB || hasTol) matchedTime = timeGet(rTime)
                }
                advanceRight()
              } else scan = false
            }
            if (rRow == null) scan = false
          }
          numOutputRows += 1
          if (nearestB) {
            // backward candidate is the buffered row; forward candidate is
            // the cursor (strictly later — equal times were consumed
            // backward, so an exact match always wins with distance 0).
            // Equidistant both sides → the earlier row, matching pandas
            // merge_asof(direction='nearest') with its backward tie rule.
            val ltv = if (lNull) 0L else timeGet(lTime)
            val bwHit = !lNull && matched != null &&
              keyOrd.compare(matchedKey, lKey) == 0 &&
              (!hasTol || ltv - matchedTime <= tolB)
            val fwHit = !lNull && rRow != null && !rKey.anyNull &&
              !rTime.isNullAt(0) && keyOrd.compare(rKey, lKey) == 0 &&
              (!hasTol || timeGet(rTime) - ltv <= tolB)
            val useFw = fwHit && (!bwHit ||
              (timeGet(rTime) - ltv) < (ltv - matchedTime))
            val hit = bwHit || fwHit
            if (hit) numMatched += 1
            resultProj(joined(l,
              if (!hit) nullRight else if (useFw) rRow else matched))
          } else {
            val hit =
              if (forwardB)
                !lNull && rRow != null && !rKey.anyNull && !rTime.isNullAt(0) &&
                  keyOrd.compare(rKey, lKey) == 0 &&
                  (!hasTol || timeGet(rTime) - timeGet(lTime) <= tolB)
              else
                !lNull && matched != null &&
                  keyOrd.compare(matchedKey, lKey) == 0 &&
                  (!hasTol || timeGet(lTime) - matchedTime <= tolB)
            if (hit) numMatched += 1
            resultProj(joined(l,
              if (!hit) nullRight else if (forwardB) rRow else matched))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry point: `AsOf.joinBackward(trades, quotes, Seq("sym"), "t", "qt")`. */
object AsOf {

  /** Idempotently make the planner aware of the operator on any session —
    * the `experimental` hooks are the runtime-settable injection points;
    * `GraftExtensions` wires the same strategy + rule at session build
    * (where the rule joins the fixed-point batch and follow-on rules
    * finish the pushdown into the scan). */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinRules))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinRules
  }

  /** Backward as-of join: each left row pairs with the latest right row of
    * the same key whose time is earlier (`strict`) or earlier-or-equal;
    * unmatched left rows keep null right columns (left-outer semantics).
    *
    * Column names must be fully disjoint between the two sides (the output
    * carries both schemas; rename before joining) — which is also why the
    * key columns are named per side.
    *
    * @param leftKeyCols   equi-key column names on the left side
    * @param rightKeyCols  matching key column names on the right side
    * @param leftTimeCol   left ordering column (any orderable atomic type)
    * @param rightTimeCol  right ordering column (same type as left's)
    * @param strict        true → `t_right < t_left` (no exact matches)
    * @param rightTiebreak extra right columns that break timestamp ties
    *                      deterministically (max in ascending sort wins)
    * @param tolerance     pandas `merge_asof(tolerance=…)`: maximum time
    *                      distance (in the time column's own units) a
    *                      candidate may sit from the left row; farther →
    *                      null match. Needs an integral/timestamp time
    *                      column (distance needs subtraction).
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      strict: Boolean = true,
      rightTiebreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeyCols, rightKeyCols, leftTimeCol, rightTimeCol,
      strict, forward = false, rightTiebreak, tolerance = tolerance)

  /** Forward as-of join: the earliest LATER right row per key instead of
    * the latest earlier one (`strict` → `t_right > t_left`); timestamp
    * ties break to the tiebreak MINIMUM (first in ascending order).
    * Same contract as [[joinBackward]] otherwise. */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      strict: Boolean = true,
      rightTiebreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeyCols, rightKeyCols, leftTimeCol, rightTimeCol,
      strict, forward = true, rightTiebreak, tolerance = tolerance)

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): each
    * left row pairs with the right row of the same key minimizing
    * |t_right − t_left|; equidistant candidates on both sides resolve to
    * the EARLIER row. Always inclusive (an exact-time match wins at
    * distance 0) — strict nearest is unsupported because the O(1)-state
    * merge cannot skip an equal-time run without losing it for later left
    * rows. The time column must be an integral/timestamp/date type (a
    * distance needs subtraction; plain orderability is enough only for
    * the directional modes). Timestamp ties within a side break like the
    * directional modes: tiebreak MAX when the earlier row wins, MIN when
    * the later one does. */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTiebreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {
    requireNumericTime(left, leftTimeCol, "nearest as-of join")
    join(left, right, leftKeyCols, rightKeyCols, leftTimeCol, rightTimeCol,
      strict = false, forward = false, rightTiebreak, nearest = true,
      tolerance = tolerance)
  }

  private def requireNumericTime(df: DataFrame, timeCol: String,
      what: String): Unit = {
    import org.apache.spark.sql.types._
    val tt = df.schema(timeCol).dataType
    require(Seq(LongType, IntegerType, ShortType, ByteType, TimestampType,
        TimestampNTZType, DateType).contains(tt),
      s"$what needs an integral/timestamp time column, got $tt")
  }

  private def join(
      left: DataFrame,
      right: DataFrame,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      strict: Boolean,
      forward: Boolean,
      rightTiebreak: Seq[String],
      nearest: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeyCols.size == rightKeyCols.size, "key lists must align")
    tolerance.foreach { t =>
      require(t >= 0L, s"tolerance must be non-negative, got $t")
      requireNumericTime(left, leftTimeCol, "as-of join with tolerance")
    }
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val dup = lPlan.output.map(_.name).toSet.intersect(rPlan.output.map(_.name).toSet)
    require(dup.isEmpty,
      s"as-of join sides must have disjoint column names, both have: ${dup.mkString(", ")}")
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side side has no column '$name' (has: ${plan.output.map(_.name).mkString(", ")})"))
    val lk = leftKeyCols.map(attr(lPlan, _, "left"))
    val rk = rightKeyCols.map(attr(rPlan, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name} ${a.dataType} vs ${b.name} ${b.dataType}")
    }
    val lt = attr(lPlan, leftTimeCol, "left")
    val rt = attr(rPlan, rightTimeCol, "right")
    require(lt.dataType == rt.dataType && RowOrdering.isOrderable(lt.dataType),
      s"time columns must share an orderable type, got ${lt.dataType} vs ${rt.dataType}")
    GraftBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, strict, forward,
        rightTiebreak.map(attr(rPlan, _, "right")), nearest, tolerance))
  }
}
