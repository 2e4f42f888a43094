package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator as-of join as a first-class plan node — SURVEY §7.2
  * preference (c): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`
  * registered through `SparkSessionExtensions`. The reference has no as-of
  * join at all (its one join is hash-equi, `cpp/src/join.cpp:230-295`); the
  * window-based [[graft.operators.Joins.asofJoin]] composes built-ins
  * (preference (a)), and this node is the same semantics expressed the way a
  * native engine would: co-partition both sides by key, sort each by
  * (key, time), and stream a single merge pass per partition.
  *
  * Semantics (backward inclusive, matching DuckDB `ASOF JOIN` and the
  * window form): each left row picks the LAST right row of the same key
  * with rightTime <= leftTime; among equal-time right rows the last in
  * (time) sort order wins. Null keys join like values (window-partition
  * semantics, same as asofJoin); null times sort first (-infinity). When
  * `tolerance` is set, a null time on EITHER side rejects the match (a
  * -infinity time is infinitely far from any bound) — never decoded as 0.
  *
  * Why a physical operator instead of the window plan: the window form
  * unions both sides into one exchange of |L|+|R| full-width rows, sorts the
  * union, runs a window carry, then filters and re-projects. This node
  * exchanges each side separately (narrow right rows never widen the left
  * payload), sorts each side once — both via Catalyst's own
  * `EnsureRequirements`, so AQE still plans the exchanges — and the merge
  * itself is O(1) state: ONE buffered candidate row per key, no window
  * frame buffer at all. A hot key costs one task the scan of its rows, the
  * same bound as the window plan's carry.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    leftOuter: Boolean,
    forward: Boolean,
    tolerance: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinNode → AsOfMergeJoinExec (1:1). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, outer, fwd, tol) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, rv, outer, fwd, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Merge-pass as-of join. Declares `ClusteredDistribution` on each side's
  * keys and `(keys…, time)` ascending child orderings; `EnsureRequirements`
  * inserts the co-partitioning exchanges and sorts exactly as it does for
  * sort-merge join — nothing here schedules its own shuffle. Output keeps
  * the left side's partitioning and ordering (a left row is emitted in
  * place), so a downstream per-key window or merge join reuses both.
  */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightValues: Seq[Attribute],
    leftOuter: Boolean,
    forward: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def childOrdering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+ SortOrder(time, Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(childOrdering(leftKeys, leftTime), childOrdering(rightKeys, rightTime))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = childOrdering(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val rVals = rightValues
    val outAttrs = output
    val outer = leftOuter
    val fwd = forward
    val tol = tolerance
    // tolerance needs the time as a comparable long (micros for timestamps).
    // Callers must check isNullAt(0) first: a null slot in an UnsafeRow
    // decodes as 0, which would silently turn "-infinity" into epoch.
    val timeAsLong: InternalRow => Long = lTimeExpr.dataType match {
      case _ if tol.isEmpty => _ => 0L
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => r => r.getLong(0)
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => r => r.getInt(0).toLong
      case other => throw new IllegalArgumentException(
        s"asof tolerance needs a long/timestamp/int/date time column, got $other")
    }
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeGen = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeGen = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val rValsGen = UnsafeProjection.create(rVals, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      // bind the value columns nullable regardless of their source
      // nullability: the outer path substitutes an all-null row
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rVals.map(_.withNullability(true)))
      val nullVals = new GenericInternalRow(rVals.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // current right cursor — held (not consumed) across left rows; valid
        // because no rIter.next() call happens until we advance past it
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        // backward: best candidate so far — copies (buffers are reused)
        private var candKey: InternalRow = null
        private var candVals: InternalRow = null
        private var candT: Long = 0L
        private var candTNull: Boolean = false
        private var ready: InternalRow = null

        override def hasNext: Boolean = {
          if (ready == null) ready = computeNext()
          ready != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = ready; ready = null; r
        }

        private def advanceRight(): Unit =
          rRow = if (rIter.hasNext) rIter.next() else null

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyGen(lRow)
            if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
              candKey = null; candVals = null
            }
            val lTime = lTimeGen(lRow)
            val lTNull = lTime.isNullAt(0)
            val lT = if (lTNull) 0L else timeAsLong(lTime)
            var matched: InternalRow = null
            if (!fwd) {
              // backward: discard earlier keys, absorb same-key rows with
              // time <= lTime (later absorbs overwrite earlier — "last
              // right row wins"), stop at the first row still ahead
              var scanning = true
              while (scanning && rRow != null) {
                val kc = keyOrd.compare(rKeyGen(rRow), lKey)
                if (kc < 0) advanceRight()
                else if (kc == 0 && timeOrd.compare(rTimeGen(rRow), lTime) <= 0) {
                  candVals = rValsGen(rRow).copy()
                  candKey = lKey.copy()
                  val rTime = rTimeGen(rRow)
                  candTNull = rTime.isNullAt(0)
                  candT = if (candTNull) 0L else timeAsLong(rTime)
                  advanceRight()
                } else scanning = false
              }
              // tolerance: a null time on either side is -infinity — no
              // finite bound admits it (never decode the null slot as 0)
              if (candKey != null &&
                  tol.forall(t => !lTNull && !candTNull && lT - candT <= t))
                matched = candVals
            } else {
              // forward: discard earlier keys AND same-key rows strictly
              // before lTime (dead for every later left row too — left
              // times are non-decreasing); the cursor itself is then the
              // earliest right row with time >= lTime, NOT consumed (it
              // may serve later left rows of the same key)
              var scanning = true
              while (scanning && rRow != null) {
                val kc = keyOrd.compare(rKeyGen(rRow), lKey)
                if (kc < 0 ||
                    (kc == 0 && timeOrd.compare(rTimeGen(rRow), lTime) < 0))
                  advanceRight()
                else scanning = false
              }
              if (rRow != null && keyOrd.compare(rKeyGen(rRow), lKey) == 0 &&
                  tol.forall { t =>
                    val rTime = rTimeGen(rRow)
                    !lTNull && !rTime.isNullAt(0) && timeAsLong(rTime) - lT <= t
                  })
                matched = rValsGen(rRow)
            }
            if (matched != null) {
              numOutputRows += 1
              return resultProj(joined(lRow, matched))
            } else if (outer) {
              numOutputRows += 1
              return resultProj(joined(lRow, nullVals))
            }
            // inner, no match: fall through to the next left row
          }
          null
        }
      }
    }
  }
}

/** DataFrame-level entry point (builds the logical node; the injected
  * [[AsOfJoinStrategy]] plans it).
  */
object AsOfMergeJoin {

  /** As-of join of `left` to `right` on equal `keys`: each left row takes
    * `valueCols` from the last right row with rightTime <= leftTime
    * (`direction = "backward"`, inclusive) or the first right row with
    * rightTime >= leftTime (`"forward"`). `how` = "inner" | "left".
    * `tolerance` (in the time column's own units — micros for timestamps)
    * rejects matches farther than the bound; a null time on either side
    * never satisfies a tolerance (it sorts as -infinity, which no finite
    * bound reaches).
    *
    * Duplicate (key, time) rows on the RIGHT with different values make
    * the equal-time winner sort-order-dependent — the merge keeps the last
    * right row in (key, time) sort order, and rows tied on both columns
    * have no defined order across partition layouts, so results can vary
    * run to run. Pre-deduplicate the right side to one row per (key, time)
    * — e.g. `groupBy(key, time).agg(max(value))`, as q254 does — or use
    * [[graft.operators.Joins.asofJoin]]'s `tieBreak` column to pin the
    * equal-time order deterministically.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String = "inner",
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof merge join direction must be backward/forward, got: $direction")
    require(how == "inner" || how == "left", s"asof merge join supports inner/left, got: $how")
    require(keys.nonEmpty, "asof merge join requires at least one key")
    val spark = left.sparkSession
    import org.apache.spark.sql.functions.col
    // Re-alias every output on both sides: a fresh exprId per column. The two
    // sides often derive from the same relation (self as-of joins), and the
    // analyzer's DeduplicateRelations only knows how to rewrite conflicting
    // ids through BUILT-IN nodes — it would re-id the right subtree without
    // updating this custom node's key/time/value references. Fresh aliases
    // on the node's own referenced attributes make the plan conflict-free by
    // construction (the aliases keep their ids when the leaf below is
    // re-deduplicated, because only alias CHILDREN are rewritten).
    def fresh(df: DataFrame): DataFrame =
      df.select(df.columns.map(n => col(n).as(n)).toSeq: _*)
    val leftFresh = fresh(left)
    val rightFresh = fresh(right.selectExpr(((keys :+ rightTime) ++ valueCols).distinct: _*))
    val lPlan = leftFresh.queryExecution.analyzed
    val rPlan = rightFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    require(keys.forall(k => attr(lPlan, k).dataType == attr(rPlan, k).dataType),
      "asof merge join key types must match")
    require(attr(lPlan, leftTime).dataType == attr(rPlan, rightTime).dataType,
      "asof merge join time column types must match")
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      valueCols.map(attr(rPlan, _)),
      leftOuter = how == "left",
      forward = direction == "forward",
      tolerance = tolerance)
    ColumnBridge.ofRows(spark, node)
  }
}
