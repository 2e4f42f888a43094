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
  * semantics, same as asofJoin); null times sort first (-infinity).
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
    leftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinNode → AsOfMergeJoinExec (1:1). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, outer) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, rv, outer, planLater(l), planLater(r)) :: Nil
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
        // best candidate so far: copies (projection/scan buffers are reused)
        private var candKey: InternalRow = null
        private var candVals: InternalRow = null
        private var ready: InternalRow = null

        override def hasNext: Boolean = {
          if (ready == null) ready = computeNext()
          ready != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = ready; ready = null; r
        }

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyGen(lRow)
            if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
              candKey = null; candVals = null
            }
            val lTime = lTimeGen(lRow)
            // advance the right cursor: discard earlier keys, absorb
            // same-key rows with time <= lTime (later absorbs overwrite
            // earlier — "last right row wins"), stop at the first row
            // that is still ahead of this left row
            var scanning = true
            while (scanning && rRow != null) {
              val kc = keyOrd.compare(rKeyGen(rRow), lKey)
              if (kc < 0) {
                rRow = if (rIter.hasNext) rIter.next() else null
              } else if (kc == 0 && timeOrd.compare(rTimeGen(rRow), lTime) <= 0) {
                candVals = rValsGen(rRow).copy()
                candKey = lKey.copy()
                rRow = if (rIter.hasNext) rIter.next() else null
              } else scanning = false
            }
            if (candKey != null) {
              numOutputRows += 1
              return resultProj(joined(lRow, candVals))
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

  /** Backward-inclusive as-of join of `left` to `right` on equal `keys`,
    * each left row taking `valueCols` from the last right row with
    * `right(rightTime) <= left(leftTime)`. `how` = "inner" | "left".
    * The right side is pre-projected to (keys, rightTime, valueCols) so
    * column pruning reaches its scan even though Catalyst does not know
    * this node.
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      how: String = "inner"): DataFrame = {
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
      leftOuter = how == "left")
    ColumnBridge.ofRows(spark, node)
  }
}
