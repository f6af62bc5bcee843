package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** First-class backward as-of join: each left row picks the LAST right
  * row with the same key and `rightTs <= leftTs` (inclusive) — the
  * second whole-operator extension next to [[RangeJoinPlan]].
  *
  * Positioning vs the composable route (`Events.asofJoin`, union +
  * `last(_, ignoreNulls)` window): the composition reads the event
  * stream ONCE and pays ONE exchange, and measures faster when both
  * sides come from the same table (0.38 s vs 0.89 s at 10× scale) — it
  * remains the recommended plan for that shape. This operator earns its
  * place when the two sides are genuinely different inputs (separate
  * tables/sources, where the union trick forces schema-padding and a
  * combined shuffle anyway): each side keeps its own scan, co-partitions
  * and sorts like a sort-merge join, and the per-key merge holds **O(1)
  * state** — no window buffer — plus first-class inner/left-outer
  * variants and an explicit tie-break.
  *
  * `leftOuter = true` keeps unmatched left rows with a null right side
  * (the right attributes are nullability-widened in the output).
  * Equal-`ts` right rows are disambiguated by `rightTieBreak` ordering
  * (last wins), making the pick deterministic — the flaw ADVICE.md
  * called out in the window composition. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression], leftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTieBreak: Seq[Expression], leftOuter: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lExprs = Seq(leftKey, leftTs)
    val rExprs = Seq(rightKey, rightTs)
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val outer = leftOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(lExprs, lOut)
      val rProj = UnsafeProjection.create(rExprs, rOut)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      case class RRow(key: Long, ts: Long, row: InternalRow)
      val rBuf = rIter.flatMap { r =>
        val kt = rProj(r)
        if (kt.isNullAt(0) || kt.isNullAt(1)) None
        else Some(RRow(kt.getLong(0), kt.getLong(1), r.copy()))
      }.buffered

      new Iterator[InternalRow] {
        private var curKey = 0L
        private var haveKey = false
        private var best: InternalRow = _ // last right row with ts <= lTs

        private var outRow: InternalRow = _
        private var ready = false

        private def computeNext(): Boolean = {
          while (lIter.hasNext) {
            val lRow = lIter.next()
            val kt = lProj(lRow)
            if (kt.isNullAt(0) || kt.isNullAt(1)) {
              // null key/ts never matches; left-outer still emits
              if (outer) { outRow = resultProj(joined(lRow, nullRight)); return true }
            } else {
              val k = kt.getLong(0)
              val lTs = kt.getLong(1)
              if (!haveKey || k != curKey) {
                haveKey = true
                curKey = k
                best = null
                while (rBuf.hasNext && rBuf.head.key < k) rBuf.next()
              }
              // advance the match pointer: all right rows at this key
              // with ts <= lTs; the last one (tie-broken by the required
              // ordering) is the as-of match. O(1) state.
              while (rBuf.hasNext && rBuf.head.key == k &&
                rBuf.head.ts <= lTs) best = rBuf.next().row
              if (best != null) {
                outRow = resultProj(joined(lRow, best)); return true
              } else if (outer) {
                outRow = resultProj(joined(lRow, nullRight)); return true
              }
            }
          }
          false
        }

        override def hasNext: Boolean = {
          if (!ready) ready = computeNext()
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          ready = false
          outRow
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Backward as-of join `left` → latest `right` with `rightTs <=
    * leftTs` per key (LongType key/ts, resolved by name). `tieBreak`
    * columns disambiguate equal-ts right rows (last in ascending order
    * wins). The two inputs must be distinct plans (fresh scans). */
  def join(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTsCol: String, rightTsCol: String,
      tieBreak: Seq[String] = Nil, leftOuter: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftStrategies))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${p.output.map(_.name)}"))
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "left and right must be distinct plans (fresh scans) — " +
        "re-read the source for a self as-of join")
    org.apache.spark.sql.graftbridge.GraftBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
        attr(lPlan, leftTsCol), attr(rPlan, rightTsCol),
        tieBreak.map(attr(rPlan, _)), leftOuter))
  }
}
