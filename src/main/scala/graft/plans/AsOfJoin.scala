package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge

/** Native as-of join — the temporal lookup the reference's event
  * processing implies and Spark lacks as a first-class operator
  * (SURVEY §2.2 "as-of join"; guide: custom operator tier (c)).
  *
  * Semantics: for every left row, attach the right row with the same
  * key and the greatest (time, tiebreak) strictly below the left row's
  * (time, tiebreak); left rows with no match keep nulls (left-outer).
  *
  * Physical shape: both sides hash-cluster on the key and sort by
  * (key, time, tiebreak) — exactly a sort-merge join's requirements, so
  * EnsureRequirements plans the shuffles/sorts and AQE still applies —
  * then a single forward merge pass per co-partition. O(n log n) in the
  * shuffle, O(n) in the merge, no window-function re-scan, no state
  * larger than one buffered right row per key. This is the plan shape
  * that holds at 100 TB: one shuffle of each side on the join key.
  *
  * The window rewrite (RelationalQueries.q10) expresses the same thing
  * with built-ins; this operator exists because the rewrite re-sorts
  * the UNION of both streams inside every window partition, while the
  * merge touches each input row exactly once. Equivalence of the two is
  * asserted in AsOfJoinSpec; q53 puts the native operator on the
  * DuckDB-oracle surface.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Seq[Expression],   // (time, tiebreak...) lexicographic
    rightTime: Seq[Expression])
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Seq[Expression],
    rightTime: Seq[Expression])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(lt, lOut)
      val rTimeProj = UnsafeProjection.create(rt, rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lt.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // downstream operators (Sort, shuffles) require UnsafeRow output.
      // Bind by ordinal with the right side forced nullable — unmatched
      // lefts carry an all-null right row, and a non-nullable binding
      // would skip the null check and read 0s.
      val resultProj = UnsafeProjection.create(
        lOut.zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, a.dataType, a.nullable)
        } ++ rOut.zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            lOut.length + i, a.dataType, nullable = true)
        })

      new Iterator[InternalRow] {
        private var rCurr: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        private var currKey: InternalRow = null      // copied
        private var lastMatch: InternalRow = null    // copied
        private def advanceRight(): Unit =
          rCurr = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // SQL join semantics: a null key matches nothing
          if (lKey.anyNull) {
            return resultProj(joined(l, nullRight))
          }
          if (currKey == null || keyOrd.compare(lKey, currKey) != 0) {
            // new left key: drop buffered match, skip right rows behind
            lastMatch = null
            currKey = lKey.copy()
            while (rCurr != null && keyOrd.compare(rKeyProj(rCurr), currKey) < 0) {
              advanceRight()
            }
          }
          val lTime = lTimeProj(l)
          while (rCurr != null && keyOrd.compare(rKeyProj(rCurr), currKey) == 0
              && timeOrd.compare(rTimeProj(rCurr), lTime) < 0) {
            lastMatch = rCurr.copy()
            advanceRight()
          }
          resultProj(joined(l, if (lastMatch == null) nullRight else lastMatch))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOf {
  /** DataFrame-level as-of join. Registers [[AsOfStrategy]] through the
    * public `spark.experimental.extraStrategies` hook (works on any
    * already-built session — no SparkSessionExtensions needed). The
    * right side is re-aliased to `rightPrefix` + name, which also gives
    * it fresh attribute ids (required when both sides derive from the
    * same source). */
  def join(
      spark: SparkSession,
      left: DataFrame,
      right: DataFrame,
      on: String,
      time: Seq[String],
      rightPrefix: String = "r_"): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(Bridge.AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Bridge.AsOfStrategy
    }
    val r = right.toDF(right.columns.map(rightPrefix + _): _*)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(r)
    def attr(p: LogicalPlan, name: String): Expression =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output}"))
    val plan = AsOfJoinPlan(lPlan, rPlan,
      Seq(attr(lPlan, on)), Seq(attr(rPlan, rightPrefix + on)),
      time.map(attr(lPlan, _)), time.map(t => attr(rPlan, rightPrefix + t)))
    Bridge.ofRows(spark, plan)
  }
}
