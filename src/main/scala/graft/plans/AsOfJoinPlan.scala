package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a FULL custom operator — the (c) rung of the
  * custom-operator ladder (LogicalPlan + Strategy + SparkPlan), for the
  * case the (a)-composition in [[graft.operators.AsOfJoin]] handles
  * poorly: a DENSE right side, where `join(range) + window` materializes
  * |left| × matches-per-key intermediate rows before discarding all but
  * one per left row.
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted
  * by (key, time) — declared via requiredChildDistribution/Ordering, so
  * EnsureRequirements plans the exchanges/sorts — then ONE merge walk
  * per partition keeps a single "latest right row ≤ current left time"
  * per key: O(|left| + |right|) with O(1) state, no intermediate
  * blow-up. Left-outer semantics (unmatched left rows keep nulls).
  *
  * v1 scope (asserted at construction): key LongType, time
  * TimestampType — the shapes the engine's tables use. The
  * (a)-composition is this operator's differential oracle in
  * AsOfJoinExecSpec.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(leftKey)
    val lTimeOrd = left.output.indexOf(leftTime)
    val rKeyOrd = right.output.indexOf(rightKey)
    val rTimeOrd = right.output.indexOf(rightTime)
    require(lKeyOrd >= 0 && lTimeOrd >= 0 && rKeyOrd >= 0 && rTimeOrd >= 0)
    val rWidth = right.output.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var rNext: InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Long = 0L
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = l.getLong(lKeyOrd)
          val lt = l.getLong(lTimeOrd) // timestamp = micros as long
          // advance the right side while it is still "at or before" the
          // current left position in (key, time) order
          while (rNext != null && {
            val rk = rNext.getLong(rKeyOrd)
            rk < lk || (rk == lk && rNext.getLong(rTimeOrd) <= lt)
          }) {
            if (rNext.getLong(rKeyOrd) == lk) {
              lastMatch = rNext // already copied on ingest
              lastMatchKey = lk
            }
            rNext = if (rIter.hasNext) rIter.next().copy() else null
          }
          if (lastMatch != null && lastMatchKey == lk)
            joined(l, lastMatch)
          else
            joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** left-outer as-of join: for each left row, the latest right row of
    * the same key with time ≤ left time. Registers [[AsOfStrategy]] on
    * the session (idempotent). */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val (lk, lt) = (attr(leftDf, leftKey), attr(leftDf, leftTime))
    val (rk, rt) = (attr(rightDf, rightKey), attr(rightDf, rightTime))
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"v1 supports Long keys, got ${lk.dataType}/${rk.dataType}")
    require(lt.dataType == TimestampType && rt.dataType == TimestampType,
      s"v1 supports Timestamp times, got ${lt.dataType}/${rt.dataType}")
    DatasetBridge.ofRows(spark, AsOfJoinPlan(
      leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
      lk, rk, lt, rt))
  }
}
