package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.graftbridge.DatasetBridge
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
  * blow-up. INNER semantics — unmatched or null-keyed left rows are
  * dropped, matching both oracles (the window composition's equi-join
  * and DuckDB's ASOF JOIN are inner).
  *
  * v1 scope (asserted at construction): key LongType, time
  * TimestampType — the shapes the engine's tables use. The
  * (a)-composition is this operator's differential oracle in
  * AsOfJoinExecSpec.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // output stays clustered on the join key — downstream key-based
  // operators must not re-shuffle (same propagation SortMergeJoin does)
  override def outputPartitioning: Partitioning = left.outputPartitioning

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
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      // downstream operators assume UnsafeRow (executeCollect, sorts,
      // shuffles all cast) — project like SortMergeJoin's resultProj
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      new Iterator[InternalRow] {
        // null keys/times never match (SQL semantics; getLong on a null
        // slot would silently read 0) — skip such rows on both sides
        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rKeyOrd) && !r.isNullAt(rTimeOrd)) return r.copy()
          }
          null
        }
        private var rNext: InternalRow = advanceRight()
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Long = 0L
        private var ready: InternalRow = null
        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            if (!l.isNullAt(lKeyOrd) && !l.isNullAt(lTimeOrd)) {
              val lk = l.getLong(lKeyOrd)
              val lt = l.getLong(lTimeOrd) // timestamp = micros as long
              // advance the right side while it is still "at or before"
              // the current left position in (key, time) order
              while (rNext != null && {
                val rk = rNext.getLong(rKeyOrd)
                rk < lk || (rk == lk && rNext.getLong(rTimeOrd) <= lt)
              }) {
                if (rNext.getLong(rKeyOrd) == lk) {
                  lastMatch = rNext // already copied on ingest
                  lastMatchKey = lk
                }
                rNext = advanceRight()
              }
              if (lastMatch != null && lastMatchKey == lk) {
                return resultProj(joined(l, lastMatch))
              } // else: inner join — drop the unmatched left row
            }
          }
          null
        }
        override def hasNext: Boolean = {
          if (ready == null) ready = computeNext()
          ready != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = ready; ready = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  /** INNER as-of join: each left row paired with the latest right row
    * of the same key with time ≤ left time; unmatched left rows drop.
    * Registers [[AsOfStrategy]] on the session (idempotent). */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    def attr(df: DataFrame, name: String): Attribute = {
      val matches = df.queryExecution.analyzed.output.filter(_.name == name)
      require(matches.nonEmpty, s"no column $name")
      require(matches.size == 1,
        s"ambiguous column $name (${matches.size} matches) — rename before joining")
      matches.head
    }
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
