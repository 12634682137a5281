package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampType}

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
  * blow-up.
  *
  * Semantics:
  *  - INNER (default): unmatched or null-keyed left rows are dropped,
  *    matching both oracles (the window composition's equi-join and
  *    DuckDB's ASOF JOIN are inner).
  *  - LEFT OUTER: unmatched left rows (including null-keyed ones, per
  *    SQL outer-join semantics) are emitted with a null right side.
  *  - Duplicate (key, time) rows on the RIGHT: the surviving match is
  *    whichever sorts last, and the sort is only on (key, time) — the
  *    payload of the match is therefore NOT deterministic across runs
  *    for such inputs (same caveat as DuckDB's ASOF JOIN). Deduplicate
  *    the right side first if its (key, time) pairs are not unique.
  *
  * Supported shapes (asserted at construction): key Int or Long, time
  * Timestamp, Date, or Long — both sides must agree on each type.
  *
  * `tolerance` (−1 = unbounded): a match is valid only while
  * leftTime − rightTime ≤ tolerance (pandas merge_asof semantics —
  * a nearest match farther than the tolerance is NO match, never "use
  * an older one"). Units are the time column's physical units: micros
  * for Timestamp, days for Date, raw for Long.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    isLeftOuter: Boolean, tolerance: Long = -1L) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    isLeftOuter: Boolean, tolerance: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
                    else right.output)

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

  /** Physical accessor for the supported key/time types, normalized to
    * Long (Int/Date are day- or key-width ints; Timestamp is micros as
    * long) — ordering is preserved by the widening, which is all the
    * merge walk needs. */
  private def longGetter(dt: DataType): (InternalRow, Int) => Long = dt match {
    case LongType | TimestampType => (r, i) => r.getLong(i)
    case IntegerType | DateType => (r, i) => r.getInt(i).toLong
    case other => throw new IllegalStateException(
      s"AsOfJoinExec: unsupported physical type $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexOf(leftKey)
    val lTimeOrd = left.output.indexOf(leftTime)
    val rKeyOrd = right.output.indexOf(rightKey)
    val rTimeOrd = right.output.indexOf(rightTime)
    require(lKeyOrd >= 0 && lTimeOrd >= 0 && rKeyOrd >= 0 && rTimeOrd >= 0)
    val keyGet = longGetter(leftKey.dataType)
    val timeGet = longGetter(leftTime.dataType)
    val outputAttrs = output
    val outer = isLeftOuter
    val rightArity = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      // all-null right side for outer no-match rows (GenericInternalRow
      // initializes to nulls; the projection below null-checks per field)
      val nullRight = new GenericInternalRow(rightArity)
      // downstream operators assume UnsafeRow (executeCollect, sorts,
      // shuffles all cast) — project like SortMergeJoin's resultProj
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      new Iterator[InternalRow] {
        // null keys/times never MATCH (SQL semantics; a primitive read
        // on a null slot would silently yield 0) — inner drops such
        // rows, outer emits them with a null right side
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
        private var lastMatchTime: Long = 0L
        private var ready: InternalRow = null
        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            if (l.isNullAt(lKeyOrd) || l.isNullAt(lTimeOrd)) {
              if (outer) return resultProj(joined(l, nullRight))
              // else: inner — skip
            } else {
              val lk = keyGet(l, lKeyOrd)
              val lt = timeGet(l, lTimeOrd)
              // advance the right side while it is still "at or before"
              // the current left position in (key, time) order
              while (rNext != null && {
                val rk = keyGet(rNext, rKeyOrd)
                rk < lk || (rk == lk && timeGet(rNext, rTimeOrd) <= lt)
              }) {
                if (keyGet(rNext, rKeyOrd) == lk) {
                  lastMatch = rNext // already copied on ingest
                  lastMatchKey = lk
                  lastMatchTime = timeGet(rNext, rTimeOrd)
                }
                rNext = advanceRight()
              }
              // tolerance: the NEAREST candidate must be close enough —
              // an out-of-tolerance nearest match is a non-match, never
              // a fallback to an older row (pandas merge_asof contract).
              // The true gap is ≥ 0 (match time ≤ lt by the walk
              // invariant), so a NEGATIVE subtraction result can only
              // mean Long overflow on extreme raw-Long times — which is
              // by definition out of any tolerance: reject, don't wrap.
              def withinTolerance: Boolean = {
                if (tolerance < 0L) return true
                val gap = lt - lastMatchTime
                gap >= 0L && gap <= tolerance
              }
              if (lastMatch != null && lastMatchKey == lk && withinTolerance) {
                return resultProj(joined(l, lastMatch))
              } else if (outer) {
                return resultProj(joined(l, nullRight))
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
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer, tol) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {

  private val keyTypes: Set[DataType] = Set(IntegerType, LongType)
  private val timeTypes: Set[DataType] = Set(TimestampType, DateType, LongType)

  /** As-of join: each left row paired with the latest right row of the
    * same key with time ≤ left time. `joinType` "inner" (default, drops
    * unmatched left rows) or "left_outer" (keeps them, null right side).
    * Registers [[AsOfStrategy]] on the session (idempotent).
    *
    * Right-side rows with duplicate (key, time): see [[AsOfJoinPlan]] —
    * the matched payload is unstable under such duplicates; dedupe first
    * if they can occur. */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      joinType: String = "inner", tolerance: Long = -1L): DataFrame = {
    val isLeftOuter = joinType match {
      case "inner" => false
      case "left_outer" | "left" => true
      case other => throw new IllegalArgumentException(
        s"asofJoin supports inner | left_outer, got $other")
    }
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
    val leftPlan = leftDf.queryExecution.analyzed
    val rightPlan = rightDf.queryExecution.analyzed
    // self-joins / shared lineage: duplicate exprIds across sides would
    // make the output projection silently read left values for right
    // columns (binding is by exprId). Refuse loudly; aliasing re-ids.
    val sharedIds = leftPlan.output.map(_.exprId).toSet
      .intersect(rightPlan.output.map(_.exprId).toSet)
    require(sharedIds.isEmpty,
      s"left and right sides share ${sharedIds.size} attribute id(s) " +
        "(self-join or common lineage) — re-alias one side, e.g. " +
        "df.select(df.columns.map(c => col(c).as(c + \"_r\")): _*), before asofJoin")
    val (lk, lt) = (attr(leftDf, leftKey), attr(leftDf, leftTime))
    val (rk, rt) = (attr(rightDf, rightKey), attr(rightDf, rightTime))
    require(keyTypes.contains(lk.dataType) && lk.dataType == rk.dataType,
      s"asofJoin keys must both be Int or Long, got ${lk.dataType}/${rk.dataType}")
    require(timeTypes.contains(lt.dataType) && lt.dataType == rt.dataType,
      s"asofJoin times must both be Timestamp, Date, or Long, got " +
        s"${lt.dataType}/${rt.dataType}")
    DatasetBridge.ofRows(spark, AsOfJoinPlan(
      leftPlan, rightPlan, lk, rk, lt, rt, isLeftOuter, tolerance))
  }
}
