package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spill-under-pressure proof — the most common 100×-scale-up failure
  * is an operator that OOMs instead of degrading to disk. These specs
  * squeeze the two stateful hot paths (hash aggregation, window
  * buffering) with session-level pressure knobs, assert the operators
  * actually SPILL (task metrics > 0), and assert the answers are
  * byte-identical to the unpressured run. The knobs are Spark's own
  * pressure-simulation confs, so this exercises the production spill
  * code paths (UnsafeKVExternalSorter / ExternalAppendOnlyUnsafeRowArray),
  * not a mock.
  */
class SpillSpec extends SparkSuite {
  import spark.implicits._

  /** Run `action` and return (result, bytesSpilled) summed over all
    * tasks. Listener events are async — poll until the counter is
    * stable. */
  private def withSpillMetrics[T](action: => T): (T, Long) = {
    val spilled = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val result = action
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 100) { // stable = 3 × 100 ms quiet
        Thread.sleep(100)
        waited += 1
        if (spilled.get == last) stable += 1 else { stable = 0; last = spilled.get }
      }
      (result, spilled.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq

  test("hash aggregation degrades to sort-based spill, answers unchanged") {
    // a wide-key aggregate (one group per orderkey — the dedup-stage /
    // fingerprint shape); testFallbackStartsAt caps the hash map at 100
    // keys, forcing the sort-based fallback over the remaining ~15k
    val agg = () => graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(27,6)")).as("q"))
      .orderBy($"l_orderkey")
    val baseline = rows(agg())
    val (pressured, spilled) = withConfs(Map(
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "100,100",
      "spark.sql.codegen.aggregate.map.twolevel.enabled" -> "false")) {
      withSpillMetrics(rows(agg()))
    }
    assert(spilled > 0, "aggregation never spilled — pressure knob inert")
    assert(pressured == baseline)
  }

  test("window buffering spills per-group state to disk, answers unchanged") {
    // running-totals window (q_running_totals' shape): few partitions ×
    // thousands of buffered rows each; an 8-row in-memory buffer forces
    // ExternalAppendOnlyUnsafeRowArray onto its disk path
    val win = () => graft.operators.WindowOps.runningTotals(spark, sf)
    val baseline = rows(win())
    val (pressured, spilled) = withConfs(Map(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "8",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16")) {
      withSpillMetrics(rows(win()))
    }
    assert(spilled > 0, "window never spilled — pressure knob inert")
    assert(pressured == baseline)
  }
}
