package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.operators.TpchSuite

/** Plan-shape evidence for the round-4 TPC-H completions (Q2, Q7–Q9,
  * Q11–Q17, Q20–Q22 — correctness is oracle-gated per query; these
  * pin the SCALE claims the scaladocs make). */
class TpchSuitePlanSpec extends SparkSuite {

  test("q2/q16: dim legs broadcast; q2 top-k never global-sorts") {
    val q2Plan = walkPlan(TpchSuite.q2(spark, sf)).map(_.nodeName)
    assert(q2Plan.exists(_.contains("BroadcastHashJoin")),
      "supplier/nation/region and filtered part must broadcast")
    assert(q2Plan.exists(_.contains("TakeOrderedAndProject")),
      "ORDER BY + LIMIT 100 must not global-sort")
    assert(q2Plan.exists(_.contains("Window")),
      "the correlated MIN must compile to a window, not a fact re-scan")
    val q16Plan = walkPlan(TpchSuite.q16(spark, sf)).map(_.nodeName)
    assert(q16Plan.exists(_.contains("BroadcastHashJoin")),
      "part filter must broadcast into the pair relation")
  }

  test("q21: semi+anti reuse one orderkey partitioning — exactly 5 exchanges") {
    // Pin the shuffle topology deterministically: no AQE replanning, no
    // size-based broadcast (the supplier hint still broadcasts). The
    // expected 5: the late-line fact leg, the orders leg, the two
    // self-join legs, and the final s_name aggregate. A 6th exchange
    // would mean the probe side re-shuffles between the semi and anti
    // joins — the regression this test exists to catch.
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val plan = walkPlan(TpchSuite.q21(spark, sf))
      val names = plan.map(_.nodeName)
      assert(names.exists(_.contains("SortMergeJoin")) ||
        names.exists(_.contains("ShuffledHashJoin")))
      val shuffles = plan.count(_.isInstanceOf[ShuffleExchangeLike])
      assert(shuffles == 5,
        s"expected 5 exchanges (3 lineitem legs + orders + final agg), got $shuffles")
    }
  }

  test("q15: scalar MAX is a dim-scale window — one lineitem scan, structurally") {
    val plan = walkPlan(TpchSuite.q15(spark, sf))
    val factScans = plan.count(p =>
      p.nodeName.contains("Scan") && p.toString.contains("lineitem"))
    assert(factScans == 1,
      s"revenue view must be computed once, got $factScans fact scans")
  }

  test("q13: zero-order customers survive the outer join with c_count = 0") {
    val rows = TpchSuite.q13(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("custdist")).sum
    val custs = graft.sources.Tables.customer(spark, sf).count()
    assert(total == custs,
      "histogram must partition ALL customers, including zero-order ones")
  }
}
