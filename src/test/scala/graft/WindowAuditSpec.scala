package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.WindowAudit

/** Mechanics of the in-band global-window tripwire: the audit must see
  * a planted partitionless window through optimization, must not count
  * partitioned ones, and the sanctioned catalogue must track real
  * query names (a rename would otherwise silently un-sanction or
  * orphan an entry). The end-to-end enforcement runs inside Verify on
  * every gate. */
class WindowAuditSpec extends SparkSuite {
  import spark.implicits._

  test("planted global window is detected and fails an unsanctioned query") {
    val df = spark.range(10)
      .withColumn("rn", row_number().over(Window.orderBy($"id")))
    assert(WindowAudit.globalWindows(df.queryExecution.optimizedPlan) == 1)
    val e = intercept[IllegalStateException] {
      WindowAudit.assertSanctioned("q_definitely_not_sanctioned", df)
    }
    assert(e.getMessage.contains("window audit"))
  }

  test("partitioned windows do not count") {
    val df = spark.range(10).withColumn("g", $"id" % 3)
      .withColumn("rn", row_number().over(Window.partitionBy($"g").orderBy($"id")))
    assert(WindowAudit.globalWindows(df.queryExecution.optimizedPlan) == 0)
    WindowAudit.assertSanctioned("q_anything", df) // no throw
  }

  test("sanctioned catalogue names are registered queries") {
    val registered = SparkEntry.queries.keySet
    val unknown = WindowAudit.Sanctioned.keySet -- registered
    assert(unknown.isEmpty, s"catalogue entries with no query: $unknown")
  }

  test("sanctioned queries plan exactly their catalogued window count") {
    // the catalogue is a CLOSED list: each sanctioned query must still
    // need its allowance (an over-allowance would hide a regression)
    val sf = "/root/testdata/sf0.001"
    WindowAudit.Sanctioned.foreach { case (name, allowed) =>
      val n = WindowAudit.globalWindows(
        SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan)
      assert(n == allowed,
        s"$name plans $n global windows, catalogued $allowed")
    }
  }
}
