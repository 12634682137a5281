package graft

import org.apache.spark.sql.functions._
import graft.operators.Behavioral
import graft.sources.Tables

/** Optimizer features the library leans on, pinned so a regression (or
  * a future refactor that accidentally defeats them) fails loudly. */
class OptimizerEvidenceSpec extends SparkSuite {
  import spark.implicits._

  test("rank<=k filter compiles to WindowGroupLimit (no full per-group sort spill)") {
    // Spark 3.5+ rewrites rank-filter windows to a bounded group-limit
    // operator — the optimizer-native form of the heap aggregate
    // (Behavioral.topKPerGroupHeap exists for when this CAN'T fire).
    val plan = Behavioral.topKPerGroup(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("CBO: ANALYZE TABLE statistics flip a stats-less join to broadcast") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_cbo_").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    try {
      Tables.nation(spark, sf).write.mode("overwrite")
        .option("path", s"$warehouse/nation_t").saveAsTable("nation_t")
      Tables.customer(spark, sf).write.mode("overwrite")
        .option("path", s"$warehouse/cust_t").saveAsTable("cust_t")
      def joinPlan = spark.table("cust_t")
        .join(spark.table("nation_t"), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").count()
        .queryExecution.executedPlan.toString
      // with stats gathered, the planner must pick broadcast for the
      // 25-row dim side without any hint
      spark.sql("ANALYZE TABLE nation_t COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cust_t COMPUTE STATISTICS")
      assert(joinPlan.contains("BroadcastHashJoin"), joinPlan.take(800))
      val stats = spark.sql("DESCRIBE EXTENDED nation_t")
        .filter($"col_name" === "Statistics").collect()
      assert(stats.nonEmpty && stats.head.getString(1).contains("rows"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS nation_t")
      spark.sql("DROP TABLE IF EXISTS cust_t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
    }
  }
}
