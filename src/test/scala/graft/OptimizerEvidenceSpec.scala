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

  test("correlated subqueries decorrelate to hash joins — no nested-loop cliff") {
    // a non-equi correlate (e.g. `o2.o_orderkey <> o.o_orderkey` inside
    // the scalar subquery) silently degrades to BroadcastNestedLoopJoin:
    // orders×orders pairs in one task — fine at the sf0.01 gate, a
    // 25-minute single-thread wedge at sf0.1. Pin the plan shape.
    val plan = graft.operators.Analytics.sqlCorrelated(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan.take(900))
  }

  test("CBO: ANALYZE TABLE statistics flip a stats-less join to broadcast") {
    // the dim must be a PARTITIONED catalog table: a non-partitioned
    // datasource table derives sizeInBytes from the file listing and
    // broadcasts with or without ANALYZE (the pre-assert below would
    // fail) — only CatalogFileIndex defaults to the "huge" size that
    // makes the plan genuinely stats-dependent
    val warehouse = java.nio.file.Files.createTempDirectory("graft_cbo_").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    try {
      Tables.nation(spark, sf).write.mode("overwrite")
        .partitionBy("n_regionkey")
        .option("path", s"$warehouse/nation_t").saveAsTable("nation_t")
      // the probe side must be partitioned too — its file-listing size
      // is small at test SF and Spark would broadcast IT pre-ANALYZE.
      // Partition it by a column the query never touches: a predicate on
      // the partition column (even the join's IsNotNull) would trigger
      // PruneFileSourcePartitions, which swaps in a file-listing index
      // with REAL sizes and defeats the stats-less setup
      Tables.customer(spark, sf).write.mode("overwrite")
        .partitionBy("c_mktsegment")
        .option("path", s"$warehouse/cust_t").saveAsTable("cust_t")
      def joinPlan = spark.table("cust_t")
        .join(spark.table("nation_t"), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name").count()
        .queryExecution.executedPlan.toString
      // without stats the 25-row dim is assumed huge: no broadcast
      assert(!joinPlan.contains("BroadcastHashJoin"),
        s"pre-ANALYZE plan already broadcasts — test proves nothing\n${joinPlan.take(800)}")
      spark.sql("ANALYZE TABLE nation_t COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE cust_t COMPUTE STATISTICS")
      assert(joinPlan.contains("BroadcastHashJoin"), joinPlan.take(800))
      val stats = spark.sql("DESCRIBE EXTENDED nation_t")
        .filter($"col_name" === "Statistics").collect()
      assert(stats.nonEmpty && stats.head.getString(1).contains("rows"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS nation_t")
      spark.sql("DROP TABLE IF EXISTS cust_t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
    }
  }
}
