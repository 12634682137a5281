package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** Physical-plan invariants — the scale contract, asserted.
  *
  * Correctness says what a query returns; these tests pin HOW: filters
  * reach the parquet scan, column pruning holds, small dims broadcast,
  * the hot vector path stays inside WholeStageCodegen, and partition
  * pruning fires on the clustered layout. A regression here is a silent
  * 10-100× cliff at 100 TB even though every oracle still matches.
  */
class PlanSpec extends SparkSuite {

  private def planOf(df: DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect() // force AQE final plan
    // AQE prints materialized stages as opaque references — expand them
    def walk(p: SparkPlan): Seq[String] = {
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
      }.flatten
      p.toString +: nested
    }
    walk(df.queryExecution.executedPlan).mkString("\n---\n")
  }

  test("flagship scan: date filter pushed to parquet, columns pruned") {
    val plan = Analytics.monthlyAgg(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(800))
    assert(plan.contains("l_shipdate"), "pushed filter must name l_shipdate")
    // projection prunes to the 3 referenced columns
    assert(!plan.contains("l_orderkey"), "unused columns must not be read")
  }

  test("demand query: dims broadcast, fact side never broadcast") {
    val plan = planOf(Analytics.demandByZone(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    // nation+region enter via BroadcastExchange; orders must not
    val broadcasts = plan.split("BroadcastExchange").length - 1
    assert(broadcasts >= 2, s"expected >=2 broadcast exchanges, got $broadcasts")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = Analytics.demandByZone(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("custom vector expressions run inside WholeStageCodegen") {
    val knn = graft.functions.Similarity.knnBruteForce(spark, "/root/testdata/sf0.01", 3, 3)
    val plan = planOf(knn)
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string:
    // the scoring Project containing dotproduct must carry one
    val scoringLines = plan.split("\n").filter(_.contains("dotproduct"))
    assert(scoringLines.nonEmpty, plan.take(1200))
    assert(scoringLines.exists(_.contains("*(")),
      s"dotproduct not inside a codegen stage:\n${scoringLines.mkString("\n")}")
  }

  test("clustered layout: partition pruning reads only the filtered year") {
    val dir = "/tmp/graft_plan_spec_clustered"
    ClusteredLayout.writeClustered(spark, sf, dir)
    val pruned = ClusteredLayout.readClustered(spark, dir)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    val years = spark.read.parquet(dir)
      .select("ship_year").distinct().count()
    assert(years > 1, "layout must actually span multiple years")
    assert(pruned.select("ship_year").distinct().count() == 1)
  }

  test("fact build: every dim join is a broadcast join (no fact shuffle per dim)") {
    val plan = planOf(GoldFact.fctTrips(spark, sf).limit(1))
    val bhj = plan.split("BroadcastHashJoin").length - 1
    assert(bhj >= 4, s"expected >=4 broadcast dim joins, got $bhj\n${plan.take(800)}")
  }
}

class CsvSourceSpec extends SparkSuite {

  test("CSV source: header + uppercase normalization round-trip (S5)") {
    import spark.implicits._
    val dir = "/tmp/graft_csv_spec"
    // build a zones-lookup-like CSV from the nation table
    graft.sources.Tables.nation(spark, sf)
      .select($"n_nationkey".as("locationid"), $"n_name".as("zone"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val back = graft.sources.Ingest.readCsv(spark, dir)
    assert(back.columns.toSeq == Seq("LOCATIONID", "ZONE"))
    assert(back.count() == 25)
  }
}
