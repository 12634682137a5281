package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MaterializedView
import graft.plans.MvRewrite

/** The MV auto-rewrite rule: serves matching aggregates from the
  * materialized partials, bit-exactly, and refuses everything it
  * cannot prove — the fail-closed half is what makes the rule safe to
  * leave enabled session-wide. */
class MvRewriteSpec extends SparkSuite {

  import spark.implicits._

  /** Build + register the daily MV, run `body` with the rule enabled,
    * always tear down (the session is shared across suites — a leaked
    * rule pointing at a deleted tmp dir would poison later suites). */
  private def withMv[T](body: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvspec_").toString
    try {
      val events = graft.sources.Tables.events(spark, sf)
      MaterializedView.dailyMv(events)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$tmp/mv")
      MaterializedView.registerDailyMv(spark, sf, s"$tmp/mv")
      MvRewrite.enable(spark)
      body(tmp)
    } finally {
      MvRewrite.disable(spark)
      MvRewrite.unregister("events_daily")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  private def usesMv(df: DataFrame, tmp: String): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains(tmp) && !plan.contains("events.parquet")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(ra == rb, s"rewritten/direct mismatch:\n$ra\nvs\n$rb")
  }

  private def rollupQuery = graft.sources.Tables.events(spark, sf)
    .filter(to_date($"ts") >= lit("2024-01-10") && $"event_type" =!= "error")
    .groupBy($"event_type")
    .agg(count(lit(1)).as("n"),
      sum($"value".cast("decimal(27,6)")).as("total_dec"),
      min($"value").as("min_value"), max($"value").as("max_value"))
    .orderBy($"event_type")

  test("dim-subset rollup rewrites to the MV and matches the direct answer bit-exactly") {
    withMv { tmp =>
      val rewritten = rollupQuery
      assert(usesMv(rewritten, tmp), "expected the MV scan in:\n" +
        rewritten.queryExecution.executedPlan)
      MvRewrite.disable(spark)
      val direct = rollupQuery
      assert(!usesMv(direct, tmp))
      MvRewrite.enable(spark)
      sameRows(rewritten, direct)
    }
  }

  test("exact-dim grouping (identity rollup) rewrites and matches") {
    withMv { tmp =>
      def q = graft.sources.Tables.events(spark, sf)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(27,6)")).as("total_dec"))
        .orderBy($"event_type", $"day")
      val rewritten = q
      assert(usesMv(rewritten, tmp))
      MvRewrite.disable(spark)
      val direct = q
      MvRewrite.enable(spark)
      sameRows(rewritten, direct)
    }
  }

  test("AVG of the decimal measure rewrites bit-exactly (divides by the non-null count)") {
    withMv { tmp =>
      // dim-subset rollup + dim filter + avg alongside the other
      // measures — the avg must come back as Average's own division
      // over the re-aggregated sum/count partials
      def q = graft.sources.Tables.events(spark, sf)
        .filter($"event_type" =!= "error")
        .groupBy($"event_type")
        .agg(avg($"value".cast("decimal(27,6)")).as("avg_dec"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
      val rewritten = q
      assert(usesMv(rewritten, tmp), "expected the MV scan in:\n" +
        rewritten.queryExecution.executedPlan)
      MvRewrite.disable(spark)
      val direct = q
      assert(!usesMv(direct, tmp))
      MvRewrite.enable(spark)
      sameRows(rewritten, direct)
      // avg of a DOUBLE measure must NOT rewrite: its sum partial is
      // order-dependent and was never registered
      val dblAvg = graft.sources.Tables.events(spark, sf)
        .groupBy($"event_type").agg(avg($"value").as("a"))
      val plan = dblAvg.queryExecution.executedPlan.toString
      assert(plan.contains("events.parquet") && !plan.contains(tmp),
        s"avg(double) must NOT rewrite, got:\n$plan")
    }
  }

  test("fail-closed: every unprovable shape keeps the base scan") {
    withMv { tmp =>
      val events = graft.sources.Tables.events(spark, sf)
      val cases: Seq[(String, DataFrame)] = Seq(
        // double sum: order-dependent, partials would change the bits
        "sum(double)" -> events.groupBy($"event_type").agg(sum($"value").as("s")),
        // filter on a non-dim column
        "non-dim filter" -> events.filter($"value" > 5.0)
          .groupBy($"event_type").agg(count(lit(1)).as("n")),
        // timestamp bound not on a day boundary
        "mid-day bound" -> events
          .filter($"ts" >= lit("2024-01-10 12:00:00").cast("timestamp"))
          .groupBy($"event_type").agg(count(lit(1)).as("n")),
        // global aggregate: SUM-of-partials over an empty MV is NULL
        // where COUNT over an empty base is 0
        "global agg" -> events.agg(count(lit(1)).as("n")),
        // distinct count has no mergeable partial in the MV
        "count distinct" -> events.groupBy($"event_type")
          .agg(countDistinct($"user_id").as("u")),
        // aggregate on an unregistered measure
        "unregistered measure" -> events.groupBy($"event_type")
          .agg(min($"user_id").as("m")),
        // grouping on a non-dim
        "non-dim grouping" -> events.groupBy($"user_id")
          .agg(count(lit(1)).as("n")),
        // non-deterministic row filter: over the MV it would become a
        // GROUP filter — a different sampling distribution entirely.
        // (0.5, not an always-true bound: the optimizer knows rand's
        // range and would delete an always-true filter outright,
        // making the case vacuous)
        "non-deterministic filter" -> events.filter(rand() < 0.5)
          .groupBy($"event_type").agg(count(lit(1)).as("n")))
      for ((label, df) <- cases) {
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("events.parquet") && !plan.contains(tmp),
          s"$label must NOT rewrite, got:\n$plan")
      }
    }
  }

  test("disable removes the rule; unregister empties the registry") {
    withMv { tmp =>
      MvRewrite.disable(spark)
      assert(!usesMv(rollupQuery, tmp))
      MvRewrite.enable(spark)
      MvRewrite.unregister("events_daily")
      assert(!usesMv(rollupQuery, tmp))
      // re-register so withMv's teardown has something to remove
      MaterializedView.registerDailyMv(spark, sf, s"$tmp/mv")
      assert(usesMv(rollupQuery, tmp))
    }
  }
}
