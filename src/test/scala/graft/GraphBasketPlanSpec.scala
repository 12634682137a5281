package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.operators.{Graph, MarketBasket, TpchQueries}

/** Plan-shape assertions for the round-3 additions: the claims the
  * scale notes make must be visible in the executed plans. */
class GraphBasketPlanSpec extends SparkSuite {
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    walkPlan(df).map(_.nodeName).mkString("\n")

  private def shuffles(df: DataFrame): Int =
    walkPlan(df).count(_.isInstanceOf[ShuffleExchangeLike])

  test("pagerank iteration: edge table never shuffles — broadcast rank join only") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val und = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    val deg = und.groupBy($"src").agg(count(lit(1)).as("deg"))
    val eDeg = und.join(deg, Seq("src"))
    val ranks0 = deg.select($"src".as("node"), lit(1.0).as("rank"))
    val step = Graph.pageRankStep(eDeg, ranks0, 0.85)
    val plan = planOf(step)
    assert(plan.contains("BroadcastHashJoin"),
      s"rank state must broadcast into the edge join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"edge table must not shuffle for the rank join:\n$plan")
  }

  test("pagerank co-keyed regime: no broadcast in the iteration plan") {
    // past the rank-state row bound the step must co-key, not broadcast
    // (the bfsStep pattern): pre-partitioned edges + shuffle_hash ranks
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val und = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    val deg = und.groupBy($"src").agg(count(lit(1)).as("deg"))
    val eDeg = und.join(deg, Seq("src")).repartition($"src")
      .localCheckpoint(eager = true)
    val ranks0 = deg.select($"src".as("node"), lit(1.0).as("rank"))
    val step = Graph.pageRankStep(eDeg, ranks0, 0.85, broadcastOk = false)
    val plan = planOf(step)
    assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastHashJoin"),
      s"co-keyed regime must not broadcast the rank state:\n$plan")
  }

  test("pagerank: all three regimes produce identical ranks") {
    // the per-round arithmetic is integer-quantized, so the driver
    // small regime (default at this edge count), a forced broadcast
    // run, and a forced co-keyed run (broadcastRowLimit = 1) must all
    // be bit-identical — the regime switches cannot move the gate
    val edges = Graph.custSuppEdgesLong(spark, sf)
    val a = Graph.pageRank(edges).orderBy($"node").collect().toSeq
    val bcast = Graph.pageRank(edges, localEdgeLimit = 0)
      .orderBy($"node").collect().toSeq
    val cokeyed = Graph.pageRank(edges, broadcastRowLimit = 1, localEdgeLimit = 0)
      .orderBy($"node").collect().toSeq
    assert(a == bcast, "driver regime diverges from broadcast rounds")
    assert(bcast == cokeyed, "co-keyed rounds diverge from broadcast rounds")
  }

  test("tpch q5: all five dimension-side joins broadcast; <= 2 shuffles total") {
    val df = TpchQueries.q5(spark, sf)
    val plan = planOf(df)
    assert(!plan.contains("SortMergeJoin"),
      s"q5's dim chain must broadcast, not sort-merge:\n$plan")
    val n = shuffles(df)
    // lineitem⨝orders may shuffle or broadcast (AQE's call at this SF);
    // aggregate + tiny result sort account for the rest
    assert(n <= 3, s"q5 shuffle budget blown: $n")
  }

  test("assoc rules: pair counts partial-aggregate before their exchange") {
    val df = MarketBasket.assocRules(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // partial_count marks map-side combine on the (pa, pb) key
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"pair counting must map-side combine:\n${plan.take(1200)}")
  }

  test("parquet bloom filter: point lookup skips row groups min/max cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pbloom_").toString
    try {
      // high-cardinality UNSORTED key: every row group's [min, max]
      // straddles any probe value, so stats alone skip nothing
      val df = spark.range(0, 200000)
        .select((($"id" * 2654435761L) % 1000003L).as("k"), $"id".as("payload"))
      graft.operators.BloomLayout.write(df, s"$dir/bloom", "k", bloom = true)
      graft.operators.BloomLayout.write(df, s"$dir/plain", "k", bloom = false)
      val probe = df.filter($"k" === 12345L).count() // whatever exists: count parity
      val b = graft.operators.BloomLayout.pointQuery(spark, s"$dir/bloom", "k", 12345L)
      val p = graft.operators.BloomLayout.pointQuery(spark, s"$dir/plain", "k", 12345L)
      assert(b.count() == probe && p.count() == probe) // same answer
      b.collect(); p.collect()
      val bloomScanned = graft.operators.BloomLayout.rowsScanned(b)
      val plainScanned = graft.operators.BloomLayout.rowsScanned(p)
      assert(plainScanned == 200000L,
        s"plain layout must scan everything, got $plainScanned")
      assert(bloomScanned < plainScanned / 4,
        s"bloom must skip most row groups: $bloomScanned vs $plainScanned")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("token budget / quota sample windows are stratum-partitioned") {
    // the partition columns are the leading arguments of
    // windowspecdefinition(...) — assert on THAT position, not on the
    // substring appearing anywhere in the line (an ORDER BY column
    // would also match a bare contains)
    val tbWindows = graft.functions.Sampling.tokenBudget(spark, sf)
      .queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("windowspecdefinition")).mkString("\n")
    assert(tbWindows.contains("windowspecdefinition(source#"),
      s"budget walk must partition by source:\n$tbWindows")
    val qsWindows = graft.functions.Sampling.quotaSample(spark, sf)
      .queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("windowspecdefinition")).mkString("\n")
    assert(qsWindows.contains("windowspecdefinition(lang#") &&
      qsWindows.replaceAll("""windowspecdefinition\(lang#\d+""", "WSD")
        .contains("WSD, source#"),
      s"quota window must partition by (lang, source):\n$qsWindows")
  }
}
