package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Skyline}

/** BFS traversal, skyline dominance, and the runtime bloom-filter
  * join-pruning surface. */
class GraphSkylineSpec extends SparkSuite {
  import spark.implicits._

  private def edges(pairs: (String, String)*) = {
    val d = pairs.toDF("a", "b")
    d.unionByName(d.select($"b".as("a"), $"a".as("b")))
  }

  test("bfs: min hop wins on multi-path graphs, cycles terminate") {
    // a-b-c-d chain plus a shortcut a-d and a cycle b-c.
    // localEdgeLimit 0 forces the distributed loop; the default runs
    // the driver small regime — both must agree on every property.
    val e = edges(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("c", "b"))
    for (localLimit <- Seq(0L, Graph.GraphLocalEdgeLimit)) {
      val out = Graph.bfsHops(e, Seq("a").toDF("node"), maxHops = 10,
          localEdgeLimit = localLimit)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      // d is 1 hop via the shortcut even though the chain path is 3
      assert(out == Map("a" -> 0, "b" -> 1, "d" -> 1, "c" -> 2),
        s"localEdgeLimit=$localLimit")
    }
  }

  test("bfs: unreachable nodes absent; maxHops truncates the walk") {
    val e = edges(("a", "b"), ("b", "c"), ("x", "y")) // two components
    for (localLimit <- Seq(0L, Graph.GraphLocalEdgeLimit)) {
      val out = Graph.bfsHops(e, Seq("a").toDF("node"), maxHops = 10,
          localEdgeLimit = localLimit)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(!out.contains("x") && !out.contains("y"))
      val capped = Graph.bfsHops(e, Seq("a").toDF("node"), maxHops = 1,
          localEdgeLimit = localLimit)
        .collect().map(_.getString(0)).toSet
      assert(capped == Set("a", "b")) // c is 2 hops out — beyond the cap
    }
  }

  test("bfs: co-keyed regime above the broadcast row limit, same answers") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val e = edges(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
    // three-regime parity: driver small regime (default), distributed
    // broadcast rounds, and co-keyed shuffle rounds all agree
    val local = Graph.bfsHops(e, Seq("a").toDF("node"), maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val small = Graph.bfsHops(e, Seq("a").toDF("node"), maxHops = 10,
      localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val sharded = Graph.bfsHops(e, Seq("a").toDF("node"), maxHops = 10,
      broadcastRowLimit = 0, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(local == small && small == sharded && small("c") == 2)
    // declared plan shape: broadcastOk=false must not REQUEST a broadcast
    // for either the frontier probe or the visited anti-join (AQE may
    // still shrink a tiny side at runtime — that's its call, not ours)
    val frontier = Seq("a").toDF("node")
    val visited = Seq(("a", 0)).toDF("node", "hop")
    def broadcastJoins(ok: Boolean) =
      Graph.bfsStep(e.toDF("a", "b"), frontier, visited, 1, broadcastOk = ok)
        .queryExecution.sparkPlan.collect { case b: BroadcastHashJoinExec => b }
    // (exact count is unstable — Catalyst duplicates the anti-join when
    // pushing it below the edge-direction union)
    assert(broadcastJoins(ok = true).nonEmpty)
    assert(broadcastJoins(ok = false).isEmpty)
  }

  test("triangles: degree orientation keeps hub wedges at Σ min-deg², not Σ deg²") {
    import spark.implicits._
    // hub 500 with 400 in-id leaves and 100 out-id leaves: id orientation
    // would generate 400·100 = 40k wedges at the hub; degree orientation
    // points every leaf edge AT the hub, so the hub generates none.
    val hubEdges = (1L to 400L).map(i => (i, 500L)) ++
      (501L to 600L).map(j => (500L, j))
    val triEdges = Seq((900L, 901L), (900L, 902L), (901L, 902L))
    val e = (hubEdges ++ triEdges).toDF("pa", "pb")
    // generated wedge frame: 1 row (the 900-centered pair), not 40_001
    assert(Graph.orientedWedges(e).count() == 1L)
    val r = Graph.triangleCounts(e).collect().head
    assert(r.getLong(0) == 503L)   // edges
    assert(r.getLong(1) == 40001L) // id-form path₂ count (closed form)
    assert(r.getLong(2) == 1L)     // the planted triangle, exactly once
  }

  test("pagerank: matches a plain-Scala reference walk step for step") {
    // star graph plus a chain — asymmetric degrees so ranks separate
    val pairs = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"), ("c", "d"))
    val e = edges(pairs: _*)
    // default = driver small regime; localEdgeLimit 0 = distributed
    // rounds — BOTH must match the sequential reference bit for bit
    val out = Graph.pageRank(e, damping = 0.85, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Graph.pageRank(e, damping = 0.85, iters = 10, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == dist, "driver and distributed PageRank regimes diverge")
    // reference implementation: same quantized update rule, sequential
    val undirected = pairs.flatMap(p => Seq(p, p.swap))
    val deg = undirected.groupBy(_._1).map { case (n, es) => n -> es.size }
    var rank = deg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 10) {
      val in = undirected.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          math.floor(rank(src) / deg(src) * 1e6).toLong }.sum
      }
      rank = rank.keys.map(n => n -> ((1.0 - 0.85) + 0.85 * (in(n).toDouble / 1e6))).toMap
    }
    assert(out.keySet == rank.keySet)
    rank.foreach { case (n, r) => assert(out(n) == r, s"node $n") }
    // the hub out-ranks every leaf
    assert(out("h") > out("a") && out("h") > out("d"))
  }

  test("skyline: strict-dominance semantics, ties on both axes kept") {
    val rows = Seq(
      (1L, 100.0, "2024-01-05"), // dominated by 3 (higher price, earlier date)
      (2L, 200.0, "2024-01-10"), // frontier: highest price
      (3L, 150.0, "2024-01-01"), // frontier: earliest date at its price level
      (4L, 150.0, "2024-01-01"), // exact tie with 3 — both kept
      (5L, 150.0, "2024-01-02"), // dominated by 3/4 (same price, later date)
      (6L, 200.0, "2024-01-10")  // exact tie with 2 — both kept
    ).toDF("o_orderkey", "o_totalprice", "d")
      .withColumn("o_orderdate", to_timestamp($"d")).drop("d")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_orderpriority", lit("1-URGENT"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sky_").toString
    try {
      rows.write.parquet(s"$dir/orders.parquet")
      val keys = Skyline.orderSkyline(spark, dir).collect().map(_.getLong(0)).toSeq
      assert(keys == Seq(2L, 3L, 4L, 6L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("clamped balance: floor and cap both bind; order is ts then event_id") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bal_").toString
    try {
      // one user: +150, +550 (caps at 500), -∞ push (floors at 0), +10
      // two events share a timestamp -> event_id breaks the tie
      val rows = Seq(
        (1L, "2024-01-01 10:00:00", 200.0), // bal 150
        (2L, "2024-01-01 10:01:00", 600.0), // 150+550=700 -> cap 500
        (3L, "2024-01-01 10:02:00", 0.0),   // 500-50=450
        (4L, "2024-01-01 10:03:00", -900.0), // -> floor 0
        (6L, "2024-01-01 10:04:00", 60.0),  // same ts as 5, larger id: SECOND
        (5L, "2024-01-01 10:04:00", 55.0))  // same ts, smaller id: FIRST -> 5
        .map { case (id, t, v) => (id, 7L, t, v) }
        .toDF("event_id", "user_id", "t", "value")
        // Tables.events expects the testdata's physical layout: ts as an
        // int64 NANOS column (decoded via nanosAsLong + div 1000)
        .select($"event_id", (unix_micros(to_timestamp($"t")) * 1000L).as("ts"),
          $"user_id", lit("x").as("event_type"), $"value", lit("{}").as("props"))
      rows.write.parquet(s"$dir/events.parquet")
      val out = graft.operators.StatefulBatch.clampedBalance(spark, dir)
        .collect().map(r => r.getLong(1) -> r.getDouble(2))
      assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
      assert(out.map(_._2).toSeq == Seq(150.0, 500.0, 450.0, 0.0, 5.0, 15.0))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("skyline distributivity: skyline(S) == skyline(skyline(S1) ∪ skyline(S2)) (randomized)") {
    // the property SCALE.md's local-skyline-per-partition path rests on
    val rnd = new scala.util.Random(7)
    def refSkyline(pts: Seq[(Double, Int)]): Set[(Double, Int)] =
      pts.filter(b => !pts.exists(a =>
        a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2))).toSet
    (1 to 20).foreach { _ =>
      val pts = Seq.fill(120)((rnd.nextInt(40).toDouble, rnd.nextInt(40)))
      val (s1, s2) = pts.splitAt(60)
      val direct = refSkyline(pts)
      val merged = refSkyline((refSkyline(s1) ++ refSkyline(s2)).toSeq)
      assert(merged == direct)
    }
  }

  test("clamped balance == plain-Scala fold on randomized event streams") {
    val rnd = new scala.util.Random(11)
    val dir = java.nio.file.Files.createTempDirectory("graft_balp_").toString
    try {
      val rows = (1L to 400L).map { id =>
        (id, (id % 7) + 1, 1700000000L + rnd.nextInt(100000),
          math.rint(rnd.between(-20.0, 120.0) * 100) / 100)
      }
      rows.toDF("event_id", "user_id", "ts_s", "value")
        .select($"event_id", ($"ts_s" * 1000000L * 1000L).as("ts"), $"user_id",
          lit("x").as("event_type"), $"value", lit("{}").as("props"))
        .write.parquet(s"$dir/events.parquet")
      val got = graft.operators.StatefulBatch.clampedBalance(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // reference: sequential fold per user in (ts, event_id) order
      val expect = rows.groupBy(_._2).flatMap { case (uid, es) =>
        var bal = 0.0
        es.sortBy(e => (e._3, e._1)).map { e =>
          bal = math.min(math.max(bal + e._4 - 50.0, 0.0), 500.0)
          (uid, e._1) -> bal
        }
      }
      assert(got.size == expect.size)
      expect.foreach { case (k, v) => assert(got(k) == v, s"at $k") }
      // invariant: every balance within [floor, cap]
      got.values.foreach(b => assert(b >= 0.0 && b <= 500.0))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("runtime bloom filter: selective dim filter is pushed to the fact scan") {
    // The 100 TB shape: a shuffle join where the dim side carries a
    // selective predicate — Spark's InjectRuntimeFilter should plant a
    // bloom-filter semi-filter on the fact side so non-joining fact rows
    // die at the scan instead of crossing the shuffle. Thresholds are
    // lowered because the gate-SF tables are far below the 10 GB default.
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom_").toString
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    try withConfs(confs) {
      spark.range(0, 100000).select($"id".as("fact_key"),
        ($"id" % 97).as("payload")).write.parquet(s"$dir/fact")
      spark.range(0, 5000).select($"id".as("dim_key"),
        ($"id" % 7).as("seg")).write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"seg" === 3)
      val joined = fact.join(dim, $"fact_key" === $"dim_key")
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$plan")
      // and it actually filters: result matches the no-filter join
      assert(joined.count() == (0 until 5000).count(_ % 7 == 3))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }
}
