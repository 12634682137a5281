package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed graph traversal — BFS shortest hops.
  *
  * The reference's relational surface has no graph operator, but its
  * entity graph is implicit in the foreign keys (customer —order—
  * supplier); "how far is X from Y" questions (fraud rings, supply-
  * chain blast radius, entity resolution) need a traversal the join
  * operators can't express in bounded form. This is the canonical
  * BFS-as-iterated-join: a frontier frame expands one hop per round
  * through the edge table, an anti-join against the visited set keeps
  * the labelling minimal, and `localCheckpoint` per round truncates
  * the growing lineage (same iterative shape as the dedup label
  * propagation, [[graft.functions.Dedup]]).
  *
  * Scale: each round is one join frontier⋈edges plus one anti-join
  * against the visited set — cost ∝ edges incident to the frontier,
  * not the whole graph; rounds = graph diameter (small-world graphs:
  * single digits). Both node-sized frames are BROADCAST only while
  * they fit an executor: the loop counts each round anyway (the
  * termination check), so the exact sizes are free, and once either
  * crosses `broadcastRowLimit` the round switches to co-keyed shuffle
  * joins on `node` — `visited` grows toward all reachable nodes, so a
  * broadcast there is unbounded on large graphs. The driver sees only
  * per-round counts, never rows. Pregel engines specialize exactly
  * this loop; expressing it over DataFrames keeps it inside
  * Catalyst/Tungsten with no extra runtime.
  */
object Graph {

  /** Above this many visited/frontier rows the per-round joins stop
    * broadcasting and become co-keyed shuffles. ~10M string-keyed rows
    * is comfortably inside one executor; the 8 GiB broadcast hard
    * limit sits far above it. */
  val BfsBroadcastRowLimit: Long = 10L * 1000 * 1000

  /** Below this many EDGE rows the iterative graph operators run their
    * whole loop on the driver over the collected edge list — the same
    * small-regime switch discipline as
    * [[graft.functions.Dedup.ClusterLocalPairLimit]]: a 10-round
    * distributed iteration pays 10-20 Spark jobs of pure scheduling
    * overhead to traverse a graph whose edge list is a few MB, while
    * the driver loop is milliseconds and — because hop counts are
    * integers and rank contributions are floor-quantized longs summed
    * exactly — BIT-identical to the distributed rounds (regime parity
    * asserted in GraphSkylineSpec/GraphBasketPlanSpec). 2M edge rows
    * ≈ 32 MB of packed longs; past the bound the distributed loop
    * takes over and the driver sees only per-round counts. Var so
    * specs can force either regime. */
  private[graft] var GraphLocalEdgeLimit: Long = 2L * 1000 * 1000

  /** Min-hop distance from `seed` to every reachable node, capped at
    * `maxHops`. `edges` must be directed pairs (a, b); pass both
    * directions for an undirected walk. */
  def bfsHops(edges: DataFrame, seed: DataFrame, maxHops: Int,
      broadcastRowLimit: Long = BfsBroadcastRowLimit,
      localEdgeLimit: Long = GraphLocalEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.toDF("a", "b").localCheckpoint(eager = true)
    if (e.count() <= localEdgeLimit) return bfsLocal(e, seed, maxHops)
    // seeds are a node SET: distinct here keeps the distributed regime
    // value-identical to the driver loop (whose visited map dedups) on
    // inputs with repeated seed rows
    var visited = seed.toDF("node").distinct().withColumn("hop", lit(0))
      .localCheckpoint(eager = true)
    var frontier = visited.select($"node")
    var hop = 0
    var frontierSize = frontier.count()
    var visitedSize = frontierSize
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val small = math.max(frontierSize, visitedSize) <= broadcastRowLimit
      val next = bfsStep(e, frontier, visited, hop, broadcastOk = small)
        .localCheckpoint(eager = true)
      visited = visited.unionByName(next).localCheckpoint(eager = true)
      frontier = next.select($"node")
      frontierSize = next.count()
      visitedSize += frontierSize
    }
    visited
  }

  /** One BFS round: expand the frontier one hop, drop already-visited
    * nodes. Split out so plan tests can pin the physical shape of both
    * regimes (the public loop checkpoints each round, which erases the
    * plan). `broadcastOk=true` broadcasts both node-sized frames so the
    * edge table never shuffles; `false` forces co-keyed shuffle joins
    * (`shuffle_hash` hint — sized state never lands on one executor). */
  private[graft] def bfsStep(e: DataFrame, frontier: DataFrame,
      visited: DataFrame, hop: Int, broadcastOk: Boolean): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val f = frontier.withColumnRenamed("node", "a")
    val (probe, anti) =
      if (broadcastOk) (broadcast(f), broadcast(visited))
      else (f.hint("shuffle_hash"), visited.hint("shuffle_hash"))
    e.join(probe, Seq("a"))
      .select($"b".as("node")).distinct()
      .join(anti, Seq("node"), "left_anti")
      .withColumn("hop", lit(hop))
  }

  /** Small-regime BFS: the whole loop on the driver over the collected
    * edge list. Exactly the distributed semantics — distinct next
    * frontier, anti-join vs visited, hop = round index — on integer
    * state, so the outputs are identical row sets (GraphSkylineSpec
    * runs every BFS property in both regimes). */
  private[graft] def bfsLocal(e: DataFrame, seed: DataFrame,
      maxHops: Int): DataFrame = {
    val spark = e.sparkSession
    val adj = new java.util.HashMap[Any, java.util.ArrayList[Any]]()
    e.collect().foreach { r =>
      adj.computeIfAbsent(r.get(0), _ => new java.util.ArrayList[Any]()).add(r.get(1))
    }
    val visited = new java.util.LinkedHashMap[Any, Int]()
    seed.collect().foreach(r => visited.put(r.get(0), 0))
    var frontier: Iterable[Any] = {
      import scala.jdk.CollectionConverters._
      visited.keySet().asScala.toVector
    }
    var hop = 0
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = new java.util.LinkedHashSet[Any]()
      frontier.foreach { n =>
        val out = adj.get(n)
        if (out != null) out.forEach(b => if (!visited.containsKey(b)) { next.add(b); () })
      }
      next.forEach(b => { visited.put(b, hop); () })
      import scala.jdk.CollectionConverters._
      frontier = next.asScala.toVector
    }
    import scala.jdk.CollectionConverters._
    val rows = visited.entrySet().asScala.toSeq.map(kv =>
      org.apache.spark.sql.Row(kv.getKey, kv.getValue))
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", e.schema.head.dataType),
      org.apache.spark.sql.types.StructField("hop",
        org.apache.spark.sql.types.IntegerType))))
  }

  /** Gated query: BFS over the undirected customer—supplier bipartite
    * graph (an edge where a supplier filled a line of the customer's
    * order), seeded at the smallest ordering customer. The DuckDB
    * oracle is an independent formulation — a recursive CTE with
    * UNION-distinct termination and a MIN(hop) rollup. */
  /** The undirected customer—supplier bipartite graph (an edge where a
    * supplier filled a line of the customer's order) — the ONE edge
    * definition both gated graph queries and both SQL oracles' shared
    * e/und CTEs must agree on. */
  /** The graph on PACKED LONG keys — customer k ↦ 2k, supplier
    * k ↦ 2k+1. Every shuffle the iterative operators pay (the edge
    * distinct, the per-round joins, the rank aggregation) moves and
    * hashes 8-byte keys instead of strings; the oracle-visible 'c…'/'s…'
    * labels are reattached by [[nodeLabel]] as a final narrow map.
    * Measured at sf0.1: the edge build alone dropped ~2× (profiled
    * before/after — string concat + string-keyed exchanges were the
    * cost, not the join itself). */
  private[graft] def custSuppEdgesLong(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the DIRECTED half is staged once per process (the Staged
    // discipline): q_bfs_hops and q_pagerank share the same
    // orders⋈lineitem distinct — the dominant cost of both gates once
    // the iteration runs in the driver small regime
    val directed = graft.functions.Staged.materialize(
        s"graph_edges_${graft.functions.Staged.sfKey(sfDir)}", spark) {
      val orders = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
      val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey")
      orders.join(li, $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
        .distinct()
    }
    directed.unionByName(directed.select($"b".as("a"), $"a".as("b")))
  }

  /** Unpack a packed-long node id back to the public 'c<k>'/'s<k>'
    * label (the form the SQL oracles and the gated outputs use). */
  private[graft] def nodeLabel(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(c % 2 === 0, concat(lit("c"), (c / 2).cast("long")))
      .otherwise(concat(lit("s"), (c / 2).cast("long")))

  def bfsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seed = Tables.orders(spark, sfDir)
      .agg(min($"o_custkey")).as[Long].head()
    // traverse on packed longs; the oracle-visible labels go on at the end
    bfsHops(custSuppEdgesLong(spark, sfDir), Seq(seed * 2).toDF("node"),
      maxHops = 10)
      .select(nodeLabel($"node").as("node"), $"hop")
      .orderBy($"hop", $"node")
  }

  /** PageRank, fixed-iteration, cross-engine-exact.
    *
    * The non-normalized form rank' = (1−d) + d·Σ rank(in)/deg(in) over
    * a graph with no dangling nodes (both edge directions present).
    * The one source of cross-engine drift — the Σ over in-neighbors,
    * which Spark folds in partition order — is quantized to integers:
    * each contribution becomes floor(rank/deg · 10⁶) in a BIGINT, the
    * sum is exact and order-independent, and the damping step is one
    * IEEE multiply-add on identical doubles. floor (unlike a decimal
    * cast) has no rounding-mode ambiguity between engines, so ten
    * iterations stay bit-identical to the oracle's recursive CTE.
    *
    * Scale: the degree is attached to the edge table ONCE before the
    * loop (not re-joined every round), and the node-sized rank state is
    * broadcast into each round — so the big edge table never moves and
    * each iteration costs exactly one map-side-combined shuffle of
    * |nodes|-sized partial sums. Broadcast holds while the node table
    * fits an executor (entity graphs: nodes ≪ edges by orders of
    * magnitude); past `broadcastRowLimit` (the BFS bound — same state
    * shape, same executor budget) the loop pre-partitions the
    * deg-attached edge table by src ONCE and every round co-keys the
    * rank join instead: the checkpoint preserves the hash partitioning,
    * so each iteration moves only the |nodes|-sized rank state — never
    * the edges — at any graph size. Unlike BFS (whose frontier/visited
    * sizes evolve), |nodes| is loop-invariant, so the regime is decided
    * once, before the loop. `localCheckpoint` truncates the 10-deep
    * lineage. */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 10,
      broadcastRowLimit: Long = BfsBroadcastRowLimit,
      localEdgeLimit: Long = GraphLocalEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // checkpoint the edge list once: the count below decides the
    // regime, and the distributed path's deg/eDeg both reread it
    // (previously the upstream edge build ran twice)
    val e = edges.toDF("src", "dst").localCheckpoint(eager = true)
    if (e.count() <= localEdgeLimit) return pageRankLocal(e, damping, iters)
    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    // checkpoint at the session's shuffle parallelism: the upstream
    // union/distinct leaves ~2× that many mostly-empty slices, and the
    // 10-round loop would pay the per-task overhead on every one of
    // them, every round (the edge table itself is loop-invariant)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    var ranks = deg.select($"src".as("node"), lit(1.0).as("rank"))
      .localCheckpoint(eager = true)
    val small = ranks.count() <= broadcastRowLimit
    // co-keyed regime: hash-partition the edges by the join key ONCE —
    // the eager checkpoint pins the partitioning, so the per-round
    // shuffle_hash join exchanges only the rank state
    val eDeg = (if (small) e.join(deg, Seq("src")).coalesce(nPart)
                else e.join(deg, Seq("src")).repartition($"src"))
      .localCheckpoint(eager = true)
    for (i <- 1 to iters) {
      ranks = pageRankStep(eDeg, ranks, damping, broadcastOk = small)
      // checkpoint every few rounds, not every round: each eager
      // checkpoint is a full job + driver sync, and a 3-round plan
      // (3 chained broadcast stages) executes as one job at a third of
      // the scheduling overhead; 3 keeps lineage shallow enough that a
      // lost-executor recompute stays cheap at cluster scale
      if (i % 3 == 0 || i == iters)
        ranks = ranks.localCheckpoint(eager = true)
    }
    ranks
  }

  /** Small-regime PageRank: the whole iteration on the driver over the
    * collected edge list. The update rule is the SAME quantized form —
    * contributions floor(rank/deg·10⁶) as longs, summed exactly (order-
    * free), one IEEE multiply-add — and the per-round rank map is keyed
    * by dst exactly as the distributed groupBy is, so the two regimes
    * are bit-identical (asserted in GraphBasketPlanSpec /
    * GraphSkylineSpec three-regime parity). */
  private[graft] def pageRankLocal(e: DataFrame, damping: Double,
      iters: Int): DataFrame = {
    val spark = e.sparkSession
    import scala.collection.mutable
    // Long-keyed fast path (r12 optimization round): the gated graphs
    // run on packed-long node ids, and the generic loop below spent
    // its time boxing every edge endpoint into HashMap[Any] on every
    // one of the 10 rounds (iters × |E| boxed map probes). Dense
    // remap + primitive arrays makes the driver loop allocation-free
    // per round; the arithmetic is the IDENTICAL quantized update —
    // floor(rank/deg·1e6) summed exactly, one IEEE multiply-add — and
    // the sum is order-free, so regime parity (asserted in
    // GraphBasketPlanSpec / GraphSkylineSpec) is unchanged.
    if (e.schema.head.dataType == org.apache.spark.sql.types.LongType) {
      import spark.implicits._
      val arr = e.as[(Long, Long)].collect()
      // dense node index over BOTH endpoints: a dst-only sink carries
      // no degree and never contributes, but it can hold rank state
      // and appear in the output — exactly as in the generic path
      val idx = new mutable.LongMap[Int]()
      arr.foreach { case (s, d) =>
        if (!idx.contains(s)) idx(s) = idx.size
        if (!idx.contains(d)) idx(d) = idx.size
      }
      val n = idx.size
      val src = new Array[Int](arr.length)
      val dst = new Array[Int](arr.length)
      var i = 0
      while (i < arr.length) {
        src(i) = idx(arr(i)._1)
        dst(i) = idx(arr(i)._2)
        i += 1
      }
      val deg = new Array[Long](n)
      src.foreach(s => deg(s) += 1L)
      var rank = Array.fill(n)(1.0)
      val live0 = new Array[Boolean](n) // initial rank state: src nodes
      src.foreach(s => live0(s) = true)
      var live = live0
      for (_ <- 1 to iters) {
        val in = new Array[Long](n)
        val hasIn = new Array[Boolean](n)
        i = 0
        while (i < arr.length) {
          val s = src(i)
          // a src absent from the rank state contributes nothing — the
          // distributed round's inner join drops those edges the same way
          if (live(s)) {
            val c = math.floor(rank(s) / deg(s) * 1e6).toLong
            val d = dst(i)
            in(d) += c; hasIn(d) = true
          }
          i += 1
        }
        val nr = new Array[Double](n)
        var j = 0
        while (j < n) {
          if (hasIn(j))
            nr(j) = (1.0 - damping) + damping * (in(j).toDouble / 1e6)
          j += 1
        }
        rank = nr; live = hasIn
      }
      val out = idx.toSeq.collect { case (node, j) if live(j) => (node, rank(j)) }
      return spark.createDataFrame(out).toDF("node", "rank")
    }
    val arr = e.collect().map(r => (r.get(0), r.get(1)))
    val deg = mutable.HashMap.empty[Any, Long]
    arr.foreach { case (s, _) => deg.updateWith(s)(c => Some(c.getOrElse(0L) + 1L)) }
    var rank: mutable.HashMap[Any, Double] =
      deg.map { case (k, _) => k -> 1.0 }
    for (_ <- 1 to iters) {
      val in = mutable.HashMap.empty[Any, Long]
      arr.foreach { case (s, d) =>
        // a src absent from the rank state contributes nothing — the
        // distributed round's inner join drops those edges the same way
        rank.get(s).foreach { rs =>
          val c = math.floor(rs / deg(s) * 1e6).toLong
          in.updateWith(d)(p => Some(p.getOrElse(0L) + c))
        }
      }
      rank = in.map { case (n, sum) =>
        n -> ((1.0 - damping) + damping * (sum.toDouble / 1e6)) }
    }
    val rows = rank.toSeq.map { case (n, r) => org.apache.spark.sql.Row(n, r) }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", e.schema.head.dataType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.DoubleType))))
  }

  /** One PageRank round over the deg-attached edge table — split out so
    * plan tests can assert the iteration's physical shape (the public
    * loop checkpoints each round, which erases the plan).
    * `broadcastOk=true` broadcasts the node-sized rank state so the
    * edge table never shuffles; `false` co-keys instead (`shuffle_hash`
    * hint — rank state sized beyond one executor never lands on one),
    * and with eDeg pre-partitioned by src only the ranks move. */
  private[graft] def pageRankStep(eDeg: DataFrame, ranks: DataFrame,
      damping: Double, broadcastOk: Boolean = true): DataFrame = {
    val spark = eDeg.sparkSession
    import spark.implicits._
    val r = if (broadcastOk) broadcast(ranks) else ranks.hint("shuffle_hash")
    eDeg.join(r, $"src" === $"node")
      .select($"dst", floor($"rank" / $"deg" * lit(1e6)).cast("long").as("c"))
      .groupBy($"dst")
      .agg(sum($"c").as("in_sum"))
      .select($"dst".as("node"),
        (lit(1.0 - damping) +
          lit(damping) * ($"in_sum".cast("double") / lit(1e6))).as("rank"))
  }

  /** Gated query: 10 PageRank rounds over the undirected (symmetric)
    * customer—supplier graph; ranks rounded to 6dp for display only —
    * the underlying iteration is already bit-identical to the oracle. */
  def pageRankQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the iteration state is node-sized (~thousands of rows): 10 rounds
    // of 32-partition shuffles would be pure task overhead, so scope the
    // whole query to a few partitions and force execution (the eager
    // checkpoint) before the conf is restored. The edge build's scan
    // side keeps its file-split parallelism; only its shuffle narrows,
    // which AQE would coalesce anyway
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // display quantization via floor, not round(): Spark rounds the exact
      // BigDecimal image of the double while DuckDB rounds in float space —
      // they disagree on midpoint-adjacent values; floor of the identical
      // double is identical everywhere. The iteration runs on packed
      // longs — identical graph, identical ranks — and the oracle's
      // string labels go on as the final narrow map
      pageRank(custSuppEdgesLong(spark, sfDir))
        .select(nodeLabel($"node").as("node"),
          floor($"rank" * lit(1e6)).cast("long").as("rank_e6"))
        .orderBy($"node")
        .localCheckpoint(eager = true)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      ()
    }
  }

  val pageRankSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |und AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      |deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY 1),
      |pr AS (
      |  SELECT 0 AS iter, src AS node, 1.0::DOUBLE AS rank FROM deg
      |  UNION ALL
      |  SELECT iter + 1, dst,
      |         -- (1.0 - 0.85) as an IEEE subtraction, NOT the literal 0.15:
      |         -- the engine-side damping is computed the same way and the
      |         -- two doubles differ in the last ulp
      |         (1.0::DOUBLE - 0.85::DOUBLE)
      |           + 0.85 * (CAST(SUM(CAST(FLOOR(rank / deg * 1000000.0)
      |                                   AS BIGINT)) AS DOUBLE) / 1000000.0)
      |  FROM pr
      |  JOIN und ON und.src = pr.node
      |  JOIN deg ON deg.src = pr.node
      |  WHERE iter < 10
      |  GROUP BY 1, 2)
      |SELECT node, CAST(FLOOR(rank * 1000000.0) AS BIGINT) AS rank_e6
      |FROM pr WHERE iter = 10
      |ORDER BY node""".stripMargin

  val bfsSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
      |bfs AS (
      |  SELECT 'c' || MIN(o_custkey) AS node, 0 AS hop FROM orders
      |  UNION
      |  SELECT u.b, bfs.hop + 1
      |  FROM bfs JOIN und u ON u.a = bfs.node
      |  WHERE bfs.hop < 10)
      |SELECT node, CAST(MIN(hop) AS INT) AS hop
      |FROM bfs GROUP BY node
      |ORDER BY hop, node""".stripMargin

  /** Triangle counting + global clustering coefficient over the item
    * co-purchase graph — compact-forward with DEGREE ordering: every
    * edge is oriented from its lower-degree endpoint to its
    * higher-degree endpoint (ties by id), wedges are pairs of
    * out-edges of one node, and each triangle closes exactly once.
    * Degree ordering is what makes the shape survive power-law graphs:
    * wedge cost is Σ min-deg² (a hub with 10⁵ neighbors but
    * low-degree co-purchasers generates ~0 wedges at the hub), where
    * id ordering would leave Θ(Σ deg²) — 10¹⁰ wedges from that one
    * hub regardless of the support floor, since minCo prunes edges,
    * not the surviving hub degree.
    *
    * The reported `n_wedges` (the clustering denominator the oracle
    * pins) is the id-oriented path₂ count — computed in CLOSED FORM as
    * Σ_b in-deg(b)·out-deg(b) from two cheap degree aggregates, never
    * materialized as a join.
    *
    * The edge list is localCheckpointed: it feeds the degree
    * aggregate and three join legs, and recomputing the baskets
    * self-join per leg would multiply the dominant cost. Clustering =
    * 3·triangles/wedges, one pinned IEEE division over exact integer
    * counts. */
  def triangles(spark: SparkSession, sfDir: String, minCo: Long = 3): DataFrame = {
    import spark.implicits._
    if (minCo >= BasketStage.SharedFloor) {
      // pairs from the staged artifact shared with q_item_neighbors —
      // counts are floor-exact, so the ≥-minCo filter reproduces the
      // edge set trianglesOn would have built
      val e = BasketStage.pairSupports(spark, sfDir)
        .filter($"n_ab" >= minCo).select($"pa", $"pb")
        .localCheckpoint(true)
      triangleCounts(e)
    } else trianglesOn(BasketStage.custBaskets(spark, sfDir), minCo)
  }

  /** The algorithm over an explicit (bk, item) basket frame — unit-gated
    * on hand graphs with known triangle counts. */
  def trianglesOn(baskets: DataFrame, minCo: Long): DataFrame = {
    val spark = baskets.sparkSession
    import spark.implicits._
    val e = baskets.as("a")
      .join(baskets.as("b"), $"a.bk" === $"b.bk" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("pa"), $"b.item".as("pb"))
      .agg(count(lit(1)).as("n_co"))
      .filter($"n_co" >= minCo)
      .select($"pa", $"pb")
      .localCheckpoint(true)
    triangleCounts(e)
  }

  /** Counts over an explicit canonical (pa < pb) edge list. */
  private[graft] def triangleCounts(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val eN = e.agg(count(lit(1)).as("n_edges"))
    // ONE shuffled aggregate yields total degree AND the id-form
    // in/out split (out = times seen as pa): deg drives orientation,
    // Σ outd·ind is the closed-form id-wedge denominator — three
    // separate degree aggregates fused into this node-sized table
    val dcounts = e.select($"pa".as("node"), lit(1L).as("is_out"))
      .unionAll(e.select($"pb".as("node"), lit(0L).as("is_out")))
      .groupBy($"node")
      .agg(count(lit(1)).as("deg"), sum($"is_out").as("outd"))
      .localCheckpoint(true)
    val wN = dcounts
      .agg(coalesce(sum($"outd" * ($"deg" - $"outd")), lit(0L)).as("n_wedges"))
    // one oriented-edge materialization feeds all three legs (both
    // wedge sides + the closure probe) — without the checkpoint the
    // degree joins re-execute per leg
    val o = degreeOriented(e, dcounts.select($"node", $"deg")).localCheckpoint(true)
    val tN = wedgesOf(o)
      .join(o.select($"src".as("u1"), $"dst".as("u2")), Seq("u1", "u2"))
      .agg(count(lit(1)).as("n_triangles"))
    eN.crossJoin(wN).crossJoin(tN)
      .select($"n_edges", $"n_wedges", $"n_triangles",
        (lit(3.0) * $"n_triangles".cast("double") / $"n_wedges".cast("double"))
          .as("clustering"))
  }

  /** Each canonical edge re-oriented from its lower-(degree, id)
    * endpoint to its higher one, carrying the destination's (deg, id)
    * so wedge generation can totally order a node's out-neighbors. */
  private[graft] def degreeOriented(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val deg = e.select($"pa".as("node")).unionAll(e.select($"pb".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    degreeOriented(e, deg)
  }

  private def degreeOriented(e: DataFrame, deg: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val fwd = ($"da" < $"db") || ($"da" === $"db" && $"pa" < $"pb")
    e.join(deg.select($"node".as("pa"), $"deg".as("da")), Seq("pa"))
      .join(deg.select($"node".as("pb"), $"deg".as("db")), Seq("pb"))
      .select(
        when(fwd, $"pa").otherwise($"pb").as("src"),
        when(fwd, $"pb").otherwise($"pa").as("dst"),
        when(fwd, $"db").otherwise($"da").as("dst_deg"))
  }

  /** Ordered out-neighbor pairs (u1, u2) of each node under the
    * (deg, id) total order — a triangle exists iff the oriented edge
    * u1→u2 is present (and given the ordering, that IS the orientation
    * the closing edge received). Row count is the Σ min-deg² wedge
    * bound the hub-graph spec pins. */
  private[graft] def orientedWedges(e: DataFrame): DataFrame =
    wedgesOf(degreeOriented(e))

  private def wedgesOf(o: DataFrame): DataFrame = {
    val spark = o.sparkSession
    import spark.implicits._
    o.select($"src", $"dst".as("u1"), $"dst_deg".as("d1"))
      .join(o.select($"src", $"dst".as("u2"), $"dst_deg".as("d2")), Seq("src"))
      .filter(($"d1" < $"d2") || ($"d1" === $"d2" && $"u1" < $"u2"))
      .select($"u1", $"u2")
  }

  def trianglesSql(minCo: Long = 3): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT o_custkey AS bk, l_partkey AS item
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (
       |  SELECT a.item AS pa, b.item AS pb
       |  FROM baskets a JOIN baskets b ON a.bk = b.bk AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minCo),
       |w AS (
       |  SELECT e1.pa AS w_a, e1.pb AS w_b, e2.pb AS w_c
       |  FROM e e1 JOIN e e2 ON e1.pb = e2.pa),
       |counts AS (
       |  SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       |         (SELECT COUNT(*) FROM w) AS n_wedges,
       |         (SELECT COUNT(*) FROM w JOIN e ON pa = w_a AND pb = w_c)
       |           AS n_triangles)
       |SELECT n_edges, n_wedges, n_triangles,
       |       3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
       |         AS clustering
       |FROM counts""".stripMargin
}
