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
  * Scale: each round is ONE co-keyed shuffle join frontier⋈edges plus
  * one anti-join — cost ∝ edges incident to the frontier, not the
  * whole graph; rounds = graph diameter (small-world graphs: single
  * digits). The visited set stays partitioned by node across rounds.
  * The driver sees only per-round counts, never rows. Pregel engines
  * specialize exactly this loop; expressing it over DataFrames keeps
  * it inside Catalyst/Tungsten with no extra runtime.
  */
object Graph {

  /** Min-hop distance from `seed` to every reachable node, capped at
    * `maxHops`. `edges` must be directed pairs (a, b); pass both
    * directions for an undirected walk. */
  def bfsHops(edges: DataFrame, seed: DataFrame, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.toDF("a", "b").localCheckpoint(eager = true)
    var visited = seed.toDF("node").withColumn("hop", lit(0))
      .localCheckpoint(eager = true)
    var frontier = visited.select($"node")
    var hop = 0
    var frontierSize = frontier.count()
    while (hop < maxHops && frontierSize > 0) {
      hop += 1
      val next = e.join(frontier.withColumnRenamed("node", "a"), Seq("a"))
        .select($"b".as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hop", lit(hop))
        .localCheckpoint(eager = true)
      visited = visited.unionByName(next).localCheckpoint(eager = true)
      frontier = next.select($"node")
      frontierSize = next.count()
    }
    visited
  }

  /** Gated query: BFS over the undirected customer—supplier bipartite
    * graph (an edge where a supplier filled a line of the customer's
    * order), seeded at the smallest ordering customer. The DuckDB
    * oracle is an independent formulation — a recursive CTE with
    * UNION-distinct termination and a MIN(hop) rollup. */
  def bfsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_suppkey")
    val directed = orders.join(li, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("a"),
        concat(lit("s"), $"l_suppkey").as("b"))
      .distinct()
    val und = directed.unionByName(directed.select($"b".as("a"), $"a".as("b")))
    val seed = orders.agg(min($"o_custkey")).as[Long].head()
    bfsHops(und, Seq(s"c$seed").toDF("node"), maxHops = 10)
      .orderBy($"hop", $"node")
  }

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
}
