package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Market-basket analytics: association rules + item-item similarity.
  *
  * Co-occurrence mining over the order graph — the two classic outputs:
  * directed association rules (support / confidence / lift) over
  * order-level baskets, and item-item cosine neighbors (the
  * collaborative-filtering "customers also bought") over customer-level
  * baskets.
  *
  * Shape at scale: the only quadratic step is the within-basket
  * self-join, bounded by max basket size (single digits for orders,
  * ~tens for customers) — cost ∝ Σ|basket|², never |items|². Both
  * joins are co-keyed on the basket id (one shuffle), pair counts get
  * map-side partial aggregation on the (a, b) key, and the support
  * floor prunes the long tail BEFORE the stats joins. The basket
  * denominator is computed in-plan and broadcast (1-row cross join —
  * same shape as the quality gate), so nothing round-trips the driver.
  * Derived ratios are single IEEE ops on exact integer counts in a
  * pinned order, so both engines produce bit-identical doubles.
  */
object MarketBasket {

  private def orderBaskets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("bk"), $"l_partkey".as("item")).distinct()
  }

  /** Directed association rules over order baskets at `minSupport`:
    * (antecedent, consequent, support, confidence, lift). */
  def assocRules(spark: SparkSession, sfDir: String, minSupport: Long = 2): DataFrame = {
    import spark.implicits._
    // eager pin (r12, guide §2.4/§7.2): the basket distinct feeds FOUR
    // consumers (total, item counts, both self-join sides) and the
    // undirected pair table feeds both union branches — un-pinned, the
    // executed plan recomputed the distinct 4× and the full
    // join+2.39M-row pair aggregate TWICE (probed plan metrics:
    // duplicate HashAggregate[numOutputRows=2392000] subtrees, ~4 s of
    // pipeline each). Checkpoints are row-bounded: baskets is the
    // distinct (order, item) table, undirected is the support-filtered
    // pair list (~3.6 k rows at sf0.1).
    val baskets = orderBaskets(spark, sfDir).localCheckpoint(eager = true)
    val total = baskets.agg(countDistinct($"bk").as("n_baskets"))
    val itemN = baskets.groupBy($"item").agg(count(lit(1)).as("n_item"))
    // (the lossless n_item ≥ minSupport prune used in itemNeighbors is
    // deliberately NOT applied here: at minSupport=2 nearly every item
    // survives, so the extra join costs more than the pairs it removes —
    // measured at sf0.1)
    val undirected = baskets.as("a")
      .join(baskets.as("b"), $"a.bk" === $"b.bk" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("pa"), $"b.item".as("pb"))
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= minSupport)
      .localCheckpoint(eager = true)
    val directed = undirected
      .unionByName(undirected.select($"pb".as("pa"), $"pa".as("pb"), $"support"))
    directed
      .join(itemN.select($"item".as("pa"), $"n_item".as("n_a")), Seq("pa"))
      .join(itemN.select($"item".as("pb"), $"n_item".as("n_b")), Seq("pb"))
      .crossJoin(broadcast(total))
      .select($"pa".as("antecedent"), $"pb".as("consequent"), $"support",
        round($"support".cast("double") / $"n_a", 6).as("confidence"),
        round($"support".cast("double") * $"n_baskets" / $"n_a" / $"n_b", 6)
          .as("lift"))
      .orderBy($"antecedent", $"consequent")
  }

  def assocRulesSql(minSupport: Long = 2): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS item FROM lineitem),
       |total AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM baskets),
       |item_n AS (SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY 1),
       |und AS (
       |  SELECT a.item AS pa, b.item AS pb, COUNT(*) AS support
       |  FROM baskets a JOIN baskets b ON a.bk = b.bk AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport),
       |dir AS (
       |  SELECT pa, pb, support FROM und
       |  UNION ALL SELECT pb, pa, support FROM und)
       |SELECT d.pa AS antecedent, d.pb AS consequent, d.support,
       |       round(CAST(d.support AS DOUBLE) / na.n_item, 6) AS confidence,
       |       round(CAST(d.support AS DOUBLE) * t.n_baskets
       |             / na.n_item / nb.n_item, 6) AS lift
       |FROM dir d
       |JOIN item_n na ON na.item = d.pa
       |JOIN item_n nb ON nb.item = d.pb
       |CROSS JOIN total t
       |ORDER BY antecedent, consequent""".stripMargin

  /** Item-item collaborative filtering over customer baskets: top-k
    * cosine neighbors per item among pairs co-purchased by at least
    * `minCo` customers. Cosine on binary purchase vectors =
    * n_ab / √(n_a · n_b). */
  def itemNeighbors(spark: SparkSession, sfDir: String, minCo: Long = 4,
      k: Int = 3): DataFrame = {
    import spark.implicits._
    require(minCo >= BasketStage.SharedFloor,
      s"itemNeighbors minCo=$minCo below the staged pair floor " +
        s"${BasketStage.SharedFloor} — counts under the floor are absent " +
        "from the shared artifact")
    // baskets and pair supports come from the staged artifacts shared
    // with q_triangles (BasketStage) — support counts are floor-exact,
    // so filtering the staged table equals computing pairs at minCo
    val baskets = BasketStage.custBaskets(spark, sfDir)
    val itemN = baskets.groupBy($"item").agg(count(lit(1)).as("n_item"))
    val und = BasketStage.pairSupports(spark, sfDir)
      .filter($"n_ab" >= minCo)
    val dir = und.unionByName(und.select($"pb".as("pa"), $"pa".as("pb"), $"n_ab"))
    val scored = dir
      .join(itemN.select($"item".as("pa"), $"n_item".as("n_a")), Seq("pa"))
      .join(itemN.select($"item".as("pb"), $"n_item".as("n_b")), Seq("pb"))
      .select($"pa".as("item"), $"pb".as("neighbor"),
        round($"n_ab".cast("double") / sqrt(($"n_a" * $"n_b").cast("double")), 6)
          .as("cosine"))
    val w = Window.partitionBy($"item").orderBy($"cosine".desc, $"neighbor")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"item", $"rk", $"neighbor", $"cosine")
      .orderBy($"item", $"rk")
  }

  def itemNeighborsSql(minCo: Long = 4, k: Int = 3): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT o_custkey AS bk, l_partkey AS item
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |item_n AS (SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY 1),
       |und AS (
       |  SELECT a.item AS pa, b.item AS pb, COUNT(*) AS n_ab
       |  FROM baskets a JOIN baskets b ON a.bk = b.bk AND a.item < b.item
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minCo),
       |dir AS (
       |  SELECT pa, pb, n_ab FROM und UNION ALL SELECT pb, pa, n_ab FROM und),
       |scored AS (
       |  SELECT d.pa AS item, d.pb AS neighbor,
       |         round(CAST(d.n_ab AS DOUBLE)
       |               / sqrt(CAST(na.n_item * nb.n_item AS DOUBLE)), 6) AS cosine
       |  FROM dir d
       |  JOIN item_n na ON na.item = d.pa
       |  JOIN item_n nb ON nb.item = d.pb),
       |ranked AS (
       |  SELECT item, neighbor, cosine,
       |         CAST(row_number() OVER (PARTITION BY item
       |                ORDER BY cosine DESC, neighbor) AS INT) AS rk
       |  FROM scored)
       |SELECT item, rk, neighbor, cosine
       |FROM ranked WHERE rk <= $k
       |ORDER BY item, rk""".stripMargin
}
