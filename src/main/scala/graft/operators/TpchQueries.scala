package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.sources.Tables

/** TPC-H-shape composite analytics (Q3 and Q5, adapted to the columns
  * the test tables carry).
  *
  * These are the canonical multi-join decision-support plans — the
  * shapes every warehouse benchmark grades. Declared DataFrame-first so
  * Catalyst owns the physical strategy: the dimension chain
  * (region→nation→customer/supplier) broadcasts all the way down, AQE
  * picks shuffle vs broadcast for the fact joins, and the revenue
  * aggregate partial-combines before its one keyed exchange. Revenue
  * sums route through [[Exact]] decimal widening (order-independent,
  * oracle-hash-stable).
  *
  * Q5's adaptation note: the classic query joins lineitem to supplier
  * on (l_suppkey) AND requires s_nationkey = c_nationkey — "local
  * supplier" semantics — which survives unchanged here.
  */
object TpchQueries {

  /** Q1 shape: the pricing-summary report — THE canonical scan-heavy
    * aggregate (one pass over the fact, 4-value group key, 8
    * aggregates). The whole query is one WholeStageCodegen span over
    * the parquet scan plus a single tiny keyed exchange of partial
    * aggregates; at 100 TB it is bandwidth-bound by design, which is
    * why published engine comparisons lead with it. Per-row products
    * are pinned-paren IEEE (identical in both engines); sums/avgs
    * route through [[Exact]]. */
  def q1(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val disc = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    // date(ts) <= d  ≡  ts < d+1 day: the bare-column form reaches the
    // parquet scan as a PushedFilter (a cast-wrapped column would not)
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" < lit("1997-09-03").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Exact.sumExact($"l_quantity").as("sum_qty"),
        Exact.sumExact($"l_extendedprice").as("sum_base_price"),
        Exact.sumExact(disc).as("sum_disc_price"),
        Exact.sumExact(disc * (lit(1.0) + $"l_tax")).as("sum_charge"),
        Exact.avgExact($"l_quantity").as("avg_qty"),
        Exact.avgExact($"l_extendedprice").as("avg_price"),
        Exact.avgExact($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       ${Exact.sumExactSql("l_quantity")} AS sum_qty,
       |       ${Exact.sumExactSql("l_extendedprice")} AS sum_base_price,
       |       ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |         AS sum_disc_price,
       |       ${Exact.sumExactSql(
            "(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")}
       |         AS sum_charge,
       |       ${Exact.avgExactSql("l_quantity")} AS avg_qty,
       |       ${Exact.avgExactSql("l_extendedprice")} AS avg_price,
       |       ${Exact.avgExactSql("l_discount")} AS avg_disc,
       |       COUNT(*) AS count_order
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) <= DATE '1997-09-02'
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Q6 shape: the forecast-revenue-change scan — a single filtered
    * SUM with three range predicates and NO group key. The plan to
    * want: all three predicates pushed to the parquet scan (min/max
    * row-group skipping does the work at scale), zero shuffles, one
    * scalar partial-sum merge. */
  def q6(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24.0)
      .agg(Exact.sumExact($"l_extendedprice" * $"l_discount").as("revenue"))
  }

  val q6Sql: String =
    s"""SELECT ${Exact.sumExactSql("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24.0""".stripMargin

  /** Q4 shape: order-priority checking — the canonical EXISTS
    * decorrelation plan. The correlated EXISTS (a line shipped after
    * the order date) becomes a LEFT SEMI join: equi key on orderkey,
    * the cross-table date comparison as the join residual; the fact
    * never duplicates orders with many qualifying lines the way an
    * inner join + distinct would. */
  def q4(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
    ord.join(li, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Q19 shape: discounted revenue under an OR of brand/size/quantity
    * conjunct groups — the disjunctive-predicate plan. The shared
    * equi key (partkey) stays a single hash join; the disjunction is a
    * post-join filter, and the common quantity/size bounds are pushed
    * to both scans (Catalyst extracts them from the OR). */
  def q19(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val part = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_brand", $"p_size")
    val arm1 = $"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
      $"l_quantity".between(1.0, 11.0)
    val arm2 = $"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
      $"l_quantity".between(10.0, 20.0)
    val arm3 = $"p_brand" === "Brand#34" && $"p_size".between(1, 15) &&
      $"l_quantity".between(20.0, 30.0)
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .filter(arm1 || arm2 || arm3)
      .agg(Exact.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
  }

  val q19Sql: String =
    s"""SELECT ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |         AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |       AND l_quantity BETWEEN 1.0 AND 11.0)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |       AND l_quantity BETWEEN 10.0 AND 20.0)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin

  /** Q3 shape: unshipped-order revenue by order, for one market
    * segment — 3-way join, date split on both sides, top-10 by
    * revenue. (o_shippriority isn't in the test schema;
    * o_orderpriority stands in.) */
  def q3(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = "1996-06-30"
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(to_date($"o_orderdate") < lit(cutoff))
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("o_orderdate"),
        $"o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .filter(to_date($"l_shipdate") > lit(cutoff))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(Exact.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       |       o_orderpriority,
       |       ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |         AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND CAST(o_orderdate AS DATE) < DATE '1996-06-30'
       |  AND CAST(l_shipdate AS DATE) > DATE '1996-06-30'
       |GROUP BY 1, 2, 3
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** Q5 shape: local-supplier revenue by nation for one region and one
    * year — the 6-way snowflake join with the s_nationkey = c_nationkey
    * correlation. */
  def q5(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nations = Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val supp = Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(year(to_date($"o_orderdate")) === 1996)
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey" &&
        $"s_nationkey" === $"c_nationkey")
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(Exact.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Q10 shape: returned-item revenue by customer for one quarter —
    * fact→orders shuffle join, broadcast customer/nation, top-20 by lost
    * revenue. The classic "who returned the most" report. */
  def q10(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, sfDir)
      .filter(to_date($"o_orderdate") >= lit("1996-10-01") &&
        to_date($"o_orderdate") < lit("1997-01-01"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(Exact.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |       ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |         AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
       |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Q18 shape: large-quantity orders — the IN-aggregate-subquery plan.
    * Spark-first: the subquery becomes an aggregate whose qualifying
    * keys AQE can broadcast into the semi join (tiny at any SF — the
    * filter keeps ~0.5% of orders), so the big fact never shuffles on
    * the probe side twice. */
  def q18(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val bigOrders = li.groupBy($"l_orderkey")
      .agg(Exact.sumExact($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 250.0)
    val ord = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("o_orderdate"),
        $"o_totalprice")
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_name")
    bigOrders.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q18Sql: String =
    s"""SELECT c_custkey, c_name, o_orderkey,
       |       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
       |       total_qty
       |FROM (SELECT l_orderkey,
       |             ${Exact.sumExactSql("l_quantity")} AS total_qty
       |      FROM lineitem GROUP BY 1
       |      HAVING ${Exact.sumExactSql("l_quantity")} > 250.0) big
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey
       |LIMIT 100""".stripMargin

  val q5Sql: String =
    s"""SELECT n_name,
       |       ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |         AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND year(CAST(o_orderdate AS DATE)) = 1996
       |GROUP BY 1
       |ORDER BY revenue DESC, n_name""".stripMargin
}
