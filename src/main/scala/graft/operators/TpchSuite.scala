package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact
import graft.sources.Tables

/** The remainder of the TPC-H suite (Q2, Q7–Q9, Q11–Q17, Q20–Q22),
  * adapted to the columns the test tables carry and held to DuckDB
  * oracles. Together with [[TpchQueries]] (Q1/Q3/Q4/Q5/Q6/Q10/Q18/Q19)
  * this covers all 22 shapes a warehouse user runs — every correlated
  * subquery, decorrelation, and disjunctive plan family in the
  * benchmark.
  *
  * Schema adaptations (the testdata has no `partsupp` table and no
  * shipmode/commitdate/receiptdate/container/phone columns):
  *   - `partsupp` is DERIVED: distinct (l_partkey, l_suppkey) pairs with
  *     ps_supplycost := MIN(l_extendedprice / l_quantity) and
  *     ps_qty := exact SUM(l_quantity). Q2/Q11/Q16 run against it.
  *   - Q9's ps_supplycost stand-in is (p_retailprice * 0.1).
  *   - Q12 groups by l_returnflag (for l_shipmode); "late" means
  *     l_shipdate > o_orderdate + 90 days (for receipt > commit).
  *   - Q13 filters o_orderpriority <> '1-URGENT' (for o_comment NOT
  *     LIKE); Q16 excludes s_name LIKE '%7' (for s_comment).
  *   - Q21's "kept waiting" is l_shipdate > o_orderdate + 60 days; the
  *     nation filter is dropped so the ranking covers all suppliers.
  *   - Q22's country code is substring(c_name, 16, 2) (for c_phone
  *     digits); "no recent orders" replaces "no orders" because every
  *     test customer has at least one order.
  *
  * Cross-engine exactness: every double aggregate routes through
  * [[Exact]] decimal widening; per-row arithmetic is pinned-paren IEEE
  * written identically in both engines; MIN/MAX over identical doubles
  * are selections (bit-stable); scalar-subquery comparisons compare two
  * identically-derived doubles. Every query tail is a total order.
  */
object TpchSuite {

  /** Derived partsupp analog. One shuffle keyed on the natural join key
    * (partkey, suppkey) with map-side combine — at 100 TB this is the
    * dominant exchange of Q2/Q11/Q16 and is shared text in the oracle
    * CTE so both engines derive the identical relation. */
  private def partsupp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(
        min($"l_extendedprice" / $"l_quantity").as("ps_supplycost"),
        Exact.sumExact($"l_quantity").as("ps_qty"))
      .select($"l_partkey".as("ps_partkey"), $"l_suppkey".as("ps_suppkey"),
        $"ps_supplycost", $"ps_qty")
  }

  private val partsuppCte: String =
    s"""WITH partsupp AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
       |         ${Exact.sumExactSql("l_quantity")} AS ps_qty
       |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- Q2

  /** Q2 shape: minimum-cost supplier — the correlated-scalar-MIN plan.
    * Spark-first: the correlated `= (SELECT MIN ...)` becomes a window
    * MIN over partkey on the (already pair-deduped) partsupp relation —
    * one extra partkey exchange over a pair-sized table, never a
    * re-scan of the fact. Suppliers/nations/region and the filtered
    * part list broadcast. */
  def q2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val eurSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val parts = Tables.part(spark, sfDir)
      .filter($"p_type" === "LARGE" && $"p_size".between(10, 20))
      .select($"p_partkey", $"p_name")
    val psEur = partsupp(spark, sfDir)
      .select($"ps_partkey", $"ps_suppkey", $"ps_supplycost")
      .join(broadcast(eurSupp), $"ps_suppkey" === $"s_suppkey")
      .join(broadcast(parts), $"ps_partkey" === $"p_partkey")
    psEur
      .withColumn("min_cost",
        min($"ps_supplycost").over(Window.partitionBy($"ps_partkey")))
      .filter($"ps_supplycost" === $"min_cost")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_name",
        $"ps_supplycost")
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  val q2Sql: String =
    s"""$partsuppCte
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
       |FROM part, partsupp, supplier, nation, region
       |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |  AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE'
       |  AND ps_supplycost = (
       |    SELECT MIN(ps2.ps_supplycost)
       |    FROM partsupp ps2, supplier s2, nation n2, region r2
       |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
       |      AND s2.s_nationkey = n2.n_nationkey
       |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- Q7

  /** Q7 shape: volume shipping between two nations. The nation-pair OR
    * can't be pushed by Catalyst, so both dimension legs are
    * pre-filtered to the two nations by hand before the broadcast —
    * the fact rows surviving the joins are only the relevant ones. */
  def q7(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val twoNations = Seq("NATION_1", "NATION_2")
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .filter($"n_name".isin(twoNations: _*))
        .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))),
        $"c_nationkey" === $"c_nk")
      .select($"c_custkey", $"cust_nation")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .filter($"n_name".isin(twoNations: _*))
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"supp_nation")
    val ord = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .filter(($"cust_nation" === "NATION_1" && $"supp_nation" === "NATION_2") ||
        ($"cust_nation" === "NATION_2" && $"supp_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation",
        year(to_date($"l_shipdate")).as("l_year"))
      .agg(Exact.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7Sql: String =
    s"""SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       |       CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
       |       ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |         AS revenue
       |FROM supplier, lineitem, orders, customer, nation n1, nation n2
       |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
       |  AND c_custkey = o_custkey
       |  AND s_nationkey = n2.n_nationkey AND c_nationkey = n1.n_nationkey
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- Q8

  /** Q8 shape: national market share — a conditional-sum ratio over a
    * 7-table snowflake. Both sums are exact-decimal; the ratio is one
    * IEEE division per group, identical in both engines. */
  def q8(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    val amCust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "AMERICA")),
          $"n_regionkey" === $"r_regionkey")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"supp_nation")
    val parts = Tables.part(spark, sfDir)
      .filter($"p_type" === "ECONOMY").select($"p_partkey")
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(amCust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .groupBy(year(to_date($"o_orderdate")).as("o_year"))
      .agg((Exact.sumExact(when($"supp_nation" === "NATION_3", vol)
          .otherwise(lit(0.0))) / Exact.sumExact(vol)).as("mkt_share"))
      .orderBy($"o_year")
  }

  val q8Sql: String =
    s"""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
       |       (${Exact.sumExactSql(
            "CASE WHEN n2.n_name = 'NATION_3' " +
              "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |        / ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")})
       |         AS mkt_share
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN region ON n1.n_regionkey = r_regionkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
       |  AND o_orderdate >= TIMESTAMP '1995-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- Q9

  /** Q9 shape: product-type profit by nation and year. ps_supplycost
    * stand-in is (p_retailprice * 0.1), carried on the broadcast part
    * leg; the amount expression is pinned-paren IEEE per row. */
  def q9(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val amount = ($"l_extendedprice" * (lit(1.0) - $"l_discount")) -
      (($"p_retailprice" * lit(0.1)) * $"l_quantity")
    val parts = Tables.part(spark, sfDir)
      .filter($"p_name".like("%red%")).select($"p_partkey", $"p_retailprice")
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .select($"n_nationkey".as("s_nk"), $"n_name".as("nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"nation")
    val ord = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_orderdate")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
        $"l_extendedprice", $"l_discount")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"nation", year(to_date($"o_orderdate")).as("o_year"))
      .agg(Exact.sumExact(amount).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation,
       |       CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
       |       ${Exact.sumExactSql(
            "(l_extendedprice * (1.0 - l_discount)) - " +
              "((p_retailprice * 0.1) * l_quantity)")} AS sum_profit
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- Q11

  /** Q11 shape: important stock — the scalar-subquery-threshold plan.
    * The per-part values and the grand total derive from the SAME pair
    * relation in both engines; the total joins back as a broadcast
    * scalar, so the threshold compare is one bit-identical double each
    * side. */
  def q11(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val natSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir).filter($"n_name" === "NATION_5")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val psn = partsupp(spark, sfDir)
      .join(broadcast(natSupp), $"ps_suppkey" === $"s_suppkey")
      .select($"ps_partkey", ($"ps_supplycost" * $"ps_qty").as("pair_value"))
    val total = psn.agg(Exact.sumExact($"pair_value").as("total_value"))
    psn.groupBy($"ps_partkey")
      .agg(Exact.sumExact($"pair_value").as("value"))
      .crossJoin(broadcast(total))
      .filter($"value" > $"total_value" * lit(0.001))
      .select($"ps_partkey", $"value")
      .orderBy($"value".desc, $"ps_partkey")
  }

  val q11Sql: String =
    s"""$partsuppCte,
       |psn AS (
       |  SELECT ps_partkey, ps_supplycost * ps_qty AS pair_value
       |  FROM partsupp, supplier, nation
       |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_name = 'NATION_5')
       |SELECT ps_partkey, ${Exact.sumExactSql("pair_value")} AS value
       |FROM psn
       |GROUP BY 1
       |HAVING ${Exact.sumExactSql("pair_value")} >
       |  ((SELECT ${Exact.sumExactSql("pair_value")} FROM psn) * 0.001)
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // --------------------------------------------------------------- Q12

  /** Q12 shape: shipping-priority counts — join plus two conditional
    * sums. All-integer aggregates, so exactness is free; the oracle
    * casts DuckDB's HUGEINT sums back to BIGINT. */
  def q12(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    val ord = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_shipdate", $"l_returnflag")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_returnflag".as("ship_mode"))
      .agg(
        sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(high, 0).otherwise(1)).as("low_line_count"))
      .orderBy($"ship_mode")
  }

  val q12Sql: String =
    """SELECT l_returnflag AS ship_mode,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- Q13

  /** Q13 shape: customer order-count distribution — the left-outer
    * count-then-histogram plan. Two keyed exchanges (custkey, then the
    * tiny c_count histogram); the outer join keeps zero-order
    * customers with COUNT(col)=0 exactly as the SQL does. */
  def q13(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    Tables.customer(spark, sfDir).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY 1) c_orders
      |GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- Q14

  /** Q14 shape: promotion-effect ratio for one month — two exact sums,
    * one pinned division, one pinned scale-by-100. */
  def q14(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vol = $"l_extendedprice" * (lit(1.0) - $"l_discount")
    val parts = Tables.part(spark, sfDir).select($"p_partkey", $"p_type")
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-09-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) *
        (Exact.sumExact(when($"p_type" === "PROMO", vol).otherwise(lit(0.0))) /
          Exact.sumExact(vol))).as("promo_revenue"))
  }

  val q14Sql: String =
    s"""SELECT (100.0 *
       |  (${Exact.sumExactSql(
            "CASE WHEN p_type = 'PROMO' " +
              "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       |   / ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}))
       |  AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
       |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  // --------------------------------------------------------------- Q15

  /** Q15 shape: top supplier — the view-plus-scalar-MAX plan. The
    * revenue view aggregates the fact once (suppkey exchange); the MAX
    * is then a single-partition window over the supplier-count-sized
    * view (dim-scale pinned, same bound as the W1/W2 SKs), which makes
    * the one-fact-scan property structural — referencing the view
    * twice (view + scalar subquery) would re-scan the fact whenever
    * exchange reuse fails to canonicalize-match. */
  def q15(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey".as("supplier_no"))
      .agg(Exact.sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("total_revenue"))
    val best = rev
      .withColumn("max_rev",
        max($"total_revenue").over(Window.partitionBy(lit(1))))
      .filter($"total_revenue" === $"max_rev")
    Tables.supplier(spark, sfDir)
      .join(broadcast(best), $"s_suppkey" === $"supplier_no")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |         ${Exact.sumExactSql("l_extendedprice * (1.0 - l_discount)")}
       |           AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate < TIMESTAMP '1996-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q16

  /** Q16 shape: supplier counts by part attribute — NOT-IN exclusion
    * plus COUNT(DISTINCT). The exclusion list is a broadcast anti
    * join; the distinct count rides the pair relation, never the
    * fact. */
  def q16(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir)
      .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val excluded = Tables.supplier(spark, sfDir)
      .filter($"s_name".like("%7")).select($"s_suppkey".as("bad_suppkey"))
    partsupp(spark, sfDir).select($"ps_partkey", $"ps_suppkey")
      .join(broadcast(parts), $"ps_partkey" === $"p_partkey")
      .join(broadcast(excluded), $"ps_suppkey" === $"bad_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"ps_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q16Sql: String =
    s"""$partsuppCte
       |SELECT p_brand, p_type, p_size,
       |       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
       |FROM partsupp, part
       |WHERE p_partkey = ps_partkey
       |  AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
       |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
       |  AND ps_suppkey NOT IN
       |    (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------------------------- Q17

  /** Q17 shape: small-quantity-order revenue — the correlated-AVG
    * plan. The per-part average aggregates only the semi-filtered
    * lines (the correlation is evaluated solely for qualifying parts),
    * then joins back on partkey; at this dimensionality AQE broadcasts
    * the tiny average table. */
  def q17(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir)
      .filter($"p_brand" === "Brand#3" && $"p_type" === "SMALL")
      .select($"p_partkey")
    val lines = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
    val avgQty = lines.groupBy($"l_partkey".as("avg_pk"))
      .agg(Exact.avgExact($"l_quantity").as("avg_qty"))
    lines.join(avgQty, $"l_partkey" === $"avg_pk")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((Exact.sumExact($"l_extendedprice") / lit(7.0)).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""SELECT (${Exact.sumExactSql("l_extendedprice")} / 7.0) AS avg_yearly
       |FROM lineitem, part
       |WHERE p_partkey = l_partkey
       |  AND p_brand = 'Brand#3' AND p_type = 'SMALL'
       |  AND l_quantity < (
       |    SELECT (0.2 * (${Exact.avgExactSql("l2.l_quantity")}))
       |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // --------------------------------------------------------------- Q20

  /** Q20 shape: potential part promotion — nested-IN decorrelation.
    * Inner GROUP/HAVING runs on the semi-filtered 1996 lines; the
    * qualifying supplier keys collapse to a distinct set that
    * semi-joins the (nation-filtered) supplier dim. */
  def q20(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val smallParts = Tables.part(spark, sfDir)
      .filter($"p_name".like("small%")).select($"p_partkey")
    val qualified = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(Exact.sumExact($"l_quantity").as("qty"))
      .filter($"qty" > 45.0)
      .select($"l_suppkey").distinct()
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir).filter($"n_name" === "NATION_7")),
        $"s_nationkey" === $"n_nationkey")
      .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  val q20Sql: String =
    s"""SELECT s_suppkey, s_name
       |FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_7'
       |  AND s_suppkey IN (
       |    SELECT l_suppkey FROM lineitem
       |    WHERE l_partkey IN
       |        (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
       |      AND l_shipdate >= TIMESTAMP '1996-01-01'
       |      AND l_shipdate < TIMESTAMP '1997-01-01'
       |    GROUP BY l_suppkey, l_partkey
       |    HAVING ${Exact.sumExactSql("l_quantity")} > 45.0)
       |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q21

  /** Q21 shape: suppliers who kept orders waiting — the double
    * EXISTS/NOT EXISTS decorrelation. All three self-join legs key on
    * orderkey, so the late-line relation keeps one partitioning across
    * the semi join (another supplier touched the order) and the anti
    * join (no OTHER supplier was late); only the supplier-inequality
    * and lateness residuals differ. */
  def q21(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val late = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
    val others = li.select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
    val othersShip = li.select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"),
      $"l_shipdate".as("d3"))
    late
      .join(others, $"l_orderkey" === $"k2" && $"s2" =!= $"l_suppkey",
        "left_semi")
      .join(othersShip, $"l_orderkey" === $"k3" && $"s3" =!= $"l_suppkey" &&
        $"d3" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_anti")
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders o
      |WHERE s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
      |  AND o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate >
      |                        o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // --------------------------------------------------------------- Q22

  /** Q22 shape: global sales opportunity — scalar-AVG threshold plus
    * anti join. The average is a broadcast scalar; the "no recent
    * orders" anti join keys on custkey (AQE picks broadcast at small
    * SF, shuffle at scale). */
  def q22(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val codes = Seq("05", "11", "17", "23", "28", "34", "39", "42", "47", "49")
    val cust = Tables.customer(spark, sfDir)
      .select(substring($"c_name", 16, 2).as("cntrycode"), $"c_acctbal",
        $"c_custkey")
      .filter($"cntrycode".isin(codes: _*))
    val avgBal = cust.filter($"c_acctbal" > 0.0)
      .agg(Exact.avgExact($"c_acctbal").as("avg_bal"))
    val recent = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"cntrycode")
      .agg(count(lit(1)).as("numcust"), Exact.sumExact($"c_acctbal").as("totacctbal"))
      .orderBy($"cntrycode")
  }

  val q22Sql: String =
    s"""WITH qualified AS (
       |  SELECT substring(c_name, 16, 2) AS cntrycode, c_acctbal, c_custkey
       |  FROM customer
       |  WHERE substring(c_name, 16, 2) IN
       |    ('05','11','17','23','28','34','39','42','47','49'))
       |SELECT cntrycode, COUNT(*) AS numcust,
       |       ${Exact.sumExactSql("c_acctbal")} AS totacctbal
       |FROM qualified q
       |WHERE c_acctbal > (SELECT ${Exact.avgExactSql("c_acctbal")}
       |                   FROM qualified WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = q.c_custkey
       |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
}
