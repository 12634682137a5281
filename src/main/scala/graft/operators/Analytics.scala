package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.sources.Tables

/** The reference's analytics surface — 7 queries (5 notebook SQL cells,
  * the README clustering benchmark, and the two evidencias-only queries),
  * re-expressed Spark-first over the driver testdata star schema
  * (taxi→TPC-H role mapping in FIXTURES.md §3).
  *
  * Reference shapes (SURVEY §2.4, §3 E3): every query is
  * `fact [⨝ dim] → filter → groupBy.agg → (having) → orderBy → (limit)`.
  *
  * Scale design:
  *  - Dim joins (`nation`, `region`, `customer` at dim-role) are
  *    broadcast — no shuffle of the fact side (J1/J2/J4 were all
  *    broadcast-sized in the reference: 4018/266/7 rows).
  *  - Aggregations are plain `groupBy.agg` → Catalyst plans partial
  *    (map-side) + final HashAggregate; the only fact shuffle is on the
  *    grouping keys, sized by spark.sql.shuffle.partitions / AQE.
  *  - Top-k uses orderBy+limit → `TakeOrderedAndProject` (no full sort).
  *  - Double aggregates go through [[graft.functions.Exact]] so results
  *    are order-independent (bit-identical under any partitioning).
  */
object Analytics {

  /** Flagship: the README clustering-benchmark query (BASELINE.md;
    * reference README.md:89-96) — monthly aggregation over one year.
    * Taxi roles: service_type→l_returnflag, pickup_date→l_shipdate,
    * trip_distance→l_quantity, total_amount→l_extendedprice.
    * Filter + month-trunc reach the parquet scan (predicate pushdown);
    * see also ClusteredLayout for the 16× pruning reproduction. */
  def monthlyAgg(spark: SparkSession, sfDir: String): DataFrame =
    monthlyAggOn(Tables.lineitem(spark, sfDir))

  /** The benchmark query shape over an arbitrary lineitem-schema frame —
    * single definition shared by the oracle query AND the Bench
    * clustering experiment (ClusteredLayout), so they can never
    * measure different queries. */
  def monthlyAggOn(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.filter($"l_shipdate".between(
        lit("2000-01-01").cast("timestamp"), lit("2000-12-31").cast("timestamp")))
      .groupBy(
        $"l_returnflag".as("service_type"),
        date_trunc("month", $"l_shipdate").cast("date").as("month"))
      .agg(
        count(lit(1)).as("trips"),
        avgExact($"l_quantity").as("avg_distance"),
        avgExact($"l_extendedprice").as("avg_amount"))
      .orderBy($"month", $"service_type")
  }

  val monthlyAggSql: String =
    s"""SELECT l_returnflag AS service_type,
       |       CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       |       COUNT(*) AS trips,
       |       ${avgExactSql("l_quantity")} AS avg_distance,
       |       ${avgExactSql("l_extendedprice")} AS avg_amount
       |FROM lineitem
       |WHERE l_shipdate BETWEEN TIMESTAMP '2000-01-01' AND TIMESTAMP '2000-12-31'
       |GROUP BY 1, 2
       |ORDER BY month, service_type""".stripMargin

  /** nb cell1 (evidencias/demandaxzona.csv): demand by zone, top-20.
    * Taxi roles: zone→nation, borough→region, trips→orders.
    *
    * Scale shape: `customer` is fact-sized at 100 TB, so it is NOT
    * broadcast — instead orders are pre-aggregated to (custkey, year)
    * before the shuffle join (map-side reduction shrinks the join input
    * from |orders| to |distinct keys|), then counts are re-summed after
    * the broadcast dim joins. AQE still auto-broadcasts customer at
    * small SF; at large SF this is a key-partitioned shuffle join. */
  def demandByZone(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perCustYear = Tables.orders(spark, sfDir)
      .groupBy($"o_custkey", year($"o_orderdate").as("trip_year"))
      .agg(count(lit(1)).as("n_trips"))
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir)
    perCustYear
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .filter($"n_name" =!= "Unknown")
      .groupBy($"n_name".as("zone_name"), $"r_name".as("borough"), $"trip_year")
      .agg(sum($"n_trips").as("total_trips"))
      .orderBy($"total_trips".desc, $"trip_year", $"zone_name")
      .limit(20)
  }

  val demandByZoneSql: String =
    """SELECT n_name AS zone_name, r_name AS borough,
      |       CAST(year(o_orderdate) AS INTEGER) AS trip_year,
      |       COUNT(*) AS total_trips
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE n_name != 'Unknown'
      |GROUP BY 1, 2, 3
      |ORDER BY total_trips DESC, trip_year, zone_name
      |LIMIT 20""".stripMargin

  /** nb cell2 (evidencias/ingresos_propinas.csv): revenue & tip%
    * by (borough, year). Tip% analog: l_tax/l_extendedprice, with the
    * reference's guarded-division CASE (F3) and range predicate (P7). */
  def revenueTips(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount", $"l_tax")
    val orders = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir)
    val tipPct = when($"l_extendedprice" > 0, $"l_tax" / $"l_extendedprice" * 100)
      .otherwise(lit(0.0))
    // tip filter depends only on lineitem columns → applied before the
    // fact-fact join (Catalyst would push it down anyway; explicit here).
    // customer is NOT broadcast (fact-sized at scale); nation/region are.
    li.withColumn("tip_percentage", tipPct)
      .filter($"tip_percentage" > 0 && $"tip_percentage" < 100)
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("borough"), year($"o_orderdate").as("trip_year"))
      .agg(
        sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("total_revenue"),
        avgExact($"tip_percentage").as("avg_tip_pct"),
        count(lit(1)).as("total_trips"))
      .orderBy($"trip_year", $"borough")
  }

  val revenueTipsSql: String =
    s"""WITH base AS (
       |  SELECT r_name AS borough,
       |         CAST(year(o_orderdate) AS INTEGER) AS trip_year,
       |         l_extendedprice * (1.0 - l_discount) AS net_revenue,
       |         CASE WHEN l_extendedprice > 0
       |              THEN l_tax / l_extendedprice * 100 ELSE 0.0 END AS tip_percentage
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey)
       |SELECT borough, trip_year,
       |       ${sumExactSql("net_revenue")} AS total_revenue,
       |       ${avgExactSql("tip_percentage")} AS avg_tip_pct,
       |       COUNT(*) AS total_trips
       |FROM base
       |WHERE tip_percentage > 0 AND tip_percentage < 100
       |GROUP BY 1, 2
       |ORDER BY trip_year, borough""".stripMargin

  /** nb cell4 (evidencias/duracion_percentiles.csv): exact interpolated
    * p50/p90 trip duration per zone, HAVING count filter, top-20 (A5/A6).
    * Duration analog: hours between o_orderdate (pickup) and l_shipdate
    * (dropoff), reference F2 `DATEDIFF(SECOND,..)/3600.0`.
    * Exact percentiles (not approx) — the reference values are exact. */
  def durationPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
    val orders = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val cust = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir)
    li.join(orders, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .withColumn("trip_duration_hours",
        (unix_timestamp($"l_shipdate") - unix_timestamp($"o_orderdate")) / 3600.0)
      .filter($"trip_duration_hours" > 0 && $"trip_duration_hours" < 24 * 365)
      // location_id alongside the name: the reference output carries
      // both (duracion_percentiles.csv: PICKUP_ZONE + LOCATIONID)
      .groupBy($"n_name".as("zone_name"), $"n_nationkey".as("location_id"))
      .agg(
        count(lit(1)).as("total_trips"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY trip_duration_hours)").as("p50_duration"),
        expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY trip_duration_hours)").as("p90_duration"),
        avgExact($"trip_duration_hours").as("avg_duration"))
      .filter($"total_trips" > 200)
      .orderBy($"total_trips".desc, $"zone_name")
      .limit(20)
  }

  val durationPercentilesSql: String =
    s"""WITH base AS (
       |  SELECT n_name AS zone_name, n_nationkey AS location_id,
       |         -- floor(epoch()) matches Spark unix_timestamp's second
       |         -- truncation (DuckDB epoch() is fractional)
       |         (CAST(floor(epoch(l_shipdate)) AS BIGINT)
       |          - CAST(floor(epoch(o_orderdate)) AS BIGINT)) / 3600.0 AS trip_duration_hours
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey)
       |SELECT zone_name, location_id, COUNT(*) AS total_trips,
       |       percentile_cont(0.5) WITHIN GROUP (ORDER BY trip_duration_hours) AS p50_duration,
       |       percentile_cont(0.9) WITHIN GROUP (ORDER BY trip_duration_hours) AS p90_duration,
       |       ${avgExactSql("trip_duration_hours")} AS avg_duration
       |FROM base
       |WHERE trip_duration_hours > 0 AND trip_duration_hours < 24 * 365
       |GROUP BY 1, 2
       |HAVING COUNT(*) > 200
       |ORDER BY total_trips DESC, zone_name
       |LIMIT 20""".stripMargin

  /** nb cell5 (evidencias/elasticidad.csv): (year, hour) demand matrix
    * with avg fare (A3). Events table plays the timestamped fact. */
  def hourlyMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(
        year($"ts").as("trip_year"), hour($"ts").as("pickup_hour"))
      .agg(count(lit(1)).as("total_trips"), avgExact($"value").as("avg_amount"))
      .orderBy($"trip_year", $"pickup_hour")
  }

  val hourlyMatrixSql: String =
    s"""SELECT CAST(year(ts) AS INTEGER) AS trip_year,
       |       CAST(hour(ts) AS INTEGER) AS pickup_hour,
       |       COUNT(*) AS total_trips,
       |       ${avgExactSql("value")} AS avg_amount
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY trip_year, pickup_hour""".stripMargin

  /** evidencias/velocidad_franja.csv: hour-band CASE decode (F16) +
    * group-by — avg value per (type, hour, franja). The band decode is
    * the REFERENCE's exact two-value domain (velocidad_franja.csv
    * pins it row-for-row: Nocturno = hours 0-5 and 19-23, Diurno =
    * 6-18 — EvidenciasShapeSpec replays that contract). */
  def speedBand(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h = hour($"ts")
    Tables.events(spark, sfDir)
      .withColumn("pickup_hour", h.cast("int"))
      .withColumn("franja",
        when(h < 6 || h >= 19, lit("Nocturno")).otherwise(lit("Diurno")))
      .groupBy($"event_type", $"pickup_hour", $"franja")
      .agg(avgExact($"value").as("avg_speed"), count(lit(1)).as("total_trips"))
      .orderBy($"event_type", $"pickup_hour")
  }

  val speedBandSql: String =
    s"""SELECT event_type, CAST(hour(ts) AS INTEGER) AS pickup_hour,
       |       CASE WHEN hour(ts) < 6 OR hour(ts) >= 19 THEN 'Nocturno'
       |            ELSE 'Diurno' END AS franja,
       |       ${avgExactSql("value")} AS avg_speed,
       |       COUNT(*) AS total_trips
       |FROM events
       |GROUP BY 1, 2, 3
       |ORDER BY event_type, pickup_hour""".stripMargin

  /** Hierarchical subtotals via ROLLUP — engine surface beyond the
    * reference (SURVEY §2.4 notes grouping sets absent there); one
    * shuffle, subtotal rows synthesized by the aggregation.
    * NULLS-order hazard: Spark ASC sorts nulls FIRST, DuckDB LAST — the
    * oracle pins NULLS FIRST explicitly. */
  def rollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .rollup($"l_returnflag".as("service_type"), $"l_linestatus".as("line_status"))
      .agg(count(lit(1)).as("trips"), sumExact($"l_extendedprice").as("total_revenue"))
      .orderBy($"service_type", $"line_status")
  }

  val rollupRevenueSql: String =
    s"""SELECT l_returnflag AS service_type, l_linestatus AS line_status,
       |       COUNT(*) AS trips,
       |       ${sumExactSql("l_extendedprice")} AS total_revenue
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY service_type NULLS FIRST, line_status NULLS FIRST""".stripMargin

  /** CUBE + GROUPING() — the full grouping-sets surface next to
    * [[rollupRevenue]]'s ROLLUP: all 4 subtotal combinations in one
    * Expand-based pass, with the grouping bit-vector exposed so
    * consumers can tell a real NULL group from a subtotal row.
    * (Spark's grouping_id() and DuckDB's GROUPING() agree: first
    * grouping column = most significant bit.) */
  def cubeRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .cube($"l_returnflag".as("service_type"), $"l_linestatus".as("line_status"))
      .agg(grouping_id().cast("int").as("grouping_level"),
        count(lit(1)).as("trips"),
        sumExact($"l_extendedprice").as("total_revenue"))
      .orderBy($"grouping_level", $"service_type", $"line_status")
  }

  val cubeRevenueSql: String =
    s"""SELECT l_returnflag AS service_type, l_linestatus AS line_status,
       |       CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS grouping_level,
       |       COUNT(*) AS trips,
       |       ${sumExactSql("l_extendedprice")} AS total_revenue
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY grouping_level, service_type NULLS FIRST, line_status NULLS FIRST""".stripMargin

  /** Explicit GROUPING SETS — the third grouping-sets surface next to
    * ROLLUP/CUBE: an ARBITRARY set list ((type,year),(type),(year))
    * that neither rollup (no (year)-only subtotal) nor cube (no way to
    * omit the grand total) can express. One Expand-based pass: the scan
    * is read once and each row fans out to its 3 grouping copies before
    * the single partial+final HashAggregate — at 100 TB this is one
    * shuffle on the (grouping_id, keys) composite, not 3 query passes.
    * grouping_id() bit order follows the groupingSets column list
    * (first = MSB), matching DuckDB GROUPING(a, b). */
  def groupingSetsRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("service_type"),
        year($"l_shipdate").as("ship_year"),
        $"l_extendedprice")
      .groupingSets(
        Seq(Seq($"service_type", $"ship_year"), Seq($"service_type"), Seq($"ship_year")),
        $"service_type", $"ship_year")
      .agg(grouping_id().cast("int").as("grouping_level"),
        count(lit(1)).as("trips"),
        sumExact($"l_extendedprice").as("total_revenue"))
      .orderBy($"grouping_level", $"service_type", $"ship_year")
  }

  val groupingSetsRevenueSql: String =
    s"""SELECT l_returnflag AS service_type,
       |       CAST(YEAR(l_shipdate) AS INTEGER) AS ship_year,
       |       CAST(GROUPING(l_returnflag, YEAR(l_shipdate)) AS INTEGER) AS grouping_level,
       |       COUNT(*) AS trips,
       |       ${sumExactSql("l_extendedprice")} AS total_revenue
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, YEAR(l_shipdate)), (l_returnflag), (YEAR(l_shipdate)))
       |ORDER BY grouping_level, service_type NULLS FIRST, ship_year NULLS FIRST""".stripMargin

  /** Group-wise outlier report (mean + 3σ rule) with DETERMINISTIC
    * moments: both sums route through exact decimals (the [[graft.functions.Exact]]
    * discipline), so mean/σ/threshold are the same doubles in any
    * partition order and in the DuckDB oracle — a float stddev_samp
    * would hash-diverge run to run. Two passes: a tiny per-group stats
    * aggregate broadcast back over the scan for the outlier count;
    * at 100 TB both passes are one shuffle-free map + one 3-row agg. */
  def amountOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("service_type"), $"l_extendedprice".as("amount"))
    // s2: square in IEEE double (one deterministic multiply per row),
    // THEN route through the exact decimal sum — a decimal×decimal
    // square would overflow DuckDB's 38-digit cap
    val stats = li.groupBy($"service_type").agg(
      count(lit(1)).as("n"),
      sumExact($"amount").as("s1"),
      sumExact($"amount" * $"amount").as("s2"))
    val thr = stats.select($"service_type", $"n",
      ($"s1" / $"n").as("mean"),
      sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("sigma"))
    li.join(broadcast(thr), Seq("service_type"))
      .groupBy($"service_type")
      .agg(max($"n").as("n"),
        round(max($"mean"), 6).as("mean_amount"),
        round(max($"sigma"), 6).as("stddev_amount"),
        sum(when($"amount" > $"mean" + lit(3) * $"sigma", 1L).otherwise(0L))
          .as("n_outliers"),
        max($"amount").as("max_amount"))
      .orderBy($"service_type")
  }

  val amountOutliersSql: String =
    s"""WITH li AS (
      |  SELECT l_returnflag AS service_type, l_extendedprice AS amount
      |  FROM lineitem),
      |st AS (
      |  SELECT service_type, COUNT(*) AS n,
      |         ${sumExactSql("amount")} AS s1,
      |         ${sumExactSql("amount * amount")} AS s2
      |  FROM li GROUP BY 1),
      |thr AS (
      |  SELECT service_type, n, s1 / n AS mean,
      |         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sigma
      |  FROM st)
      |SELECT li.service_type,
      |       CAST(max(thr.n) AS BIGINT) AS n,
      |       round(max(thr.mean), 6) AS mean_amount,
      |       round(max(thr.sigma), 6) AS stddev_amount,
      |       CAST(sum(CASE WHEN li.amount > thr.mean + 3 * thr.sigma THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       max(li.amount) AS max_amount
      |FROM li JOIN thr USING (service_type)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Exact distinct cardinalities per group (engine surface; the scale
    * path for approximate needs is `approx_count_distinct`, not
    * oracle-comparable by construction). Two-level shuffle: distinct
    * expansion then final merge — Catalyst's expand-based plan. */
  def distinctCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag".as("service_type"))
      .agg(
        countDistinct($"l_partkey").as("distinct_parts"),
        countDistinct($"l_suppkey").as("distinct_suppliers"),
        count(lit(1)).as("trips"))
      .orderBy($"service_type")
  }

  val distinctCountsSql: String =
    """SELECT l_returnflag AS service_type,
      |       COUNT(DISTINCT l_partkey) AS distinct_parts,
      |       COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
      |       COUNT(*) AS trips
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY service_type""".stripMargin

  /** Set operations (INTERSECT / EXCEPT — absent from the reference,
    * SURVEY §2.7, present for engine completeness): customers active in
    * 1995 AND 1996, minus those active in 1997. Both are shuffle
    * dedup-joins on the full key; at scale prefer left_semi/left_anti
    * joins on pre-aggregated keys (same result, join-planned). */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def activeIn(y: Int) = Tables.orders(spark, sfDir)
      .filter(year($"o_orderdate") === y).select($"o_custkey")
    activeIn(1995).intersect(activeIn(1996))
      .except(activeIn(1997))
      .orderBy($"o_custkey")
  }

  val setOpsSql: String =
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      |ORDER BY o_custkey""".stripMargin

  /** Pivot (long→wide) — trips per service across line statuses as
    * columns. Spark plans pivot as a single-pass conditional
    * aggregation; the oracle states that form explicitly (engine-
    * portable and identical). */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag".as("service_type"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .withColumnRenamed("F", "n_fulfilled")
      .withColumnRenamed("O", "n_open")
      // pivot emits NULL (not 0) for absent (group, value) combos; the
      // conditional-aggregation oracle counts 0 — align explicitly
      .na.fill(0L, Seq("n_fulfilled", "n_open"))
      .orderBy($"service_type")
  }

  val pivotStatusSql: String =
    """SELECT l_returnflag AS service_type,
      |       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_fulfilled,
      |       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_open
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY service_type""".stripMargin

  /** Semi-structured column surface: the events table carries a JSON
    * `props` string (engine breadth — the reference has no JSON, SURVEY
    * §2.8, but pipeline users do). Extraction stays codegen'd
    * (`get_json_object`); at scale prefer `from_json` with a declared
    * schema once per column rather than repeated path extraction. */
  /** The twins' `$.k` extraction expressions, ONE copy each —
    * VariantPropsSpec runs exactly these, so the parity contract cannot
    * drift from the registered queries. Both degrade to NULL on
    * malformed JSON AND on a parseable row whose `k` isn't an int
    * ({"k":"abc"}): try semantics end to end, because under Spark 4's
    * default ANSI mode a plain cast would THROW on the dirty value the
    * fixtures don't currently contain (round-7 review — same family as
    * the try_parse_json choice below). */
  private[graft] def propsKString(props: Column): Column =
    get_json_object(props, "$.k").try_cast("int")
  private[graft] def propsKVariant(props: Column): Column =
    try_variant_get(try_parse_json(props), "$.k", "int")

  def eventProps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .withColumn("k", propsKString($"props"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        avgExact($"k").as("avg_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val eventPropsSql: String =
    s"""SELECT event_type, COUNT(*) AS n_events,
       |       ${avgExactSql("CAST(json_extract_string(props, '$.k') AS INTEGER)")} AS avg_k,
       |       MIN(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS min_k,
       |       MAX(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS max_k
       |FROM events
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin

  /** VARIANT-typed twin of [[eventProps]] (the Spark 4 semi-structured
    * type): `parse_json` decodes each props string ONCE into the
    * shredded binary VARIANT encoding; `variant_get` then extracts
    * typed paths without re-parsing. Same values as the string-path
    * query — the oracle is shared — but the 100 TB shape differs:
    * `get_json_object` re-parses the JSON text per extraction call,
    * while a VARIANT parse is paid once per row however many fields
    * extract, and with parquet variant shredding the decode moves into
    * the scan itself (the open-lakehouse direction for semi-structured
    * columns). */
  def eventPropsVariant(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      // try_parse_json AND try_variant_get, not their throwing forms:
      // the string-path twin maps a malformed props row to NULL
      // (get_json_object semantics) and a non-int `k` to NULL (the
      // try_cast), so the VARIANT twin must degrade identically on
      // BOTH failure axes — malformed JSON (parse time) and a parseable
      // row whose value can't cast ({"k":"abc"} — extract time) —
      // rather than throw. Pinned in VariantPropsSpec.
      .withColumn("k", propsKVariant($"props"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        avgExact($"k").as("avg_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Sketch-path statistics — the 100 TB variants of A5/COUNT DISTINCT:
    * approx_percentile (single-pass, mergeable, bounded error instead
    * of percentile_cont's full per-group sort) and
    * approx_count_distinct (HLL++, constant memory per group).
    * Deterministic for fixed input but engine-specific — no DuckDB
    * oracle; the test suite bounds them against the exact values. */
  def approxStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag".as("service_type"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50_price_approx"),
        approx_count_distinct($"l_partkey").as("distinct_parts_approx"),
        count(lit(1)).as("trips"))
      .orderBy($"service_type")
  }

  /** Hash-gateable twin of [[approxStats]]: the same approximate
    * statistics from DETERMINISTIC sketches instead of Spark's
    * engine-internal ones — p50 off a KMV bottom-k sample (md5
    * priorities, exact median within the sample — the
    * [[quantileSketchRollup]] recipe) and distinct parts off the
    * register HLL with pinned integer/IEEE arithmetic (the
    * hllRegisterRollup recipe, grouped by return flag). Same mergeable
    * 100 TB shape as the built-ins; gains an exact DuckDB oracle. */
  /** THE single copy of the register-HLL formula pieces (m = 256),
    * shared by [[approxStatsSketch]] and [[hllRegisterRollup]] — the
    * pinned arithmetic must never diverge between the two gates
    * (round-6 review). Callers keep the column-name contract: grouped
    * registers named `reg`, window max named `rmax`, aggregate outputs
    * `rmax_i`/`znum`. */
  private object RegisterHll {
    def bucket(h: Column): Column = h % 256
    def rho(h: Column): Column = {
      val w = shiftright(h, 8)
      when(w === 0, lit(53)).otherwise(lit(53) - length(bin(w)))
    }
    /** Exact-integer harmonic numerator Σ2^(rmax−reg) + V·2^rmax. */
    val znum: Column =
      sum(expr("shiftleft(CAST(1 AS BIGINT), rmax - reg)")) +
        (lit(256) - count(lit(1))).cast("long") *
          expr("shiftleft(CAST(1 AS BIGINT), max(rmax))")
    val alphaM2: Column =
      (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))) * lit(65536.0)
    /** One pinned IEEE op chain over the exact integers. */
    def estimate: Column =
      alphaM2 * expr("CAST(shiftleft(CAST(1 AS BIGINT), rmax_i) AS DOUBLE)") /
        col("znum").cast("double")
  }

  def approxStatsSketch(spark: SparkSession, sfDir: String,
      k: Int = 256): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("service_type"), $"l_extendedprice",
        $"l_partkey", $"l_orderkey", $"l_linenumber")
    // KMV sample per group -> exact median within sample
    val pri = graft.functions.Dedup.hash60(concat_ws("|",
      $"l_orderkey".cast("string"), $"l_linenumber".cast("string"),
      lit("astat_v1")))
    val w = Window.partitionBy($"service_type").orderBy($"pri", $"l_extendedprice")
    val p50 = li.withColumn("pri", pri)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .groupBy($"service_type")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6)
        .as("p50_price_approx"))
    // register HLL per group on l_partkey (m = 256, est_raw pinned)
    val h = graft.functions.Dedup.hash60(
      concat_ws("|", $"l_partkey".cast("string"), lit("astat_hll_v1")))
    val r = li.select($"service_type", h.as("h"))
      .select($"service_type", RegisterHll.bucket($"h").as("bucket"),
        RegisterHll.rho($"h").as("rho"))
    val regs = r.groupBy($"service_type", $"bucket").agg(max($"rho").as("reg"))
    val wr = regs.withColumn("rmax",
      max($"reg").over(Window.partitionBy($"service_type")))
    val hll = wr.groupBy($"service_type").agg(
        max($"rmax").as("rmax_i"), RegisterHll.znum.as("znum"))
      .select($"service_type", RegisterHll.estimate.as("distinct_parts_est"))
    val counts = li.groupBy($"service_type").agg(count(lit(1)).as("trips"))
    p50.join(hll, "service_type").join(counts, "service_type")
      .orderBy($"service_type")
  }

  val approxStatsSketchSql: String =
    s"""WITH li AS (
       |  SELECT l_returnflag AS service_type, l_extendedprice, l_partkey,
       |         l_orderkey, l_linenumber
       |  FROM lineitem),
       |pr AS (
       |  SELECT service_type, l_extendedprice,
       |         CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
       |           || CAST(l_linenumber AS VARCHAR) || '|astat_v1'), 1, 15)) AS BIGINT) AS pri
       |  FROM li),
       |kept AS (
       |  SELECT service_type, l_extendedprice,
       |         row_number() OVER (PARTITION BY service_type
       |           ORDER BY pri, l_extendedprice) AS rn
       |  FROM pr),
       |p50 AS (
       |  SELECT service_type,
       |         round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price_approx
       |  FROM kept WHERE rn <= 256 GROUP BY service_type),
       |hh AS (
       |  SELECT service_type,
       |         CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)
       |           || '|astat_hll_v1'), 1, 15)) AS BIGINT) AS h
       |  FROM li),
       |rr AS (
       |  SELECT service_type, h % 256 AS bucket,
       |         CASE WHEN h // 256 = 0 THEN 53
       |              ELSE 53 - length(bin(h // 256)) END AS rho
       |  FROM hh),
       |regs AS (SELECT service_type, bucket, max(rho) AS reg
       |         FROM rr GROUP BY 1, 2),
       |wr AS (SELECT service_type, bucket, reg,
       |              max(reg) OVER (PARTITION BY service_type) AS rmax
       |       FROM regs),
       |hll AS (
       |  SELECT service_type,
       |         ((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |             + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
       |           * CAST(65536.0 AS DOUBLE))
       |           * CAST(1::BIGINT << CAST(max(rmax) AS BIGINT) AS DOUBLE)
       |           / CAST(CAST(sum(1::BIGINT << (rmax - reg))
       |               + (256 - count(*)) * (1::BIGINT << max(rmax)) AS BIGINT) AS DOUBLE)
       |           AS distinct_parts_est
       |  FROM wr GROUP BY service_type),
       |cnt AS (SELECT service_type, COUNT(*) AS trips FROM li GROUP BY 1)
       |SELECT service_type, p50.p50_price_approx, hll.distinct_parts_est, cnt.trips
       |FROM p50 JOIN hll USING (service_type) JOIN cnt USING (service_type)
       |ORDER BY service_type""".stripMargin

  /** evidencias/matriz-cobertura.csv: per (year, month, service) coverage
    * with COUNT/SUM/MIN/MAX (A7) — the loader-manifest analog. */
  def coverageMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy(
        year($"l_shipdate").as("trip_year"),
        month($"l_shipdate").as("trip_month"),
        $"l_returnflag".as("service_type"))
      .agg(
        count(lit(1)).as("total_trips"),
        sumExact($"l_quantity").as("total_miles"),
        sumExact($"l_extendedprice").as("total_revenue"),
        min($"l_shipdate".cast("date")).as("first_trip"),
        max($"l_shipdate".cast("date")).as("last_trip"))
      .orderBy($"trip_year", $"trip_month", $"service_type")
  }

  val coverageMatrixSql: String =
    s"""SELECT CAST(year(l_shipdate) AS INTEGER) AS trip_year,
       |       CAST(month(l_shipdate) AS INTEGER) AS trip_month,
       |       l_returnflag AS service_type,
       |       COUNT(*) AS total_trips,
       |       ${sumExactSql("l_quantity")} AS total_miles,
       |       ${sumExactSql("l_extendedprice")} AS total_revenue,
       |       MIN(CAST(l_shipdate AS DATE)) AS first_trip,
       |       MAX(CAST(l_shipdate AS DATE)) AS last_trip
       |FROM lineitem
       |GROUP BY 1, 2, 3
       |ORDER BY trip_year, trip_month, service_type""".stripMargin

  /** Equi-width histogram of line amounts — the distribution primitive
    * behind every profiling UI. Bounds come from an in-plan 1-row
    * min/max aggregate broadcast back over a second scan (the
    * quality-gate shape: no driver collect), bucket assignment is one
    * fixed-order double expression clamped so x == max lands in the
    * last bucket, and bucket bounds are recomputed from the index so
    * both engines render identical doubles.
    *
    * Scale: two scans (bounds + assign) and one |buckets|-sized
    * aggregate; the broadcast is a single row. A streaming/sketch
    * variant would swap exact bounds for a quantile sketch. */
  def histogram(spark: SparkSession, sfDir: String, nBuckets: Int = 20): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir).select($"l_extendedprice".as("x"))
    val bounds = li.agg(min($"x").as("lo"), max($"x").as("hi"))
    val b = lit(nBuckets)
    li.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(floor(($"x" - $"lo") * b / ($"hi" - $"lo")), b - 1).cast("int"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), max($"lo").as("lo"), max($"hi").as("hi"))
      .select($"bucket",
        round($"lo" + $"bucket" * ($"hi" - $"lo") / b, 6).as("bucket_lo"),
        round($"lo" + ($"bucket" + 1) * ($"hi" - $"lo") / b, 6).as("bucket_hi"),
        $"n")
      .orderBy($"bucket")
  }

  /** Mergeable-sketch re-aggregation — the pre-aggregated rollup
    * pattern exact COUNT DISTINCT forbids: distinct counts don't add,
    * but HLL SKETCHES union losslessly, so a pipeline stores one tiny
    * sketch per (day) and answers any coarser distinct-user question
    * by unioning sketches instead of rescanning events. At 100 TB the
    * daily sketch table is KB-sized where the raw re-scan is the whole
    * corpus — this is how warehouse rollup tables serve distinct
    * metrics.
    *
    * Rows-only gate (sketch estimates have no SQL oracle); the spec
    * pins the union estimate against the EXACT weekly distinct within
    * HLL's published error envelope, and sketch-of-week ==
    * union-of-day-sketches as a re-aggregation identity. */
  def hllUnionRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // sketch-only: an exact count_distinct alongside would re-pay the
    // very (day, user) shuffle this rollup exists to avoid
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("sketch"))
    daily
      .groupBy(date_trunc("week", $"day").cast("date").as("week"))
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("approx_weekly"))
      .orderBy($"week")
  }

  /** Hash-gateable wrapper for the black-box sketch: `hll_sketch_agg`
    * is engine-internal (no DuckDB twin), but its CONTRACT is — emit
    * the exact weekly distinct (oracle-recomputable) plus the estimate
    * folded into a pinned envelope boolean. The oracle pins n_exact
    * hash-exactly and within_5pct ≡ TRUE, so a broken union or a
    * drifted estimator flips the gate red; only the estimate's exact
    * digits stay engine-private. (The exact count re-pays the (week,
    * user) shuffle the production rollup avoids — gate-only cost,
    * documented; the register-HLL twin below is the cross-engine-exact
    * path.) */
  def hllUnionGate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val est = hllUnionRollup(spark, sfDir)
    val exact = Tables.events(spark, sfDir)
      .groupBy(date_trunc("week", to_date($"ts")).cast("date").as("week"))
      .agg(countDistinct($"user_id").as("n_exact"))
    est.join(exact, "week")
      .select($"week", $"n_exact",
        (abs($"approx_weekly" - $"n_exact") / $"n_exact" < 0.05).as("within_5pct"))
      .orderBy($"week")
  }

  val hllUnionGateSql: String =
    """SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
      |       count(DISTINCT user_id) AS n_exact,
      |       TRUE AS within_5pct
      |FROM events
      |GROUP BY 1
      |ORDER BY week""".stripMargin

  /** Register-level HLL built from scratch — the cross-engine-EXACT
    * twin of [[hllUnionRollup]]. Spark's `hll_sketch_agg` is a black
    * box no other engine reproduces bit-for-bit, so that query can only
    * be rows-gated; this one IS hash-gated, because every step is
    * integer-exact in both engines:
    *
    *   - 60-bit md5 item hash ([[graft.functions.Dedup.hash60]]),
    *     bucket = low 8 bits (m = 256), w = high 52 bits;
    *   - rho = leading-zero rank of w via `length(bin(w))` — string
    *     length of the minimal binary rendering, identical in Spark and
    *     DuckDB, no floating log2;
    *   - per-day registers = max(rho) per bucket (duplicates are
    *     absorbed by max — no pre-distinct shuffle needed);
    *   - weekly union = REGISTER-WISE MAX of daily registers — the HLL
    *     union is lossless and commutative, which is the whole point of
    *     storing sketches: any coarser rollup is a tiny merge, never a
    *     rescan;
    *   - the harmonic denominator as an exact integer:
    *     znum = Σ 2^(rmax − reg) over live buckets + V·2^rmax (empty
    *     buckets carry reg = 0; rho ≥ 1 so reg = 0 never collides),
    *     ≤ 2^62 — no overflow;
    *   - est_raw = ((α·m²)·2^rmax)/znum as ONE pinned IEEE op sequence
    *     over exact operands (α from literals both engines fold with
    *     correctly-rounded arithmetic) — bit-identical doubles, the
    *     [[statsMoments]] discipline.
    *
    * est_raw is the UNCORRECTED estimator (no linear-counting branch:
    * its m·ln(m/V) needs a transcendental the two engines don't
    * guarantee to round identically). The spec bounds est_raw against
    * exact weekly distincts within the published error envelope.
    *
    * At 100 TB: the stored artifact is 256 small ints per (day) — the
    * rollup table pattern for distinct metrics; re-aggregation cost is
    * |days|·256 rows, independent of corpus size. */
  def hllRegisterRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val item = concat($"user_id".cast("string"), lit("#"), $"event_type",
      lit("|hll_v1"))
    val ev = Tables.events(spark, sfDir)
      .select(to_date($"ts").as("day"),
        graft.functions.Dedup.hash60(item).as("h"))
    val r = ev.select($"day", RegisterHll.bucket($"h").as("bucket"),
      RegisterHll.rho($"h").as("rho"))
    val daily = r.groupBy($"day", $"bucket").agg(max($"rho").as("reg"))
    val weekly = daily
      .groupBy(date_trunc("week", $"day").cast("date").as("week"), $"bucket")
      .agg(max($"reg").as("reg"))
    val wk = weekly.withColumn("rmax",
      max($"reg").over(Window.partitionBy($"week")))
    val agg = wk.groupBy($"week").agg(
      max($"rmax").as("rmax_i"),
      (lit(256) - count(lit(1))).as("v_zero_i"),
      RegisterHll.znum.as("znum"))
    agg.select($"week",
        $"rmax_i".cast("long").as("rmax"),
        $"v_zero_i".cast("long").as("v_zero"),
        $"znum",
        RegisterHll.estimate.as("est_raw"))
      .orderBy($"week")
  }

  val hllRegisterSql: String =
    """WITH h AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#' || event_type || '|hll_v1'), 1, 15)) AS BIGINT) AS h
      |  FROM events),
      |r AS (
      |  SELECT day, h % 256 AS bucket,
      |         CASE WHEN h // 256 = 0 THEN 53
      |              ELSE 53 - length(bin(h // 256)) END AS rho
      |  FROM h),
      |daily AS (SELECT day, bucket, max(rho) AS reg FROM r GROUP BY 1, 2),
      |weekly AS (SELECT CAST(date_trunc('week', day) AS DATE) AS week, bucket,
      |                  max(reg) AS reg
      |           FROM daily GROUP BY 1, 2),
      |wk AS (SELECT week, bucket, reg,
      |              max(reg) OVER (PARTITION BY week) AS rmax
      |       FROM weekly),
      |agg AS (SELECT week,
      |               CAST(max(rmax) AS BIGINT) AS rmax,
      |               CAST(256 - count(*) AS BIGINT) AS v_zero,
      |               CAST(sum(1::BIGINT << (rmax - reg))
      |                    + (256 - count(*)) * (1::BIGINT << max(rmax)) AS BIGINT) AS znum
      |        FROM wk GROUP BY week)
      |SELECT week, rmax, v_zero, znum,
      |       ((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
      |         * CAST(65536.0 AS DOUBLE))
      |         * CAST(1::BIGINT << rmax AS DOUBLE) / CAST(znum AS DOUBLE) AS est_raw
      |FROM agg ORDER BY week""".stripMargin

  /** Mergeable QUANTILE sketch rollup — the percentile analog of
    * [[hllUnionRollup]], via a KMV bottom-k sample: every row gets a
    * deterministic md5 priority, each day keeps its k lowest-priority
    * (value, priority) pairs, and weeks merge daily sketches by
    * re-taking the bottom-k of the union. Mergeability is EXACT (not
    * approximate): bottom-k of a union equals bottom-k of the
    * per-part bottom-k's — the identity QuantileSketchSpec asserts
    * against the sketch built directly on the whole week. The kept
    * rows are a uniform (hash-ordered) sample, so within-sketch exact
    * percentiles estimate the true quantiles with standard
    * sampling error (empirically bounded in the spec).
    *
    * Why hash priorities and not `rand()`: the sketch is a pure
    * function of the data — recomputes, retries, and re-partitioning
    * reproduce it bit-for-bit (the [[graft.functions.Sampling]]
    * discipline), and two engines agree on its contents.
    *
    * At 100 TB: daily sketch state is k rows per partition pre-combine
    * (the row_number window runs per day-partition after one keyed
    * shuffle); the weekly merge touches only |days| × k rows — the
    * pre-aggregated-rollup pattern exact percentile_cont forbids. */
  def quantileSketchRollup(spark: SparkSession, sfDir: String,
      k: Int = 256): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.Dedup.hash60(
      concat_ws("|", $"event_id".cast("string"), lit("qsketch_v1")))
    val ev = Tables.events(spark, sfDir)
      .select(to_date($"ts").as("day"), $"value", pri.as("pri"))
    val dayW = Window.partitionBy($"day").orderBy($"pri", $"value")
    val daily = ev
      .withColumn("rn", row_number().over(dayW)).filter($"rn" <= k)
      .select($"day", $"value", $"pri")
    val weekW = Window.partitionBy($"week").orderBy($"pri", $"value")
    sketchEstimates(daily
      .withColumn("week", date_trunc("week", $"day").cast("date"))
      .withColumn("rn", row_number().over(weekW)).filter($"rn" <= k)
      .select($"week", $"value", $"pri"))
  }

  /** Quantile estimates off a (week, value, pri) sketch table — shared
    * by the batch rollup and the streaming maintenance twin, so both
    * gates run the identical estimator. */
  private[graft] def sketchEstimates(sketch: DataFrame): DataFrame =
    sketch
      .groupBy(col("week"))
      .agg(count(lit(1)).cast("int").as("n_sample"),
        round(expr("percentile(value, 0.5)"), 6).as("p50_est"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_est"))
      .orderBy(col("week"))

  /** Oracle: the sketch is DETERMINISTIC SQL (md5 priorities, bottom-k,
    * exact within-sample percentiles), and bottom-k commutes with the
    * day→week rollup (QuantileSketchSpec), so DuckDB reproduces the
    * estimates from the week-direct formulation hash-exactly. */
  def quantileSketchSql(k: Int = 256): String =
    s"""WITH pr AS (
       |  SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
       |         value,
       |         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
       |           || '|qsketch_v1'), 1, 15)) AS BIGINT) AS pri
       |  FROM events),
       |kept AS (
       |  SELECT week, value,
       |         row_number() OVER (PARTITION BY week ORDER BY pri, value) AS rn
       |  FROM pr)
       |SELECT week, CAST(COUNT(*) AS INTEGER) AS n_sample,
       |       round(quantile_cont(value, 0.5), 6) AS p50_est,
       |       round(quantile_cont(value, 0.95), 6) AS p95_est
       |FROM kept WHERE rn <= $k
       |GROUP BY week
       |ORDER BY week""".stripMargin

  /** Scalar-function surface parity in one gated pass — the string and
    * date/interval builtins a SQL-first user reaches for daily, each
    * pinned cross-engine: lpad, split_part (1-indexed in both),
    * translate, reverse, replace, locate/position (1-based, 0 when
    * absent), last_day, add_months (both engines clamp to month end),
    * datediff, quarter. Narrow codegen projection; zero shuffles
    * besides the output sort. */
  def scalarFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        lpad($"o_orderkey".cast("string"), 8, "0").as("padded"),
        split_part($"o_orderpriority", lit("-"), lit(2)).as("prio_word"),
        translate($"o_orderstatus", "OFP", "ofp").as("status_lc"),
        reverse($"o_orderpriority").as("prio_rev"),
        regexp_replace($"o_orderpriority", "-", "_").as("prio_u"),
        locate("5", $"o_orderkey".cast("string")).as("pos5"),
        last_day(to_date($"o_orderdate")).as("month_end"),
        add_months(to_date($"o_orderdate"), 3).as("plus3m"),
        datediff(to_date($"o_orderdate"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        quarter($"o_orderdate").as("q"))
      .orderBy($"o_orderkey")
  }

  val scalarFuncsSql: String =
    """SELECT o_orderkey,
      |       lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS padded,
      |       split_part(o_orderpriority, '-', 2) AS prio_word,
      |       translate(o_orderstatus, 'OFP', 'ofp') AS status_lc,
      |       reverse(o_orderpriority) AS prio_rev,
      |       replace(o_orderpriority, '-', '_') AS prio_u,
      |       CAST(position('5' IN CAST(o_orderkey AS VARCHAR)) AS INTEGER) AS pos5,
      |       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
      |       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Array / higher-order-function surface parity: array_max, a left
    * FOLD (Spark `aggregate` ≡ DuckDB `list_reduce` — both
    * left-associated, so IEEE sums agree bit-for-bit), `filter`,
    * `slice`, `transform`, and array_position (both engines return 0
    * when absent). The comparison threshold is 0.125 — dyadic, exactly
    * representable as float AND double, so the float-vs-double
    * comparison path can't disagree (0.1 would: 0.1f ≠ 0.1d). HOFs are
    * interpreted in Spark — fine in a parity sweep, wrong in a hot
    * path ([[graft.plans.NGrams]] et al. exist for those). */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val asDouble = transform($"embedding", x => x.cast("double"))
    Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        round(array_max(asDouble), 6).as("max_elem"),
        round(aggregate(transform(slice($"embedding", 1, 8),
          x => x.cast("double")), lit(0.0), (a, x) => a + x), 6)
          .as("head_sum"),
        size(filter($"embedding", x => x > 0)).as("n_pos"),
        array_position(transform($"embedding", x => x > 0.125f),
          true).cast("int").as("first_big"))
      .orderBy($"vec_id")
  }

  val arrayFuncsSql: String =
    """SELECT vec_id,
      |       round(CAST(list_max(list_transform(embedding,
      |                x -> CAST(x AS DOUBLE))) AS DOUBLE), 6) AS max_elem,
      |       round(CAST(list_reduce(
      |                list_prepend(CAST(0.0 AS DOUBLE),
      |                  list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
      |                (a, x) -> a + x) AS DOUBLE), 6) AS head_sum,
      |       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
      |       CAST(list_position(list_transform(embedding,
      |                x -> x > CAST(0.125 AS FLOAT)), true) AS INTEGER) AS first_big
      |FROM embeddings
      |ORDER BY vec_id""".stripMargin

  /** NULL-semantics parity: the null GROUP (SQL groups null keys
    * together), count(*) vs count(col), null-safe equality
    * (Spark `<=>` ≡ SQL `IS NOT DISTINCT FROM`), and coalesce — on a
    * key column deliberately nulled for every 7th order. */
  /** Error-handling semantics sweep — the ANSI/`try_` surface.
    *
    * Spark 4 runs ANSI mode by default: division by zero, invalid
    * casts, and bad array indices THROW unless routed through the
    * `try_` family, which returns NULL — exactly DuckDB's default
    * behavior for the same expressions. This query pins that
    * correspondence pair by pair (each column is one semantic), plus
    * two classic cross-dialect gotchas that agree: sign of `%` follows
    * the dividend, and negative substring starts index from the end.
    * Mismatched semantics found while probing are documented OUT:
    * DuckDB TRY_CAST('3.7' AS INT) rounds to 4 while Spark's try_cast
    * rejects non-integral strings (NULL); and index 0 is NULL in
    * DuckDB but throws INVALID_INDEX_OF_ZERO in Spark EVEN under
    * try_element_at (try_ catches out-of-bounds, not invalid-index) —
    * both pairs excluded. */
  def trySemantics(spark: SparkSession, sfDir: String): DataFrame = {
    spark.range(1).toDF("one").selectExpr(
      "CAST(try_divide(7, 0) AS DOUBLE) AS div0_int",
      "CAST(try_divide(1.0, 0.0) AS DOUBLE) AS div0_dbl",
      "CAST(7 / 2 AS DOUBLE) AS int_div_is_double",
      "CAST(7 div 2 AS BIGINT) AS floor_div",
      "try_cast('abc' AS INT) AS cast_bad",
      "try_cast(' 12 ' AS INT) AS cast_trimmed",
      "CAST(try_to_timestamp('not a date') AS TIMESTAMP) AS ts_bad",
      "CAST(try_element_at(array(10, 20), 5) AS INT) AS elem_oob",
      "CAST(element_at(array(10, 20), 2) AS INT) AS elem_ok",
      "CAST((-7) % 3 AS BIGINT) AS mod_neg_dividend",
      "CAST(7 % (-3) AS BIGINT) AS mod_neg_divisor",
      "substring('abc', -1, 2) AS substr_neg_start")
  }

  val trySemanticsSql: String =
    """SELECT CAST(7 / 0 AS DOUBLE) AS div0_int,
      |       CAST(1.0 / 0.0 AS DOUBLE) AS div0_dbl,
      |       CAST(7 / 2 AS DOUBLE) AS int_div_is_double,
      |       CAST(7 // 2 AS BIGINT) AS floor_div,
      |       TRY_CAST('abc' AS INTEGER) AS cast_bad,
      |       TRY_CAST(' 12 ' AS INTEGER) AS cast_trimmed,
      |       TRY_CAST('not a date' AS TIMESTAMP) AS ts_bad,
      |       CAST(list_extract([10, 20], 5) AS INTEGER) AS elem_oob,
      |       CAST(([10, 20])[2] AS INTEGER) AS elem_ok,
      |       CAST((-7) % 3 AS BIGINT) AS mod_neg_dividend,
      |       CAST(7 % (-3) AS BIGINT) AS mod_neg_divisor,
      |       substr('abc', -1, 2) AS substr_neg_start""".stripMargin

  /** MAP-type surface parity: construction, key/value extraction,
    * lookup, cardinality, membership — rendered to scalars because the
    * engines' native map orderings differ (Spark preserves insertion
    * order, DuckDB's is storage order; sorting the extracted arrays
    * removes the ambiguity, which is also the portable way to USE map
    * output). DuckDB 1.0 map lookup returns a one-element LIST —
    * `m['a'][1]` — another pinned dialect gap. */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    spark.range(1).toDF("one").selectExpr(
      "array_join(sort_array(map_keys(map('b', 2, 'a', 1))), ',') AS ks",
      "array_join(sort_array(transform(map_values(map('b', 2, 'a', 1)), " +
        "x -> CAST(x AS STRING))), ',') AS vs",
      "size(map('a', 1, 'b', 2)) AS n",
      "CAST(element_at(map('a', 1, 'b', 2), 'a') AS INT) AS ea",
      "CAST(try_element_at(map('a', 1), 'zzz') AS INT) AS ea_missing",
      "array_contains(map_keys(map('a', 1)), 'a') AS has_key")
  }

  val mapFuncsSql: String =
    """SELECT array_to_string(list_sort(map_keys(MAP {'b': 2, 'a': 1})), ',') AS ks,
      |       array_to_string(list_sort(list_transform(
      |         map_values(MAP {'b': 2, 'a': 1}), x -> CAST(x AS VARCHAR))), ',') AS vs,
      |       CAST(cardinality(MAP {'a': 1, 'b': 2}) AS INT) AS n,
      |       CAST((MAP {'a': 1, 'b': 2}['a'])[1] AS INT) AS ea,
      |       CAST((MAP {'a': 1}['zzz'])[1] AS INT) AS ea_missing,
      |       list_contains(map_keys(MAP {'a': 1}), 'a') AS has_key""".stripMargin

  def nullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice",
        when($"o_orderkey" % 7 === 0, lit(null)).otherwise($"o_orderstatus")
          .as("s"))
      .groupBy($"s")
      .agg(count(lit(1)).as("n_rows"),
        count($"s").as("n_nonnull"),
        count(when($"s" <=> lit(null), 1)).as("n_nullsafe_null"),
        sumExact($"o_totalprice").as("revenue"))
      .withColumn("s_filled", coalesce($"s", lit("NONE")))
      .orderBy($"s".asc_nulls_first)
  }

  val nullSemanticsSql: String =
    s"""WITH t AS (
      |  SELECT o_orderkey, o_totalprice,
      |         CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |              ELSE o_orderstatus END AS s
      |  FROM orders)
      |SELECT s, COUNT(*) AS n_rows, COUNT(s) AS n_nonnull,
      |       COUNT(CASE WHEN s IS NOT DISTINCT FROM NULL THEN 1 END)
      |         AS n_nullsafe_null,
      |       ${sumExactSql("o_totalprice")} AS revenue,
      |       coalesce(s, 'NONE') AS s_filled
      |FROM t GROUP BY s
      |ORDER BY s NULLS FIRST""".stripMargin

  /** UNPIVOT — the inverse of [[pivotStatus]], closing the reshape
    * pair: the wide pivot output melts back to long via `stack` (a
    * generator: one pass, rows-out = rows-in × statuses, no shuffle of
    * its own). Zero cells survive the round trip (the pivot
    * zero-fills), which is what distinguishes melt from re-aggregating
    * the raw table — the oracle mirrors that with per-status
    * conditional counts. */
  def unpivotStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pivotStatus(spark, sfDir)
      .select($"service_type",
        expr("stack(2, 'F', n_fulfilled, 'O', n_open) AS (status, n)"))
      .orderBy($"service_type", $"status")
  }

  val unpivotStatusSql: String =
    """SELECT l_returnflag AS service_type, 'F' AS status,
      |       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n
      |FROM lineitem GROUP BY 1
      |UNION ALL
      |SELECT l_returnflag, 'O',
      |       COUNT(*) FILTER (WHERE l_linestatus = 'O')
      |FROM lineitem GROUP BY 1
      |ORDER BY service_type, status""".stripMargin

  /** Winsorization — the robust-statistics clamp (cap each group's
    * values at its own p05/p95) that precedes any mean-based metric on
    * heavy-tailed data. Group bounds come from the exact
    * `percentile_cont` (cross-engine interpolation parity proven by
    * q_duration_percentiles), broadcast back over a second scan — the
    * quality-gate shape: data-dependent thresholds with no driver
    * collect and zero corpus shuffles beyond the bounds aggregate.
    * The winsorized total stays decimal-routed. */
  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("service_type"), $"l_extendedprice".as("amount"))
    val bounds = li.groupBy($"service_type").agg(
      expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY amount)").as("lo"),
      expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY amount)").as("hi"))
    li.join(broadcast(bounds), "service_type")
      .withColumn("w", least(greatest($"amount", $"lo"), $"hi"))
      .groupBy($"service_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"amount" < $"lo", 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when($"amount" > $"hi", 1L).otherwise(0L)).as("n_clamped_hi"),
        round(max($"lo"), 6).as("p05"),
        round(max($"hi"), 6).as("p95"),
        sumExact($"w").as("winsorized_total"))
      .orderBy($"service_type")
  }

  val winsorizeSql: String =
    s"""WITH li AS (
      |  SELECT l_returnflag AS service_type, l_extendedprice AS amount
      |  FROM lineitem),
      |b AS (
      |  SELECT service_type,
      |         quantile_cont(amount, 0.05) AS lo,
      |         quantile_cont(amount, 0.95) AS hi
      |  FROM li GROUP BY 1),
      |w AS (
      |  SELECT li.service_type, li.amount, b.lo, b.hi,
      |         least(greatest(li.amount, b.lo), b.hi) AS wamount
      |  FROM li JOIN b ON li.service_type = b.service_type)
      |SELECT service_type, count(*) AS n,
      |       CAST(sum(CASE WHEN amount < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |       CAST(sum(CASE WHEN amount > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
      |       round(max(lo), 6) AS p05,
      |       round(max(hi), 6) AS p95,
      |       ${graft.functions.Exact.sumExactSql("wamount")} AS winsorized_total
      |FROM w GROUP BY 1
      |ORDER BY service_type""".stripMargin

  /** The flagship query run VERBATIM through the SQL surface — the
    * oracle string itself is ANSI enough to be the Spark program
    * (`registerAll` + `spark.sql`), which is the porting story for a
    * SQL-first user of the reference: their dbt/console SQL runs
    * as-is, planned by the same Catalyst pipeline as the DataFrame
    * form. Exactly equal to [[monthlyAgg]] by construction.
    *
    * Scale: identical plan to the DataFrame flagship — the SQL parser
    * is the only difference; pushdown/pruning/AQE all apply. */
  def sqlE2e(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(monthlyAggSql)
  }

  /** WITH RECURSIVE parity: the classic recursive month spine with a
    * zero-filled revenue rollup, run VERBATIM as both the Spark program
    * (Spark 4's recursive CTE support) and the DuckDB oracle — the
    * porting story for recursive SQL. Engine limits pinned by probing:
    * Spark rejects UNION-distinct and aggregates over the recursive
    * reference, so the recursion generates, and the aggregation joins
    * OUTSIDE — the shape that ports. */
  val recursiveSpineSql: String =
    s"""WITH RECURSIVE spine AS (
       |  SELECT CAST('1995-01-01' AS DATE) AS month_start
       |  UNION ALL
       |  SELECT CAST(month_start + INTERVAL 1 MONTH AS DATE) FROM spine
       |  WHERE month_start < CAST('2001-12-01' AS DATE)),
       |rev AS (
       |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
       |           AS month_start,
       |         COUNT(*) AS n,
       |         ${graft.functions.Exact.sumExactSql("o_totalprice")} AS revenue
       |  FROM orders GROUP BY 1)
       |SELECT s.month_start, COALESCE(r.n, 0) AS n,
       |       COALESCE(r.revenue, 0.0) AS revenue
       |FROM spine s LEFT JOIN rev r ON r.month_start = s.month_start
       |ORDER BY s.month_start""".stripMargin

  def sqlRecursive(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(recursiveSpineSql)
  }

  /** Per-group MODE (ordered-set aggregate) with a deterministic
    * tiebreak: the most frequent event_type per user, ties resolved to
    * the lexicographically smallest type (engines' native mode()
    * tiebreaks differ — an explicit rank pins it). Two keyed shuffles:
    * the (user, type) count and the user-partitioned rank window over
    * already-aggregated (users × types)-sized rows. */
  def modePerUser(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"user_id").orderBy($"n".desc, $"event_type")
    counts.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"user_id", $"event_type".as("mode_event_type"), $"n")
      .orderBy($"user_id")
  }

  val modePerUserSql: String =
    """SELECT user_id, event_type AS mode_event_type, n FROM (
      |  SELECT user_id, event_type, COUNT(*) AS n,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY COUNT(*) DESC, event_type) AS rk
      |  FROM events GROUP BY 1, 2)
      |WHERE rk = 1
      |ORDER BY user_id""".stripMargin

  /** Second-moment statistics sweep — corr / stddev_samp / covar_samp /
    * regr_slope — made cross-engine BIT-EXACT, which the built-ins can't
    * be (Spark's `corr` is a partition-order-dependent double
    * accumulation; DuckDB's is sequential — last-ulp drift guaranteed).
    *
    * The trick (proven for pagerank/cosine in this repo): quantize each
    * value to integer cents via `floor(x*100) → BIGINT` (deterministic
    * IEEE multiply + floor, identical in both engines), accumulate the
    * five moments Sx Sy Sxx Syy Sxy as EXACT integer sums
    * (decimal(38,0) here ≡ HUGEINT in the oracle — order-independent),
    * then derive the statistics with one pinned sequence of IEEE ops.
    * Identical integer inputs + identical op order = identical doubles,
    * no rounding needed.
    *
    * At 100 TB: one map-side-combined shuffle on the group key; the five
    * moments are 5 longs of state per group — the same cost as the
    * built-in `corr`, with reproducibility the built-in can't give. */
  def statsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.lineitem(spark, sfDir).select($"l_returnflag",
      floor($"l_quantity" * 100).cast("long").as("qx"),
      floor($"l_extendedprice" * 100).cast("long").as("qy"))
    val s = q.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"),
      sum($"qx".cast("decimal(38,0)")).as("sx"),
      sum($"qy".cast("decimal(38,0)")).as("sy"),
      sum(($"qx" * $"qx").cast("decimal(38,0)")).as("sxx"),
      sum(($"qy" * $"qy").cast("decimal(38,0)")).as("syy"),
      sum(($"qx" * $"qy").cast("decimal(38,0)")).as("sxy"))
    val dn = $"n".cast("double")
    val (sx, sy, sxx, syy, sxy) = ($"sx".cast("double"), $"sy".cast("double"),
      $"sxx".cast("double"), $"syy".cast("double"), $"sxy".cast("double"))
    s.select($"l_returnflag", $"n",
        ((dn * sxy - sx * sy) /
          (sqrt(dn * sxx - sx * sx) * sqrt(dn * syy - sy * sy)))
          .as("corr_qty_price"),
        (sqrt((dn * sxx - sx * sx) / (dn * (dn - 1.0))) / 100.0)
          .as("stddev_qty"),
        (sqrt((dn * syy - sy * sy) / (dn * (dn - 1.0))) / 100.0)
          .as("stddev_price"),
        ((dn * sxy - sx * sy) / (dn * (dn - 1.0)) / 10000.0)
          .as("covar_qty_price"),
        ((dn * sxy - sx * sy) / (dn * sxx - sx * sx)).as("slope_price_on_qty"))
      .orderBy($"l_returnflag")
  }

  val statsMomentsSql: String =
    """WITH q AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100) AS BIGINT) AS qx,
      |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS qy
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |         SUM(CAST(qx AS HUGEINT)) AS sx,
      |         SUM(CAST(qy AS HUGEINT)) AS sy,
      |         SUM(CAST(qx * qx AS HUGEINT)) AS sxx,
      |         SUM(CAST(qy * qy AS HUGEINT)) AS syy,
      |         SUM(CAST(qx * qy AS HUGEINT)) AS sxy
      |  FROM q GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS dn,
      |         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
      |         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
      |         CAST(sxy AS DOUBLE) AS sxy
      |  FROM s)
      |SELECT l_returnflag, n,
      |       (dn * sxy - sx * sy) /
      |         (sqrt(dn * sxx - sx * sx) * sqrt(dn * syy - sy * sy))
      |         AS corr_qty_price,
      |       sqrt((dn * sxx - sx * sx) / (dn * (dn - 1.0))) / 100.0
      |         AS stddev_qty,
      |       sqrt((dn * syy - sy * sy) / (dn * (dn - 1.0))) / 100.0
      |         AS stddev_price,
      |       (dn * sxy - sx * sy) / (dn * (dn - 1.0)) / 10000.0
      |         AS covar_qty_price,
      |       (dn * sxy - sx * sy) / (dn * sxx - sx * sx)
      |         AS slope_price_on_qty
      |FROM d
      |ORDER BY l_returnflag""".stripMargin

  /** Spearman rank correlation, bit-exact across engines. Pearson on
    * integer ranks: tie groups take the AVERAGE rank, which can be a
    * half — so both sides use DOUBLED ranks `2·rank() + (ties−1)`
    * (always integral) and the scale cancels in the correlation. The
    * moment sums are then exact integers ([[statsMoments]] machinery)
    * and the final ops are one pinned IEEE sequence.
    *
    * At 100 TB: two per-group window sorts (the rank assignment) +
    * one moment aggregation — the same cost any rank statistic pays;
    * no driver-side collection anywhere. Bounds: groups are capped at
    * 2^31 rows by `rank()`'s IntegerType (an engine limit every rank
    * statistic shares); within that bound the doubled ranks reach
    * ~6.4e9, so their PRODUCTS exceed Long and must be multiplied in
    * decimal — squaring as Long would wrap silently near the cap
    * (statsMoments can multiply as Long because its cent quantities
    * are bounded per-row, not per-group). */
  def spearman(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def r2(c: String) = {
      val w = Window.partitionBy($"l_returnflag").orderBy(col(c))
      val ties = Window.partitionBy($"l_returnflag", col(c))
      lit(2) * rank().over(w).cast("long") + (count(lit(1)).over(ties) - 1L)
    }
    val ranked = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .withColumn("rx", r2("l_quantity"))
      .withColumn("ry", r2("l_extendedprice"))
    val dx = $"rx".cast("decimal(19,0)")
    val dy = $"ry".cast("decimal(19,0)")
    val s = ranked.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(dx).as("sx"),
      sum(dy).as("sy"),
      sum(dx * dx).as("sxx"),
      sum(dy * dy).as("syy"),
      sum(dx * dy).as("sxy"))
    val dn = $"n".cast("double")
    val (sx, sy, sxx, syy, sxy) = ($"sx".cast("double"), $"sy".cast("double"),
      $"sxx".cast("double"), $"syy".cast("double"), $"sxy".cast("double"))
    s.select($"l_returnflag", $"n",
        ((dn * sxy - sx * sy) /
          (sqrt(dn * sxx - sx * sx) * sqrt(dn * syy - sy * sy)))
          .as("spearman_qty_price"))
      .orderBy($"l_returnflag")
  }

  val spearmanSql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag,
      |         2 * rank() OVER (PARTITION BY l_returnflag
      |                          ORDER BY l_quantity)
      |           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1)
      |           AS rx,
      |         2 * rank() OVER (PARTITION BY l_returnflag
      |                          ORDER BY l_extendedprice)
      |           + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1)
      |           AS ry
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |         SUM(CAST(rx AS HUGEINT)) AS sx,
      |         SUM(CAST(ry AS HUGEINT)) AS sy,
      |         SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
      |         SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy,
      |         SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy
      |  FROM ranked GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS dn,
      |         CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
      |         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
      |         CAST(sxy AS DOUBLE) AS sxy
      |  FROM s)
      |SELECT l_returnflag, n,
      |       (dn * sxy - sx * sy) /
      |         (sqrt(dn * sxx - sx * sx) * sqrt(dn * syy - sy * sy))
      |         AS spearman_qty_price
      |FROM d
      |ORDER BY l_returnflag""".stripMargin

  /** Every join type in one gated sweep — inner / left / right / full /
    * semi / anti / cross over the same keyed pair, each reduced to
    * (rows, key checksum) so the oracle hash pins both cardinality AND
    * membership per type. The pair is sized so cross stays tiny. */
  def joinTypes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("n_a"))
      .filter($"user_id" % 7 === 0)
    val b = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id".as("uid")).agg(count(lit(1)).as("n_b"))
      .filter($"uid" % 3 === 0)
    def reduceTo(name: String, df: DataFrame, key: Column) =
      df.agg(count(lit(1)).as("n"),
        coalesce(sum(key), lit(0L)).as("key_sum"))
        .select(lit(name).as("join_type"), $"n", $"key_sum")
    val on = $"user_id" === $"uid"
    reduceTo("1_inner", a.join(b, on, "inner"), $"user_id")
      .unionByName(reduceTo("2_left", a.join(b, on, "left_outer"),
        $"user_id" + coalesce($"uid", lit(0L))))
      .unionByName(reduceTo("3_right", a.join(b, on, "right_outer"),
        coalesce($"user_id", lit(0L)) + $"uid"))
      .unionByName(reduceTo("4_full", a.join(b, on, "full_outer"),
        coalesce($"user_id", lit(0L)) + coalesce($"uid", lit(0L))))
      .unionByName(reduceTo("5_semi", a.join(b, on, "left_semi"), $"user_id"))
      .unionByName(reduceTo("6_anti", a.join(b, on, "left_anti"), $"user_id"))
      .unionByName(reduceTo("7_cross", a.crossJoin(b), $"user_id" + $"uid"))
      .orderBy($"join_type")
  }

  val joinTypesSql: String =
    """WITH a AS (
      |  SELECT user_id, COUNT(*) AS n_a FROM events
      |  GROUP BY 1 HAVING user_id % 7 = 0),
      |b AS (
      |  SELECT user_id AS uid, COUNT(*) AS n_b FROM events
      |  WHERE event_type = 'purchase'
      |  GROUP BY 1 HAVING user_id % 3 = 0)
      |SELECT '1_inner' AS join_type, COUNT(*) AS n,
      |       CAST(coalesce(SUM(user_id), 0) AS BIGINT) AS key_sum
      |FROM a JOIN b ON user_id = uid
      |UNION ALL
      |SELECT '2_left', COUNT(*),
      |       CAST(coalesce(SUM(user_id + coalesce(uid, 0)), 0) AS BIGINT)
      |FROM a LEFT JOIN b ON user_id = uid
      |UNION ALL
      |SELECT '3_right', COUNT(*),
      |       CAST(coalesce(SUM(coalesce(user_id, 0) + uid), 0) AS BIGINT)
      |FROM a RIGHT JOIN b ON user_id = uid
      |UNION ALL
      |SELECT '4_full', COUNT(*),
      |       CAST(coalesce(SUM(coalesce(user_id, 0) + coalesce(uid, 0)), 0) AS BIGINT)
      |FROM a FULL OUTER JOIN b ON user_id = uid
      |UNION ALL
      |SELECT '5_semi', COUNT(*), CAST(coalesce(SUM(user_id), 0) AS BIGINT)
      |FROM a WHERE EXISTS (SELECT 1 FROM b WHERE uid = user_id)
      |UNION ALL
      |SELECT '6_anti', COUNT(*), CAST(coalesce(SUM(user_id), 0) AS BIGINT)
      |FROM a WHERE NOT EXISTS (SELECT 1 FROM b WHERE uid = user_id)
      |UNION ALL
      |SELECT '7_cross', COUNT(*), CAST(coalesce(SUM(user_id + uid), 0) AS BIGINT)
      |FROM a CROSS JOIN b
      |ORDER BY join_type""".stripMargin

  /** Correlated-subquery SQL parity: EXISTS, NOT EXISTS, and a
    * correlated scalar subquery (exact MAX — a correlated AVG of
    * doubles would drift in the last ulp between engines), run VERBATIM
    * on Spark and DuckDB. Exercises Spark's decorrelation: each
    * subquery becomes a join under RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery rather than a per-row re-execution.
    *
    * The scalar subquery correlates on EQUALITY ONLY (the customer's
    * max order). An earlier draft added `o2.o_orderkey <> o.o_orderkey`
    * to the correlation — a non-equi correlate decorrelates into a
    * BroadcastNestedLoopJoin, which is orders×orders row PAIRS in one
    * task: invisible at the sf0.01 gate, a 25-minute wedge at sf0.1.
    * Correlated predicates must stay equi-joinable or the plan is a
    * scale cliff. */
  val correlatedSql: String =
    """SELECT o.o_orderkey, o.o_totalprice
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |                  WHERE l2.l_orderkey = o.o_orderkey
      |                    AND l2.l_returnflag = 'R')
      |  AND o.o_totalprice = (SELECT MAX(o2.o_totalprice)
      |                        FROM orders o2
      |                        WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey
      |LIMIT 100""".stripMargin

  def sqlCorrelated(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    spark.sql(correlatedSql)
  }

  def histogramSql(nBuckets: Int = 20): String =
    s"""WITH li AS (SELECT l_extendedprice AS x FROM lineitem),
      |bounds AS (SELECT min(x) AS lo, max(x) AS hi FROM li),
      |assigned AS (
      |  SELECT CAST(least(floor((x - lo) * $nBuckets / (hi - lo)), $nBuckets - 1) AS INTEGER) AS bucket,
      |         lo, hi
      |  FROM li, bounds)
      |SELECT bucket,
      |       round(lo + bucket * (hi - lo) / $nBuckets, 6) AS bucket_lo,
      |       round(lo + (bucket + 1) * (hi - lo) / $nBuckets, 6) AS bucket_hi,
      |       count(*) AS n
      |FROM assigned
      |GROUP BY bucket, lo, hi
      |ORDER BY bucket""".stripMargin
}
