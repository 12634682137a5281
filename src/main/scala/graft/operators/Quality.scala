package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality module — the reference's 32 declarative dbt tests
  * (reference: scheduler_data/dbt_nyc_taxi/models/gold/schema.yml:1-107,
  * models/silver/schema.yml:1-43; README.md:101-123 "32 PASS").
  *
  * Each check family maps to a DataFrame pattern (SURVEY §2):
  *  - `not_null`       → filter(col.isNull).count
  *  - `unique` (A9)    → groupBy(key).count.filter(count > 1)
  *  - `relationships` (J5) → LEFT ANTI join fact→dim (broadcast)
  *  - `accepted_values` (A10) → filter(!col.isin(domain))
  *
  * The report is one row per check with its violation count — asserted
  * all-zero in ScalaTest, and exposed as an oracle-verified query
  * (violation *counts* are deterministic; violating *rows* may not be).
  *
  * Scale: every check is a single scan + partial-agg (count) or a
  * broadcast anti-join — no fact-sized shuffles; checks over the same
  * table could share one pass via conditional aggregation, which is how
  * `notNullChecks` batches its column list.
  */
object Quality {

  /** `dbt test` CLI analog: print the report, exit non-zero if any
    * check has violations (README.md:119-123 — "32 PASS" run shape).
    * Usage: `runMain graft.operators.Quality <sfDir>` */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local(appName = "graft-quality")
    try {
      val rows = report(spark, sfDir).collect()
      rows.foreach { r =>
        val status = if (r.getLong(1) == 0L) "PASS" else "FAIL"
        println(f"$status%-5s ${r.getString(0)}%-40s violations=${r.getLong(1)}")
      }
      val failed = rows.count(_.getLong(1) > 0)
      println(s"${rows.length - failed} PASS / $failed FAIL")
      if (failed > 0) sys.exit(1)
    } finally spark.stop()
  }

  /** One row per check: (check_name, violations). */
  def report(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the fact feeds three independent checks (uniqueness + two FK
    // anti-joins) — materialize it ONCE, but only the three columns the
    // checks read: caching the full fact (md5 keys, every derived
    // metric) measured slower than recomputing it
    val silver = Silver.build(spark, sfDir)
    val fact = GoldFact.build(spark, sfDir)
      .select("trip_id", "pickup_zone_sk", "pickup_date_sk")
      .cache()
    fact.count() // eager pin — three checks would otherwise race to
    // compute the un-materialized join chain concurrently
    val dimZone = GoldDims.dimZone(spark, sfDir)
    val dimDate = GoldDims.dimDate(spark)

    // not_null ×6 on silver criticals (silver/schema.yml analog) —
    // batched into ONE pass via conditional aggregation.
    val notNullCols = Seq("service_type", "order_key", "line_number",
      "quantity", "extended_price", "ship_ts")
    val notNull = silver.select(
      notNullCols.map(c =>
        // coalesce: sum over an EMPTY silver is NULL, which would NPE
        // the CLI's getLong — an empty table has zero violations
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c)).toIndexedSeq: _*)
      .selectExpr(s"stack(${notNullCols.size}, " +
        notNullCols.map(c => s"'not_null_silver_$c', $c").mkString(", ") +
        ") as (check_name, violations)")

    // unique ×3 on dim SKs (A9)
    def uniqueCheck(df: DataFrame, key: String, name: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .filter($"n" > 1)
        .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
        .select(lit(name).as("check_name"), $"violations")

    val uniques =
      uniqueCheck(dimZone, "zone_sk", "unique_dim_zone_zone_sk")
        .unionByName(uniqueCheck(dimDate, "date_sk", "unique_dim_date_date_sk"))
        .unionByName(uniqueCheck(fact, "trip_id", "unique_fct_trips_trip_id"))

    // relationships ×2 (J5): every fact FK resolves in its dim
    def fkCheck(fk: String, dim: DataFrame, dimKey: String, name: String): DataFrame =
      fact.select(col(fk)).join(broadcast(dim.select(col(dimKey))),
          col(fk) === col(dimKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check_name"), $"violations")

    val fks =
      fkCheck("pickup_zone_sk", dimZone, "zone_sk", "relationships_fct_pickup_zone_sk")
        .unionByName(fkCheck("pickup_date_sk", dimDate, "date_sk", "relationships_fct_pickup_date_sk"))

    // accepted_values ×1 (A10)
    val accepted = silver
      .filter(!$"service_type".isin("yellow", "green"))
      .agg(count(lit(1)).as("violations"))
      .select(lit("accepted_values_service_type").as("check_name"), $"violations")

    notNull.select($"check_name", $"violations".cast("long"))
      .unionByName(uniques).unionByName(fks).unionByName(accepted)
      .orderBy($"check_name")
  }

  val reportSql: String =
    """WITH silver AS (
      |  SELECT 'yellow' AS service_type, l_orderkey AS order_key,
      |         l_linenumber AS line_number, l_quantity AS quantity,
      |         l_extendedprice AS extended_price, l_shipdate AS ship_ts
      |  FROM lineitem WHERE l_linestatus = 'O'
      |    AND l_shipdate IS NOT NULL AND l_quantity >= 0
      |    AND l_extendedprice >= 0 AND l_tax >= 0
      |  UNION ALL
      |  SELECT 'green', l_orderkey, l_linenumber, l_quantity,
      |         l_extendedprice, l_shipdate
      |  FROM lineitem WHERE l_linestatus = 'F'
      |    AND l_shipdate IS NOT NULL AND l_quantity >= 0
      |    AND l_extendedprice >= 0 AND l_tax >= 0),
      |fact_keys AS (
      |  SELECT md5(concat_ws('|', CAST(s.order_key AS VARCHAR),
      |           CAST(s.line_number AS VARCHAR),
      |           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S'),
      |           strftime(s.ship_ts, '%Y-%m-%d %H:%M:%S'))) AS trip_id,
      |         coalesce(z.zone_sk, 0) AS pickup_zone_sk,
      |         coalesce(dd.date_sk, 0) AS pickup_date_sk
      |  FROM silver s
      |  JOIN orders o ON s.order_key = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  LEFT JOIN (SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS INTEGER) AS zone_sk,
      |                    n_nationkey AS locationid FROM nation) z
      |    ON c.c_nationkey = z.locationid
      |  LEFT JOIN (SELECT CAST(row_number() OVER (ORDER BY d) AS INTEGER) AS date_sk,
      |                    CAST(d AS DATE) AS date_actual
      |             FROM (SELECT generate_series AS d
      |                   FROM generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY))) dd
      |    ON CAST(o.o_orderdate AS DATE) = dd.date_actual
      |  WHERE o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '2001-12-31'
      |    AND s.ship_ts BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '2001-12-31'),
      |dim_zone_full AS (
      |  SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS INTEGER) AS zone_sk FROM nation
      |  UNION ALL SELECT 0),
      |dim_date_full AS (
      |  SELECT CAST(row_number() OVER (ORDER BY generate_series) AS INTEGER) AS date_sk
      |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY))
      |SELECT check_name, violations FROM (
      |  SELECT 'not_null_silver_service_type' AS check_name,
      |         CAST(sum(CASE WHEN service_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM silver
      |  UNION ALL SELECT 'not_null_silver_order_key',
      |         CAST(sum(CASE WHEN order_key IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM silver
      |  UNION ALL SELECT 'not_null_silver_line_number',
      |         CAST(sum(CASE WHEN line_number IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM silver
      |  UNION ALL SELECT 'not_null_silver_quantity',
      |         CAST(sum(CASE WHEN quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM silver
      |  UNION ALL SELECT 'not_null_silver_extended_price',
      |         CAST(sum(CASE WHEN extended_price IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM silver
      |  UNION ALL SELECT 'not_null_silver_ship_ts',
      |         CAST(sum(CASE WHEN ship_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM silver
      |  UNION ALL SELECT 'unique_dim_zone_zone_sk',
      |         CAST(count(*) AS BIGINT) FROM (
      |           SELECT zone_sk FROM (SELECT CAST(row_number() OVER (ORDER BY n_nationkey) AS INTEGER) AS zone_sk
      |                                FROM nation UNION ALL SELECT 0) t
      |           GROUP BY zone_sk HAVING count(*) > 1)
      |  UNION ALL SELECT 'unique_dim_date_date_sk',
      |         CAST(count(*) AS BIGINT) FROM (
      |           SELECT date_sk FROM dim_date_full GROUP BY date_sk HAVING count(*) > 1)
      |  UNION ALL SELECT 'unique_fct_trips_trip_id',
      |         CAST(count(*) AS BIGINT) FROM (
      |           SELECT trip_id FROM fact_keys GROUP BY trip_id HAVING count(*) > 1)
      |  UNION ALL SELECT 'relationships_fct_pickup_zone_sk',
      |         CAST(count(*) AS BIGINT) FROM fact_keys
      |         WHERE pickup_zone_sk NOT IN (SELECT zone_sk FROM dim_zone_full)
      |  UNION ALL SELECT 'relationships_fct_pickup_date_sk',
      |         CAST(count(*) AS BIGINT) FROM fact_keys
      |         WHERE pickup_date_sk NOT IN (SELECT date_sk FROM dim_date_full)
      |  UNION ALL SELECT 'accepted_values_service_type',
      |         CAST(sum(CASE WHEN service_type NOT IN ('yellow','green') THEN 1 ELSE 0 END) AS BIGINT) FROM silver)
      |ORDER BY check_name""".stripMargin
}
