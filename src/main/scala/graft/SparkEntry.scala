package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator family in SURVEY §2 is exposed as a named query with a
  * DuckDB oracle; column names/types are aligned on both sides (the
  * driver sorts columns by name before hashing). */
object SparkEntry {

  /** Flagship query (the README clustering benchmark analog) on
    * /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.monthlyAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_monthly_agg" -> (Analytics.monthlyAgg _),
    "q_demand_by_zone" -> (Analytics.demandByZone _),
    "q_revenue_tips" -> (Analytics.revenueTips _),
    "q_duration_percentiles" -> (Analytics.durationPercentiles _),
    "q_hourly_matrix" -> (Analytics.hourlyMatrix _),
    "q_speed_band" -> (Analytics.speedBand _),
    "q_coverage_matrix" -> (Analytics.coverageMatrix _),
    "q_silver_union" -> (Silver.silverUnion _),
    "q_dim_date" -> ((s: SparkSession, _: String) => GoldDims.dimDate(s)),
    "q_dim_zone" -> (GoldDims.dimZone _),
    "q_dim_payment_type" -> ((s: SparkSession, _: String) => GoldDims.dimPaymentType(s)),
    "q_dim_rate_code" -> ((s: SparkSession, _: String) => GoldDims.dimRateCode(s)),
    "q_fct_trips" -> (GoldFact.fctTrips _),
    "q_quality_report" -> (Quality.report _),
  )

  /** DuckDB-equivalent ANSI SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q_monthly_agg" -> Analytics.monthlyAggSql,
    "q_demand_by_zone" -> Analytics.demandByZoneSql,
    "q_revenue_tips" -> Analytics.revenueTipsSql,
    "q_duration_percentiles" -> Analytics.durationPercentilesSql,
    "q_hourly_matrix" -> Analytics.hourlyMatrixSql,
    "q_speed_band" -> Analytics.speedBandSql,
    "q_coverage_matrix" -> Analytics.coverageMatrixSql,
    "q_silver_union" -> Silver.silverUnionSql,
    "q_dim_date" -> GoldDims.dimDateSql,
    "q_dim_zone" -> GoldDims.dimZoneSql,
    "q_dim_payment_type" -> GoldDims.dimPaymentTypeSql,
    "q_dim_rate_code" -> GoldDims.dimRateCodeSql,
    "q_fct_trips" -> GoldFact.fctTripsSql,
    "q_quality_report" -> Quality.reportSql,
  )
}
