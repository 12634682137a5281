package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's one deliberate physical-design choice, reproduced
  * Spark-native: fct_trips is clustered by (pickup_date_sk,
  * service_type) in Snowflake (fct_trips.sql:3) and the README's
  * benchmark query runs 16.3× faster on the clustered table
  * (README.md:83-86, 1500 ms → 92 ms).
  *
  * Spark analog: write the fact **partitioned by year** (directory-level
  * partition pruning — the WHERE year clause never opens other years'
  * files) and **sorted within partitions by (ship date, service)** so
  * parquet row-group min/max statistics skip non-matching row groups
  * inside each file. Same two pruning levels Snowflake's micro-partition
  * clustering provides; at 100 TB this is the difference between a
  * full-table scan and reading ~1/7 of one year's files.
  *
  * [[Bench]] measures the README query against the raw single-file
  * layout vs this layout and reports both (BENCH json keys
  * `bench_monthly_agg_raw` / `bench_monthly_agg_clustered`).
  */
object ClusteredLayout {

  /** Write lineitem in the clustered fact layout. */
  def writeClustered(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .withColumn("ship_year", year($"l_shipdate"))
      .repartition($"ship_year")
      .sortWithinPartitions($"l_shipdate", $"l_returnflag")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ship_year")
      .parquet(outDir)
  }

  /** The README benchmark query shape over an arbitrary lineitem frame
    * (raw or clustered): one-year monthly aggregation. */
  def monthlyAggOn(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.filter($"l_shipdate".between(
        lit("2000-01-01").cast("timestamp"), lit("2000-12-31").cast("timestamp")))
      .groupBy($"l_returnflag".as("service_type"),
        date_trunc("month", $"l_shipdate").cast("date").as("month"))
      .agg(count(lit(1)).as("trips"),
        graft.functions.Exact.avgExact($"l_quantity").as("avg_distance"),
        graft.functions.Exact.avgExact($"l_extendedprice").as("avg_amount"))
      .orderBy($"month", $"service_type")
  }

  /** Read back the clustered layout with the partition column available
    * for pruning (`ship_year = 2000` prunes at directory level). */
  def readClustered(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(outDir).filter($"ship_year" === 2000)
  }
}
