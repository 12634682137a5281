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
    * (raw or clustered) — delegates to the single definition in
    * [[Analytics.monthlyAggOn]] so the experiment and the oracle query
    * can never drift apart. */
  def monthlyAggOn(df: DataFrame): DataFrame = Analytics.monthlyAggOn(df)

  /** Read back the clustered layout with the partition column available
    * for pruning (`ship_year = 2000` prunes at directory level). */
  def readClustered(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(outDir).filter($"ship_year" === 2000)
  }
}
