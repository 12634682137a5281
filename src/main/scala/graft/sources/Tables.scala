package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared-source catalog for the driver testdata (TESTDATA.md).
  *
  * Mirrors the reference's inferred-then-declared schema split
  * (reference: scheduler_data/dbt_nyc_taxi/models/raw/sources.yml:4-109 —
  * dbt declares every raw column after pandas-inferred ingestion): each
  * table gets an explicit [[StructType]] applied at read time instead of
  * relying on inference, so schema drift fails fast at the scan.
  *
  * Scale note: reads stay pushdown-friendly — callers `.select(...)`
  * immediately so the parquet scan prunes columns; passing the schema
  * here does not defeat predicate pushdown or vectorized reads.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.parquet stores `ts` as TIMESTAMP(NANOS) which Spark 4 refuses
    * to read as TimestampType ([PARQUET_TYPE_ILLEGAL]); it is read as raw
    * nanos (LongType, legacy.parquet.nanosAsLong) and floor-divided to
    * micros — the same truncation DuckDB applies reading nanos natively,
    * so both engines see identical microsecond timestamps. Integer `div`
    * (not `/`) because epoch-nanos ≈ 1.7e18 exceeds double's 2^53. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> eventsRaw,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Read one table from an sf directory with its declared schema. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") return events(spark, sfDir)
    spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** THE single copy of the nanos-read recipe (batch + streaming call
    * through here): enable the legacy long-read of TIMESTAMP(NANOS)
    * and floor-divide to micros — DuckDB's truncation exactly. */
  def enableNanosAsLong(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def decodeEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    enableNanosAsLong(spark)
    decodeEventTs(spark.read.schema(eventsRaw).parquet(s"$sfDir/events.parquet"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view (SQL entry point, reference
    * sources.yml analog: the declared-source catalog, S8 in SURVEY §2.1). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    schemas.keys.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
