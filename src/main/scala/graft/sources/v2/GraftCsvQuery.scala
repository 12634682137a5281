package graft.sources.v2

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Exact
import graft.sources.Tables

/** Oracle-gated end-to-end run of the [[GraftCsv]] connector: dump the
  * events table to graftcsv once per sf dir, then answer a pruned +
  * filtered daily rollup THROUGH the connector. The DuckDB oracle reads
  * the ORIGINAL parquet — so the dump, the byte-range splits, the
  * pushed filters, and the reader's parsing must all be exact for the
  * hash to match.
  */
object GraftCsvQuery {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Dump events (minus the JSON props column — graftcsv is unquoted by
    * contract) to `/tmp/graft_dsv2_<sf>`; marker file makes it once.
    * The dump goes THROUGH the connector's own write path (V2 commit
    * protocol), so q_dsv2_source gates write+read end to end. */
  def dumpDir(spark: SparkSession, sfDir: String): String = {
    val dir = s"/tmp/graft_dsv2_${new File(sfDir).getName}"
    val marker = new File(dir, "_GRAFT_DUMPED")
    val src = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // fingerprinted marker: a bare exists() check would keep serving a
    // stale pre-change dump across writer/format changes forever, and
    // the oracle gate would "pass" without exercising the new code.
    // Fingerprint on source-file metadata (names + lengths + mtimes),
    // not a count() — counting scanned the whole events table on every
    // call even when the dump was already current
    val srcMeta = {
      val root = new File(s"$sfDir/events.parquet")
      val files = if (root.isDirectory) root.listFiles().filter(_.isFile)
        else Array(root)
      files.sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(",")
    }
    val fingerprint = s"v4|${schema.catalogString}|$srcMeta"
    if (!marker.exists() ||
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) != fingerprint) {
      src.write.format("graftcsv").mode("overwrite").save(s"$dir/events")
      java.nio.file.Files.write(marker.toPath, fingerprint.getBytes)
    }
    s"$dir/events"
  }

  def read(spark: SparkSession, sfDir: String, splitBytes: Long = 256 * 1024): DataFrame =
    spark.read.format("graftcsv")
      .schema(schema)
      .option("splitBytes", splitBytes.toString)
      .load(dumpDir(spark, sfDir))

  /** `q_dsv2_source`: In + GreaterThan pushdown, 3-of-5-column pruning,
    * multi-split scan, exact-decimal day rollup. */
  def dsv2Query(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    read(spark, sfDir)
      .filter($"event_type".isin("purchase", "click") && $"value" > 10.0)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"), Exact.sumExact($"value").as("total_value"))
      .orderBy($"event_type", $"day")
  }

  val dsv2Sql: String =
    s"""SELECT event_type, CAST(ts AS DATE) AS day,
       |       COUNT(*) AS n,
       |       ${Exact.sumExactSql("value")} AS total_value
       |FROM events
       |WHERE event_type IN ('purchase', 'click') AND value > 10.0
       |GROUP BY 1, 2
       |ORDER BY event_type, day""".stripMargin
}
