package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion layer — the reference's loader/orchestrator surface
  * (reference: loader_yellow_green.py, scheduler_data/scheduler/
  * data_loaders/ingest_taxi.py, data_exporters/exporter_taxi.py):
  * availability probe (S1), file sources (S2/S5), footer-metadata scan
  * (S3), the per-source ingestion manifest / run ledger (S4), and
  * replace-semantics sinks (S6/S9).
  *
  * The reference's HEAD-probe / monthly-download loop is driver-side
  * Python; here the equivalents are driver-side Scala (availability
  * check) plus Spark reads. The 3–6M-row batched bulk load (S7,
  * README.md:44) needs no analog: a partitioned parquet read is
  * inherently batched, `spark.sql.files.maxPartitionBytes` is the knob.
  *
  * Scale: the manifest is tiny (one row per source file) and built from
  * parquet FOOTER metadata (`count()` resolves from row-group statistics
  * — no data scan), so ingestion bookkeeping stays O(files), not O(rows).
  */
object Ingest {

  /** S1: availability probe before load; missing sources become
    * `brecha` (gap) rows in the manifest rather than job failures
    * (loader_yellow_green.py:13-19,56-61 behavior). */
  def available(path: String): Boolean = new java.io.File(path).exists()

  /** S4+S3: one manifest row per source table of an sf directory —
    * status, row count (footer-only), column count, bytes. */
  def manifest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val rows = tables.map { t =>
      val path = s"$sfDir/$t.parquet"
      if (available(path)) {
        val df = Tables.load(spark, sfDir, t)
        // count() on a bare parquet scan is answered from row-group
        // statistics (no column data read) — the S3 metadata-scan analog
        (t, "loaded", df.count(), df.columns.length)
      } else (t, "brecha", 0L, 0)
    }
    rows.toDF("table_name", "status", "row_count", "n_cols")
      .orderBy($"table_name")
  }

  /** Oracle: counts recomputed independently; n_cols pinned to the
    * declared contract (sources.yml analog — the oracle asserts the
    * declared width, catching schema drift). */
  val manifestSql: String = {
    val expected = Seq(
      ("customer", 5), ("documents", 5), ("embeddings", 3), ("events", 6),
      ("lineitem", 11), ("nation", 3), ("orders", 6), ("part", 6),
      ("region", 2), ("supplier", 4))
    expected.map { case (t, nc) =>
      s"""SELECT '$t' AS table_name, 'loaded' AS status,
         |       (SELECT count(*) FROM $t) AS row_count,
         |       CAST($nc AS INTEGER) AS n_cols""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
  }

  /** S5: CSV source with header + the reference's uppercase column
    * normalization (ingest_taxi.py:15). */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(path)
    df.toDF(df.columns.map(_.trim.toUpperCase).toIndexedSeq: _*)
  }

  /** S6/S9: replace-semantics materialization (exporter_taxi.py:26-32,
    * dbt `materialized='table'`): overwrite, return the re-read frame
    * (the "table" downstream layers consume). Format-agnostic —
    * parquet default; orc/json for interop sinks (csv deliberately NOT
    * claimed here: Spark's csv writer renders empty string and null
    * identically, so the round-trip is lossy). Schema is re-applied on
    * read for json, which does not preserve types by itself. */
  def writeBronze(df: DataFrame, dir: String, format: String = "parquet"): DataFrame = {
    df.write.mode(SaveMode.Overwrite).format(format).save(dir)
    val reader = df.sparkSession.read.format(format)
    (format match {
      case "json" | "csv" => reader.schema(df.schema)
      case _ => reader
    }).load(dir)
  }
}
