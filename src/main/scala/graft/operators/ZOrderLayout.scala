package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order (Morton) clustering — the MULTI-dimensional extension of
  * [[ClusteredLayout]]'s linear sort. A layout sorted by ship date
  * alone prunes date predicates beautifully and part predicates not at
  * all; interleaving the bits of both dimensions into one sort key
  * gives every row group a tight bounding BOX in (date, part) space,
  * so parquet min/max statistics skip row groups for 2-dimensional
  * range queries — the same reason Delta/Iceberg ship OPTIMIZE
  * ZORDER BY for multi-predicate workloads.
  *
  * Mechanics: each dimension is min-max scaled to `bits` integer
  * levels (two scalar aggregates at build time), then bit-interleaved
  * into a single long via a folded shift/or expression — pure codegen
  * column arithmetic, no UDF. The write range-partitions by the
  * z-value (so files tile the curve) and sorts within partitions by it
  * (so row groups tile it too).
  *
  * At 100 TB: build cost is one extra projection + the same shuffle
  * any clustered write pays; read benefit compounds with file count —
  * a (month × part-range) query opens the handful of files whose
  * z-range intersects the query box. [[Bench]] reports rows-scanned
  * for the same box query on the linear-sorted vs z-ordered layout.
  */
object ZOrderLayout {

  /** Interleave the low `bits` bits of `a` (even positions) and `b`
    * (odd positions) into one long — the Morton code. Inputs must
    * already be in [0, 2^bits). */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Min-max scale a numeric column to [0, 2^bits) integer levels.
    * (lo/hi are build-time scalars — two-value aggregate, not a per-row
    * dependency.) */
  def scaleToLevels(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val levels = 1L << bits
    val span = math.max(hi - lo, 1e-12)
    least(floor((c.cast("double") - lo) / span * levels), lit(levels - 1))
      .cast("long")
  }

  val bits = 16

  /** Write lineitem z-ordered by (ship date, part key). */
  /** Layout artifacts store l_shipdate as DATE: Spark writes timestamps
    * as INT96 by default, which parquet keeps NO min/max stats for — a
    * timestamp sort key would silently disable the row-group skipping
    * this whole layout exists to enable. (The source timestamps are
    * midnight-exact, so the conversion is lossless.) */
  def writeZOrdered(spark: SparkSession, sfDir: String, outDir: String,
      nFiles: Int = 16, blockBytes: Int = 1 << 20): Unit = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("l_shipdate", to_date($"l_shipdate"))
      .withColumn("ship_days", datediff($"l_shipdate", lit("1992-01-01")))
    val Array(dLo, dHi, pLo, pHi) = li
      .agg(min($"ship_days"), max($"ship_days"),
        min($"l_partkey"), max($"l_partkey"))
      .collect().head.toSeq.map(_.toString.toDouble).toArray
    li.withColumn("z",
        zValue(scaleToLevels($"ship_days", dLo, dHi, bits),
          scaleToLevels($"l_partkey", pLo, pHi, bits), bits))
      .repartitionByRange(nFiles, $"z")
      .sortWithinPartitions($"z")
      // helper columns stay out of the artifact: the projection after
      // the sort preserves per-partition order, and the written schema
      // matches the source table + the comparison layout
      .drop("ship_days", "z")
      .write.mode(SaveMode.Overwrite)
      // small row groups so min/max skipping has granularity to work
      // with even at test scale; at 100 TB the default 128 MB is right
      .option("parquet.block.size", blockBytes.toString)
      .parquet(outDir)
  }

  /** Linear comparison layout: same file count, sorted by date only. */
  def writeDateSorted(spark: SparkSession, sfDir: String, outDir: String,
      nFiles: Int = 16, blockBytes: Int = 1 << 20): Unit = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .withColumn("l_shipdate", to_date($"l_shipdate"))
      .repartitionByRange(nFiles, $"l_shipdate")
      .sortWithinPartitions($"l_shipdate")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", blockBytes.toString)
      .parquet(outDir)
  }

  /** The 2-dimensional box query both layouts are judged on: a WIDE
    * date range (one year) × a NARROW part-key slice — the shape where
    * a date-only sort must scan the whole year while z-order's
    * per-row-group bounding boxes cut the part dimension too. (For a
    * narrow-date query the date sort is already optimal; z-order's
    * trade is per-dimension precision for multi-dimension coverage.) */
  def boxQuery(df: DataFrame, pLo: Long, pHi: Long): DataFrame = {
    import df.sparkSession.implicits._
    df.filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1999-01-01" &&
        $"l_partkey" >= pLo && $"l_partkey" < pHi)
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))
  }

  /** Sum a FileSourceScanExec metric across the (AQE-aware) executed
    * plan — THE shared walk for pruning evidence; [[graft.Bench]] uses
    * it too, so a future AQE node shape is fixed in one place. */
  def scanMetric(df: DataFrame, metric: String): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => f.metrics(metric).value
      case other => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Rows the scan actually produced after row-group skipping +
    * pushed filters. */
  def rowsScanned(df: DataFrame): Long = scanMetric(df, "numOutputRows")
}
