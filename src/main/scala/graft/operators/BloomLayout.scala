package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet column bloom filters — row-group skipping for point lookups
  * on columns no sort order helps.
  *
  * Min/max stats (ClusteredLayout) and Morton codes (ZOrderLayout)
  * only skip when the layout correlates with the predicate; a point
  * lookup on a HIGH-CARDINALITY, UNSORTED key (entity id, content
  * hash) sees every row group's [min, max] straddle the probe value
  * and scans everything. Parquet's per-row-group split-block bloom
  * filters fix exactly this: the reader drops any group whose filter
  * says "definitely absent" — no layout change, one write option.
  *
  * Dictionary encoding is disabled on the probe column in BOTH
  * variants: parquet-mr's dictionary-page filtering can also skip
  * groups (a dictionary IS an exact membership list), which would
  * contaminate the bloom-vs-nothing comparison this experiment makes.
  *
  * At 100 TB this is the difference between a point lookup reading one
  * row group per file (~128 MB × files) and reading the whole table —
  * the poor man's secondary index, and the reason table formats let
  * you declare bloom columns per table. */
object BloomLayout {

  /** Write `df` as one file with many small row groups; bloom filter
    * on `col` iff `bloom`. */
  def write(df: DataFrame, outDir: String, col: String, bloom: Boolean,
      blockBytes: Int = 64 * 1024): Unit = {
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", blockBytes.toString)
      .option("parquet.enable.dictionary", "false")
      .option(s"parquet.bloom.filter.enabled#$col", bloom.toString)
      .parquet(outDir)
  }

  /** Point lookup on the probe column. */
  def pointQuery(spark: SparkSession, dir: String, col: String,
      value: Long): DataFrame =
    spark.read.parquet(dir).filter(org.apache.spark.sql.functions.col(col) === value)

  def rowsScanned(df: DataFrame): Long = ZOrderLayout.rowsScanned(df)
}
