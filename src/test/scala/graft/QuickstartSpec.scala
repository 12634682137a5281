package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hll, TextAnalysis}
import graft.sources.Tables

/** README "Quickstart — use graft on your own cluster" doc-snippet
  * test: the exact calls the README shows must compile and run against
  * a plain session. Keep in sync with README.md — this IS the
  * snippet (paths and the write sink swapped for test temp dirs). */
class QuickstartSpec extends SparkSuite {

  test("quickstart snippet: configure + operator + mergeable sketch") {
    GraftSession.configure(spark)

    val dataDir = "/root/testdata/sf0.001"
    val counts = TextAnalysis.tokenCounts(spark, dataDir)
    assert(counts.count() > 0)

    val toks = Tables.documents(spark, dataDir).select(col("source"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("tok"))
    val sketch = toks.select(col("source"), Hll.sketchCol(col("tok")).as("s"))
      .groupBy(col("source"), col("s.reg").as("reg")).agg(max(col("s.rho")).as("r"))
    val out = java.nio.file.Files.createTempDirectory("quickstart").toString
    sketch.write.mode("append").parquet(s"$out/hll")

    // the persisted shard state re-reads and merges by the same MAX
    val regs = spark.read.parquet(s"$out/hll")
    val bySource = regs.groupBy("source").count().collect()
    assert(bySource.nonEmpty && bySource.forall(_.getLong(1) <= Hll.Registers))
    val merged = regs.groupBy(col("source"), col("reg")).agg(max(col("r")).as("r"))
    assert(merged.count() == regs.count(), "single shard merges to itself")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
