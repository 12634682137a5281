package graft

import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Specs for the dynamic-partition-overwrite incremental sink (round 3). */
class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def listing(dir: java.io.File): Map[String, (Long, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap

  test("insert-overwrite replaces only the partitions in the batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_iow_spec_").toString
    try {
      Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0), ("c", 4L, 40.0))
        .toDF("part", "id", "v")
        .write.partitionBy("part").parquet(s"$tmp/t")
      val untouchedBefore = listing(new java.io.File(s"$tmp/t/part=b"))
      val touchedBefore = listing(new java.io.File(s"$tmp/t/part=a"))
      assert(untouchedBefore.nonEmpty && touchedBefore.nonEmpty)

      val batch = Seq(("a", 9L, 90.0)).toDF("part", "id", "v")
      val out = Ingest.insertOverwritePartitions(spark, s"$tmp/t", batch, Seq("part"))
        .select($"part", $"id", $"v").orderBy($"id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

      // partition a fully replaced, b and c untouched, nothing dropped
      assert(out.toSeq == Seq(("b", 3L, 30.0), ("c", 4L, 40.0), ("a", 9L, 90.0)))
      val untouchedAfter = listing(new java.io.File(s"$tmp/t/part=b"))
      assert(untouchedAfter == untouchedBefore,
        "untouched partition files must be byte-identical (same name/size/mtime)")
      val touchedAfter = listing(new java.io.File(s"$tmp/t/part=a"))
      assert(touchedAfter.keySet.intersect(touchedBefore.keySet).isEmpty,
        "overwritten partition must contain only new files")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("partitionOverwriteMode is restored after the write") {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val tmp = java.nio.file.Files.createTempDirectory("graft_iow_conf_").toString
    try {
      spark.conf.set(key, "static")
      Seq(("a", 1L)).toDF("part", "id").write.partitionBy("part").parquet(s"$tmp/t")
      Ingest.insertOverwritePartitions(spark, s"$tmp/t",
        Seq(("a", 2L)).toDF("part", "id"), Seq("part"))
      assert(spark.conf.get(key) == "static")
    } finally {
      spark.conf.unset(key)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("gated query: restated 1997 months differ from stale, others stay stale") {
    val q = Ingest.insertOverwriteQuery(spark, sf).cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    val full1997 = orders.filter(year($"o_orderdate") === 1997)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_full"))
    // every 1997 month carries the FULL count (restated), and at least
    // one non-1997 month lost rows to the stale filter
    val mism = q.join(full1997, "order_month")
      .filter($"n" =!= $"n_full").count()
    assert(mism == 0)
    val staleMonths = q.filter(!$"order_month".startsWith("1997"))
    val fullOther = orders.filter(year($"o_orderdate") =!= 1997)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_full"))
    val shrunk = staleMonths.join(fullOther, "order_month")
      .filter($"n" < $"n_full").count()
    assert(shrunk > 0)
    q.unpersist()
  }
}
