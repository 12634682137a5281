package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{ManifestIndex, Versioned}

/** The manifest index's three contracts (r11 verdict #2):
  *  1. stats FIDELITY — the footer-derived manifest rows equal a data
  *     recompute per file;
  *  2. prune EXACTNESS + evidence — the pruned read returns exactly
  *     the full read's content while provably reading fewer files
  *     (the gate layout: 1 of 7 year files);
  *  3. CRASH CONSISTENCY — data and manifest become visible in one
  *     atomic step (marker-last), an uncommitted snapshot is invisible
  *     to readers and sweepable by vacuum. */
class ManifestIndexSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.001"

  private def scratch() =
    graft.functions.Staged.scratchDir("graft_mi_spec_").toString

  test("manifest rows match a per-file data recompute") {
    val tmp = scratch()
    try {
      val df = (1L to 100L).map(i => (i, i * 10L, i / 4.0)).toDF("k", "v", "d")
      ManifestIndex.publish(spark, s"$tmp/t", Seq("k", "v", "d")) { dir =>
        df.filter($"k" <= 40).coalesce(1).write.mode(SaveMode.Append).parquet(dir)
        df.filter($"k" > 40).coalesce(1).write.mode(SaveMode.Append).parquet(dir)
      }
      // normalize file-URI spellings: Hadoop lists file:/x, Spark's
      // input_file_name() renders file:///x
      def norm(s: String) = s.replaceFirst("^file:/+", "/")
      val m = ManifestIndex.manifest(spark, s"$tmp/t").collect()
        .map(r => (norm(r.getString(0)), r.getString(2)) -> r).toMap
      assert(m.size == 6, "2 files x 3 stats columns")
      // recompute per file off the data itself
      val byFile = spark.read.parquet(s"$tmp/t/v=0")
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n"), min($"k").as("k0"), max($"k").as("k1"),
          min($"v").as("v0"), max($"v").as("v1"),
          min($"d").as("d0"), max($"d").as("d1"))
        .collect()
      assert(byFile.length == 2)
      byFile.foreach { r =>
        val f = norm(r.getString(0))
        val kRow = m((f, "k")); val vRow = m((f, "v")); val dRow = m((f, "d"))
        assert(kRow.getLong(1) == r.getLong(1), "row_count")
        assert(kRow.getLong(3) == r.getLong(2) && kRow.getLong(4) == r.getLong(3))
        assert(vRow.getLong(3) == r.getLong(4) && vRow.getLong(4) == r.getLong(5))
        assert(dRow.getDouble(5) == r.getDouble(6) &&
          dRow.getDouble(6) == r.getDouble(7))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }
  }

  test("pruned read ≡ full read; gate layout reads 1 of 7 files") {
    val tmp = scratch()
    try {
      val orders = graft.sources.Tables.orders(spark, gateSf)
        .select($"o_orderkey", to_date($"o_orderdate").as("o_orderdate"),
          $"o_totalprice")
      val years = orders.select(year($"o_orderdate").as("y"))
        .distinct().orderBy($"y").collect().map(_.getInt(0)).toSeq
      ManifestIndex.publish(spark, s"$tmp/t", Seq("o_orderdate")) { dir =>
        years.foreach(y => orders.filter(year($"o_orderdate") === y)
          .coalesce(1).write.mode(SaveMode.Append).parquet(dir))
      }
      val (pruned, kept, total) = ManifestIndex.readPruned(
        spark, s"$tmp/t", "o_orderdate",
        java.time.LocalDate.of(1997, 1, 1).toEpochDay,
        java.time.LocalDate.of(1998, 1, 1).toEpochDay - 1L)
      assert(total == 7 && kept == 1,
        s"year-clustered gate layout must read 1 of 7 files, got $kept/$total")
      // content equivalence: pruned + residual == full + residual
      val a = pruned.filter(year($"o_orderdate") === 1997)
        .orderBy($"o_orderkey").collect().toSeq
      val b = spark.read.parquet(s"$tmp/t/v=0")
        .filter(year($"o_orderdate") === 1997)
        .orderBy($"o_orderkey").collect().toSeq
      assert(a == b, "pruned read must be content-identical to the full read")
      assert(a.nonEmpty)
      // a window spanning everything keeps every non-empty file
      val (_, keptAll, totalAll) = ManifestIndex.readPruned(
        spark, s"$tmp/t", "o_orderdate", Long.MinValue, Long.MaxValue)
      assert(keptAll == totalAll,
        "conservative: an all-covering window must keep every file")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }
  }

  test("crash consistency: marker-last; orphans invisible + vacuumable") {
    val tmp = scratch()
    try {
      val df = (1L to 10L).map(i => (i, i * 2)).toDF("k", "v")
      val v0 = ManifestIndex.publish(spark, s"$tmp/t", Seq("k")) { dir =>
        df.coalesce(1).write.mode(SaveMode.Append).parquet(dir)
      }
      assert(v0 == 0)
      // simulate a publish that crashed AFTER data+manifest, BEFORE the
      // marker: everything is on disk, nothing is committed
      df.coalesce(1).write.parquet(s"$tmp/t/v=1")
      spark.createDataFrame(Seq(("torn", 10L, "k",
          java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L),
          null: java.lang.Double, null: java.lang.Double)))
        .toDF("file", "row_count", "col", "min_long", "max_long",
          "min_double", "max_double")
        .coalesce(1).write.parquet(s"$tmp/t/v=1/_manifest")
      assert(Versioned.currentVersion(spark, s"$tmp/t") == 0,
        "uncommitted snapshot must be invisible")
      intercept[IllegalArgumentException] {
        ManifestIndex.manifest(spark, s"$tmp/t", 1)
      }
      // the pruned read plans from the COMMITTED manifest only
      val (_, kept, total) = ManifestIndex.readPruned(
        spark, s"$tmp/t", "k", 1L, 100L)
      assert(kept == 1 && total == 1)
      // the next publish skips over the orphan; readers see it whole
      val v2 = ManifestIndex.publish(spark, s"$tmp/t", Seq("k")) { dir =>
        df.filter($"k" <= 5).coalesce(1)
          .write.mode(SaveMode.Append).parquet(dir)
      }
      assert(v2 == 2 && Versioned.currentVersion(spark, s"$tmp/t") == 2)
      assert(ManifestIndex.manifest(spark, s"$tmp/t").count() == 1)
      // vacuum sweeps the orphan below the newest committed version
      Versioned.vacuum(spark, s"$tmp/t", keepLast = 2)
      assert(!new java.io.File(s"$tmp/t/v=1").exists(),
        "vacuum must sweep the crashed publish's orphan")
      assert(ManifestIndex.manifest(spark, s"$tmp/t", 0).count() == 1,
        "retained committed snapshots keep their manifests")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)); ()
    }
  }
}
