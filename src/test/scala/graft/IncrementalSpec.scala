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

  test("insert-overwrite writes one file per partition dir (bounded commit)") {
    // r4 bench: a 4-task batch spanning 7 keys committed up to 4 files
    // into EVERY partition dir; the pre-write repartition(partCols)
    // bounds it to exactly one per key regardless of upstream layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_iow_files_").toString
    try {
      spark.range(100)
        .select(($"id" % 7).cast("string").as("part"), $"id", ($"id" * 1.5).as("v"))
        .repartition(col("part"))
        .write.partitionBy("part").parquet(s"$tmp/t")
      val batch = spark.range(500)
        .select(($"id" % 7).cast("string").as("part"), ($"id" + 1000).as("id"),
          ($"id" * 2.5).as("v"))
        .repartition(4) // deliberately scattered: every task holds every key
      Ingest.insertOverwritePartitions(spark, s"$tmp/t", batch, Seq("part"))
      (0 until 7).foreach { p =>
        val files = listing(new java.io.File(s"$tmp/t/part=$p"))
        assert(files.size == 1, s"part=$p has ${files.size} data files, want 1")
      }
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

/** Incremental view maintenance: merge-only refresh (round 3). */
class MatViewSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.MaterializedView

  test("maintain() needs only the stored aggregate and the delta") {
    // stored state constructed directly — no base table exists at all,
    // which proves maintenance never needs to rescan history
    val stored = Seq(
      ("click", java.sql.Date.valueOf("2024-01-01"), 3L, BigDecimal("10.5")),
      ("view", java.sql.Date.valueOf("2024-01-01"), 2L, BigDecimal("4.0"))
    ).toDF("event_type", "day", "n", "total_dec")
      .select($"event_type", $"day", $"n", $"total_dec".cast("decimal(27,6)"))
    val delta = Seq(
      (100L, "click", "2024-01-01 10:00:00", 2.5), // merges into existing cell
      (101L, "error", "2024-01-02 10:00:00", 1.0)  // creates a new cell
    ).toDF("event_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = MaterializedView.maintain(stored, delta)
      .orderBy($"event_type", $"day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDecimal(3).doubleValue))
    assert(out.toSeq == Seq(
      ("click", "2024-01-01", 4L, 13.0),
      ("error", "2024-01-02", 1L, 1.0),
      ("view", "2024-01-01", 2L, 4.0)))
  }

  test("gated query equals the full recompute on testdata") {
    val maintained = graft.operators.MaterializedView.incrementalAggQuery(spark, sf)
    val full = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_full"),
        sum($"value".cast("decimal(27,6)")).cast("double").as("total_full"))
    val joined = maintained.join(full, Seq("event_type", "day"))
    assert(joined.filter($"n" =!= $"n_full" || $"total_value" =!= $"total_full").count() == 0)
    assert(maintained.count() == full.count())
  }
}

/** Attribution + A/B report specs (round 3). */
class AbAttributionSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.Behavioral

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).withColumn("value", lit(1.0))
      .drop("ts_s")

  test("attribution: first/last touch, purchase-before-click is null") {
    val events = ev(
      (1L, 1L, "click", "2024-01-01 01:00:00"),
      (2L, 1L, "view", "2024-01-01 02:00:00"),
      (3L, 1L, "click", "2024-01-01 03:00:00"),
      (4L, 1L, "purchase", "2024-01-01 04:00:00"), // first=1, last=3
      (5L, 1L, "click", "2024-01-01 05:00:00"),
      (6L, 1L, "purchase", "2024-01-01 06:00:00"), // first=1, last=5
      (7L, 2L, "purchase", "2024-01-01 01:00:00"), // no prior click
      (8L, 2L, "click", "2024-01-01 02:00:00")
    )
    val out = Behavioral.attributionFrom(events).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq((4L, 1L, 3L), (6L, 1L, 5L), (7L, -1L, -1L)))
  }

  test("attribution: equal timestamps break by event_id") {
    val events = ev(
      (10L, 1L, "click", "2024-01-01 01:00:00"),
      (11L, 1L, "click", "2024-01-01 01:00:00"), // same ts, higher id
      (12L, 1L, "purchase", "2024-01-01 02:00:00")
    )
    val out = Behavioral.attributionFrom(events).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((10L, 11L)))
  }

  test("ab test: deterministic, both variants populated, stable assignment") {
    val a = Behavioral.abTest(spark, sf).collect()
    val b = Behavioral.abTest(spark, sf).collect()
    assert(a.toSeq == b.toSeq && a.length == 1)
    val row = a.head
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    assert(!row.isNullAt(4)) // t_stat defined
  }
}

/** Table diff, schema evolution, streaming IVM (round 3, batch 3). */
class ReconcileSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.Reconcile

  test("tableDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
      .toDF("id", "t", "v")
    val next = Seq((2L, "b", 2.0), (3L, "c", 9.0), (4L, "x", 4.0), (5L, "e", 5.0))
      .toDF("id", "t", "v")
    val out = Reconcile.tableDiff(old, next, "id", Seq("t", "v")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "changed"), (5L, "added")))
  }

  test("tableDiff: NULL-to-value and value-to-NULL are changes, NULL==NULL is not") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("id", "t")
    val next = Seq((1L, Some("v")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("id", "t")
    val out = Reconcile.tableDiff(old, next, "id", Seq("t")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "changed"), (2L, "changed")))
  }

  test("gated diff: removal wins over update on overlapping ids") {
    val out = graft.operators.Reconcile.tableDiffQuery(spark, sf).cache()
    // event_id divisible by 65 is both %5 (update) and %13 (remove)
    val both = out.filter($"event_id" % 65 === 0 && $"event_id" < 1000000)
    assert(both.filter($"change_type" =!= "removed").count() == 0)
    assert(out.filter($"change_type" === "added").count() > 0)
    assert(out.filter($"change_type" === "changed").count() > 0)
    out.unpersist()
  }

  test("schema evolution: v1 files physically lack the evolved column") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_evo_spec_").toString
    try {
      Seq((1L, "x")).toDF("id", "a").write.parquet(s"$tmp/t")
      Seq((2L, "y", "z")).toDF("id", "a", "b")
        .write.mode("append").parquet(s"$tmp/t")
      val merged = spark.read.option("mergeSchema", "true").parquet(s"$tmp/t")
      assert(merged.columns.toSet == Set("id", "a", "b"))
      val rows = merged.orderBy($"id").collect()
      assert(rows(0).isNullAt(rows(0).fieldIndex("b"))) // v1 row null-padded
      assert(rows(1).getString(rows(1).fieldIndex("b")) == "z")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("IVM batch apply is replay-idempotent via the applied-batch watermark") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivm_replay_").toString
    try {
      val events = graft.sources.Tables.events(spark, sf)
      graft.operators.MaterializedView.viewOf(events.filter($"event_id" % 10 =!= 0))
        .write.parquet(s"$tmp/view")
      val delta = events.filter($"event_id" % 10 === 0)
      val first = graft.streaming.EventsStream.applyIvmBatch(spark, s"$tmp/view", delta, 0L)
      val afterFirst = spark.read.parquet(s"$tmp/view")
        .agg(sum($"n")).collect().head.getLong(0)
      // checkpoint replay re-delivers the SAME batchId: must be a no-op
      val replay = graft.streaming.EventsStream.applyIvmBatch(spark, s"$tmp/view", delta, 0L)
      val afterReplay = spark.read.parquet(s"$tmp/view")
        .agg(sum($"n")).collect().head.getLong(0)
      assert(first && !replay)
      assert(afterFirst == afterReplay && afterFirst == events.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  test("streaming IVM equals the single-fold maintenance result") {
    val streamed = graft.streaming.EventsStream.ivmStreamQuery(spark, sf)
    val batch = graft.operators.MaterializedView.incrementalAggQuery(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
  }
}
