package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Profile, TimeSeries}
import graft.functions.Retrieval

/** Specs for the profiling / distribution / phrase-search operators
  * (round 3, batch 2). */
class ProfilingSpec extends SparkSuite {
  import spark.implicits._

  test("profile: one row per column, exact stats on constructed data") {
    val df = Seq(
      (1L, Some("a"), Some(java.math.BigDecimal.valueOf(150, 2))),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(java.math.BigDecimal.valueOf(275, 2))),
      (4L, None, Some(java.math.BigDecimal.valueOf(150, 2)))
    ).toDF("id", "s", "d")
      .select($"id", $"s", $"d".cast("decimal(18,2)"))
    val byName = Profile.profileFrom(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(byName("id") == ((4L, 0L, 4L, "1", "4")))
    assert(byName("s") == ((4L, 1L, 2L, "a", "b")))
    assert(byName("d") == ((4L, 1L, 2L, "1.50", "2.75")))
  }

  test("profile on events: keys unique, types complete") {
    val p = Profile.profileEvents(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p.keySet == Set("event_id", "ts_sec", "user_id", "event_type", "value", "props"))
    val (n, nulls, distinct) = p("event_id")
    assert(nulls == 0 && distinct == n) // event_id is a key
    assert(p("event_type")._3 == 5)
  }

  test("ts anomaly: first day has no baseline, z matches hand computation") {
    val events = Seq(
      // 3 days: 2, 2, 8 events -> day3 z vs trailing {2,2}: sigma 0 -> null z
      (1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 11:00:00"),
      (3L, "2024-01-02 10:00:00"), (4L, "2024-01-02 11:00:00"),
      (5L, "2024-01-03 01:00:00"), (6L, "2024-01-03 02:00:00"),
      (7L, "2024-01-03 03:00:00"), (8L, "2024-01-03 04:00:00"),
      (9L, "2024-01-03 05:00:00"), (10L, "2024-01-03 06:00:00"),
      (11L, "2024-01-03 07:00:00"), (12L, "2024-01-03 08:00:00"),
      // day 4: 4 events vs trailing {2,2,8}: mean 4, sigma sqrt(12) -> z 0
      (13L, "2024-01-04 01:00:00"), (14L, "2024-01-04 02:00:00"),
      (15L, "2024-01-04 03:00:00"), (16L, "2024-01-04 04:00:00")
    ).toDF("event_id", "ts_s").withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = TimeSeries.dailyAnomalyFrom(events).collect()
    assert(out.length == 4)
    assert(out(0).isNullAt(2) && out(0).isNullAt(4)) // no baseline at all
    assert(out(1).getDouble(2) == 2.0 && out(1).isNullAt(4)) // cnt7=1: mean only
    assert(out(2).isNullAt(4)) // sigma 0 -> z null
    assert(!out(2).getBoolean(5))
    assert(out(3).getDouble(4) == 0.0) // exactly the trailing mean
  }

  test("ts anomaly on events: all 30 days present, z defined after warmup") {
    val out = TimeSeries.dailyAnomaly(spark, sf).cache()
    assert(out.count() == 30)
    assert(out.filter($"z".isNotNull).count() >= 20)
    out.unpersist()
  }

  test("histogram: buckets partition the count, max lands in last bucket") {
    val h = Analytics.histogram(spark, sf).cache()
    val total = h.agg(sum($"n")).as[Long].head()
    val rows = graft.sources.Tables.lineitem(spark, sf).count()
    assert(total == rows)
    val buckets = h.select($"bucket").as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 20))
    assert(buckets.contains(19)) // the max value itself is clamped in
    h.unpersist()
  }

  test("phrase search: overlapping occurrences count individually") {
    val docs = Seq(
      (1L, "x batch batch batch batch y"), // 2 overlapping triples
      (2L, "batch batch nothing batch batch"), // none
      (3L, "one batch batch batch end") // 1
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseSearchFrom(docs, Seq("batch", "batch", "batch"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 1), (3L, 1L, 1)))
  }

  test("phrase search finds the pinned phrase on testdata") {
    val out = Retrieval.phraseSearch(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) >= 1))
  }
}

/** Binary media dedup (round 3). */
class MediaDedupSpec extends SparkSuite {
  import spark.implicits._
  import graft.functions.Multimodal

  test("planted duplicates are found, keeper is the original id") {
    val out = Multimodal.mediaDedupQuery(spark, sf).cache()
    // every doc_id % 10 == 0 asset was re-ingested under id + 10000
    val planted = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 10 === 0).count()
    assert(out.count() >= planted && planted > 0)
    // keeper is always the minimum id in its group (the original)
    assert(out.filter($"keeper_media_id" >= 1000000).count() == 0)
    assert(out.filter($"n_copies" < 2).count() == 0)
    out.unpersist()
  }

  test("perceptual near-dup: single-byte edits pair, decoys don't, banded == brute force") {
    // constructed payloads: base assets, one-byte-edited variants
    // (near-dups), and structurally different decoys
    def bytes(s: String) = s.getBytes("UTF-8")
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val rows = Seq(
      (1L, bytes(base)),
      (2L, bytes("#" + base.substring(1))),      // 1-byte edit of 1
      (3L, bytes(base.reverse)),                  // same bytes, other order
      (4L, bytes("completely different content here, nothing shared " * 7)),
      (5L, bytes(base.substring(0, base.length - 1) + "!")) // tail edit of 1
    ).toDF("media_id", "payload")
    val got = Multimodal.mediaNearDup(rows, thr = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth over the same dhash values
    val h = rows.select($"media_id",
      Multimodal.dhash60($"payload").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- h.keys; b <- h.keys if a < b
      if java.lang.Long.bitCount(h(a) ^ h(b)) <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"banded $got != brute $brute")
    // the planted edits pair with the original; the decoys pair with nothing
    assert(got.contains((1L, 2L)) && got.contains((1L, 5L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dhash locality: flipping one sampled byte moves few bits; empty payload is 0") {
    def bytes(s: String) = s.getBytes("UTF-8")
    val base = ("x" * 30) ++ ("A@zQ9" * 30) // varied bytes, length 180
    val edited = "#" + base.substring(1)
    val df = Seq((1L, bytes(base)), (2L, bytes(edited)),
      (3L, Array.empty[Byte])).toDF("media_id", "payload")
    val h = df.select($"media_id", Multimodal.dhash60($"payload").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // byte 0 is sampled by grid cell (0,0) only → at most the bit
    // comparing cells (0,0)-(0,1) flips
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) <= 1)
    assert(h(3L) == 0L)
    // hashes stay inside the 60-bit budget (sign bit clear)
    h.values.foreach(v => assert(v >= 0L && v < (1L << 60)))
  }
}

/** Unpivot round-trip + winsorization (round 3). */
class ReshapeRobustSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.Analytics

  test("unpivot is the exact inverse of pivot, zero cells included") {
    val long = Analytics.unpivotStatus(spark, sf).cache()
    val wide = Analytics.pivotStatus(spark, sf)
    // every (group, status) cell appears exactly once
    assert(long.count() == wide.count() * 2)
    val rebuilt = long.groupBy($"service_type")
      .pivot("status", Seq("F", "O")).sum("n")
      .withColumnRenamed("F", "n_fulfilled").withColumnRenamed("O", "n_open")
    assert(rebuilt.exceptAll(wide).isEmpty && wide.exceptAll(rebuilt).isEmpty)
    long.unpersist()
  }

  test("winsorize: clamp counts ~5% tails, total matches a plain-Scala clamp") {
    val w = Analytics.winsorize(spark, sf).cache()
    val raw = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val rows = w.collect()
    rows.foreach { r =>
      val n = r.getLong(1); val lo = r.getLong(2); val hi = r.getLong(3)
      // percentile_cont bounds put at most ~5% strictly outside each side
      assert(lo <= n * 6 / 100 + 1, s"lo clamp $lo of $n")
      assert(hi <= n * 6 / 100 + 1, s"hi clamp $hi of $n")
      val p05 = r.getDouble(4); val p95 = r.getDouble(5)
      assert(p05 <= p95)
      // the decimal-routed winsorized_total equals an independent
      // plain-Scala clamp-and-exact-sum (sumExact discipline: each
      // value rounded to 6 decimals half-up, summed exactly)
      val expected = raw(r.getString(0)).map { v =>
        BigDecimal(math.min(math.max(v, p05), p95))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(math.abs(r.getDouble(6) - expected) < 1e-3,
        s"${r.getString(0)}: ${r.getDouble(6)} vs $expected")
    }
    assert(rows.nonEmpty)
    w.unpersist()
  }
}

/** HLL sketch re-aggregation + join-hint surface (round 3). */
class SketchHintSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.Analytics

  test("union-of-daily-sketches estimates weekly distinct within the HLL envelope") {
    val out = Analytics.hllUnionRollup(spark, sf).cache()
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("week", $"ts").cast("date").as("week"))
      .agg(count_distinct($"user_id").as("exact_weekly"))
    val sumDaily = graft.sources.Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(count_distinct($"user_id").as("d"))
      .groupBy(date_trunc("week", $"day").cast("date").as("week"))
      .agg(sum($"d").as("sum_of_daily"))
    val joined = out.join(exact, "week").join(sumDaily, "week").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val approx = r.getAs[Long]("approx_weekly").toDouble
      val ex = r.getAs[Long]("exact_weekly").toDouble
      // default lgConfigK=12 => ~1.6% relative standard error; 5 sigma
      assert(math.abs(approx - ex) / ex < 0.08, s"week ${r.get(0)}: $approx vs $ex")
      // and re-aggregation actually deduplicates: estimate is far below
      // the sum of daily distincts (users recur across days)
      assert(approx < r.getAs[Long]("sum_of_daily"))
    }
    out.unpersist()
  }

  test("register HLL: daily-then-merge == single-shot weekly (lossless union), estimate in envelope") {
    // sf0.01: weekly (user, type) cardinality ~450-720 sits above m=256,
    // where the uncorrected estimator is valid (sf0.001 would land in
    // the linear-counting region the op deliberately doesn't implement)
    val sf01 = "/root/testdata/sf0.01"
    val viaDaily = Analytics.hllRegisterRollup(spark, sf01).collect()
    // single-shot twin: identical pipeline with the daily level removed —
    // if register-wise max were lossy these would diverge
    import org.apache.spark.sql.expressions.Window
    val item = concat($"user_id".cast("string"), lit("#"), $"event_type",
      lit("|hll_v1"))
    val ev = graft.sources.Tables.events(spark, sf01)
      .select(date_trunc("week", to_date($"ts")).cast("date").as("week"),
        graft.functions.Dedup.hash60(item).as("h"))
    val weekly = ev.select($"week", ($"h" % 256).as("bucket"),
        shiftright($"h", 8).as("w"))
      .select($"week", $"bucket",
        when($"w" === 0, lit(53))
          .otherwise(lit(53) - length(bin($"w"))).as("rho"))
      .groupBy($"week", $"bucket").agg(max($"rho").as("reg"))
    val wk = weekly.withColumn("rmax",
      max($"reg").over(Window.partitionBy($"week")))
    val oneShot = wk.groupBy($"week").agg(
        max($"rmax").cast("long").as("rmax"),
        (lit(256) - count(lit(1))).cast("long").as("v_zero"),
        (sum(expr("shiftleft(CAST(1 AS BIGINT), rmax - reg)")) +
          (lit(256) - count(lit(1))).cast("long") *
            expr("shiftleft(CAST(1 AS BIGINT), max(rmax))")).as("znum"))
      .orderBy($"week").collect()
    assert(viaDaily.length == oneShot.length && viaDaily.nonEmpty)
    viaDaily.zip(oneShot).foreach { case (d, s) =>
      assert(d.getAs[java.sql.Date]("week") == s.getAs[java.sql.Date]("week"))
      assert(d.getAs[Long]("rmax") == s.getAs[Long]("rmax"))
      assert(d.getAs[Long]("v_zero") == s.getAs[Long]("v_zero"))
      assert(d.getAs[Long]("znum") == s.getAs[Long]("znum"),
        s"union not lossless at week ${d.get(0)}")
    }
    // envelope: raw estimator, m=256 => ~6.5% rel std err; generous 4 sigma
    val exact = graft.sources.Tables.events(spark, sf01)
      .groupBy(date_trunc("week", $"ts").cast("date").as("week"))
      .agg(count_distinct(concat($"user_id".cast("string"), lit("#"),
        $"event_type")).as("ex"))
      .collect().map(r => r.getAs[java.sql.Date]("week") -> r.getAs[Long]("ex")).toMap
    viaDaily.foreach { r =>
      val ex = exact(r.getAs[java.sql.Date]("week")).toDouble
      val est = r.getAs[Double]("est_raw")
      assert(math.abs(est - ex) / ex < 0.26, s"week ${r.get(0)}: $est vs $ex")
    }
  }

  test("join hints steer the physical strategy") {
    val ev = graft.sources.Tables.events(spark, sf)
    val dim = graft.sources.Tables.nation(spark, sf)
      .select($"n_nationkey".as("user_mod"), $"n_name")
    val keyed = ev.withColumn("user_mod", $"user_id" % 25)
    def strategyOf(hinted: org.apache.spark.sql.DataFrame): String = {
      val plan = hinted.join(keyed, "user_mod").queryExecution.executedPlan.toString
      if (plan.contains("BroadcastHashJoin")) "broadcast"
      else if (plan.contains("SortMergeJoin")) "merge"
      else if (plan.contains("ShuffledHashJoin")) "shuffle_hash"
      else "other"
    }
    assert(strategyOf(dim.hint("broadcast")) == "broadcast")
    assert(strategyOf(dim.hint("merge")) == "merge")
    assert(strategyOf(dim.hint("shuffle_hash")) == "shuffle_hash")
  }
}
