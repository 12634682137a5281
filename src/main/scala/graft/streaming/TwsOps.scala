package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, Trigger, TTLConfig, ValueState}
import graft.operators.{BalanceOut, BalanceRow}

/** `transformWithState` — Spark 4's arbitrary-stateful streaming API —
  * running the clamped-balance fold continuously.
  *
  * The batch surface already carries this walk twice
  * ([[graft.operators.StatefulBatch]]: `flatMapGroups` and the
  * secondary-sort form); this is the third physical strategy, the one a
  * pipeline runs when ledger events never stop arriving. The reference
  * has no streaming at all (its ingestion is a monthly batch loop —
  * reference README.md:44 batch sizing), so as with the rest of §2.10
  * this is the Spark-native analog, not a port.
  *
  * Why `transformWithState` and not `mapGroupsWithState` (which
  * [[EventsStream.runStatefulUserRollup]] already covers): the v2 API is
  * what the old one hard-wires shut — NAMED state variables (value /
  * list / map) instead of one opaque blob, per-variable TTL, event- and
  * processing-time timers via `handleExpiredTimer`, and state-schema
  * evolution across restarts. Here one `ValueState[Double]` holds each
  * user's post-clamp balance: O(1) state per key, partitioned by the
  * grouping key across executors, persisted in RocksDB (the provider
  * the API requires — changelog-checkpointed, spillable, not
  * heap-bound like the HDFS-backed map).
  *
  * Determinism contract: the clamp makes the fold order-sensitive, so
  * the stream must see each user's events in (ts, event_id) order —
  * batches are TIME-RANGED (quarter spans of the event-time range, all
  * equal-ts rows land in one file, mtime-staggered so the file source
  * replays them oldest-first), and within a batch the processor sorts
  * its group's rows. State then stitches the quarters: batch k starts
  * every user exactly where batch k-1 left it. The final table is
  * byte-identical to the batch walk, which is why the SAME DuckDB
  * recursive-CTE oracle (q_clamped_balance) gates all three forms.
  *
  * Scale: per-batch cost is one keyed shuffle of the batch (not the
  * history); state is 8 bytes per live user; a TTL on the balance
  * variable is the retention knob when user keys churn (not set here —
  * the oracle needs every key). The in-batch sort is per (user, batch)
  * slice, bounded by the batch size, not the stream length.
  */
object TwsOps {

  /** The stateful processor: one named ValueState per user carrying the
    * post-clamp balance across micro-batches. Pinned-order IEEE
    * arithmetic — (((bal + value) − drift) clamped low then high) —
    * matching [[graft.operators.StatefulBatch.clampedBalance]] exactly. */
  private[streaming] class ClampedBalanceProcessor(
      floorAt: Double, cap: Double, drift: Double)
      extends StatefulProcessor[Long, BalanceRow, BalanceOut] {

    @transient private var balance: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      balance = getHandle.getValueState[Double](
        "balance", Encoders.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[BalanceRow],
        timerValues: TimerValues): Iterator[BalanceOut] = {
      // the group's slice of THIS batch, in event order; state supplies
      // the carry-in from every earlier batch
      val slice = rows.toArray.sortBy(r => (r.ts_micros, r.event_id))
      var bal = if (balance.exists()) balance.get() else 0.0
      val out = slice.map { r =>
        bal = math.min(math.max(bal + r.value - drift, floorAt), cap)
        BalanceOut(user, r.event_id, bal)
      }
      balance.update(bal)
      out.iterator
    }
  }

  /** Runs the clamped balance as a 4-micro-batch stream over a
    * time-ranged feed built from the events table; returns the full
    * emitted history (one row per event, its post-clamp balance). */
  def twsBalanceQuery(spark: SparkSession, sfDir: String,
      floorAt: Double = 0.0, cap: Double = 500.0,
      drift: Double = 50.0): DataFrame = {
    import spark.implicits._
    val work = graft.functions.Staged.scratchDir("graft_tws_").toString
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val prevChangelog = spark.conf.getOption(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    // 4, not the gate-default 8: each shuffle partition is a RocksDB
    // store instance, and with tiny per-key state the gate's cost is
    // store open/commit × partitions × batches, not data (r9 verdict
    // #8 — profiled: halving partitions halves the fixed cost, results
    // are key-partitioned and identical). The batch COUNT stays ≥ 4 —
    // that is the gated semantic (state crossing batch boundaries).
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // transformWithState requires the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // changelog checkpointing: commit the per-batch WRITE DELTA instead
    // of a full RocksDB snapshot zip per store per micro-batch (the OSS
    // default). With 8 stores × 4 batches the full-snapshot uploads are
    // the dominant fixed cost here, and at production state sizes the
    // snapshot-per-commit mode is quadratic-ish in state — changelog
    // mode is the deployment setting this gate should be measuring.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    try {
      def src = graft.sources.Tables.events(spark, sfDir)
        .select($"user_id", $"event_id",
          unix_micros($"ts").as("ts_micros"), $"value")
      // time-ranged quarters: every equal-ts row lands in ONE file, so
      // file order (staggered mtimes, FileStreamSource replays oldest
      // first) IS global (ts, event_id) order up to in-batch sorting.
      // Read-only to the stream → staged once per process.
      val feedDir = graft.functions.Staged.materializeDir(
          s"tws_feed_${graft.functions.Staged.sfKey(sfDir)}") { p =>
        val Row2 = src.agg(min($"ts_micros"), max($"ts_micros")).head()
        val (lo, hi) = (Row2.getLong(0), Row2.getLong(1))
        val feed = new java.io.File(p); feed.mkdirs()
        val t0 = System.currentTimeMillis() - 3600 * 1000L
        val cuts = (0 to 4).map(k => lo + (hi - lo) / 4 * k)
        (0 until 4).foreach { b =>
          val upper = if (b == 3) hi + 1 else cuts(b + 1)
          // staging lives INSIDE the artifact dir (so materializeDir's
          // retry sweep clears it) with a `_` prefix (so the file stream
          // source ignores it if a crash ever leaves it behind);
          // overwrite-mode for the same retry reason
          val staging = s"$p/_tws_stage$b"
          src.filter($"ts_micros" >= cuts(b) && $"ts_micros" < upper)
            .coalesce(1).write.mode("overwrite").parquet(staging)
          val part = new java.io.File(staging).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(feed, f"quarter-$b%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(t0 + b * 10000L)
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
          ()
        }
      }
      val stream = spark.readStream
        .schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feedDir)
        .as[BalanceRow]
      val q = stream.groupByKey(_.user_id)
        .transformWithState(
          new ClampedBalanceProcessor(floorAt, cap, drift),
          TimeMode.None(), OutputMode.Append())
        .writeStream
        .outputMode(OutputMode.Append)
        .format("memory")
        .queryName("tws_balance")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val nBatches = q.recentProgress.map(_.batchId).distinct.length
      require(nBatches >= 4,
        s"tws balance: expected >=4 micro-batches (state must cross " +
          s"batch boundaries), saw $nBatches")
      spark.table("tws_balance")
        .orderBy($"user_id", $"event_id")
        .localCheckpoint(eager = true)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      prevChangelog match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      ()
    }
  }
}
