package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Right-to-be-forgotten over an immutable versioned table — the
  * deletion-vector mechanic production table formats use (Delta DVs,
  * Iceberg positional deletes), distilled to plain parquet.
  *
  * Deleting users from a 100 TB corpus by rewriting it is a full-table
  * write per request; not rewriting at all leaves the data serving.
  * The standard resolution is two-phase:
  *
  *   1. **Merge-on-read (instant)**: the opt-out keys land in a tiny
  *      tombstone side-table; every read anti-joins it (broadcast — the
  *      tombstone list is KB-scale, the corpus never shuffles). Data is
  *      logically gone the moment the tombstone commits.
  *   2. **Compaction + vacuum (eventual, physical)**: a background
  *      rewrite publishes a new snapshot with tombstones applied
  *      ([[Versioned.publish]] — copy-on-write), and [[Versioned.vacuum]]
  *      beyond the retention window physically erases the old bytes.
  *      Only then is the forget durable against time travel — the spec
  *      pins exactly that boundary.
  *
  * The gated query runs BOTH paths independently and joins them, so the
  * oracle hash proves merge-on-read ≡ compacted ≡ a fresh filter of the
  * source. Opt-out set is deterministic (user_id % 97 = 0) so the
  * oracle can reproduce it. */
object Forget {

  /** Publish `events` as a versioned table and return (table dir,
    * tombstone frame) for the deterministic opt-out set. */
  def setup(spark: SparkSession, sfDir: String, dir: String): (String, DataFrame) = {
    import spark.implicits._
    val table = s"$dir/events_tbl"
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    Versioned.publish(events, table)
    events.filter($"user_id" % 97 === 0).select($"user_id").distinct()
      .write.mode("overwrite").parquet(s"$table/_tombstones")
    (table, spark.read.parquet(s"$table/_tombstones"))
  }

  /** Merge-on-read view: current snapshot minus tombstoned users. */
  def readForgotten(spark: SparkSession, table: String): DataFrame = {
    val tombstones = spark.read.parquet(s"$table/_tombstones")
    Versioned.read(spark, table)
      .join(broadcast(tombstones), Seq("user_id"), "left_anti")
  }

  /** Apply tombstones physically: publish the rewritten snapshot.
    * (Vacuum beyond retention — the caller's policy — then erases the
    * pre-forget bytes; see ForgetSpec for the full lifecycle.) */
  def compact(spark: SparkSession, table: String): Int =
    Versioned.publish(readForgotten(spark, table), table)

  /** `q_forget`: both paths, computed independently, joined. */
  def forgetQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.functions.Staged.scratchDir("graft_forget_").toString
    try {
      val (table, _) = setup(spark, sfDir, tmp)
      def rollup(df: DataFrame, suffix: String) =
        df.groupBy($"event_type").agg(
          count(lit(1)).as(s"n_$suffix"),
          Exact.sumExact($"value").as(s"total_$suffix"))
      val mor = rollup(readForgotten(spark, table), "mor")
      compact(spark, table)
      // the compacted snapshot needs no tombstone join any more
      val compacted = rollup(Versioned.read(spark, table), "compacted")
      mor.join(compacted, Seq("event_type"))
        .orderBy($"event_type")
        .localCheckpoint(eager = true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  /** `q_change_feed`: the change-data-feed composition — the SAME
    * derived next-state as [[graft.operators.Reconcile.tableDiffQuery]],
    * but both states round-trip through [[Versioned]] snapshots before
    * diffing, so the oracle (shared with q_table_diff) additionally
    * proves the versioned storage is change-transparent: diff(v0, v1)
    * on disk ≡ diff of the in-memory frames, row for row. This is
    * Delta's CDF / Iceberg's changelog read expressed over the
    * snapshot mechanic. */
  def changeFeedQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = graft.functions.Staged.scratchDir("graft_cdf_").toString
    val tbl = s"$tmp/events_versioned"
    try {
      val old = Tables.events(spark, sfDir)
        .select($"event_id", $"event_type", $"value")
      val next = old.filter($"event_id" % 13 =!= 0)
        .select($"event_id",
          when($"event_id" % 5 === 0, lit("updated"))
            .otherwise($"event_type").as("event_type"),
          when($"event_id" % 5 === 0, $"value" + 100.0)
            .otherwise($"value").as("value"))
        .unionByName(old.filter($"event_id" % 17 === 0)
          .select(($"event_id" + 1000000).as("event_id"), $"event_type", $"value"))
      val v0 = Versioned.publish(old, tbl)
      val v1 = Versioned.publish(next, tbl)
      graft.operators.Reconcile.tableDiff(
          Versioned.read(spark, tbl, v0), Versioned.read(spark, tbl, v1),
          "event_id", Seq("event_type", "value"))
        .localCheckpoint(eager = true)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      ()
    }
  }

  val forgetSql: String =
    s"""SELECT event_type,
       |       COUNT(*) AS n_mor,
       |       ${Exact.sumExactSql("value")} AS total_mor,
       |       COUNT(*) AS n_compacted,
       |       ${Exact.sumExactSql("value")} AS total_compacted
       |FROM events
       |WHERE user_id % 97 <> 0
       |GROUP BY 1
       |ORDER BY event_type""".stripMargin
}
