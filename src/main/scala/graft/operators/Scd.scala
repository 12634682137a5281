package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Slowly-changing-dimension (Type 2) builder — the `dbt snapshot`
  * analog. The reference materializes dims as full rebuilds
  * (dim_zone.sql etc.); a user running the same stack gets history
  * tracking from dbt snapshots, so the library carries the operator:
  * collapse a change log into versioned validity intervals.
  *
  * Input contract: an event/change log with an entity key, an event
  * time, a tiebreaker id, and a tracked attribute. Output: one row per
  * VALUE CHANGE with `[valid_from, valid_to)` intervals, a dense
  * per-entity `version`, and `is_current` on the open interval.
  *
  * Scale: both windows share one `(user_id)` hash partitioning and one
  * `(ts, event_id)` sort — state per task is bounded by the largest
  * single entity's history, never the corpus; there is no global
  * window (the unpartitioned-window trap the dims pin) and no
  * driver-side iteration. A 100 TB change log SCDs in one shuffle.
  */
object Scd {

  /** Collapse consecutive equal `status` values per `key` (ordered by
    * `ts, tie`) into SCD2 interval rows. */
  def scd2(log: DataFrame, key: String, ts: String, tie: String,
      status: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    log
      .withColumn("prev_status", lag(col(status), 1).over(w))
      .filter(col("prev_status").isNull || col("prev_status") =!= col(status))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col("version"), col(status).as("status"),
        col(ts).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Gated query: the events table as a user-status change log. */
  def userStatusScd2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    scd2(Tables.events(spark, sfDir), "user_id", "ts", "event_id", "event_type")
      .orderBy($"user_id", $"version")
  }

  val userStatusScd2Sql: String =
    """WITH c AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id,
      |       CAST(row_number() OVER w AS INTEGER) AS version,
      |       event_type AS status,
      |       ts AS valid_from,
      |       lead(ts) OVER w AS valid_to,
      |       (lead(ts) OVER w IS NULL) AS is_current
      |FROM ch
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin
}
