package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Table reconciliation — the diff between two versions of a keyed
  * table (pipeline-regression review, migration sign-off, CDC audit):
  * one FULL OUTER join on the key classifies every row as added /
  * removed / changed, and unchanged rows are dropped before the
  * result ever materializes.
  *
  * Scale: one co-keyed shuffle of both versions (or zero with
  * co-bucketed layouts — the Skew/bucketing toolkit applies); the
  * output is diff-sized, which for healthy pipelines is orders of
  * magnitude below table-sized. Compare-column lists keep wide tables
  * cheap: only the key and compared columns are scanned. */
object Reconcile {

  /** Generic keyed diff of two frames on `key`, comparing `cols`. */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val o = oldDf.select((key +: cols).map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select((key +: cols).map(c => col(c).as(s"n_$c")): _*)
    // NULL-SAFE inequality: `=!=` yields SQL NULL for NULL-vs-value,
    // which would classify a real change as unchanged and drop it
    val changed = cols.map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
      .withColumn("change_type",
        when(col(s"o_$key").isNull, "added")
          .when(col(s"n_$key").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col(s"n_$key"), col(s"o_$key")).as(key), col("change_type"))
      .orderBy(col(key))
  }

  /** Gated query: the events table diffed against a derived next
    * version — every 5th row updated, every 13th removed, every 17th
    * re-keyed (offset past any natural id) as an addition. The oracle recomputes the same diff with
    * a FULL OUTER JOIN, pinning all three change classes and the
    * precedence (a row both updated and removed is removed). */
  def tableDiffQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val old = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"value")
    val next = old.filter($"event_id" % 13 =!= 0)
      .select($"event_id",
        when($"event_id" % 5 === 0, lit("updated")).otherwise($"event_type").as("event_type"),
        when($"event_id" % 5 === 0, $"value" + 100.0).otherwise($"value").as("value"))
      .unionByName(old.filter($"event_id" % 17 === 0)
        .select(($"event_id" + 1000000).as("event_id"), $"event_type", $"value"))
    tableDiff(old, next, "event_id", Seq("event_type", "value"))
  }

  val tableDiffSql: String =
    """WITH o AS (SELECT event_id, event_type, value FROM events),
      |n AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 5 = 0 THEN 'updated' ELSE event_type END AS event_type,
      |         CASE WHEN event_id % 5 = 0 THEN value + 100.0 ELSE value END AS value
      |  FROM o WHERE event_id % 13 <> 0
      |  UNION ALL
      |  SELECT event_id + 1000000, event_type, value FROM o WHERE event_id % 17 = 0),
      |d AS (
      |  SELECT coalesce(n.event_id, o.event_id) AS event_id,
      |         CASE WHEN o.event_id IS NULL THEN 'added'
      |              WHEN n.event_id IS NULL THEN 'removed'
      |              WHEN o.event_type IS DISTINCT FROM n.event_type
      |                OR o.value IS DISTINCT FROM n.value
      |                THEN 'changed' END AS change_type
      |  FROM o FULL OUTER JOIN n ON o.event_id = n.event_id)
      |SELECT event_id, change_type FROM d
      |WHERE change_type IS NOT NULL
      |ORDER BY event_id""".stripMargin
}
