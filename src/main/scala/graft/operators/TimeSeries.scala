package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Time-series anomaly detection over the event stream: each day's
  * volume scored against the TRAILING week (rows between -7 and -1 —
  * the current day never contaminates its own baseline). Moments are
  * decimal-routed inside the frame, so mean/σ are order-independent;
  * the z-score is one fixed-order double expression; the first days
  * (frame < 2 rows) surface NULL z rather than a fake score.
  *
  * Scale: the raw scan collapses to |days| rows in one aggregate
  * BEFORE any window runs; the window then walks a bounded daily
  * spine per series. With many independent series, partition the
  * window by series key — the spine stays dimension-sized either way. */
object TimeSeries {

  def dailyAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    dailyAnomalyFrom(Tables.events(spark, sfDir))

  private[graft] def dailyAnomalyFrom(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    daily
      .withColumn("cnt7", count(col("n")).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      // square in DECIMAL, not Long: day counts near 3e9 would wrap a
      // Long n*n in Spark while DuckDB promotes — cast BEFORE multiply
      .withColumn("s2", sum(col("n").cast("decimal(19,0)")
        * col("n").cast("decimal(19,0)")).over(w))
      .withColumn("mean7",
        when(col("cnt7") >= 1, col("s1").cast("double") / col("cnt7")))
      .withColumn("sigma7",
        when(col("cnt7") >= 2, sqrt(greatest(
          (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("cnt7"))
            / (col("cnt7") - 1), lit(0.0)))))
      .withColumn("z",
        when(col("sigma7") > 0,
          round((col("n").cast("double") - col("mean7")) / col("sigma7"), 6)))
      .select(col("day"), col("n"), round(col("mean7"), 6).as("mean7"),
        round(col("sigma7"), 6).as("sigma7"), col("z"),
        (col("z").isNotNull && abs(col("z")) > 2.0).as("is_anomaly"))
      .orderBy(col("day"))
  }

  val dailyAnomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |win AS (
      |  SELECT day, n,
      |         count(n) OVER w AS cnt7,
      |         sum(n) OVER w AS s1,
      |         sum(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))) OVER w AS s2
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |sc AS (
      |  SELECT day, n, cnt7,
      |         CASE WHEN cnt7 >= 1 THEN CAST(s1 AS DOUBLE) / cnt7 END AS mean7,
      |         CASE WHEN cnt7 >= 2 THEN sqrt(greatest(
      |           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / cnt7)
      |             / (cnt7 - 1), 0.0)) END AS sigma7
      |  FROM win)
      |SELECT day, n, round(mean7, 6) AS mean7, round(sigma7, 6) AS sigma7,
      |       CASE WHEN sigma7 > 0
      |            THEN round((CAST(n AS DOUBLE) - mean7) / sigma7, 6) END AS z,
      |       coalesce(CASE WHEN sigma7 > 0
      |            THEN abs(round((CAST(n AS DOUBLE) - mean7) / sigma7, 6)) > 2.0 END,
      |         false) AS is_anomaly
      |FROM sc ORDER BY day""".stripMargin
}
