package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** DDSketch relative-error quantile sketch (Masson, Lee & Mishra,
  * "DDSketch: a fast and fully-mergeable quantile sketch with
  * relative-error guarantees", VLDB 2019) — the quantile member of the
  * sketch family (CountMin = frequency, Hll = cardinality): log-γ bins
  * with bin(x) = ⌈ln x / ln γ⌉ guarantee |est − true| ≤ α·true at any
  * rank, the bin table is fixed-size-ish (⌈ln(max/min)/ln γ⌉ bins
  * regardless of row count) and MERGES by bin-wise count addition —
  * executor-partial-aggregation- and cross-shard-safe, proven in
  * DdSketchSpec. Spark's `approx_percentile` offers rank error, not
  * relative value error, and hides its state in an opaque buffer; this
  * keeps the bin table first-class (persist / union / re-query
  * incrementally) and lets a plain-SQL oracle replay every bin and
  * estimate.
  *
  * Cross-engine exactness: ln γ and 2/(γ+1) are shared round-trip
  * double literals (the [[Hll]] discipline); bin indices floor a libm
  * ln — the e9-ln residual risk the repo accepts (a 1-ulp flip needs x
  * to sit exactly on a bin edge). Ranks, cumulative counts and the
  * bin walk are exact integers; the estimate 2γ^bin/(γ+1) is
  * e6-floored; the within-bound audit compares est_e6/1e6 against the
  * exact rank-r ORDER STATISTIC — the item the guarantee is stated
  * for (an interpolated percentile can sit a whole inter-item gap
  * away at small n) — and both engines compute identical doubles.
  *
  * Scale shape: one (source, bin)-keyed map-side-combined COUNT over
  * the scan; the quantile walk is a window over the BIN table
  * (per-source bins ≈ ln(max/min)/ln γ ≈ a few hundred rows), never
  * the corpus; the exact-percentile audit column is the one per-group
  * sort a 100 TB deployment drops (the sketch replaces it — that's
  * the point).
  */
object DdSketch {

  val Alpha = 0.01
  val Gamma: Double = (1.0 + Alpha) / (1.0 - Alpha)
  val LnGamma: Double = math.log(Gamma)
  /** 2/(γ+1) — the bin-midpoint estimate factor. */
  val EstFactor: Double = 2.0 / (Gamma + 1.0)
  val Quantiles: Seq[(String, Double)] =
    Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))

  /** Scalar bin form — bin(x) = ⌈ln x / ln γ⌉ for one positive value —
    * the SQL-surface building block (registered as `ddsketch_bin`): a
    * SQL-first user builds the sketch with plain
    * `GROUP BY source, ddsketch_bin(x) → COUNT(*)` and merges shards
    * by bin-wise count addition, no Scala API needed. */
  def binCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ceil(log(x.cast("double")) / lit(LnGamma)).cast("int")

  /** Per-source (bin, cnt) table over a positive value column — the
    * persistable, mergeable sketch state. */
  private[graft] def sketchOf(vals: DataFrame): DataFrame = {
    import vals.sparkSession.implicits._
    vals.filter($"x" > 0)
      .groupBy($"source", binCol($"x").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** One row per (source, quantile): sketch bin, e6-floored estimate,
    * the exact percentile as the audit column, and the α-bound check. */
  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame =
    quantileSketchOf(Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars").as("x")))

  /** Same, over any (source, x > 0) frame — the testable core. */
  def quantileSketchOf(vals: DataFrame): DataFrame = {
    val spark = vals.sparkSession
    import spark.implicits._
    val sk = sketchOf(vals)
    val cum = sk.withColumn("cum",
      sum($"cnt").over(Window.partitionBy($"source").orderBy($"bin")))
    val n = sk.groupBy($"source").agg(sum($"cnt").cast("long").as("n"))
    val qs = Quantiles.toDF("pct", "q")
    // rank of the DDSketch target item, 1-based: ⌊q·(n−1)⌋ + 1
    val ranks = n.crossJoin(broadcast(qs))
      .select($"source", $"pct", $"q", $"n",
        (floor($"q" * ($"n" - 1).cast("double")).cast("long") + 1L).as("r"))
    val binq = ranks.join(cum, "source")
      .filter($"cum" >= $"r")
      .groupBy($"source", $"pct", $"n", $"r")
      .agg(min($"bin").as("bin"))
    val est = floor(lit(EstFactor) * exp($"bin".cast("double") * lit(LnGamma))
      * lit(1e6)).cast("long")
    // the guarantee is against the rank-r ORDER STATISTIC (the item the
    // bin walk addresses), not an interpolated percentile — audit that
    // exact item (the one per-group sort the sketch exists to replace).
    // The ordered side is explicitly re-aliased: both frames descend
    // from the same `vals` lineage, so joining on `source === source`
    // would carry one exprId on both sides (Spark resolves it only via
    // dataset-id disambiguation tags, logging a "trivially true equals
    // predicate" WARN, and a plan-rebuilding refactor would silently
    // degrade the condition).
    val ordered = vals.filter($"x" > 0)
      .withColumn("rn",
        row_number().over(Window.partitionBy($"source").orderBy($"x")))
      .select($"source".as("o_source"), $"x", $"rn")
    binq
      .join(ordered, $"source" === $"o_source" && $"rn" === $"r")
      .select($"source", $"pct", $"n", $"bin", est.as("est_e6"),
        $"x".cast("double").as("true_q"))
      .withColumn("within_bound",
        abs($"est_e6".cast("double") / lit(1e6) - $"true_q")
          <= lit(Alpha * 1.02) * $"true_q")
      .orderBy($"source", $"pct")
  }

  /** DuckDB replay: identical literals, identical integer rank walk,
    * identical e6-floored estimate and bound check. */
  def quantileSketchSql(): String = {
    val lnG = java.lang.Double.toString(LnGamma)
    val ef = java.lang.Double.toString(EstFactor)
    s"""WITH vals AS (
       |  SELECT source, n_chars AS x FROM documents WHERE n_chars > 0),
       |sk AS (
       |  SELECT source,
       |         CAST(ceil(ln(CAST(x AS DOUBLE)) / $lnG) AS INTEGER) AS bin,
       |         COUNT(*) AS cnt
       |  FROM vals GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, bin, cnt,
       |         SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum
       |  FROM sk),
       |n AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n FROM sk GROUP BY 1),
       |qs AS (SELECT * FROM (VALUES ('p50', 0.5), ('p95', 0.95), ('p99', 0.99)) t(pct, q)),
       |ranks AS (
       |  SELECT n.source, q.pct, q.q, n.n,
       |         CAST(floor(q.q * CAST(n.n - 1 AS DOUBLE)) AS BIGINT) + 1 AS r
       |  FROM n CROSS JOIN qs q),
       |binq AS (
       |  SELECT r.source, r.pct, r.n, r.r, min(c.bin) AS bin
       |  FROM ranks r JOIN cum c ON c.source = r.source AND c.cum >= r.r
       |  GROUP BY 1, 2, 3, 4),
       |ordered AS (
       |  SELECT source, x,
       |         row_number() OVER (PARTITION BY source ORDER BY x) AS rn
       |  FROM vals)
       |SELECT b.source, b.pct, b.n, b.bin,
       |       CAST(floor($ef * exp(CAST(b.bin AS DOUBLE) * $lnG) * 1e6) AS BIGINT)
       |         AS est_e6,
       |       CAST(o.x AS DOUBLE) AS true_q,
       |       abs(CAST(floor($ef * exp(CAST(b.bin AS DOUBLE) * $lnG) * 1e6) AS DOUBLE)
       |             / 1e6 - CAST(o.x AS DOUBLE))
       |         <= ${Alpha * 1.02} * CAST(o.x AS DOUBLE) AS within_bound
       |FROM binq b JOIN ordered o ON o.source = b.source AND o.rn = b.r
       |ORDER BY b.source, b.pct""".stripMargin
  }
}
