package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Table profiler — the data-quality / discovery surface (dbt docs,
  * Deequ, Glue crawlers): one row of statistics per column. All stats
  * for every column come out of ONE scan: Spark expands the multiple
  * exact count_distinct aggregates internally (Expand ×|distinct
  * columns|) and everything else is a plain partial-aggregate — no
  * per-column jobs, no driver loop over columns.
  *
  * min/max are rendered to strings with TYPE-AWARE rules so the
  * profile has one uniform schema AND stays cross-engine
  * deterministic: longs/strings render as-is, timestamps as floored
  * epoch seconds, doubles through DECIMAL(18,2) (double→VARCHAR
  * formatting differs between engines; decimal rendering does not).
  *
  * Scale: one scan + one shuffle whose volume is the Expand fan-out of
  * |distinct-profiled columns| × rows in the partial maps — with hot
  * maps collapsing cardinality before exchange. For 1000-column tables
  * profile column GROUPS per pass to bound the fan-out. */
object Profile {

  /** Per-column profile of the events table. */
  def profileEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("ts_sec"),
        col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("value"), col("props"))
    profileFrom(ev)
  }

  /** Profile any frame whose columns are long/bigint, string, or
    * decimal — the rendering rules that are engine-portable. */
  private[graft] def profileFrom(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    one.select(explode(array(perCol: _*)).as("p"))
      .select(col("p.col_name"), col("p.n"), col("p.n_null"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
      .orderBy(col("col_name"))
  }

  val profileEventsSql: String =
    """WITH ev AS (
      |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |         user_id, event_type, CAST(value AS DECIMAL(18,2)) AS value, props
      |  FROM events),
      |s AS (
      |  SELECT 'event_id' AS col_name, count(*) AS n,
      |         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |         count(DISTINCT event_id) AS n_distinct,
      |         CAST(min(event_id) AS VARCHAR) AS min_value,
      |         CAST(max(event_id) AS VARCHAR) AS max_value
      |  FROM ev
      |  UNION ALL
      |  SELECT 'ts_sec', count(*),
      |         CAST(sum(CASE WHEN ts_sec IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT ts_sec),
      |         CAST(min(ts_sec) AS VARCHAR), CAST(max(ts_sec) AS VARCHAR)
      |  FROM ev
      |  UNION ALL
      |  SELECT 'user_id', count(*),
      |         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT user_id),
      |         CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
      |  FROM ev
      |  UNION ALL
      |  SELECT 'event_type', count(*),
      |         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT event_type),
      |         CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
      |  FROM ev
      |  UNION ALL
      |  SELECT 'value', count(*),
      |         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT value),
      |         CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
      |  FROM ev
      |  UNION ALL
      |  SELECT 'props', count(*),
      |         CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |         count(DISTINCT props),
      |         CAST(min(props) AS VARCHAR), CAST(max(props) AS VARCHAR)
      |  FROM ev)
      |SELECT * FROM s ORDER BY col_name""".stripMargin

  /** Robust outlier report: median / MAD per group.
    *
    * The 3σ report ([[Analytics.amountOutliers]]) breaks down when the
    * outliers themselves inflate σ; median absolute deviation is the
    * standard robust alternative (threshold 3·1.4826·MAD ≈ 3σ under
    * normality — the 4.4478 constant is pinned as one literal so both
    * engines parse the identical double). Three passes, each one keyed
    * aggregate: group medians (exact percentile_cont), MAD over the
    * deviations, then the flag count; the group-sized stats broadcast
    * back, the raw scan never shuffles.
    *
    * Scale: exact percentile_cont sorts per group — at 100 TB swap for
    * the KMV / approx_percentile sketch (same contract, documented in
    * [[Analytics.approxStats]]); passes and broadcasts are unchanged. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select($"event_type", $"value")
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs($"value" - $"med"))
    val mad = dev.groupBy($"event_type")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY adev)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), max($"med").as("med"), max($"mad").as("mad"),
        sum(when($"adev" > lit(4.4478) * $"mad", 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy($"event_type")
  }

  val madOutliersSql: String =
    """WITH med AS (
      |  SELECT event_type,
      |         percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m ON m.event_type = e.event_type),
      |mad AS (
      |  SELECT event_type,
      |         percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.event_type, COUNT(*) AS n, max(d.med) AS med,
      |       max(mad.mad) AS mad,
      |       CAST(SUM(CASE WHEN d.adev > 4.4478 * mad.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_outliers
      |FROM d JOIN mad ON mad.event_type = d.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Benford first-digit audit — the forensic data-quality screen for
    * amount columns (fabricated or truncated amounts drift from the
    * log-uniform first-digit law). The digit is taken from the INTEGER
    * cents rendering (bigint→string is unambiguous cross-engine;
    * double→string is not), shares are floor-quantized at 1e-6, and
    * the Benford expectations ride as pinned literals. One narrow
    * projection + one 9-row aggregate — scan-bound at any scale. */
  def benford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val expected = Seq.tabulate(9) { i =>
      val d = i + 1
      (d.toString, math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
    }.toDF("digit", "benford_e6")
    val digits = Tables.orders(spark, sfDir)
      .select(substring(floor($"o_totalprice" * 100).cast("long")
        .cast("string"), 1, 1).as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum($"n_obs").as("n_total"))
    digits.crossJoin(broadcast(total))
      .join(broadcast(expected), Seq("digit"))
      .select($"digit", $"n_obs",
        floor($"n_obs" * lit(1000000L) / $"n_total").cast("long").as("share_e6"),
        $"benford_e6")
      .orderBy($"digit")
  }

  val benfordSql: String = {
    val expected = (1 to 9).map { d =>
      s"($d, ${math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong})"
    }.mkString(", ")
    s"""WITH digits AS (
       |  SELECT substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
       |                     AS VARCHAR), 1, 1) AS digit,
       |         COUNT(*) AS n_obs
       |  FROM orders GROUP BY 1),
       |total AS (SELECT SUM(n_obs) AS n_total FROM digits),
       |expected(d, benford_e6) AS (VALUES $expected)
       |SELECT digit, n_obs,
       |       CAST(FLOOR(n_obs * 1000000 / n_total) AS BIGINT) AS share_e6,
       |       benford_e6
       |FROM digits
       |CROSS JOIN total
       |JOIN expected ON CAST(expected.d AS VARCHAR) = digits.digit
       |ORDER BY digit""".stripMargin
  }

  // ---- join-key skew profile ---------------------------------------------

  /** Skew diagnostics for the engine's main join/shuffle keys — the
    * operational report that decides when a key needs salting, an AQE
    * skew-join hint, or a broadcast instead of a shuffle. For each key:
    * row count, distinct keys, the heaviest key's row count, and the
    * integer skew factor max·distinct·1000/rows (1000 = perfectly
    * uniform; a 100 TB key with factor ≫ 1000 is the one that strands
    * a straggler task). Each profile is one map-side-combined group-by
    * collapsed to a 1-row summary — output is 3 rows at any scale. */
  def keySkewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.Tables
    def prof(name: String, df: DataFrame, key: String) = {
      val g = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
      g.agg(sum($"c").as("n_rows"), count(lit(1)).as("n_keys"),
          max($"c").as("max_key_rows"))
        .select(lit(name).as("key_name"), $"n_rows", $"n_keys",
          $"max_key_rows",
          floor($"max_key_rows" * $"n_keys" * 1000L / $"n_rows")
            .cast("long").as("skew_x1000"))
    }
    prof("lineitem.l_orderkey", Tables.lineitem(spark, sfDir), "l_orderkey")
      .unionByName(prof("orders.o_custkey", Tables.orders(spark, sfDir), "o_custkey"))
      .unionByName(prof("events.user_id", Tables.events(spark, sfDir), "user_id"))
      .orderBy($"key_name")
  }

  val keySkewProfileSql: String = {
    def prof(name: String, table: String, key: String) =
      s"""SELECT '$name' AS key_name,
         |       CAST(SUM(c) AS BIGINT) AS n_rows,
         |       COUNT(*) AS n_keys,
         |       CAST(MAX(c) AS BIGINT) AS max_key_rows,
         |       CAST(MAX(c) * COUNT(*) * 1000 // SUM(c) AS BIGINT) AS skew_x1000
         |FROM (SELECT $key, COUNT(*) AS c FROM $table GROUP BY 1) g""".stripMargin
    s"""${prof("lineitem.l_orderkey", "lineitem", "l_orderkey")}
       |UNION ALL
       |${prof("orders.o_custkey", "orders", "o_custkey")}
       |UNION ALL
       |${prof("events.user_id", "events", "user_id")}
       |ORDER BY key_name""".stripMargin
  }

  /** Pearson χ² test of source × language independence over the
    * documents table — "do my crawl sources all carry the same
    * language mix, or is a source quietly language-skewed?" The
    * categorical-association sibling of the distribution checks
    * ([[graft.functions.Divergence.ksTest]] for a numeric column,
    * KL for the word mix): χ² is what a profiler reports for a pair
    * of CATEGORICAL columns.
    *
    * Exactness ([[graft.functions.Divergence]]'s quantization
    * recipe): each cell's (o−e)²/e is evaluated in IEEE doubles from
    * exact integers (e = r·c/n is one division; the term is three
    * more deterministic ops), then floored to e9 fixed-point so the
    * cross-cell sum is exact integer arithmetic — order-independent,
    * hash-gateable; the nats-scale χ² is one final division.
    *
    * Scale: one map-side-combined groupBy to (source, lang) cells;
    * marginals and the final fold are cells-sized (|sources|·|langs|),
    * broadcast-joined. Output is ONE row at any corpus size. */
  def chi2Independence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, sfDir)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy($"source").agg(sum($"o").as("r"))
    val cols = cells.groupBy($"lang").agg(sum($"o").as("c"))
    val tot = cells.agg(sum($"o").as("n"),
      countDistinct($"source").as("n_sources"),
      countDistinct($"lang").as("n_langs"))
    val e = ($"r" * $"c").cast("double") / $"n".cast("double")
    cells
      .join(broadcast(rows), "source")
      .join(broadcast(cols), "lang")
      .crossJoin(broadcast(tot))
      .select($"n", $"n_sources", $"n_langs",
        floor(($"o" - e) * ($"o" - e) / e * lit(1e9)).cast("long")
          .as("term_e9"))
      .groupBy($"n", $"n_sources", $"n_langs")
      .agg(sum($"term_e9").as("chi2_e9"))
      .select($"n", $"n_sources", $"n_langs",
        (($"n_sources" - 1) * ($"n_langs" - 1)).as("dof"),
        $"chi2_e9", ($"chi2_e9".cast("double") / lit(1e9)).as("chi2"))
  }

  /** Corpus-mixture diversity indices, one row per categorical axis
    * (language, source): cell count, Shannon entropy in nats, and the
    * Simpson concentration Σp² — the two numbers a data-mixing plan
    * states up front ("how many effective domains am I training on,
    * and how dominated is the mix"). Entropy and Simpson terms are
    * each quantized to e9 fixed point per cell before the sum (the
    * [[graft.functions.Divergence]] ln discipline: p is one IEEE
    * division, the term is deterministic double ops, floor pins it),
    * so the cross-cell sums are exact integers. Scale: one combiner
    * group-by per axis; everything after is cells-sized. */
  def mixtureReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def axis(name: String, c0: String) = {
      val cells = Tables.documents(spark, sfDir)
        .groupBy(col(c0)).agg(count(lit(1)).as("c"))
      val tot = cells.agg(sum($"c").as("n"))
      val p = $"c".cast("double") / $"n".cast("double")
      cells.crossJoin(broadcast(tot))
        .select($"n",
          floor((p * log(p)) * lit(-1e9)).cast("long").as("ent_term"),
          floor((p * p) * lit(1e9)).cast("long").as("simp_term"))
        .groupBy($"n")
        .agg(count(lit(1)).as("n_cells"),
          sum($"ent_term").as("entropy_e9"),
          sum($"simp_term").as("simpson_e9"))
        .select(lit(name).as("axis"), $"n".as("n_rows"), $"n_cells",
          $"entropy_e9",
          ($"entropy_e9".cast("double") / lit(1e9)).as("entropy_nats"),
          $"simpson_e9")
    }
    axis("lang", "lang").unionByName(axis("source", "source"))
      .orderBy($"axis")
  }

  val mixtureReportSql: String = {
    def axis(name: String, c0: String) =
      s"""SELECT '$name' AS axis, n AS n_rows, n_cells, entropy_e9,
         |       CAST(entropy_e9 AS DOUBLE) / 1000000000.0 AS entropy_nats,
         |       simpson_e9
         |FROM (
         |  SELECT n, COUNT(*) AS n_cells,
         |         CAST(SUM(ent_term) AS BIGINT) AS entropy_e9,
         |         CAST(SUM(simp_term) AS BIGINT) AS simpson_e9
         |  FROM (
         |    SELECT n,
         |           CAST(FLOOR((p * ln(p)) * -1000000000.0) AS BIGINT) AS ent_term,
         |           CAST(FLOOR((p * p) * 1000000000.0) AS BIGINT) AS simp_term
         |    FROM (
         |      SELECT CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p, n
         |      FROM (SELECT $c0, COUNT(*) AS c FROM documents GROUP BY 1)
         |      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)))
         |  GROUP BY n)""".stripMargin
    s"""${axis("lang", "lang")}
       |UNION ALL
       |${axis("source", "source")}
       |ORDER BY axis""".stripMargin
  }

  val chi2IndependenceSql: String =
    """WITH cells AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |r AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |c AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
      |               COUNT(DISTINCT source) AS n_sources,
      |               COUNT(DISTINCT lang) AS n_langs
      |        FROM cells),
      |terms AS (
      |  SELECT t.n, t.n_sources, t.n_langs,
      |         CAST(FLOOR(
      |           (o - CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
      |           * (o - CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
      |           / (CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
      |           * 1000000000.0) AS BIGINT) AS term_e9
      |  FROM cells
      |  JOIN r USING (source) JOIN c USING (lang) CROSS JOIN tot t)
      |SELECT n, n_sources, n_langs,
      |       (n_sources - 1) * (n_langs - 1) AS dof,
      |       CAST(SUM(term_e9) AS BIGINT) AS chi2_e9,
      |       CAST(SUM(term_e9) AS DOUBLE) / 1000000000.0 AS chi2
      |FROM terms
      |GROUP BY n, n_sources, n_langs""".stripMargin
}
