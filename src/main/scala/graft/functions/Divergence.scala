package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus slice-drift measurement: per-source KL divergence of the
  * slice's word distribution from the whole-corpus distribution — the
  * standard check that a new shard / scrape / dedup pass did not shift
  * the data mix (and the scoring half of DSIR-style domain weighting,
  * cf. [[Dsir]] which resamples by hashed-n-gram bucket instead).
  *
  * Model: add-one smoothing over the GLOBAL vocab on both sides,
  *   p_s(w) = (c_s(w)+1) / (n_s+V),   p_c(w) = (c(w)+1) / (n+V),
  *   KL(P_s ‖ P_c) = Σ_w p_s(w)·ln(p_s(w)/p_c(w))
  * summed over every global-vocab word (absent words contribute their
  * smoothed mass — that is what makes KL finite and the comparison
  * honest for small slices).
  *
  * Cross-engine exactness ([[Perplexity]]'s recipe): each term is
  * quantized FIRST — floor(p_s·(ln p_s − ln p_c)·1e9) as BIGINT — and
  * the per-source sum is exact integer arithmetic, order-independent.
  * p_s and p_c are single IEEE divisions of exact integers; the
  * two-ln difference form is used instead of ln(num/den) of cross
  * products so no intermediate integer product can overflow BIGINT at
  * corpus scale (c·n would pass 2^63 around 10^13 tokens; the
  * probabilities themselves never overflow anything).
  *
  * Scale: one corpus explode into a (source, word) count — one shuffle
  * with map-side combine; everything after is vocab-sized: global
  * counts derive from the per-source counts (a vocab-sized aggregate,
  * not a second corpus pass), the evaluation grid is vocab × #sources
  * rows co-keyed on word, and the scalars (n, V, per-source n_s) ride
  * along as broadcast 1-row / #source-row frames. Nothing corpus-sized
  * reaches the driver.
  */
object Divergence {

  /** One row per source: token count, distinct-word count, and the
    * quantized + nats KL divergence from the corpus distribution. */
  def sliceDivergence(spark: SparkSession, sfDir: String): DataFrame =
    sliceDivergenceOf(Tables.documents(spark, sfDir))

  /** Same, over any (source, text) frame — the testable core. */
  def sliceDivergenceOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val csw = docs
      .select($"source", explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c_s"))
    // global word counts + corpus scalars derive from csw — vocab-sized
    val gw = csw.groupBy($"w").agg(sum($"c_s").as("c"))
    val tot = gw.agg(sum($"c").as("n"), count(lit(1)).as("v"))
    val per = csw.groupBy($"source")
      .agg(sum($"c_s").as("n_s"), count(lit(1)).as("vocab_used"))
    // full evaluation grid: every (source, global-vocab word), absent
    // words at c_s = 0 so their smoothed mass is counted
    val grid = gw.crossJoin(broadcast(per))
      .join(csw, Seq("source", "w"), "left")
      .na.fill(0L, Seq("c_s"))
      .crossJoin(broadcast(tot))
    val ps = ($"c_s" + 1L).cast("double") / ($"n_s" + $"v").cast("double")
    val pc = ($"c" + 1L).cast("double") / ($"n" + $"v").cast("double")
    grid
      .select($"source", $"n_s", $"vocab_used",
        floor(ps * (log(ps) - log(pc)) * lit(1e9)).cast("long").as("term_e9"))
      .groupBy($"source", $"n_s", $"vocab_used")
      .agg(sum($"term_e9").as("kl_e9"))
      .select($"source", $"n_s".as("n_tokens"), $"vocab_used",
        $"kl_e9", ($"kl_e9".cast("double") / lit(1e9)).as("kl_nats"))
      .orderBy($"source")
  }

  val sliceDivergenceSql: String =
    """WITH csw AS (
      |  SELECT source, w, COUNT(*) AS c_s
      |  FROM (SELECT source,
      |               UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |gw AS (SELECT w, SUM(c_s) AS c FROM csw GROUP BY 1),
      |tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM gw),
      |per AS (
      |  SELECT source, SUM(c_s) AS n_s, COUNT(*) AS vocab_used
      |  FROM csw GROUP BY 1),
      |grid AS (
      |  SELECT per.source, per.n_s, per.vocab_used,
      |         COALESCE(csw.c_s, 0) AS c_s, gw.c, tot.n, tot.v
      |  FROM gw CROSS JOIN per
      |  LEFT JOIN csw ON csw.source = per.source AND csw.w = gw.w
      |  CROSS JOIN tot),
      |terms AS (
      |  SELECT source, n_s, vocab_used,
      |         CAST(FLOOR(
      |           (CAST(c_s + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE))
      |           * (ln(CAST(c_s + 1 AS DOUBLE) / CAST(n_s + v AS DOUBLE))
      |              - ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)))
      |           * 1000000000.0) AS BIGINT) AS term_e9
      |  FROM grid)
      |SELECT source, CAST(n_s AS BIGINT) AS n_tokens, vocab_used,
      |       CAST(SUM(term_e9) AS BIGINT) AS kl_e9,
      |       CAST(SUM(term_e9) AS DOUBLE) / 1000000000.0 AS kl_nats
      |FROM terms
      |GROUP BY source, n_s, vocab_used
      |ORDER BY source""".stripMargin

  // ---- two-sample Kolmogorov–Smirnov slice drift -------------------------

  /** Per-source two-sample KS statistic of the quality-score
    * distribution vs the REST of the corpus: D = sup_v |ECDF_s(v) −
    * ECDF_rest(v)| — the distribution-shape complement of
    * [[sliceDivergence]]'s word-mix KL (a slice can keep the corpus
    * vocabulary yet shift its quality profile; KS sees that, KL
    * doesn't). `at_value` is the smallest score where the supremum is
    * attained — where the two CDFs pull apart, the first thing an
    * investigating pipeline owner asks.
    *
    * Exactness: the ECDFs are evaluated only at the distinct observed
    * scores; each ECDF value is ONE IEEE division of exact integer
    * cumulatives, the difference/abs/max chain is deterministic and
    * order-independent, and the argmax re-derives the identical
    * doubles — bit-equal cross-engine, no quantization needed.
    *
    * Scale: one corpus-sized map-side-combined groupBy into (source,
    * score) counts; everything after is RESOLUTION-bounded (quality
    * scores are rounded to 1e-6, so the evaluation grid is ≤ ~1e6 ×
    * #sources narrow rows at any corpus size — the same bounded-window
    * argument as [[QualityModel.rocAuc]]). */
  def ksTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    ksTestOf(TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"quality_score")
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"source"),
        Seq("doc_id"))
      .select($"source", $"quality_score".as("v")))
  }

  /** Same, over any (source, v) frame — the testable core. */
  def ksTestOf(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = scored.groupBy($"source", $"v").agg(count(lit(1)).as("c_sv"))
    val gv = counts.groupBy($"v").agg(sum($"c_sv").as("c_v"))
    val per = counts.groupBy($"source").agg(sum($"c_sv").as("n_s"))
    val tot = per.agg(sum($"n_s").as("n"))
    val w = Window.partitionBy($"source").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, 0)
    // grid = every (source, distinct score): absent scores ride at
    // c_sv = 0 so each source's cumulative is evaluated on the COMMON
    // support. Cached: the max and argmax branches both read it, and
    // it is resolution-bounded, not corpus-sized.
    val cum = gv.crossJoin(broadcast(per))
      .join(counts, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c_sv"))
      .withColumn("cum_s", sum($"c_sv").over(w))
      .withColumn("cum_all", sum($"c_v").over(w))
      .crossJoin(broadcast(tot))
      .filter($"n" - $"n_s" > 0)
      .withColumn("n_r", $"n" - $"n_s")
      .withColumn("diff",
        abs($"cum_s".cast("double") / $"n_s".cast("double") -
          ($"cum_all" - $"cum_s").cast("double") / $"n_r".cast("double")))
      .cache()
    cum.count()
    val maxes = cum.groupBy($"source").agg(max($"diff").as("ks_d"))
    cum.join(maxes, Seq("source"))
      .filter($"diff" === $"ks_d")
      .groupBy($"source", $"n_s", $"n_r", $"ks_d")
      .agg(min($"v").as("at_value"))
      .select($"source", $"n_s", $"n_r", $"ks_d", $"at_value")
      .orderBy($"source")
  }

  val ksTestSql: String =
    s"""WITH q AS (SELECT doc_id, quality_score
       |           FROM (${TextAnalysis.qualityScoreSql})),
       |s AS (
       |  SELECT d.source, q.quality_score AS v
       |  FROM q JOIN documents d ON d.doc_id = q.doc_id),
       |counts AS (SELECT source, v, COUNT(*) AS c_sv FROM s GROUP BY 1, 2),
       |gv AS (SELECT v, CAST(SUM(c_sv) AS BIGINT) AS c_v FROM counts GROUP BY 1),
       |per AS (SELECT source, CAST(SUM(c_sv) AS BIGINT) AS n_s
       |        FROM counts GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM per),
       |grid AS (
       |  SELECT p.source, g.v, g.c_v, COALESCE(c.c_sv, 0) AS c_sv, p.n_s
       |  FROM gv g CROSS JOIN per p
       |  LEFT JOIN counts c ON c.source = p.source AND c.v = g.v),
       |cum AS (
       |  SELECT source, v, n_s,
       |         CAST(SUM(c_sv) OVER (PARTITION BY source ORDER BY v
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_s,
       |         CAST(SUM(c_v) OVER (PARTITION BY source ORDER BY v
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS cum_all
       |  FROM grid),
       |d AS (
       |  SELECT source, v, n_s, t.n - n_s AS n_r,
       |         abs(CAST(cum_s AS DOUBLE) / CAST(n_s AS DOUBLE)
       |             - CAST(cum_all - cum_s AS DOUBLE)
       |               / CAST(t.n - n_s AS DOUBLE)) AS diff
       |  FROM cum CROSS JOIN tot t
       |  WHERE t.n - n_s > 0),
       |m AS (SELECT source, max(diff) AS ks_d FROM d GROUP BY 1)
       |SELECT d.source, d.n_s, d.n_r, m.ks_d, min(d.v) AS at_value
       |FROM d JOIN m ON d.source = m.source AND d.diff = m.ks_d
       |GROUP BY 1, 2, 3, 4
       |ORDER BY d.source""".stripMargin

  // ---- embedding-distribution drift (diagonal Fréchet) -------------------

  /** Per-label embedding-distribution drift from the corpus: the
    * diagonal-covariance Fréchet distance (the FID formula of Heusel et
    * al. 2017 restricted to diagonal Σ — standard practice when full
    * covariance is unaffordable or ill-conditioned),
    *   d² = Σ_dim (μ_l − μ_c)² + σ_l² + σ_c² − 2·σ_l·σ_c.
    * The scalar drift family (KS / KL / χ² / PSI) covers scalar slices;
    * this is the member for EMBEDDING columns — class-conditional
    * distribution shift, stale-encoder detection, per-shard vector
    * drift.
    *
    * Cross-engine exactness: vectors are quantized first (floor(x ·
    * 2¹⁰) as BIGINT — the [[Clustering]] recipe: float→double exact,
    * power-of-two scale exact), per-(label, dim) n/Σq/Σq² are exact
    * integer aggregates (Σq² decimal-routed — BIGINT would saturate
    * near 10¹¹ vectors), and the per-dim term is IEEE arithmetic on
    * those exact integers: casts, divides, multiplies and sqrt are all
    * correctly-rounded operations, so both engines floor the SAME
    * double at e9 and the per-label sum is order-independent integer
    * addition. `greatest(var, 0)` guards the σ² ≈ 0 rounding corner
    * where the two-moment form can dip epsilon-negative.
    *
    * Scale: one corpus×dim posexplode into a (label, dim)-keyed
    * map-side-combined aggregate; everything after is labels × dims
    * rows (the corpus moments DERIVE from the per-label ones — no
    * second corpus pass). The μ_c/σ_c frame broadcasts. */
  def embeddingDrift(spark: SparkSession, sfDir: String,
      scale: Int = 1024): DataFrame =
    embeddingDriftOf(Tables.embeddings(spark, sfDir), scale)

  /** Same, over any (label, embedding) frame — the testable core. */
  def embeddingDriftOf(vecs: DataFrame, scale: Int = 1024): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val vd = vecs
      .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"label", $"dim",
        floor($"x".cast("double") * scale).cast("long").as("q"))
    // pinned ONCE (the sourceOverlap discipline): both the join's left
    // side and the derived corpus moments consume this frame; without
    // the pin each consumer re-runs the corpus×dim explode (two scan
    // towers, measured). The pinned frame is labels × dims rows.
    val per = vd.groupBy($"label", $"dim").agg(
      count(lit(1)).as("n_l"),
      sum($"q").as("s1_l"),
      sum(($"q" * $"q").cast("decimal(38,0)")).as("s2_l"))
      .localCheckpoint(true)
    // corpus moments derive from the per-label frame — labels×dims rows
    val g = per.groupBy($"dim").agg(
      sum($"n_l").as("n_g"), sum($"s1_l").as("s1_g"), sum($"s2_l").as("s2_g"))
    def mu(s1: Column, n: Column): Column = s1.cast("double") / n.cast("double")
    def vr(s2: Column, n: Column, m: Column): Column =
      greatest(s2.cast("double") / n.cast("double") - m * m, lit(0.0))
    val muL = mu($"s1_l", $"n_l"); val muG = mu($"s1_g", $"n_g")
    val vrL = vr($"s2_l", $"n_l", muL); val vrG = vr($"s2_g", $"n_g", muG)
    val term = (muL - muG) * (muL - muG) + vrL + vrG - lit(2.0) * sqrt(vrL * vrG)
    per.join(broadcast(g), "dim")
      .select($"label", $"n_l",
        floor(term * lit(1e9)).cast("long").as("term_e9"))
      .groupBy($"label")
      .agg(max($"n_l").cast("long").as("n_vecs"),
        sum($"term_e9").as("frechet_e9"))
      .select($"label", $"n_vecs", $"frechet_e9",
        ($"frechet_e9".cast("double") / lit(1e9)).as("frechet_sq"))
      .orderBy($"label")
  }

  /** DuckDB replay: identical quantization, identical two-moment
    * formula; Σq² goes through HUGEINT (the decimal(38) twin). */
  def embeddingDriftSql(scale: Int = 1024, dim: Int = 64): String =
    s"""WITH vd AS (
       |  SELECT label, i - 1 AS dim,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale.0) AS BIGINT) AS q
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) dd),
       |per AS (
       |  SELECT label, dim, COUNT(*) AS n_l,
       |         CAST(SUM(q) AS BIGINT) AS s1_l,
       |         SUM(CAST(q AS HUGEINT) * q) AS s2_l
       |  FROM vd GROUP BY 1, 2),
       |g AS (
       |  SELECT dim, CAST(SUM(n_l) AS BIGINT) AS n_g,
       |         CAST(SUM(s1_l) AS BIGINT) AS s1_g, SUM(s2_l) AS s2_g
       |  FROM per GROUP BY 1),
       |terms AS (
       |  SELECT p.label, p.n_l,
       |         CAST(floor((
       |           (CAST(p.s1_l AS DOUBLE) / CAST(p.n_l AS DOUBLE)
       |              - CAST(g.s1_g AS DOUBLE) / CAST(g.n_g AS DOUBLE))
       |           * (CAST(p.s1_l AS DOUBLE) / CAST(p.n_l AS DOUBLE)
       |              - CAST(g.s1_g AS DOUBLE) / CAST(g.n_g AS DOUBLE))
       |           + greatest(CAST(p.s2_l AS DOUBLE) / CAST(p.n_l AS DOUBLE)
       |               - (CAST(p.s1_l AS DOUBLE) / CAST(p.n_l AS DOUBLE))
       |                 * (CAST(p.s1_l AS DOUBLE) / CAST(p.n_l AS DOUBLE)), 0.0)
       |           + greatest(CAST(g.s2_g AS DOUBLE) / CAST(g.n_g AS DOUBLE)
       |               - (CAST(g.s1_g AS DOUBLE) / CAST(g.n_g AS DOUBLE))
       |                 * (CAST(g.s1_g AS DOUBLE) / CAST(g.n_g AS DOUBLE)), 0.0)
       |           - 2.0 * sqrt(
       |               greatest(CAST(p.s2_l AS DOUBLE) / CAST(p.n_l AS DOUBLE)
       |                 - (CAST(p.s1_l AS DOUBLE) / CAST(p.n_l AS DOUBLE))
       |                   * (CAST(p.s1_l AS DOUBLE) / CAST(p.n_l AS DOUBLE)), 0.0)
       |               * greatest(CAST(g.s2_g AS DOUBLE) / CAST(g.n_g AS DOUBLE)
       |                 - (CAST(g.s1_g AS DOUBLE) / CAST(g.n_g AS DOUBLE))
       |                   * (CAST(g.s1_g AS DOUBLE) / CAST(g.n_g AS DOUBLE)), 0.0))
       |         ) * 1e9) AS BIGINT) AS term_e9
       |  FROM per p JOIN g ON g.dim = p.dim)
       |SELECT label, CAST(max(n_l) AS BIGINT) AS n_vecs,
       |       CAST(SUM(term_e9) AS BIGINT) AS frechet_e9,
       |       CAST(SUM(term_e9) AS DOUBLE) / 1e9 AS frechet_sq
       |FROM terms GROUP BY label ORDER BY label""".stripMargin
}
