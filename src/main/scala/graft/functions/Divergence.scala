package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
