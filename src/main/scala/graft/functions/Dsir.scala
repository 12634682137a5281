package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus, by importance weights
  * w(doc) = Π_b (p_target(b) / p_raw(b))^{c_doc(b)} over hashed n-gram
  * buckets b, sampled without replacement via Gumbel-top-k. The
  * standard recipe for "make 100 TB of web text look like Wikipedia"
  * — model-free, two corpus scans, no training loop (contrast
  * [[QualityModel]], a trained classifier, and [[Perplexity]], a
  * corpus-fit LM; DSIR needs only the target SLICE itself).
  *
  * Cross-engine exactness (the [[Perplexity]] discipline): bucket
  * counts are exact integers; each smoothed log-probability is floored
  * to a BIGINT at 1e-9 granularity SEPARATELY — w_e9(b) =
  * floor(ln((tc_b+1)/(T+B))·1e9) − floor(ln((rc_b+1)/(R+B))·1e9) — so
  * the per-doc score Σ c_doc(b)·w_e9(b) is exact integer arithmetic,
  * order-independent. The Gumbel perturbation uses the repo's
  * no-RNG sampling discipline: u = md5-derived uniform per doc
  * (rerun/engine stable), noise = floor(−ln(−ln(u))·1e9) added to the
  * integer score. ln() is the only cross-engine surface (JVM vs libm),
  * quantized exactly as the hash-green perplexity gate.
  *
  * Scale: the gram explode is the only corpus-wide work, scanned twice
  * (count pass, score pass — stage the gram frame to parquet between
  * them at 100 TB, the [[DedupStage]] pattern). Both count tables are
  * B-sized (4096 rows) whatever the corpus — the score join BROADCASTS
  * the weight table, so scoring adds zero shuffles to the gram
  * explode's own aggregation; selection is orderBy+limit =
  * TakeOrderedAndProject (per-partition heaps + k-row driver merge).
  * Nothing corpus-sized reaches the driver.
  */
object Dsir {

  /** Hashed feature-space size B. The paper uses 10^4; collisions are
    * part of the method (they bias both distributions identically in
    * expectation). Power of two keeps the SQL twin's modulo cheap. */
  val NumBuckets = 4096

  /** Top-k sample size for the gated query. */
  val DefaultK = 100

  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** md5-derived bucket id in [0, B) — same construction as
    * [[TextAnalysis.fingerprint]]'s fp_num (15 hex chars < 2^60, so
    * the modulo sees a positive long in both engines). */
  private def bucketOf(gram: Column): Column =
    conv(substring(md5(gram), 1, 15), 16, 10).cast("long") % NumBuckets

  /** (doc_id, lang, bucket) — one row per unigram AND bigram instance
    * (the paper's hashed n-gram featurization). Lang rides along so the
    * target slice needs no join back. */
  private def gramBuckets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.select($"doc_id", $"lang", toks($"text").as("tk"))
    val uni = d.select($"doc_id", $"lang", explode($"tk").as("gram"))
    val bi = d.filter(size($"tk") >= 2)
      .select($"doc_id", $"lang", explode(
        zip_with(slice($"tk", lit(1), size($"tk") - 1),
          slice($"tk", lit(2), size($"tk") - 1),
          (a, b) => concat(a, lit(" "), b))).as("gram"))
    uni.unionByName(bi).select($"doc_id", $"lang", bucketOf($"gram").as("bucket"))
  }

  /** Gumbel-top-k DSIR sample: the k raw docs with the highest
    * importance-weighted Gumbel keys, i.e. a without-replacement sample
    * ∝ w(doc) that is deterministic under the hashed-uniform noise. */
  def sample(spark: SparkSession, sfDir: String, targetLang: String = "en",
      k: Int = DefaultK): DataFrame =
    sampleOn(Tables.load(spark, sfDir, "documents"), targetLang, k)

  /** The pipeline over an explicit (doc_id, lang, text) frame. */
  private[graft] def sampleOn(docs: DataFrame, targetLang: String,
      k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // materialize the gram frame ONCE (eager localCheckpoint): both
    // consumers below — the bucket-count aggregate and the score join —
    // would otherwise each re-run the split+md5 explode, which is this
    // query's dominant cost (the ×64 soak read α = 0.84 before, with
    // the rebuild; the 100 TB analog is staging the gram frame to
    // parquet between the two passes, the DedupStage pattern — the
    // narrow (doc_id, lang, bucket) rows are ~50× smaller than the
    // text they derive from)
    val g = gramBuckets(docs).localCheckpoint(true)
    // ONE gram scan + ONE bucket shuffle derives BOTH distributions:
    // the target count is a conditional count inside the same
    // aggregate. Values are identical to the former rc ⟕ tc join —
    // target ⊆ raw, so a bucket with no target grams reads tc = 0
    // exactly where the left join's coalesce(tc, 0) did — but the
    // separate target-slice scan, its shuffle, and the join are gone
    // (the gram build was this query's dominant cost, and it ran for
    // each of the two count paths).
    val cnts = g.groupBy($"bucket").agg(
      count(lit(1)).as("rc"),
      count(when($"lang" === targetLang, lit(1))).as("tc"))
    val totals = cnts.agg(sum($"rc").as("r_total"),
      sum($"tc").as("t_total"))
    val w = cnts.crossJoin(totals)
      .select($"bucket",
        (floor(log(($"tc" + 1L).cast("double") /
            ($"t_total" + NumBuckets).cast("double")) * lit(1e9)).cast("long")
          - floor(log(($"rc" + 1L).cast("double") /
            ($"r_total" + NumBuckets).cast("double")) * lit(1e9)).cast("long"))
          .as("w_e9"))
    val scored = g.join(broadcast(w), Seq("bucket"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"), sum($"w_e9").as("logw_e9"))
    // hashed-uniform Gumbel key: u ∈ (0,1) from md5("dsir"||doc_id)
    val u = (conv(substring(md5(concat(lit("dsir"), $"doc_id".cast("string"))),
        1, 15), 16, 10).cast("long") % 1000000000L + lit(0.5)) / lit(1e9)
    scored
      .select($"doc_id", $"n_grams", $"logw_e9",
        ($"logw_e9" + floor(-log(-log(u)) * lit(1e9)).cast("long")).as("g_e9"))
      .orderBy($"g_e9".desc, $"doc_id")
      .limit(k)
  }

  def sampleSql(targetLang: String = "en", k: Int = DefaultK): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |         string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |g AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |         CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)
       |           % $NumBuckets AS bucket
       |  FROM (
       |    SELECT doc_id, lang, UNNEST(tk) AS gram FROM d
       |    UNION ALL
       |    SELECT doc_id, lang,
       |           UNNEST(list_transform(generate_series(1, len(tk) - 1),
       |                                 i -> tk[i] || ' ' || tk[i + 1]))
       |    FROM d WHERE len(tk) >= 2)),
       |rc AS (SELECT bucket, COUNT(*) AS rc FROM g GROUP BY 1),
       |tc AS (SELECT bucket, COUNT(*) AS tc FROM g
       |       WHERE lang = '$targetLang' GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(SUM(rc) AS BIGINT) FROM rc) AS r_total,
       |               (SELECT CAST(COALESCE(SUM(tc), 0) AS BIGINT) FROM tc)
       |                 AS t_total),
       |w AS (
       |  SELECT bucket,
       |         CAST(FLOOR(ln(CAST(COALESCE(tc, 0) + 1 AS DOUBLE)
       |                       / CAST(t_total + $NumBuckets AS DOUBLE))
       |                    * 1000000000.0) AS BIGINT)
       |       - CAST(FLOOR(ln(CAST(rc + 1 AS DOUBLE)
       |                       / CAST(r_total + $NumBuckets AS DOUBLE))
       |                    * 1000000000.0) AS BIGINT) AS w_e9
       |  FROM rc LEFT JOIN tc USING (bucket), tot),
       |s AS (
       |  SELECT doc_id, COUNT(*) AS n_grams, CAST(SUM(w_e9) AS BIGINT) AS logw_e9
       |  FROM g JOIN w USING (bucket) GROUP BY 1)
       |SELECT doc_id, n_grams, logw_e9,
       |       logw_e9 + CAST(FLOOR(-ln(-ln(
       |           (CAST(('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)),
       |                                 1, 15)) AS BIGINT)
       |              % 1000000000 + 0.5) / 1000000000.0))
       |         * 1000000000.0) AS BIGINT) AS g_e9
       |FROM s
       |ORDER BY g_e9 DESC, doc_id
       |LIMIT $k""".stripMargin
}
