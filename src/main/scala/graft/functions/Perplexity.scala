package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** N-gram language-model perplexity scoring — the model-based quality
  * filter of the CCNet lineage (train a small LM on the corpus, drop
  * documents the model finds surprising). Heuristic scoring
  * ([[TextAnalysis.qualityScore]]) catches boilerplate; perplexity
  * catches fluent-looking noise the heuristics pass.
  *
  * The model is an add-one-smoothed bigram LM trained on the corpus
  * itself: p(w|v) = (c(v,w) + 1) / (c(v,·) + V), all counts exact
  * integers from two map-side-combined groupBys. A document's score is
  * its summed negative log-likelihood.
  *
  * Cross-engine exactness: a per-doc SUM of double log terms would be
  * partition-order-dependent. Each term is therefore quantized FIRST —
  * floor(ln(ratio)·1e9) as a BIGINT — and the per-doc sum is exact
  * integer arithmetic, order-independent. The ratio itself is one
  * correctly-rounded IEEE division of exact integers, so the only
  * cross-engine surface is ln() (JVM vs libm), whose ulp-level
  * disagreement would have to land exactly on an integer boundary at
  * 1e-9 granularity to flip a hash — and the gate would catch it. The
  * keep/drop filter is pure integer math (nll_e9 ≤ thr·n), exact by
  * construction; avg_nll is derived for display via one pinned
  * cast-divide-divide sequence on identical inputs.
  *
  * Scale: the exploded bigram stream is scanned twice — once to build
  * the count table (one shuffle with partial combine; prefix counts
  * then derive from it as a vocab-sized aggregate, not a second
  * corpus pass), once to score, re-joining each doc's bigrams to the
  * counts — at 100 TB those are co-keyed shuffle joins (bigram vocab
  * is far beyond broadcast), at gate SF AQE broadcasts them; to pay
  * the explode once instead of twice, stage the bigram table to
  * parquet between the two (the [[Dedup]] DedupStage pattern).
  * Nothing corpus-sized reaches the driver; the vocab size V is the
  * only scalar collected (as a 1-row frame, cross-joined). Unlike
  * [[graft.functions.Bpe]]'s distinct-word trick, bigram counting
  * must see token ADJACENCY, so it runs over the exploded corpus.
  */
object Perplexity {

  /** Default keep threshold: average nll per token ≤ 3.4 nats
    * (perplexity ≈ e^3.4 ≈ 30 under the smoothed bigram model). Real
    * pipelines tune this per corpus — 3.4 sits just above the test
    * corpus median, so the gate exercises both branches. */
  val DefaultThrNllE9PerToken: Long = 3_400_000_000L

  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** (doc_id, bg) — one row per adjacent token pair, docs with < 2
    * tokens contribute nothing. */
  private def bigrams(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(size($"tk") >= 2)
      .select($"doc_id", explode(
        zip_with(slice($"tk", lit(1), size($"tk") - 1),
          slice($"tk", lit(2), size($"tk") - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
  }

  /** Per-document bigram NLL under the corpus-trained model, plus the
    * integer-exact keep flag. One row per document (short docs get
    * n_bigrams = 0, keep = false — too short to assess). */
  def score(spark: SparkSession, sfDir: String,
      thrNllE9PerToken: Long = DefaultThrNllE9PerToken): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"doc_id", toks($"text").as("tk"))
    val bg = bigrams(docs)
    val cbg = bg.groupBy($"bg").agg(count(lit(1)).as("c_bg"))
    // prefix counts derive from the bigram counts — c_pre(w) is exactly
    // Σ c_bg over bigrams starting with w — so this is a vocab-sized
    // aggregate, NOT a second full corpus explode+shuffle
    val cpre = cbg.groupBy(split($"bg", " ").getItem(0).as("w"))
      .agg(sum($"c_bg").as("c_pre"))
    val vocab = docs.select(explode($"tk").as("tok"))
      .agg(countDistinct($"tok").as("v"))
    val terms = bg
      .join(cbg, Seq("bg"))
      .join(cpre, split($"bg", " ").getItem(0) === $"w")
      .crossJoin(vocab)
      .select($"doc_id",
        floor(log(($"c_bg" + 1L).cast("double") /
          ($"c_pre" + $"v").cast("double")) * lit(1e9)).cast("long")
          .as("term_e9"))
    val perDoc = terms.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), (-sum($"term_e9")).as("nll_e9"))
    docs.select($"doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"nll_e9", lit(0L)).as("nll_e9"))
      .withColumn("avg_nll",
        when($"n_bigrams" > 0,
          $"nll_e9".cast("double") / $"n_bigrams" / lit(1e9)))
      .withColumn("ppl_keep",
        $"n_bigrams" > 0 && $"nll_e9" <= lit(thrNllE9PerToken) * $"n_bigrams")
      .orderBy($"doc_id")
  }

  def scoreSql(thrNllE9PerToken: Long = DefaultThrNllE9PerToken): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
       |  FROM documents),
       |vocab AS (
       |  SELECT COUNT(DISTINCT tok) AS v
       |  FROM (SELECT UNNEST(tk) AS tok FROM d)),
       |bg AS (
       |  SELECT doc_id,
       |         UNNEST(list_transform(generate_series(1, len(tk) - 1),
       |                               i -> tk[i] || ' ' || tk[i + 1])) AS bg
       |  FROM d WHERE len(tk) >= 2),
       |cbg AS (SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY 1),
       |cpre AS (
       |  SELECT split_part(bg, ' ', 1) AS w, COUNT(*) AS c_pre
       |  FROM bg GROUP BY 1),
       |terms AS (
       |  SELECT doc_id,
       |         CAST(FLOOR(ln(CAST(c_bg + 1 AS DOUBLE)
       |                       / CAST(c_pre + v AS DOUBLE))
       |                    * 1000000000.0) AS BIGINT) AS term_e9
       |  FROM bg
       |  JOIN cbg USING (bg)
       |  JOIN cpre ON cpre.w = split_part(bg.bg, ' ', 1), vocab),
       |per_doc AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams,
       |         CAST(-SUM(term_e9) AS BIGINT) AS nll_e9
       |  FROM terms GROUP BY 1)
       |SELECT d.doc_id,
       |       COALESCE(n_bigrams, 0) AS n_bigrams,
       |       COALESCE(nll_e9, 0) AS nll_e9,
       |       CASE WHEN COALESCE(n_bigrams, 0) > 0
       |            THEN CAST(nll_e9 AS DOUBLE) / n_bigrams / 1000000000.0
       |       END AS avg_nll,
       |       COALESCE(n_bigrams, 0) > 0
       |         AND COALESCE(nll_e9, 0)
       |               <= $thrNllE9PerToken * COALESCE(n_bigrams, 0)
       |         AS ppl_keep
       |FROM d LEFT JOIN per_doc USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
