package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", App. A) — the published heuristic filter set
  * most large-scale text pipelines start from (reused by MassiveText,
  * RefinedWeb, Dolma). Seven document-level rules; a doc is kept iff
  * ALL pass:
  *
  *  1. word count in [minWords, maxWords] (paper: 50..100k)
  *  2. mean word length in [3, 10] characters
  *  3. symbol-to-word ratio ('#', '…', '...') ≤ 0.1
  *  4. ≤ 10% of lines start with a bullet ('-', '*', '•')
  *  5. ≤ 30% of lines end with an ellipsis
  *  6. ≥ 80% of words contain ≥ 1 alphabetic character
  *  7. ≥ 2 distinct members of the required-stopword set
  *     {the, be, to, of, and, that, have, with} appear
  *
  * Cross-engine exactness: unlike the float composite of
  * [[TextAnalysis.qualityScore]], every Gopher threshold is a RATIO of
  * two exact integer counts — so each rule is evaluated as an integer
  * cross-multiplication (e.g. mean length ∈ [3,10] ⇔ 3·words ≤ chars
  * ∧ chars ≤ 10·words) and the gate involves no floating point at
  * all. Words follow the repo token convention (\s+ split of trimmed
  * lower text); lines split the RAW text on newlines.
  *
  * Scale: one narrow projection per document — no joins, no shuffles
  * except the output sort; at 100 TB this is a pure map over the scan
  * and composes as the first stage of [[graft.operators.Curation]]. */
object GopherRules {

  /** Word-count bounds. The paper's 50..100_000; the default lower
    * bound is 20 so the synthetic gate corpus (short ~50-word docs)
    * exercises both branches of every rule rather than failing all
    * docs on rule 1. */
  val DefaultMinWords = 20
  val DefaultMaxWords = 100000

  /** Required-stopword minimum. The paper demands ≥ 2 distinct members;
    * the synthetic gate corpus is generated word-salad that almost
    * never carries two, so the REGISTERED gate passes minStops = 1
    * explicitly (same deviation rationale as [[DefaultMinWords]]) —
    * the API default stays at the paper's value. */
  val DefaultMinStops = 2

  private val requiredStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  def score(spark: SparkSession, sfDir: String,
      minWords: Int = DefaultMinWords,
      maxWords: Int = DefaultMaxWords,
      minStops: Int = DefaultMinStops): DataFrame = {
    import spark.implicits._
    val t = toks($"text")
    val nWords = size(t).cast("long")
    val wordChars = aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long"))
    // symbol instances: '#' and '…' are 1 unit each, '...' counts per
    // non-overlapping occurrence (left-to-right replace in both engines)
    val hashes = (length($"text") - length(regexp_replace($"text", "#", ""))).cast("long")
    val uniEll = (length($"text") - length(regexp_replace($"text", "…", ""))).cast("long")
    val asciiEll = ((length($"text") -
      length(regexp_replace($"text", "\\.\\.\\.", ""))) / 3).cast("long")
    val symbols = hashes + uniEll + asciiEll
    val lines = split($"text", "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellLines = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val alphaWords = size(filter(t, w => w.rlike("[a-z]"))).cast("long")
    val stopsPresent = requiredStops.map(s =>
      when(array_contains(t, s), 1).otherwise(0)).reduce(_ + _)
    Tables.documents(spark, sfDir).select(
      $"doc_id",
      nWords.as("n_words"),
      nLines.as("n_lines"),
      (nWords >= minWords && nWords <= maxWords).as("r_word_count"),
      (lit(3L) * nWords <= wordChars && wordChars <= lit(10L) * nWords)
        .as("r_mean_word_len"),
      (lit(10L) * symbols <= nWords).as("r_symbol_ratio"),
      (lit(10L) * bulletLines <= nLines).as("r_bullet_lines"),
      (lit(10L) * ellLines <= lit(3L) * nLines).as("r_ellipsis_lines"),
      (lit(5L) * alphaWords >= lit(4L) * nWords).as("r_alpha_words"),
      (stopsPresent >= minStops).as("r_stopwords"))
      .withColumn("gopher_keep",
        $"r_word_count" && $"r_mean_word_len" && $"r_symbol_ratio" &&
          $"r_bullet_lines" && $"r_ellipsis_lines" && $"r_alpha_words" &&
          $"r_stopwords")
      .orderBy($"doc_id")
  }

  def scoreSql(minWords: Int = DefaultMinWords,
      maxWords: Int = DefaultMaxWords,
      minStops: Int = DefaultMinStops): String = {
    val stopsPresent = requiredStops.map(s =>
      s"CASE WHEN list_contains(t, '$s') THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS t,
       |         string_split(text, chr(10)) AS lines,
       |         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |           + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT)
       |           + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
       |           AS symbols
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         CAST(len(t) AS BIGINT) AS n_words,
       |         CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS word_chars,
       |         symbols,
       |         CAST(len(lines) AS BIGINT) AS n_lines,
       |         CAST(len(list_filter(lines,
       |           l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS bullet_lines,
       |         CAST(len(list_filter(lines,
       |           l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT) AS ell_lines,
       |         CAST(len(list_filter(t,
       |           w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha_words,
       |         $stopsPresent AS stops_present
       |  FROM base)
       |SELECT doc_id, n_words, n_lines,
       |       n_words >= $minWords AND n_words <= $maxWords AS r_word_count,
       |       3 * n_words <= word_chars AND word_chars <= 10 * n_words
       |         AS r_mean_word_len,
       |       10 * symbols <= n_words AS r_symbol_ratio,
       |       10 * bullet_lines <= n_lines AS r_bullet_lines,
       |       10 * ell_lines <= 3 * n_lines AS r_ellipsis_lines,
       |       5 * alpha_words >= 4 * n_words AS r_alpha_words,
       |       stops_present >= $minStops AS r_stopwords,
       |       (n_words >= $minWords AND n_words <= $maxWords)
       |         AND (3 * n_words <= word_chars AND word_chars <= 10 * n_words)
       |         AND 10 * symbols <= n_words
       |         AND 10 * bullet_lines <= n_lines
       |         AND 10 * ell_lines <= 3 * n_lines
       |         AND 5 * alpha_words >= 4 * n_words
       |         AND stops_present >= $minStops AS gopher_keep
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }
}
