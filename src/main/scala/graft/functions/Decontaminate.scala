package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Benchmark decontamination — the n-gram overlap check run before
  * training: does any training document contain a long n-gram that
  * also appears in a held-out evaluation set? (The classic 8-13-gram
  * exact-substring test; complements [[Sampling.splitLeakage]], which
  * flags NEAR-dup pairs straddling split boundaries — this one flags
  * verbatim eval text embedded inside training documents.)
  *
  * Shape, designed for the real asymmetry at 100 TB: the benchmark
  * side is an eval suite — thousands of documents, not billions — so
  * its distinct-gram set broadcasts; the training corpus explodes to
  * (doc, gram) rows, hash-joins against the broadcast set with NO
  * shuffle of the corpus, and aggregates per document (partial,
  * map-side). The corpus is touched once, streaming.
  *
  * Output: one row per CONTAMINATED training document with its
  * distinct n-gram count, the number shared with the benchmark, and
  * the ratio — the kill-list a pipeline feeds back into filtering.
  */
object Decontaminate {

  /** Distinct n-grams of the token array `t` (whitespace tokens of
    * lower-cased text), as a per-row array — the fused codegen
    * [[graft.plans.NGrams]] (distinct mode), byte-identical to the
    * interpreted `array_distinct(transform(...))` chain it replaced
    * (parity pinned in PropertySpec). */
  private def gramArray(n: Int) =
    graft.plans.ShingleExpression.ngrams(col("t"), n, distinct = true)

  /** Contamination report of `docs` (doc_id, text, source): training
    * docs = source <> benchSource, benchmark = source = benchSource. */
  def contaminationOf(docs: DataFrame, benchSource: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select($"doc_id", $"source", Dedup.tokens($"text").as("t"))
      .select($"doc_id", $"source", explode(gramArray(n)).as("g"))
    val bench = grams.filter($"source" === benchSource)
      .select($"g").distinct()
    val train = grams.filter($"source" =!= benchSource)
    train
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum(coalesce($"hit", lit(0))).cast("int").as("n_contaminated"))
      .filter($"n_contaminated" > 0)
      .select($"doc_id", $"n_grams", $"n_contaminated",
        round($"n_contaminated".cast("double") / $"n_grams", 6)
          .as("contamination_ratio"))
      .orderBy($"doc_id")
  }

  /** Gated query: source 'src0' plays the held-out benchmark. */
  def contamination(spark: SparkSession, sfDir: String,
      benchSource: String = "src0", n: Int = 8): DataFrame =
    contaminationOf(Tables.documents(spark, sfDir), benchSource, n)

  def contaminationSql(benchSource: String = "src0", n: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |gr AS (
       |  SELECT DISTINCT doc_id, source, array_to_string(t[i:i+${n - 1}], ' ') AS g
       |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - ${n - 2})) AS i
       |        FROM toks)),
       |bench AS (SELECT DISTINCT g FROM gr WHERE source = ${Sql.lit(benchSource)}),
       |tr AS (SELECT doc_id, g FROM gr WHERE source <> ${Sql.lit(benchSource)}),
       |agg AS (
       |  SELECT tr.doc_id,
       |         CAST(COUNT(*) AS INTEGER) AS n_grams,
       |         CAST(COUNT(bench.g) AS INTEGER) AS n_contaminated
       |  FROM tr LEFT JOIN bench USING (g)
       |  GROUP BY 1)
       |SELECT doc_id, n_grams, n_contaminated,
       |       round(CAST(n_contaminated AS DOUBLE) / n_grams, 6) AS contamination_ratio
       |FROM agg
       |WHERE n_contaminated > 0
       |ORDER BY doc_id""".stripMargin
}
