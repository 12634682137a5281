package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Decontaminate, Dedup, Divergence, TextAnalysis}

/** Corpus-release data card — the composition report (r10 verdict #3).
  *
  * Every audit a corpus data card states (Gebru et al., "Datasheets
  * for Datasets", CACM 2021; the Dolma/RefinedWeb release-report
  * practice) already exists in this library as its own hash-gated
  * query; what a 100 TB pipeline SHIPS is one artifact composing them
  * per release. This operator emits that artifact in long form — one
  * row per (section, item, metric) with an exact BIGINT value — so the
  * gate pins the COMPOSITION (which audits, which summaries, which
  * quantization) the way q_curation pins the curation funnel:
  *
  *   - mixture:       diversity indices per categorical axis
  *                    ([[Profile.mixtureReport]] — entropy/Simpson e9)
  *   - dedup_funnel:  corpus → exact-dup → near-dup → shipped masses
  *                    ([[graft.functions.Dedup.dedupFunnel]])
  *   - contamination: benchmark n-gram overlap summary
  *                    ([[graft.functions.Decontaminate.contaminationOf]])
  *   - lang_id:       detector accuracy per labeled language
  *                    (diagonal of [[TextAnalysis.langIdConfusion]])
  *   - drift_kl:      per-source word-mix KL from the corpus
  *                    ([[graft.functions.Divergence.sliceDivergence]])
  *   - drift_ks:      per-source quality-score KS drift
  *                    ([[graft.functions.Divergence.ksTest]])
  *   - zipf:          per-source rank-frequency OLS
  *                    ([[TextAnalysis.zipfSlope]])
  *
  * Doubles cross the section boundary only as the components' own
  * quantized integers (entropy_e9, kl_e9, slope_e9) or as one floor of
  * a bit-exact-cross-engine double (ks_d, at_value — IEEE ops over
  * exact integers per [[graft.functions.Divergence.ksTestOf]], so the
  * floored e-units are identical in both engines).
  *
  * Scale: pure composition — each component keeps its own one-scan /
  * staged-artifact plan (the funnel re-reads the staged MinHash chain;
  * nothing here adds a corpus-sized exchange), and every summary this
  * operator adds on top (the contamination rollup, the confusion
  * diagonal) aggregates component OUTPUTS, which are doc-, cell- or
  * source-sized. The report itself is ~tens of rows at any corpus
  * size. */
object DataCard {

  private def melt(df: DataFrame, section: String, item: Column,
      metrics: (String, Column)*): DataFrame = {
    val entries = metrics.map { case (name, c) =>
      struct(lit(name).as("metric"), c.cast("long").as("value")) }
    df.select(lit(section).as("section"), item.cast("string").as("item"),
        explode(array(entries: _*)).as("e"))
      .select(col("section"), col("item"),
        col("e.metric").as("metric"), col("e.value").as("value"))
  }

  def dataCard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val mix = melt(Profile.mixtureReport(spark, sfDir), "mixture", $"axis",
      "n_rows" -> $"n_rows", "n_cells" -> $"n_cells",
      "entropy_e9" -> $"entropy_e9", "simpson_e9" -> $"simpson_e9")
    val funnel = melt(Dedup.dedupFunnel(spark, sfDir), "dedup_funnel",
      lit("corpus"),
      "n_docs" -> $"n_docs", "n_exact_unique" -> $"n_exact_unique",
      "n_exact_dup_docs" -> $"n_exact_dup_docs",
      "n_neardup_pairs" -> $"n_neardup_pairs",
      "n_docs_in_clusters" -> $"n_docs_in_clusters",
      "n_dropped" -> $"n_dropped", "n_final" -> $"n_final",
      "retention_x1000" -> $"retention_x1000")
    // summary over the per-doc contamination hits; max ratio re-derived
    // from the integer columns (never the rounded double) so the floor
    // is exact integer arithmetic in both engines
    val contam = melt(
      Decontaminate.contamination(spark, sfDir).agg(
        count(lit(1)).as("n_docs_flagged"),
        coalesce(sum($"n_contaminated".cast("long")), lit(0L))
          .as("n_contaminated_grams"),
        coalesce(max(floor($"n_contaminated".cast("long") * 1000000L /
          $"n_grams")), lit(0L)).as("max_ratio_x1e6")),
      "contamination", lit("src0"),
      "n_docs_flagged" -> $"n_docs_flagged",
      "n_contaminated_grams" -> $"n_contaminated_grams",
      "max_ratio_x1e6" -> $"max_ratio_x1e6")
    // detector accuracy = the confusion matrix's diagonal share
    val conf = TextAnalysis.langIdConfusion(spark, sfDir)
    val lang = melt(
      conf.groupBy($"lang_labeled").agg(
        max($"n_labeled").as("n_labeled"),
        coalesce(sum(when($"lang_pred" === $"lang_labeled", $"n")), lit(0L))
          .as("n_correct")),
      "lang_id", $"lang_labeled",
      "n_labeled" -> $"n_labeled", "n_correct" -> $"n_correct",
      "acc_x1000" -> floor($"n_correct" * 1000L / $"n_labeled"))
    val kl = melt(Divergence.sliceDivergence(spark, sfDir), "drift_kl",
      $"source",
      "n_tokens" -> $"n_tokens", "vocab_used" -> $"vocab_used",
      "kl_e9" -> $"kl_e9")
    val ks = melt(Divergence.ksTest(spark, sfDir), "drift_ks", $"source",
      "ks_d_e9" -> floor($"ks_d" * lit(1e9)),
      "at_value_e6" -> floor($"at_value" * lit(1e6)))
    val zipf = melt(TextAnalysis.zipfSlope(spark, sfDir), "zipf", $"source",
      "n_terms" -> $"n_terms", "slope_e9" -> $"slope_e9",
      "r2_e9" -> $"r2_e9")
    mix.unionByName(funnel).unionByName(contam).unionByName(lang)
      .unionByName(kl).unionByName(ks).unionByName(zipf)
      .orderBy($"section", $"item", $"metric")
  }

  /** The same composition in SQL: each component's published oracle as
    * a derived table, melted with identical integer arithmetic. */
  def dataCardSql(): String = {
    def m(cte: String, section: String, item: String,
        metrics: Seq[(String, String)]): String =
      metrics.map { case (name, expr) =>
        s"""SELECT '$section' AS section, CAST($item AS VARCHAR) AS item,
           |       '$name' AS metric, CAST($expr AS BIGINT) AS value
           |FROM $cte""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH dc_mix AS (SELECT * FROM (${Profile.mixtureReportSql})),
       |dc_funnel AS (SELECT * FROM (${Dedup.dedupFunnelSql()})),
       |dc_contam AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_flagged,
       |         COALESCE(CAST(SUM(n_contaminated) AS BIGINT), 0)
       |           AS n_contaminated_grams,
       |         COALESCE(MAX(CAST(n_contaminated AS BIGINT) * 1000000
       |                      // n_grams), 0) AS max_ratio_x1e6
       |  FROM (${Decontaminate.contaminationSql()})),
       |dc_conf AS (
       |  SELECT lang_labeled,
       |         MAX(n_labeled) AS n_labeled,
       |         COALESCE(CAST(SUM(CASE WHEN lang_pred = lang_labeled
       |                                THEN n END) AS BIGINT), 0) AS n_correct
       |  FROM (${TextAnalysis.langIdConfusionSql})
       |  GROUP BY 1),
       |dc_kl AS (SELECT * FROM (${Divergence.sliceDivergenceSql})),
       |dc_ks AS (SELECT * FROM (${Divergence.ksTestSql})),
       |dc_zipf AS (SELECT * FROM (${TextAnalysis.zipfSlopeSql()}))
       |${m("dc_mix", "mixture", "axis", Seq(
            "n_rows" -> "n_rows", "n_cells" -> "n_cells",
            "entropy_e9" -> "entropy_e9", "simpson_e9" -> "simpson_e9"))}
       |UNION ALL
       |${m("dc_funnel", "dedup_funnel", "'corpus'", Seq(
            "n_docs" -> "n_docs", "n_exact_unique" -> "n_exact_unique",
            "n_exact_dup_docs" -> "n_exact_dup_docs",
            "n_neardup_pairs" -> "n_neardup_pairs",
            "n_docs_in_clusters" -> "n_docs_in_clusters",
            "n_dropped" -> "n_dropped", "n_final" -> "n_final",
            "retention_x1000" -> "retention_x1000"))}
       |UNION ALL
       |${m("dc_contam", "contamination", "'src0'", Seq(
            "n_docs_flagged" -> "n_docs_flagged",
            "n_contaminated_grams" -> "n_contaminated_grams",
            "max_ratio_x1e6" -> "max_ratio_x1e6"))}
       |UNION ALL
       |${m("dc_conf", "lang_id", "lang_labeled", Seq(
            "n_labeled" -> "n_labeled", "n_correct" -> "n_correct",
            "acc_x1000" -> "n_correct * 1000 // n_labeled"))}
       |UNION ALL
       |${m("dc_kl", "drift_kl", "source", Seq(
            "n_tokens" -> "n_tokens", "vocab_used" -> "vocab_used",
            "kl_e9" -> "kl_e9"))}
       |UNION ALL
       |${m("dc_ks", "drift_ks", "source", Seq(
            "ks_d_e9" -> "FLOOR(ks_d * 1e9)",
            "at_value_e6" -> "FLOOR(at_value * 1e6)"))}
       |UNION ALL
       |${m("dc_zipf", "zipf", "source", Seq(
            "n_terms" -> "n_terms", "slope_e9" -> "slope_e9",
            "r2_e9" -> "r2_e9"))}
       |ORDER BY section, item, metric""".stripMargin
  }
}
