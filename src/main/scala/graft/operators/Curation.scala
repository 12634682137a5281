package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{DedupStage, TextAnalysis}
import graft.sources.Tables

/** End-to-end corpus curation pipeline — the composition query.
  *
  * Every training-data operator in this library exists to serve ONE
  * pipeline: raw corpus → language filter → quality gate → exact dedup
  * → near-dedup → training corpus (the C4/RefinedWeb/Dolma recipe).
  * This operator runs that whole funnel as a single declarative plan
  * and labels every document with its exit stage, so the gated query
  * pins not just each component (they have their own oracles) but the
  * COMPOSITION: stage ordering, survivor-set threading (each stage
  * dedups only among the previous stage's survivors, as a real funnel
  * does), and the drop rules' determinism.
  *
  * Drop rules, deterministic in both engines:
  *   - lang: heuristic language ID ≠ 'en'
  *   - quality: composite score below the gate
  *   - exact_dup: not the min-doc_id holder of its normalized-text md5
  *     (window over the fingerprint key, survivors only)
  *   - near_dup: has a verified Jaccard≥0.9 partner with a SMALLER id
  *     among remaining survivors (the SemDeDup smaller-id rule; the
  *     pairs come from the staged MinHash-LSH artifact, so the funnel
  *     reuses the corpus-wide index instead of rebuilding it)
  *
  * Scale: one shuffle per keyed stage (fingerprint groupBy, pair
  * restriction joins — both on doc-sized keys, never on text); the
  * text-derived signals (lang hits, quality ratios, md5) are narrow
  * codegen projections computed in a single corpus scan each. The
  * funnel's selectivity compounds left-to-right, so the expensive
  * near-dup restriction join runs over the SMALLEST survivor set.
  */
object Curation {

  /** Per-document funnel outcome: (doc_id, outcome) where outcome is
    * the first failing stage or 'kept'. */
  def curate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lang = TextAnalysis.langId(spark, sfDir).select($"doc_id", $"lang_pred")
    val qual = TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"is_high_quality")
    val norm = regexp_replace(trim(lower($"text")), "\\s+", " ")
    val fp = Tables.documents(spark, sfDir).select($"doc_id", md5(norm).as("fp"))

    val base = fp.join(lang, Seq("doc_id")).join(qual, Seq("doc_id"))
    // survivors of lang + quality; exact-dup keeper among THEM
    val surv2 = base.filter($"lang_pred" === "en" && $"is_high_quality")
    val surv3 = surv2
      .withColumn("fp_keeper", min($"doc_id").over(Window.partitionBy($"fp")))
      .filter($"doc_id" === $"fp_keeper")
      .select($"doc_id")
    // near-dup drop among stage-3 survivors: pair endpoints are ordered
    // doc_a < doc_b, so dropping doc_b is the smaller-id-keeper rule
    val pairs = DedupStage.pairs(spark, sfDir, minJac = 0.9)
      .select($"doc_a", $"doc_b")
    val nearDropped = pairs
      .join(surv3.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(surv3.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
      .select($"doc_b".as("doc_id")).distinct()

    base
      .join(surv3.withColumn("is_keeper", lit(true)), Seq("doc_id"), "left")
      .join(nearDropped.withColumn("is_near_dup", lit(true)), Seq("doc_id"), "left")
      .select($"doc_id",
        when($"lang_pred" =!= "en", lit("lang"))
          .when(!$"is_high_quality", lit("quality"))
          .when($"is_keeper".isNull, lit("exact_dup"))
          .when($"is_near_dup".isNotNull, lit("near_dup"))
          .otherwise(lit("kept")).as("outcome"))
      .orderBy($"doc_id")
  }

  def curateSql(): String =
    s"""WITH lpred AS (
       |  SELECT doc_id, lang_pred FROM (${TextAnalysis.langIdSql})),
       |q AS (
       |  SELECT doc_id, is_high_quality FROM (${TextAnalysis.qualityScoreSql})),
       |fp AS (
       |  SELECT doc_id,
       |         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM documents),
       |s2 AS (
       |  SELECT f.doc_id, f.fp FROM fp f
       |  JOIN lpred l ON l.doc_id = f.doc_id
       |  JOIN q ON q.doc_id = f.doc_id
       |  WHERE l.lang_pred = 'en' AND q.is_high_quality),
       |s3 AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS k FROM s2)
       |  WHERE doc_id = k),
       |pairs AS (${graft.functions.Dedup.ngramJaccardSql(0.9)}),
       |near AS (
       |  SELECT DISTINCT p.doc_b AS doc_id FROM pairs p
       |  JOIN s3 a ON a.doc_id = p.doc_a
       |  JOIN s3 b ON b.doc_id = p.doc_b)
       |SELECT d.doc_id,
       |       CASE WHEN l.lang_pred <> 'en' THEN 'lang'
       |            WHEN NOT q.is_high_quality THEN 'quality'
       |            WHEN s3.doc_id IS NULL THEN 'exact_dup'
       |            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
       |            ELSE 'kept' END AS outcome
       |FROM documents d
       |JOIN lpred l ON l.doc_id = d.doc_id
       |JOIN q ON q.doc_id = d.doc_id
       |LEFT JOIN s3 ON s3.doc_id = d.doc_id
       |LEFT JOIN near n ON n.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
