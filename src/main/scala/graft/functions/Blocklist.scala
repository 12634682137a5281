package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.AhoCorasickExpression.blocklistCounts
import graft.sources.Tables

/** Blocklist scrub report — the curation step that answers "how much
  * of the corpus trips the banned-term list, and which terms do the
  * damage" before any row is dropped (NSFW vocab, boilerplate markers,
  * policy phrases). One automaton pass per document
  * ([[graft.plans.AcAutomaton]]); the report is per pattern: documents
  * hit and total occurrences.
  *
  * Counting semantics are leftmost non-overlapping PER PATTERN — the
  * `replace()`-difference count — so the DuckDB oracle replays the
  * numbers with plain SQL per pattern. Patterns are matched against
  * `lower(text)`, substring-level (a blocklist bans "scan" wherever it
  * appears; word-boundary variants belong to the pattern author via
  * spaces, e.g. "table table").
  *
  * Scale shape: the automaton (bounded: total pattern bytes × 256-int
  * rows) rides the plan as a codegen reference object; per document the
  * walk is O(|text| + matches) regardless of pattern count — the whole
  * point vs P per-pattern scans. The posexplode fan-out (P rows per
  * doc) feeds straight into a map-side-combined aggregate keyed on the
  * pattern index (≤ P keys), so the shuffle is P rows per partition no
  * matter the corpus; for 10⁴⁺-pattern lists, fold the counts
  * per-partition instead (same automaton, mapPartitions reduce) — the
  * report stays P rows.
  */
object Blocklist {

  /** Deterministic demo blocklist over the synthetic corpus vocab —
    * deliberately overlap-stressed: nested patterns ("a" ⊂ "an" ⊂
    * "can" ⊂ "scan", "tab" ⊂ "table"), a self-overlapping phrase
    * ("table table"), and fragments that only occur inside words
    * ("able", "al"). */
  val DefaultPatterns: Seq[String] = Seq(
    "a", "able", "al", "an", "can", "fast",
    "row", "scan", "tab", "table", "table table", "value")

  /** One row per pattern: (pattern, n_docs, n_hits), every pattern
    * present even at zero hits. */
  def blocklistReport(spark: SparkSession, sfDir: String,
      patterns: Seq[String] = DefaultPatterns): DataFrame = {
    import spark.implicits._
    val pats = patterns.toArray
    Tables.documents(spark, sfDir)
      .select(blocklistCounts(lower($"text"), pats.toSeq).as("c"))
      .select(posexplode($"c").as(Seq("pi", "n")))
      .groupBy($"pi")
      .agg(sum(when($"n" > 0L, 1L).otherwise(0L)).as("n_docs"),
        sum($"n").as("n_hits"))
      .select(element_at(lit(pats), ($"pi" + 1).cast("int")).as("pattern"),
        $"n_docs".cast("long").as("n_docs"), $"n_hits".cast("long").as("n_hits"))
      .orderBy($"pattern")
  }

  /** DuckDB replay: per-pattern `replace()`-difference counts — the
    * exact semantics the automaton's non-overlapping cursor implements. */
  def blocklistReportSql(patterns: Seq[String] = DefaultPatterns): String = {
    val lits = patterns.map(p => s"'${p.replace("'", "''")}'").mkString(", ")
    s"""WITH pats AS (SELECT unnest([$lits]) AS pattern),
       |per AS (
       |  SELECT p.pattern,
       |         (length(lower(d.text)) - length(replace(lower(d.text), p.pattern, '')))
       |           // length(p.pattern) AS n
       |  FROM documents d CROSS JOIN pats p)
       |SELECT pattern,
       |       CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS n_docs,
       |       CAST(sum(n) AS BIGINT) AS n_hits
       |FROM per GROUP BY pattern ORDER BY pattern""".stripMargin
  }
}
