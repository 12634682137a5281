package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Planted-corpus test for the curation funnel: the gate-SF oracle
  * exercises lang/quality/near_dup/kept but has no byte-identical
  * survivors, so the exact_dup branch and the stage-precedence rules
  * are pinned here on constructed documents. */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  // 12 distinct sentences -> ~160 distinct shingles, so a one-word edit
  // in the tail stays above the 0.9 Jaccard near-dup threshold
  private val body: String = (0 until 12).map(i =>
    s"the quick brown fox item$i and the lazy dog that is said to run"
  ).mkString(" ")
  private val goodEn = s"$body of a morning"

  test("funnel reads the staged pairs artifact — no LSH recompute in-plan") {
    val plan = Curation.curate(spark, sf).queryExecution.optimizedPlan.toString
    // the near-dup stage must come from the materialized pairs parquet,
    // not an inline re-derivation of signatures/bands
    assert(!plan.toLowerCase.contains("minhash"), plan.take(800))
    assert(!plan.toLowerCase.contains("sorted_shingles"), plan.take(800))
  }

  test("all five outcomes fire; first failing stage wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cur_").toString
    try {
      val nearDup = s"$body of a evening" // ~3 of ~160 shingles differ
      val spanish = Seq.fill(20)("el que la de y los es que de la").mkString(" ")
      val docs = Seq(
        (1L, goodEn, "en", "web"),        // kept
        (2L, spanish, "es", "web"),       // lang
        (3L, "the end.", "en", "web"),    // en-detectable but too few tokens
        (4L, goodEn, "en", "books"),      // exact_dup of 1 (larger id drops)
        (5L, nearDup, "en", "web"),       // near_dup of 1
        (6L, spanish, "es", "books")      // lang — NOT exact_dup of 2:
                                          // lang fails first (precedence)
      ).toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length($"text").cast("long")) // declared schema type
      docs.write.parquet(s"$dir/documents.parquet")
      val out = Curation.curate(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "kept", 2L -> "lang", 3L -> "quality",
        4L -> "exact_dup", 5L -> "near_dup", 6L -> "lang"))
    } finally {
      graft.functions.Staged.reset() // temp-dir staged artifacts
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }
}
