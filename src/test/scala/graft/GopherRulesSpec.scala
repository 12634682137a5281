package graft

import org.apache.spark.sql.functions._
import graft.functions.GopherRules

/** Hand-built documents hitting each Gopher rule's boundary — the
  * oracle gate proves cross-engine agreement; these prove the rules
  * mean what the paper says. Uses the package-private single-frame
  * entry via a temp parquet dir + the public scorer. */
class GopherRulesSpec extends SparkSuite {
  import spark.implicits._

  private def scoreDocs(docs: Seq[(Long, String)]): Map[Long, Map[String, Boolean]] = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gopher_").toString
    docs.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = GopherRules.score(spark, dir, minWords = 5).collect()
      out.map { r =>
        r.getLong(0) -> Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
          "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords",
          "gopher_keep").map(c => c -> r.getAs[Boolean](c)).toMap
      }.toMap
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
    }
  }

  test("each rule trips on its engineered violation, passes otherwise") {
    val clean = "the quick brown fox jumps over and over with all of that energy"
    val out = scoreDocs(Seq(
      1L -> clean,                                    // passes everything
      2L -> "too short",                              // word count < 5
      3L -> "a b c d e f g h i j the of",            // mean word len < 3
      4L -> ("the of " + Seq.fill(10)("### word").mkString(" ")), // symbols > 10%
      5L -> ("the of line\n" + Seq.fill(9)("- bullet line\n").mkString), // bullets > 10%
      6L -> ("the of line one...\nline two...\nline three\n" +
             "line four\nplain line"),                // 2 of 5 lines ellipsis > 30%
      7L -> "the of 111 222 333 444 555 666 777 888", // alpha words < 80%
      8L -> clean.replace("the", "zzz").replace("and", "qqq")
                 .replace("with", "www").replace("of", "xx").replace("that", "yy")))
    assert(out(1L)("gopher_keep"), s"clean doc must pass: ${out(1L)}")
    assert(!out(2L)("r_word_count"))
    assert(!out(3L)("r_mean_word_len"))
    assert(!out(4L)("r_symbol_ratio"))
    assert(!out(5L)("r_bullet_lines"))
    assert(!out(6L)("r_ellipsis_lines"))
    assert(!out(7L)("r_alpha_words"))
    assert(!out(8L)("r_stopwords"))
    // every violation doc is dropped
    (2L to 8L).foreach(id => assert(!out(id)("gopher_keep"), s"doc $id"))
  }

  test("boundary arithmetic is exact: thresholds compare as integers") {
    // exactly 10% bullets (1 of 10 lines) passes (≤); 2 of 10 fails
    val tenLines = (1 to 9).map(i => s"the of plain line $i").mkString("\n")
    val out = scoreDocs(Seq(
      1L -> s"- bullet\n$tenLines",
      2L -> s"- bullet\n- bullet\n${(1 to 8).map(i => s"the of line $i").mkString("\n")}"))
    assert(out(1L)("r_bullet_lines"), "exactly 10% must pass the ≤ bound")
    assert(!out(2L)("r_bullet_lines"), "20% must fail")
    // mean word length exactly 3 passes: 12 words of exactly 3 chars
    val three = (1 to 12).map(_ => "abc").mkString(" ")
    val o2 = scoreDocs(Seq(3L -> three))
    assert(o2(3L)("r_mean_word_len"), "mean length exactly 3 is in [3,10]")
  }

  test("corpus gate: both keep and drop branches populated at sf0.001") {
    val out = GopherRules.score(spark, "/root/testdata/sf0.001", minStops = 1)
      .collect()
    val kept = out.count(_.getAs[Boolean]("gopher_keep"))
    assert(kept > 0 && kept < out.length,
      s"rule battery should split the corpus, kept $kept of ${out.length}")
  }
}
