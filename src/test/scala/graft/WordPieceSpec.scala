package graft

import org.apache.spark.sql.functions._
import graft.functions.WordPiece

/** The greedy matcher's semantics on hand cases (the part a hash gate
  * can't explain when it trips), plus corpus-level conservation laws
  * for the registered q_wordpiece_counts gate. */
class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("encodeWord: greedy longest-match-first with ## continuations") {
    val pieces = Set("table", "tab", "le", "t", "a", "b", "l", "e", "s")
    // longest match at the start wins outright
    assert(WordPiece.encodeWord("table", pieces).get == Seq("table"))
    // continuation matching is greedy too: tab + ##le, never t+a+b+l+e
    assert(WordPiece.encodeWord("tables", pieces).get ==
      Seq("table", "##s"))
    assert(WordPiece.encodeWord("tablet", pieces).get ==
      Seq("table", "##t"))
    assert(WordPiece.encodeWord("letab", pieces).get ==
      Seq("le", "##tab"))
    // char fallback keeps ## marks on every non-initial piece
    assert(WordPiece.encodeWord("ba", pieces).get == Seq("b", "##a"))
    // OOV character -> None ([UNK])
    assert(WordPiece.encodeWord("tab1e", pieces).isEmpty)
  }

  test("piece counts: conservation — start pieces sum to the corpus word count") {
    val out = WordPiece.pieceCounts(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty)
    val words = spark.read.parquet(s"$gateSf/documents.parquet")
      .select(explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .count()
    // every word's encoding has exactly ONE unmarked start piece
    val startTotal = out.filterNot(_._1.startsWith("##")).map(_._2).sum
    assert(startTotal == words,
      s"start pieces $startTotal != corpus words $words")
    // no [UNK] on a corpus-derived alphabet
    assert(!out.exists(_._1 == "[UNK]"))
    // the inventory bound: distinct pieces <= vocabWords + |alphabet| (x2 for ## marks)
    assert(out.length <= 2 * (WordPiece.VocabWords + 36))
  }
}
