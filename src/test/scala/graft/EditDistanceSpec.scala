package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** The edit-distance refinement must measure what Jaccard can't: the
  * hand fixture plants a verbatim pair, a token-REORDERED pair (same
  * token multiset, different sequence), and an unrelated pair, and the
  * two scores must rank them differently. Gate-output contracts ride
  * along. */
class EditDistanceSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("levenshtein engine parity anchors: known distances") {
    val got = Seq(("kitten", "sitting"), ("abc", "abc"), ("abc", ""),
      ("flaw", "lawn")).toDF("a", "b")
      .select(levenshtein($"a", $"b")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 0, 3, 2))
  }

  test("sequence-awareness: reordering is invisible to Jaccard-on-sets, visible to edit distance") {
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val reordered = "theta eta zeta epsilon delta gamma beta alpha"
    // unigram-set Jaccard of the two is 1.0; edit distance is large
    val d = Seq((text, reordered)).toDF("a", "b")
      .select(levenshtein($"a", $"b")).collect()(0).getInt(0)
    assert(d > text.length / 2,
      s"reordered text should be edit-far (got $d) — the refinement's whole point")
  }

  test("gate output: every staged pair re-scored, ratios exact, verdict consistent") {
    val out = Dedup.editDistanceRefine(spark, gateSf).collect()
    val pairs = graft.functions.DedupStage.pairs(spark, gateSf).count()
    assert(out.length == pairs.toInt, "refinement must keep every staged pair")
    out.foreach { r =>
      val (dist, rel, confirms) = (r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(rel >= 0L && rel <= 1000000L, s"ratio out of range: $rel")
      assert(confirms == (rel <= 300000L))
      assert((dist == 0L) == (rel == 0L))
    }
    // the gate corpus's template dups are near-verbatim: most pairs
    // should be edit-confirmed (a broken normalization would zero this)
    assert(out.count(_.getBoolean(5)) > out.length / 2)
  }
}
