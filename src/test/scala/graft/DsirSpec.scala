package graft

import org.apache.spark.sql.functions._
import graft.functions.Dsir

/** Properties of the DSIR importance-resampling selector that the
  * hash-exact oracle gate cannot express: the method actually steers
  * toward the target distribution, the Gumbel keys are deterministic,
  * and selection degrades gracefully to the whole corpus. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic corpus: target-lang docs speak "wiki"; raw pool is
    * half wiki-like (should be selected) and half spam-like. */
  private def corpus = {
    val target = (0L until 20L).map(i =>
      (i, s"wiki article number $i about encyclopedic knowledge", "en"))
    val wikiLike = (100L until 120L).map(i =>
      (i, s"article $i with encyclopedic knowledge and wiki style", "xx"))
    val spamLike = (200L until 220L).map(i =>
      (i, s"buy cheap pills now $i click here winner casino", "xx"))
    (target ++ wikiLike ++ spamLike).toDF("doc_id", "text", "lang")
  }

  test("importance weights steer selection toward target-like documents") {
    val all = Dsir.sampleOn(corpus, targetLang = "en", k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap // doc_id -> logw_e9
    assert(all.size == 60, "k beyond corpus size returns every doc")
    val wikiLike = (100L until 120L).map(all)
    val spamLike = (200L until 220L).map(all)
    // EVERY wiki-like raw doc out-scores EVERY spam-like doc on the
    // importance weight (their gram mass sits in target-heavy buckets)
    assert(wikiLike.min > spamLike.max,
      s"wiki-like min ${wikiLike.min} !> spam-like max ${spamLike.max}")
  }

  test("gumbel top-k is deterministic and respects (g_e9, doc_id) order") {
    val a = Dsir.sampleOn(corpus, "en", 10).collect().toSeq
    val b = Dsir.sampleOn(corpus, "en", 10).collect().toSeq
    assert(a == b, "hashed-uniform Gumbel keys must be rerun-stable")
    val keys = a.map(r => (r.getLong(3), r.getLong(0)))
    val sorted = keys.sortBy { case (g, id) => (-g, id) }
    assert(keys == sorted, "output must be (g_e9 desc, doc_id) ordered")
  }

  test("top-k of the mixed pool prefers target-like docs despite noise") {
    // select 40 of 60: target + wiki-like docs should dominate the
    // sample (Gumbel noise can admit a few spam docs at the margin,
    // but the weight gap dominates at this separation)
    val picked = Dsir.sampleOn(corpus, "en", 40)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size == 40)
    val spamPicked = picked.count(id => id >= 200L && id < 220L)
    assert(spamPicked <= 5,
      s"spam-like docs should rarely survive selection, got $spamPicked")
  }
}
