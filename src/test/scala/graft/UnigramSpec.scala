package graft

import org.apache.spark.sql.functions._
import graft.functions.Unigram

/** Unigram-LM tokenizer: hand-computed Viterbi pins, differential
  * Spark-vs-plain-Scala learner agreement, and contract invariants. */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  test("Viterbi picks the max-score segmentation with deterministic ties") {
    // scores chosen so 'ab'+'cd' (-2-2=-4) beats 'a'+'b'+'cd' (-1-1-2=-4
    // same score, MORE pieces -> loses) and 'abc'+'d' (-10-1=-11)
    val sc = Map("a" -> -1_000_000_000L, "b" -> -1_000_000_000L,
      "ab" -> -2_000_000_000L, "cd" -> -2_000_000_000L,
      "abc" -> -10_000_000_000L, "c" -> -3_000_000_000L, "d" -> -1_000_000_000L)
    assert(Unigram.viterbi("abcd", 4, sc) == Seq("ab", "cd"))
    // unreachable word must trip loudly, not segment silently
    intercept[IllegalArgumentException] { Unigram.viterbi("abxd", 4, sc) }
    // single-char fallback when no multi-char piece helps
    assert(Unigram.viterbi("dc", 4, sc) == Seq("d", "c"))
  }

  test("Spark learner agrees with the plain-Scala reference at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toMap
    val ref = Unigram.learnModelReference(words,
      Unigram.DefaultMaxLen, Unigram.DefaultSeedK,
      Unigram.DefaultVocabSize, Unigram.DefaultIters)
    val got = Unigram.stagedModel(spark, sfDir)
      .orderBy(col("cnt").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref, s"Spark learner drifted from reference:\n got=${got.take(10)}\n ref=${ref.take(10)}")
    assert(got.nonEmpty)
    assert(got.exists(_._1.length > 1), "no multi-char pieces learned — EM is degenerate")
  }

  test("encode bounds and coverage hold at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val enc = Unigram.encodeContract(spark, sfDir).collect()
    assert(enc.nonEmpty)
    assert(enc.forall(_.getAs[Boolean]("tokens_in_bounds")))
    val m = Unigram.modelContract(spark, sfDir).collect()(0)
    assert(m.getAs[Boolean]("covers_all_chars"))
    assert(m.getAs[Boolean]("vocab_size_le_max"))
    assert(m.getAs[Boolean]("logp_negative"))
    assert(m.getAs[Boolean]("piece_len_le_max"))
  }
}
