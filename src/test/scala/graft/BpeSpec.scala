package graft

import org.apache.spark.sql.functions._
import graft.functions.Bpe

/** Specs for BPE vocabulary induction (round 3). */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("merge application: greedy non-overlapping, overlapping counting") {
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x", "a", "b", "y", "a", "b"), "a", "b")
      == Seq("x", "ab", "y", "ab"))
    // counting is overlapping: "aaaa" has THREE (a,a) adjacencies
    val pc = Bpe.pairCountsFrom(docs("aaaa")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pc.toSeq == Seq(("a", "a", 3L)))
  }

  test("tie-break is lexicographic on (left, right) at equal counts") {
    // "cd cd ab ab": both pairs occur twice -> (a,b) merges first
    val m = Bpe.learnMergesFrom(spark, docs("cd cd ab ab"), 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(m.toSeq == Seq((1, "a", "b", "ab"), (2, "c", "d", "cd")))
  }

  test("tie-break compares CODE POINTS (UTF-8 order), not UTF-16 units") {
    // U+E000 (one UTF-16 unit 0xE000) vs U+1F600 (surrogates
    // 0xD83D,0xDE00): Java String order puts the emoji FIRST (its high
    // surrogate 0xD83D < 0xE000); code-point / UTF-8 byte order — what
    // Spark's orderBy and the DuckDB oracle use — puts U+E000 first.
    // At equal counts the batch selector must agree with the engines.
    val e000 = "\uE000"; val emoji = new String(Character.toChars(0x1F600))
    val batch = Bpe.selectMergeBatch(
      Array(("a", emoji, 5L), ("a", e000, 5L)), maxN = 1)
    assert(batch == Seq(("a", e000)),
      s"expected U+E000 to win the code-point tie-break, got $batch")
    // and the comparator itself: supplementary > U+E000, prefix < longer
    assert(Bpe.codePointOrdering.compare(emoji, e000) > 0)
    assert(Bpe.codePointOrdering.compare("ab", "abc") < 0)
    assert(Bpe.codePointOrdering.compare("ab", "ab") == 0)
  }

  test("early stop: no pair with count >= 2 learns nothing") {
    val m = Bpe.learnMergesFrom(spark, docs("ab", "cd", "ef"), 10).collect()
    assert(m.isEmpty)
  }

  test("merges grow multi-character symbols across iterations") {
    // "abab" x3: (a,b) -> ab; then (ab,ab) -> abab
    val m = Bpe.learnMergesFrom(spark, docs("abab abab abab"), 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(m.toSeq == Seq(("a", "b", "ab"), ("ab", "ab", "abab")))
  }

  test("distributed loop equals the plain-Scala reference on the corpus") {
    val words = Bpe.wordFreqs(graft.sources.Tables.documents(spark, sf))
      .as[(String, Long)].collect().toMap
    val ref = Bpe.learnMergesReference(words, 12)
    val dist = Bpe.learnMerges(spark, sf, 12).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(dist.toSeq == ref)
    assert(ref.size == 12)
  }

  test("encode: hand examples — canonical lowest-rank-first fixpoint") {
    // merges (a,b)->ab then (ab,c)->abc: "abcab" => [abc, ab]
    val merges = Seq(("a", "b"), ("ab", "c"))
    assert(Bpe.encodeWord("abcab", merges) == Seq("abc", "ab"))
    // the case that distinguishes the canonical loop from a one-pass
    // rank-order fold: with ranks [(ab,c), (a,b)], (a,b) fires first
    // (only applicable one), CREATING "ab" — rank-0 (ab,c) must then
    // still apply (a fold would have already passed it)
    assert(Bpe.encodeWord("abcab", merges.reverse) == Seq("abc", "ab"))
    assert(Bpe.encodeWord("xyz", merges) == Seq("x", "y", "z"))
    // lowest rank wins when several merges are applicable at once
    assert(Bpe.encodeWord("abab", Seq(("a", "b"), ("ab", "ab"))) == Seq("abab"))
  }

  test("encodeTokenCounts: totals equal the reference encoder, doc-complete") {
    val out = graft.functions.Bpe.encodeTokenCounts(spark, sf, nMerges = 12).cache()
    val merges = Bpe.stagedMerges(spark, sf, 12).orderBy($"rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // independent recomputation: per-doc token count straight from text
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val wordRe = "[a-z0-9]+".r
    val expected = docs.map { case (id, text) =>
      id -> wordRe.findAllIn(text.toLowerCase).map(w =>
        Bpe.encodeWord(w, merges).length.toLong).sum
    }.toMap
    val got = out.select($"doc_id", $"bpe_tokens").as[(Long, Long)].collect().toMap
    assert(got == expected.filter(_._2 > 0))
    // BPE can only shorten: token count ≤ character count of the words
    val chars = docs.map { case (id, text) =>
      id -> wordRe.findAllIn(text.toLowerCase).map(_.length.toLong).sum
    }.toMap
    assert(got.forall { case (id, n) => n <= chars(id) && n > 0 })
    out.unpersist()
  }

  test("selectMergeBatch: safe prefix only — stops at shared symbols, ties, collisions") {
    def batch(counts: (String, String, Long)*) =
      Bpe.selectMergeBatch(counts.toArray, 30)
    // disjoint prefix batches; the scan stops at the first overlap
    assert(batch(("a", "b", 10L), ("c", "d", 7L), ("x", "a", 6L))
      == Seq(("a", "b"), ("c", "d")))
    // second-best shares a symbol -> batch of one (the unbatched shape)
    assert(batch(("a", "b", 10L), ("b", "c", 9L)) == Seq(("a", "b")))
    // equal counts with a bound contributor sorting BELOW the candidate:
    // a pair created by merging (a,b) could tie (c,d) and win on lex
    // order, so (c,d) must wait for a re-count
    assert(batch(("a", "b", 4L), ("c", "d", 4L), ("x", "a", 4L))
      == Seq(("a", "b")))
    // merged-string collision with the live alphabet closes the batch
    assert(batch(("a", "b", 10L), ("c", "d", 9L), ("ab", "z", 3L))
      == Seq(("a", "b")))
    // count-1 pairs never merge
    assert(batch(("a", "b", 1L)) == Seq.empty)
  }

  test("pair counts on testdata: weighted, complete, deterministic order") {
    val pc = Bpe.pairCounts(spark, sf).cache()
    val total = pc.agg(sum($"pair_count")).as[Long].head()
    // total weighted adjacencies == sum over words of freq * (len - 1)
    val expected = Bpe.wordFreqs(graft.sources.Tables.documents(spark, sf))
      .filter(length($"word") >= 2)
      .agg(sum($"freq" * (length($"word") - 1))).as[Long].head()
    assert(total == expected && total > 0)
    pc.unpersist()
  }
}
