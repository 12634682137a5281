package graft

import org.apache.spark.sql.functions._
import graft.functions.Perplexity

/** Bigram-LM perplexity scoring — hand-verifiable counts, integer-exact
  * keep gate, short-doc handling. */
class PerplexitySpec extends SparkSuite {
  import spark.implicits._

  /** Write a documents.parquet with the declared schema into a temp sf
    * dir; returns the dir. */
  private def corpus(docs: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ppl_").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("nll matches the hand-computed smoothed bigram model") {
    // corpus: bigram counts {"a b" -> 3, "b a" -> 1}, prefix counts
    // {a -> 3, b -> 1}, vocab = {a, b, z} so V = 3
    val dir = corpus(1L -> "a b a b", 2L -> "a b", 3L -> "z")
    try {
      val out = Perplexity.score(spark, dir).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
      def term(c: Long, cp: Long): Long =
        math.floor(math.log((c + 1).toDouble / (cp + 3).toDouble) * 1e9).toLong
      val ab = term(3, 3) // ln(4/6)
      val ba = term(1, 1) // ln(2/4)
      assert(out(1L) == ((3L, -(ab + ba + ab), true))) // nll/tok ≈ 0.50
      assert(out(2L) == ((1L, -ab, true)))             // nll/tok ≈ 0.41
      assert(out(3L) == ((0L, 0L, false))) // too short to assess
    } finally cleanup(dir)
  }

  test("keep gate is exact integer math at the threshold boundary") {
    // one doc whose avg nll/token lands exactly on a known value: with a
    // single bigram, keep flips exactly at thr = nll_e9
    val dir = corpus(1L -> "x y", 2L -> "x y")
    try {
      val nll = Perplexity.score(spark, dir, thrNllE9PerToken = Long.MaxValue)
        .filter($"doc_id" === 1L).select($"nll_e9").as[Long].head()
      def keptAt(thr: Long) =
        Perplexity.score(spark, dir, thrNllE9PerToken = thr)
          .filter($"doc_id" === 1L).select($"ppl_keep").as[Boolean].head()
      assert(keptAt(nll))      // <= is inclusive
      assert(!keptAt(nll - 1)) // one integer unit below: dropped
    } finally cleanup(dir)
  }

  private def cleanup(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)); ()
  }
}
