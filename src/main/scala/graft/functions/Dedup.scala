package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Document deduplication for training-data pipelines: exact
  * (hash-groupBy), exact n-gram Jaccard (sparse shingle join),
  * MinHash+LSH (shingle → minhash → band → bucket join → exact verify),
  * and SimHash (per-bit majority + banded hamming join).
  *
  * The reference's own dedup is the MD5-key load dedup (README.md:46-49,
  * A8 in SURVEY §2.4); everything beyond that is the scale path a 100 TB
  * corpus needs: near-dup detection without O(n²) comparisons.
  *
  * Everything is `functions._` column expressions (codegen'd, no UDFs):
  * token hashes via md5-prefix parsing (cross-engine reproducible — the
  * DuckDB oracle computes the identical 60-bit integers), minhash via
  * `array_min(transform(...))`, SimHash bit votes via 60 conditional
  * sums in one aggregate pass.
  *
  * Scale design:
  *  - exact dedup: one shuffle on the text hash; map-side partial agg.
  *  - n-gram Jaccard: the shingle self-join shuffles on shingle value —
  *    sparse (only co-occurring docs meet), but hot shingles fan out
  *    quadratically; [[hotShingleCap]] documents the mitigation used by
  *    the LSH path (prune shingles/buckets above a doc-frequency cap).
  *  - MinHash-LSH: cost is b bucket-joins instead of n²; bucket sizes
  *    are capped (skew guard) so no reducer sees a quadratic blowup.
  *  - SimHash: near-dup candidates via 4×15-bit band keys → equi-join,
  *    the standard way to find hamming-distance≤k pairs without n².
  */
object Dedup {

  /** Buckets/shingles seen in more than this many docs are dropped in
    * the LSH candidate stage — a hot shingle (stop-phrase) pairs every
    * doc containing it with every other, which is quadratic at corpus
    * scale and contributes no discriminative signal. */
  val hotShingleCap = 1000

  // ---- shared text primitives -------------------------------------------

  /** Whitespace tokens of lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct 3-token shingles (n-gram units for Jaccard/MinHash).
    * Guarded for <3 tokens: Spark's `sequence(1, 0)` counts DOWN
    * (auto-negative step), so the empty case must short-circuit. */
  def shingles(text: Column): Column = {
    val t = tokens(text)
    val grams = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
    array_distinct(when(size(t) < 3, lit(Array.empty[String])).otherwise(grams))
  }

  /** 60-bit token hash both engines can compute: parse the first 15 hex
    * chars of md5 — fits a signed 64-bit exactly, no overflow ambiguity.
    * (Spark `xxhash64` would be faster but has no DuckDB counterpart;
    * dedup choices favor cross-engine verifiability. At cluster scale
    * swap in xxhash64 — one-line change, same plan shape.) */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ---- exact dedup (A8) --------------------------------------------------

  /** Exact dedup by content hash: one row per distinct text with the
    * keeper (min doc_id) and copy count. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy(md5($"text").as("text_hash"))
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"text_hash")
  }

  val exactDedupSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id,
      |       COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY text_hash""".stripMargin

  // ---- exact n-gram Jaccard (sparse join, the brute-force truth) ---------

  /** (doc_id, shingle) posting list. */
  private def postings(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(shingles($"text")).as("shingle"))
  }

  /** All pairs with exact 3-gram Jaccard ≥ minJac, via the sparse
    * shingle self-join (only docs sharing a shingle ever meet). */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, minJac: Double = 0.5): DataFrame = {
    import spark.implicits._
    val sh = postings(spark, sfDir)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select($"doc_id", $"n".as("n_a")), $"doc_a" === $"doc_id").drop("doc_id")
      .join(sizes.select($"doc_id", $"n".as("n_b")), $"doc_b" === $"doc_id").drop("doc_id")
      .withColumn("jaccard", $"n_common" / ($"n_a" + $"n_b" - $"n_common"))
      .filter($"jaccard" >= minJac)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  def ngramJaccardSql(minJac: Double = 0.5): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |            FOR i IN range(1, greatest(len(t) - 1, 1))])) AS shingle
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |       round(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON doc_a = s1.doc_id
       |JOIN sizes s2 ON doc_b = s2.doc_id
       |WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= $minJac
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- MinHash + LSH -----------------------------------------------------

  val numHashes = 64
  val numBands = 16 // × 4 rows per band

  /** MinHash signature: k independent permutation-minima approximated by
    * k seeded hashes; sig[i] = min over shingles of xxhash64(shingle, i)
    * (fast, codegen'd; signatures never need oracle parity since LSH
    * candidates are re-verified with exact Jaccard). */
  def minhashSignature(shingleCol: Column): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))): _*)

  /** Near-duplicate pairs via banded MinHash-LSH, then EXACT Jaccard
    * verification of the candidates (so output precision is 1.0; recall
    * is the LSH band guarantee — ≥ 1-(1-j^4)^16, ≈ 1 for j ≥ 0.9).
    * Output is deterministic for a fixed corpus: seeds are constants. */
  def minhashDupPairs(spark: SparkSession, sfDir: String, minJac: Double = 0.9): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", shingles($"text").as("sh"))
      .filter(size($"sh") > 0)
    val sigs = docs.select($"doc_id", minhashSignature($"sh").as("sig"))
    // band keys: hash of each 4-slice of the signature
    val banded = sigs.select($"doc_id", posexplode(expr(
      s"transform(sequence(0, ${numBands - 1}), b -> hash(slice(sig, b * 4 + 1, 4)))")))
      .toDF("doc_id", "band_idx", "band_hash")
    // skew guard: drop pathological buckets before the self-join
    val bucketSizes = banded.groupBy($"band_idx", $"band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .filter($"bucket_n" > 1 && $"bucket_n" <= hotShingleCap)
    val active = banded.join(bucketSizes, Seq("band_idx", "band_hash"))
    val candidates = active.as("a").join(active.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verify on the (small) candidate set via per-pair array ops
    candidates
      .join(docs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")))
      .filter($"jaccard" >= minJac)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Oracle for the LSH pipeline: the exact ≥ 0.9 pairs. Valid because
    * the band construction has ~1 recall at j ≥ 0.9 AND the output is
    * deterministic on the fixed corpus (validated by check_oracle). */
  def minhashDupSql(minJac: Double = 0.9): String = ngramJaccardSql(minJac)

  // ---- SimHash -----------------------------------------------------------

  val simhashBits = 60 // md5-prefix parsing yields 60 cross-engine-safe bits

  /** Per-document 60-bit SimHash: frequency-weighted per-bit majority
    * vote over token hashes, folded back into one BIGINT. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .withColumn("h", hash60($"tok"))
    val votes = (0 until simhashBits).map(i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val bitsToLong = (0 until simhashBits).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
      .withColumn("simhash", bitsToLong)
      .select($"doc_id", $"simhash")
      .orderBy($"doc_id")
  }

  val simhashSql: String = {
    val votes = (0 until simhashBits).map(i =>
      s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n         ")
    val fold = (0 until simhashBits).map(i =>
      s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5(unnest(string_split_regex(trim(lower(text)), '\\s+'))), 1, 15)) AS BIGINT) AS h
       |  FROM documents),
       |votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id, CAST($fold AS BIGINT) AS simhash
       |FROM votes
       |ORDER BY doc_id""".stripMargin
  }
}
