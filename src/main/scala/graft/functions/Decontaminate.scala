package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Benchmark decontamination — the n-gram overlap check run before
  * training: does any training document contain a long n-gram that
  * also appears in a held-out evaluation set? (The classic 8-13-gram
  * exact-substring test; complements [[Sampling.splitLeakage]], which
  * flags NEAR-dup pairs straddling split boundaries — this one flags
  * verbatim eval text embedded inside training documents.)
  *
  * Shape, designed for the real asymmetry at 100 TB: the benchmark
  * side is an eval suite — thousands of documents, not billions — so
  * its distinct-gram set broadcasts; the training corpus explodes to
  * (doc, gram) rows, hash-joins against the broadcast set with NO
  * shuffle of the corpus, and aggregates per document (partial,
  * map-side). The corpus is touched once, streaming.
  *
  * Output: one row per CONTAMINATED training document with its
  * distinct n-gram count, the number shared with the benchmark, and
  * the ratio — the kill-list a pipeline feeds back into filtering.
  */
object Decontaminate {

  /** Distinct n-grams of the token array `t` (whitespace tokens of
    * lower-cased text), as a per-row array — the fused codegen
    * [[graft.plans.NGrams]] (distinct mode), byte-identical to the
    * interpreted `array_distinct(transform(...))` chain it replaced
    * (parity pinned in PropertySpec). */
  private def gramArray(n: Int) =
    graft.plans.ShingleExpression.ngrams(col("t"), n, distinct = true)

  /** Contamination report of `docs` (doc_id, text, source): training
    * docs = source <> benchSource, benchmark = source = benchSource. */
  def contaminationOf(docs: DataFrame, benchSource: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select($"doc_id", $"source", Dedup.tokens($"text").as("t"))
      .select($"doc_id", $"source", explode(gramArray(n)).as("g"))
    val bench = grams.filter($"source" === benchSource)
      .select($"g").distinct()
    val train = grams.filter($"source" =!= benchSource)
    train
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum(coalesce($"hit", lit(0))).cast("int").as("n_contaminated"))
      .filter($"n_contaminated" > 0)
      .select($"doc_id", $"n_grams", $"n_contaminated",
        round($"n_contaminated".cast("double") / $"n_grams", 6)
          .as("contamination_ratio"))
      .orderBy($"doc_id")
  }

  /** Gated query: source 'src0' plays the held-out benchmark. */
  def contamination(spark: SparkSession, sfDir: String,
      benchSource: String = "src0", n: Int = 8): DataFrame =
    contaminationOf(Tables.documents(spark, sfDir), benchSource, n)

  def contaminationSql(benchSource: String = "src0", n: Int = 8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |gr AS (
       |  SELECT DISTINCT doc_id, source, array_to_string(t[i:i+${n - 1}], ' ') AS g
       |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - ${n - 2})) AS i
       |        FROM toks)),
       |bench AS (SELECT DISTINCT g FROM gr WHERE source = ${Sql.lit(benchSource)}),
       |tr AS (SELECT doc_id, g FROM gr WHERE source <> ${Sql.lit(benchSource)}),
       |agg AS (
       |  SELECT tr.doc_id,
       |         CAST(COUNT(*) AS INTEGER) AS n_grams,
       |         CAST(COUNT(bench.g) AS INTEGER) AS n_contaminated
       |  FROM tr LEFT JOIN bench USING (g)
       |  GROUP BY 1)
       |SELECT doc_id, n_grams, n_contaminated,
       |       round(CAST(n_contaminated AS DOUBLE) / n_grams, 6) AS contamination_ratio
       |FROM agg
       |WHERE n_contaminated > 0
       |ORDER BY doc_id""".stripMargin

  // ---- Bloom-filter decontamination (fixed-memory eval side) ------------
  //
  // [[contaminationOf]] broadcasts the eval set's RAW distinct n-grams —
  // right for a benchmark suite (thousands of docs). When the held-out
  // side is itself corpus-sized (decontaminating against an entire prior
  // training run, or a customer's full blocklist), raw grams stop
  // fitting an executor broadcast. The Bloom path replaces them with an
  // m-bit filter: memory is FIXED at m/8 bytes regardless of eval-gram
  // count (size m ≈ grams·k/ln2 for the target FP rate; 2^33 bits = 1 GB
  // absorbs ~800M grams at k=7 with FP < 1%), the corpus side is still
  // touched once with no shuffle before the per-doc aggregate, and the
  // decision errs only toward FALSE POSITIVES — extra kill-list entries,
  // never missed contamination (the safe direction for this operator).
  //
  // Everything is engine-neutral integer math: the gram hash is the
  // md5-prefix [[Dedup.hash60]], bit positions are overflow-free
  // Kirsch–Mitzenmacher double hashing (see [[graft.plans.BloomContains]]),
  // so the DuckDB oracle rebuilds the identical filter as a distinct
  // position SET and replays every probe — false positives included —
  // making the gate hash-exact, not merely superset-consistent.

  /** (h1, h2) double-hash bases of gram hash `h` for an `m`-bit filter:
    * p_j = (h1 + j·h2) mod m. Mirrors BloomContains' codegen exactly. */
  private def hashBases(h: Column, m: Long): (Column, Column) =
    (h % lit(m), lit(1L) + shiftright(h, 20) % lit(m - 1L))

  /** Build the m-bit filter over `grams`' distinct values as bit words:
    * one shuffle of (position) longs, bit_or per word, ≤ m/64 rows back
    * to the driver — the build is distributed; only the finished bitmap
    * (m/8 bytes) ever sits in one place. */
  private[graft] def bloomBitmap(grams: DataFrame, numBits: Long,
      numHashes: Int): Array[Long] = {
    val spark = grams.sparkSession
    import spark.implicits._
    val (h1, h2) = hashBases(Dedup.hash60($"g"), numBits)
    val positions = grams.select($"g").distinct()
      .select(explode(array((0 until numHashes).map(j =>
        (h1 + lit(j.toLong) * h2) % lit(numBits)): _*)).as("p"))
    val words = positions
      .select(shiftright($"p", 6).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").as("bitv"))
      .groupBy($"w").agg(expr("bit_or(bitv)").as("word"))
      .as[(Long, Long)].collect()
    val arr = new Array[Long]((numBits / 64).toInt)
    words.foreach { case (w, word) => arr(w.toInt) = word }
    arr
  }

  /** Bloom-probed contamination report: per training doc, its distinct
    * gram count and how many grams the filter flags. Flags are a
    * SUPERSET of [[contaminationOf]]'s exact hits (never a miss); the
    * FP surplus is bounded by fill^k and replayed verbatim by the SQL
    * oracle. */
  def bloomContaminationOf(docs: DataFrame, benchSource: String, n: Int,
      numBits: Long, numHashes: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .select($"doc_id", $"source", Dedup.tokens($"text").as("t"))
      .select($"doc_id", $"source", explode(gramArray(n)).as("g"))
    val bitmap = bloomBitmap(grams.filter($"source" === benchSource),
      numBits, numHashes)
    val hit = graft.plans.BloomExpression.bloomContains(
      Dedup.hash60($"g"), typedLit(bitmap.toSeq), numBits, numHashes)
    grams.filter($"source" =!= benchSource)
      .select($"doc_id", hit.cast("int").as("hit"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum($"hit").cast("int").as("n_bloom_hits"))
      .filter($"n_bloom_hits" > 0)
      .select($"doc_id", $"n_grams", $"n_bloom_hits")
      .orderBy($"doc_id")
  }

  /** Gate defaults: m = 2^20 bits (128 KB — vastly oversized for the
    * sf eval sets, as a production filter would be), k = 7. */
  def bloomContamination(spark: SparkSession, sfDir: String,
      benchSource: String = "src0", n: Int = 8,
      numBits: Long = 1L << 20, numHashes: Int = 7): DataFrame =
    bloomContaminationOf(Tables.documents(spark, sfDir), benchSource, n,
      numBits, numHashes)

  /** Oracle: the filter's set bits as a DISTINCT position set (bit p is
    * set iff p is a position of some eval gram — definitionally the
    * bitmap), then a probe is a hit iff all k of its positions match. */
  def bloomContaminationSql(benchSource: String = "src0", n: Int = 8,
      numBits: Long = 1L << 20, numHashes: Int = 7): String = {
    val h = "CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)"
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |gr AS (
       |  SELECT DISTINCT doc_id, source, array_to_string(t[i:i+${n - 1}], ' ') AS g
       |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t) - ${n - 2})) AS i
       |        FROM toks)),
       |js AS (SELECT unnest(range(0, $numHashes)) AS j),
       |pos AS MATERIALIZED (
       |  SELECT DISTINCT (($h % $numBits) +
       |      j * (1 + (($h >> 20) % ${numBits - 1L}))) % $numBits AS p
       |  FROM (SELECT DISTINCT g FROM gr WHERE source = ${Sql.lit(benchSource)})
       |  CROSS JOIN js),
       |probes AS (
       |  SELECT doc_id, g,
       |         (($h % $numBits) +
       |          j * (1 + (($h >> 20) % ${numBits - 1L}))) % $numBits AS p
       |  FROM (SELECT doc_id, g FROM gr WHERE source <> ${Sql.lit(benchSource)})
       |  CROSS JOIN js),
       |hits AS (
       |  SELECT doc_id, g, (COUNT(pos.p) = $numHashes) AS hit
       |  FROM probes LEFT JOIN pos USING (p)
       |  GROUP BY doc_id, g),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_grams,
       |         CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS INTEGER) AS n_bloom_hits
       |  FROM hits GROUP BY 1)
       |SELECT doc_id, n_grams, n_bloom_hits
       |FROM agg WHERE n_bloom_hits > 0
       |ORDER BY doc_id""".stripMargin
  }

  // ---- Fuzzy (MinHash-LSH) decontamination ------------------------------
  //
  // [[contaminationOf]] catches VERBATIM benchmark text (shared exact
  // n-grams). Paraphrased or lightly-edited contamination — the kind
  // dataset cards actually worry about — shares few exact 8-grams but
  // keeps a high shingle-set Jaccard. This is the cross-set analog of
  // [[Dedup.minhashDupPairs]]: train docs whose Jaccard with ANY
  // benchmark doc clears the threshold, found through the SAME staged
  // LSH index ([[DedupStage.bandKeys]] / shingleDocs — built once per
  // corpus, shared with the whole dedup family), then exact-verified.
  //
  // Scale: the benchmark side of the band-bucket join is eval-suite-
  // sized (tiny vs. the corpus), so AQE broadcasts it and the corpus
  // band keys are scanned once with no self-join — cost is
  // O(corpus bands + collisions), the incremental-dedup shape, not the
  // within-corpus pair-mining shape. Recall is the band guarantee
  // (≥ 1-(1-j⁴)¹⁶, > 0.999 at j ≥ 0.8); precision is 1.0 (exact
  // verify). The oracle is the brute cross-set exact-Jaccard join —
  // valid for the same reason as [[Dedup.minhashDupSql]].

  /** Per-train-doc fuzzy contamination report: how many benchmark docs
    * it near-duplicates and the strongest match. Only contaminated
    * docs appear (the kill list a pipeline ships). */
  def fuzzyContamination(spark: SparkSession, sfDir: String,
      benchSource: String = "src0", minJac: Double = 0.8): DataFrame = {
    import spark.implicits._
    val side = Tables.documents(spark, sfDir)
      .select($"doc_id", ($"source" === benchSource).as("is_bench"))
    val bands = DedupStage.bandKeys(spark, sfDir).join(side, Seq("doc_id"))
    val bench = bands.filter($"is_bench")
    val train = bands.filter(!$"is_bench")
    val candidates = train.as("a").join(bench.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    Dedup.verifyPairsExact(candidates,
        DedupStage.shingleDocs(spark, sfDir), minJac)
      .groupBy($"doc_a")
      .agg(count(lit(1)).cast("int").as("n_bench_matches"),
        max($"jaccard").as("max_jaccard"))
      .select($"doc_a".as("doc_id"), $"n_bench_matches", $"max_jaccard")
      .orderBy($"doc_id")
  }

  def fuzzyContaminationSql(benchSource: String = "src0",
      minJac: Double = 0.8): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, source, unnest(list_distinct(
       |           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |            FOR i IN range(1, greatest(len(t) - 1, 1))])) AS shingle
       |  FROM toks),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle
       |  WHERE a.source <> ${Sql.lit(benchSource)}
       |    AND b.source = ${Sql.lit(benchSource)}
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |         round(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes s1 ON doc_a = s1.doc_id
       |  JOIN sizes s2 ON doc_b = s2.doc_id
       |  WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= $minJac)
       |SELECT doc_a AS doc_id,
       |       CAST(COUNT(*) AS INTEGER) AS n_bench_matches,
       |       MAX(jaccard) AS max_jaccard
       |FROM pairs
       |GROUP BY doc_a
       |ORDER BY doc_id""".stripMargin
}
