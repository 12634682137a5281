package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic sampling and splitting — the data-mixing operators a
  * training pipeline runs after dedup/quality filtering: down-sample
  * over-represented strata, hold out validation/test slices, and do it
  * REPRODUCIBLY (the same row lands in the same split on every run, on
  * any cluster, regardless of partitioning).
  *
  * Spark's `sample()`/`randomSplit()` are seeded per-partition and not
  * stable under repartitioning — a recompute or layout change moves
  * rows between splits, which silently contaminates held-out data.
  * Content-hash bucketing fixes that: bucket = hash(key ⊕ salt) mod N
  * depends only on the ROW, so membership is a pure function of the
  * data. The hash is the engine's cross-engine [[Dedup.hash60]]
  * (md5-prefix), so DuckDB computes identical buckets and the oracle
  * verifies exact membership, not just rates.
  *
  * Scale: both operators are one narrow codegen'd filter/projection on
  * the scan — no shuffle, no state; the sampled output feeds directly
  * into downstream stages with pushdown intact.
  */
object Sampling {

  val buckets = 1000

  /** The verified-query mix: halve the dominant language, keep 80% of
    * the mid strata, everything else untouched — the classic
    * rebalancing move on this corpus's en-heavy distribution. */
  val defaultRates: Map[String, Double] = Map("en" -> 0.5, "zh" -> 0.8)

  /** Stable per-row bucket in [0, buckets): hash of (key, salt). The
    * salt decorrelates different sampling decisions over the same keys
    * (a row sampled INTO a 10% slice under one salt is independent of
    * its membership under another). */
  def bucket(key: Column, salt: String): Column =
    pmod(Dedup.hash60(concat_ws("|", key.cast("string"), lit(salt))),
      lit(buckets.toLong))

  def bucketSql(keyExpr: String, salt: String): String =
    s"CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || '|' || ${Sql.lit(salt)}), 1, 15)) AS BIGINT) % $buckets"

  /** Per-stratum deterministic down-sampling: keep `rate(lang)` of each
    * language's documents (the corpus-mixing move: cap the dominant
    * language, keep the tail). Unlisted strata keep everything. */
  def stratifiedSample(spark: SparkSession, sfDir: String,
      rates: Map[String, Double], salt: String = "mix_v1"): DataFrame = {
    import spark.implicits._
    // round, don't truncate: 0.29 * 1000 is 289.999… in doubles, and
    // toLong would silently keep one bucket too few
    val keepBuckets = rates.foldLeft(lit(buckets.toLong)) { case (acc, (lang, r)) =>
      when($"lang" === lang, lit(math.round(r * buckets))).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .filter(bucket($"doc_id", salt) < keepBuckets)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  def stratifiedSampleSql(rates: Map[String, Double], salt: String = "mix_v1"): String = {
    val cases = rates.map { case (lang, r) =>
      s"WHEN lang = '$lang' THEN ${math.round(r * buckets)}"
    }.mkString(" ")
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE ${bucketSql("doc_id", salt)} < (CASE $cases ELSE $buckets END)
       |ORDER BY doc_id""".stripMargin
  }

  /** Temperature-based mixture sampling (domain reweighting) — the
    * data-dependent step beyond [[stratifiedSample]]'s fixed rates:
    * target stratum shares ∝ n_l^(1/T), the standard move that caps a
    * dominant language while keeping the tail. Shipped at T = 2, where
    * the per-stratum keep rate normalizes to sqrt(n_min / n_l) — ON
    * PURPOSE: sqrt is correctly-rounded IEEE in every engine, so the
    * rate (and the integer bucket threshold derived from it) is
    * bit-identical in the DuckDB oracle, where an arbitrary-T pow()
    * would carry a 1-ulp libm caveat. The smallest stratum keeps 100%.
    *
    * Scale: stratum counts are a tiny aggregate broadcast back over
    * one corpus scan; membership is the same per-row hash-bucket
    * compare as every sampler here — no shuffle of the corpus, and
    * adding/removing other documents never flips a kept document. */
  def mixtureSample(spark: SparkSession, sfDir: String,
      salt: String = "mix_t2_v1"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
    val nMin = counts.agg(min($"n_l").as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("rate", sqrt($"n_min".cast("double") / $"n_l"))
      .withColumn("keep_buckets", round($"rate" * buckets).cast("long"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(bucket($"doc_id", salt) < $"keep_buckets")
      .select($"doc_id", $"lang", round($"rate", 6).as("rate"))
      .orderBy($"doc_id")
  }

  def mixtureSampleSql(salt: String = "mix_t2_v1"): String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
       |m AS (SELECT min(n_l) AS n_min FROM c),
       |r AS (SELECT lang, n_l,
       |             sqrt(CAST(n_min AS DOUBLE) / n_l) AS rate,
       |             CAST(round(sqrt(CAST(n_min AS DOUBLE) / n_l) * $buckets) AS BIGINT) AS keep_buckets
       |      FROM c CROSS JOIN m)
       |SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate
       |FROM documents d JOIN r USING (lang)
       |WHERE ${bucketSql("d.doc_id", salt)} < r.keep_buckets
       |ORDER BY d.doc_id""".stripMargin

  /** THE split-assignment function — the single definition every
    * consumer (the matrix report, the leakage gate, and their oracles
    * via [[splitAssignSql]]) must share: the decontamination report is
    * only meaningful if it labels documents with exactly the split the
    * pipeline ships. */
  def splitAssign(key: Column, valPct: Int, testPct: Int, salt: String): Column = {
    val b = bucket(key, salt)
    when(b < testPct * buckets / 100, "test")
      .when(b < (testPct + valPct) * buckets / 100, "val")
      .otherwise("train")
  }

  /** DuckDB twin of [[splitAssign]] — same thresholds, same hash. */
  def splitAssignSql(keyExpr: String, valPct: Int, testPct: Int, salt: String): String =
    s"""CASE WHEN ${bucketSql(keyExpr, salt)} < ${testPct * buckets / 100} THEN 'test'
       |     WHEN ${bucketSql(keyExpr, salt)} < ${(testPct + valPct) * buckets / 100} THEN 'val'
       |     ELSE 'train' END""".stripMargin

  /** Reproducible train/val/test assignment (98/1/1 by default), plus
    * the per-(lang, split) count matrix a pipeline reports before
    * training. Assignment is per-document content hash — adding or
    * removing OTHER documents never moves an existing document across
    * splits (the property random row-numbering schemes lack). */
  def trainValTest(spark: SparkSession, sfDir: String,
      valPct: Int = 1, testPct: Int = 1, salt: String = "split_v1"): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .withColumn("split", splitAssign($"doc_id", valPct, testPct, salt))
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang", $"split")
  }

  /** Decontamination report: near-duplicate pairs that STRADDLE splits
    * — a test document with a near-dup in train is leaked evaluation
    * data. Composes the staged near-dup pairs ([[DedupStage.pairs]],
    * built once per corpus) with the deterministic split assignment, so
    * the check costs one tiny join-free projection over the pairs
    * artifact. Empty result = clean split; every training pipeline
    * should gate on this before shipping a mix. */
  def splitLeakage(spark: SparkSession, sfDir: String, minJac: Double = 0.9,
      valPct: Int = 1, testPct: Int = 1, salt: String = "split_v1"): DataFrame = {
    import spark.implicits._
    DedupStage.pairs(spark, sfDir, minJac)
      .withColumn("split_a", splitAssign($"doc_a", valPct, testPct, salt))
      .withColumn("split_b", splitAssign($"doc_b", valPct, testPct, salt))
      .filter($"split_a" =!= $"split_b")
      .select($"doc_a", $"doc_b", $"jaccard", $"split_a", $"split_b")
      .orderBy($"doc_a", $"doc_b")
  }

  def splitLeakageSql(minJac: Double = 0.9, valPct: Int = 1, testPct: Int = 1,
      salt: String = "split_v1"): String = {
    s"""WITH pairs AS (${Dedup.ngramJaccardSql(minJac).replaceAll("(?s)\nORDER BY [^\n]*$", "")}),
       |labeled AS (
       |  SELECT doc_a, doc_b, jaccard,
       |         ${splitAssignSql("doc_a", valPct, testPct, salt)} AS split_a,
       |         ${splitAssignSql("doc_b", valPct, testPct, salt)} AS split_b
       |  FROM pairs)
       |SELECT doc_a, doc_b, jaccard, split_a, split_b
       |FROM labeled
       |WHERE split_a != split_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  def trainValTestSql(valPct: Int = 1, testPct: Int = 1,
      salt: String = "split_v1"): String =
    s"""SELECT lang,
       |       ${splitAssignSql("doc_id", valPct, testPct, salt)} AS split,
       |       COUNT(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM documents
       |GROUP BY 1, 2
       |ORDER BY lang, split""".stripMargin

  /** Seeded deterministic corpus shuffle + sharding — the training-order
    * writer: every document gets a content-derived pseudo-random rank
    * (hash of doc_id ⊕ seed), a shard assignment, and a position within
    * its shard. Reshuffling = change the seed; the order is a pure
    * function of (data, seed) — reproducible across runs, clusters, and
    * engines, unlike `orderBy(rand(seed))` which is partition-dependent.
    *
    * Scale: the hash is a narrow projection; the ONLY shuffle is the
    * partitionBy(shard) exchange — exactly the write-path shuffle a
    * sharded output needs anyway — and each shard numbers its rows
    * independently (no global row_number bottleneck). */
  def corpusShuffle(spark: SparkSession, sfDir: String,
      seed: String = "shuffle_v1", shards: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val h = Tables.documents(spark, sfDir)
      .select($"doc_id",
        Dedup.hash60(concat_ws("|", $"doc_id".cast("string"), lit(seed)))
          .as("shuffle_hash"))
      .withColumn("shard", pmod($"shuffle_hash", lit(shards.toLong)).cast("int"))
    val w = Window.partitionBy($"shard").orderBy($"shuffle_hash", $"doc_id")
    h.withColumn("pos_in_shard", row_number().over(w))
      .orderBy($"shard", $"pos_in_shard")
  }

  def corpusShuffleSql(seed: String = "shuffle_v1", shards: Int = 8): String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || ${Sql.lit(seed)}), 1, 15)) AS BIGINT) AS shuffle_hash
       |  FROM documents)
       |SELECT doc_id, shuffle_hash,
       |       CAST(shuffle_hash % $shards AS INTEGER) AS shard,
       |       CAST(row_number() OVER (PARTITION BY shuffle_hash % $shards
       |            ORDER BY shuffle_hash, doc_id) AS INTEGER) AS pos_in_shard
       |FROM h
       |ORDER BY shard, pos_in_shard""".stripMargin

  /** Duplication-aware sampling: keep each document with probability
    * 1/n_copies, where n_copies is its EXACT-duplicate multiplicity
    * (content-hash group size) — so every duplicate cluster survives
    * with ~1 expected copy and the sampled corpus approaches the
    * deduplicated token distribution WITHOUT dropping any cluster
    * outright (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL'22 motivates the downweighting; this is its
    * sampling form). Unique documents (n_copies = 1) always survive.
    *
    * Determinism: the coin is a keyed PRF u = hash60(doc_id|salt) ∈
    * [0, 2^60), kept iff u ≤ (2^60−1) div n_copies — pure INTEGER
    * arithmetic, so both engines make bit-identical decisions (same
    * discipline as [[trainValTest]]'s split PRF; no float thresholds).
    *
    * Scale: one groupBy on the content hash (the dedup shuffle the
    * pipeline pays anyway) + an output-sized hash join back to docs;
    * the PRF and threshold are narrow projections. The same algebra
    * runs over near-dup CLUSTER sizes by substituting
    * [[DedupStage.clusters]] group sizes for the hash groups. */
  def dupWeightedSample(spark: SparkSession, sfDir: String,
      salt: String = "dupw_v1"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", md5($"text").as("text_hash"))
    val copies = docs.groupBy($"text_hash")
      .agg(count(lit(1)).as("n_copies"))
    docs.join(copies, "text_hash")
      .withColumn("u", Dedup.hash60(concat_ws("|", $"doc_id".cast("string"), lit(salt))))
      .select($"doc_id", $"source", $"n_copies",
        ($"u" <= expr("CAST(1152921504606846975 AS BIGINT) div n_copies"))
          .as("kept"))
      .orderBy($"doc_id")
  }

  def dupWeightedSampleSql(salt: String = "dupw_v1"): String =
    s"""WITH copies AS (
       |  SELECT md5(text) AS text_hash, COUNT(*) AS n_copies
       |  FROM documents GROUP BY 1),
       |d AS (
       |  SELECT doc_id, source, md5(text) AS text_hash,
       |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || ${Sql.lit(salt)}), 1, 15)) AS BIGINT) AS u
       |  FROM documents)
       |SELECT d.doc_id, d.source, c.n_copies,
       |       d.u <= 1152921504606846975 // c.n_copies AS kept
       |FROM d JOIN copies c ON d.text_hash = c.text_hash
       |ORDER BY d.doc_id""".stripMargin

  /** Mixture BUDGET solver — the deployment step after a mixing policy
    * picks weights: given a token budget B, allocate tokens per source
    * under temperature-smoothed weights w_s ∝ √tokens_s (the α = 0.5
    * multilingual-sampling standard, Conneau & Lample's XLM recipe)
    * and report the implied EPOCH count per source — epochs > 1 means
    * the plan repeats that source, the number a pipeline owner checks
    * against repetition-harm budgets.
    *
    * Exactness: √t is the ONE transcendental-free float op — IEEE-754
    * guarantees sqrt correctly rounded in both engines (unlike pow/ln,
    * the ulp-drift family the ADVICE-r7 fix banned from gates) — and
    * it is quantized immediately (s_e3 = floor(√t·1e3) BIGINT); the
    * weight/allocation/epoch chain is then pure integer floor-div.
    * e3 keeps every product under 2^63 far past soak scale.
    *
    * Scale: one corpus scan to per-source token sums (map-side
    * combined), then |sources|-row arithmetic against a broadcast
    * 1-row total. */
  def mixtureBudget(spark: SparkSession, sfDir: String,
      budgetTokens: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, sfDir)
      .groupBy($"source")
      .agg(sum(size(split(trim(lower($"text")), "\\s+"))).cast("long").as("n_tokens"))
      .withColumn("s_e3", floor(sqrt($"n_tokens".cast("double")) * 1e3).cast("long"))
    val tot = tok.agg(sum($"s_e3").cast("long").as("tot"))
    // weight_e9 reaches 1e9 and realistic budgets reach 1e11–1e13
    // tokens, so the products overflow BIGINT — route them through
    // decimal(38,0) (the zipfSlope/HLL 128-bit discipline; HUGEINT in
    // the oracle), floor-div back to BIGINT.
    tok.crossJoin(broadcast(tot))
      .select($"source", $"n_tokens",
        expr("s_e3 * 1000000000 div tot").as("weight_e9"))
      .withColumn("alloc_tokens",
        expr(s"cast((cast(weight_e9 as decimal(38,0)) * $budgetTokens)" +
          " div 1000000000 as bigint)"))
      .withColumn("epochs_e6",
        expr("cast((cast(alloc_tokens as decimal(38,0)) * 1000000)" +
          " div n_tokens as bigint)"))
      .orderBy($"source")
  }

  def mixtureBudgetSql(budgetTokens: Long = 1000000L): String =
    s"""WITH tok AS (
       |  SELECT source,
       |         CAST(SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |s AS (
       |  SELECT source, n_tokens,
       |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e3) AS BIGINT) AS s_e3
       |  FROM tok),
       |t AS (SELECT CAST(SUM(s_e3) AS BIGINT) AS tot FROM s),
       |w AS (
       |  SELECT source, n_tokens,
       |         s_e3 * 1000000000 // tot AS weight_e9
       |  FROM s, t),
       |a AS (
       |  SELECT source, n_tokens, weight_e9,
       |         CAST(CAST(weight_e9 AS HUGEINT) * $budgetTokens // 1000000000 AS BIGINT) AS alloc_tokens
       |  FROM w)
       |SELECT source, n_tokens, weight_e9, alloc_tokens,
       |       CAST(CAST(alloc_tokens AS HUGEINT) * 1000000 // n_tokens AS BIGINT) AS epochs_e6
       |FROM a
       |ORDER BY source""".stripMargin

  /** Curriculum interleave — the training-order writer for curriculum
    * learning (Bengio et al., ICML'09): documents are banded by quality
    * score (fixed 0.75/0.5/0.25 edges on the 6-dp score, easy/high-
    * quality = band 0 first), sharded by a seeded PRF, and within each
    * shard the bands are round-robin interleaved: position
    * (rank_in_band − 1)·4 + band, so every 4-position window of a
    * shard mixes all quality bands while band-0 content still leads.
    * Reshuffle = change the seed, as [[corpusShuffle]].
    *
    * Scale: NO global window — rank is per (shard, band), bounded by
    * corpus/(shards·4) rows, and the only shuffle is the shard
    * exchange the sharded writer needs anyway. Fixed score edges (not
    * data-driven quantiles) are deliberate: banding stays a narrow
    * projection with no rank pass; when data-driven edges are wanted,
    * feed [[globalPercentRank]] output in as the score. Positions
    * within a shard are unique (disjoint mod-4 classes per band) and
    * strictly ordered but NOT consecutive — readers order by position,
    * gaps are harmless. */
  def curriculum(spark: SparkSession, sfDir: String,
      seed: String = "curr_v1", shards: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val q = graft.functions.TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val banded = q.withColumn("band",
        when($"quality_score" >= 0.75, 0)
          .when($"quality_score" >= 0.5, 1)
          .when($"quality_score" >= 0.25, 2)
          .otherwise(3))
      .withColumn("h",
        Dedup.hash60(concat_ws("|", $"doc_id".cast("string"), lit(seed))))
      .withColumn("shard", pmod($"h", lit(shards.toLong)).cast("int"))
    val w = Window.partitionBy($"shard", $"band").orderBy($"h", $"doc_id")
    banded
      .withColumn("pos_in_shard", (row_number().over(w) - 1) * 4 + $"band")
      .select($"doc_id", $"quality_score", $"band", $"shard", $"pos_in_shard")
      .orderBy($"shard", $"pos_in_shard")
  }

  def curriculumSql(seed: String = "curr_v1", shards: Int = 8): String =
    s"""WITH qs AS (${graft.functions.TextAnalysis.qualityScoreSql}),
       |banded AS (
       |  SELECT doc_id, quality_score,
       |         CASE WHEN quality_score >= 0.75 THEN 0
       |              WHEN quality_score >= 0.5 THEN 1
       |              WHEN quality_score >= 0.25 THEN 2
       |              ELSE 3 END AS band,
       |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || ${Sql.lit(seed)}), 1, 15)) AS BIGINT) AS h
       |  FROM qs)
       |SELECT doc_id, quality_score, band,
       |       CAST(h % $shards AS INTEGER) AS shard,
       |       (CAST(row_number() OVER (PARTITION BY h % $shards, band
       |              ORDER BY h, doc_id) AS INTEGER) - 1) * 4 + band
       |         AS pos_in_shard
       |FROM banded
       |ORDER BY shard, pos_in_shard""".stripMargin

  /** Leakage-free split CONSTRUCTOR — the fix for what [[splitLeakage]]
    * reports: assignment keys on the document's near-dup CLUSTER
    * KEEPER, not the document itself, so every member of a duplicate
    * cluster lands in the same split and train/test contamination via
    * near-dups is impossible BY CONSTRUCTION (asserted over the staged
    * pairs in SamplingSpec — the leakage report over this split is
    * empty). Unclustered documents key on themselves, which preserves
    * the per-document stability contract of [[trainValTest]]: adding
    * or removing other documents never moves an existing singleton.
    *
    * Scale: one broadcast join against the (tiny) cluster artifact +
    * the same pure-function hash assignment — zero corpus shuffles. */
  def clusterSplit(spark: SparkSession, sfDir: String, minJac: Double = 0.9,
      valPct: Int = 1, testPct: Int = 1, salt: String = "split_v1"): DataFrame = {
    import spark.implicits._
    val keepers = DedupStage.clusters(spark, sfDir, minJac)
    Tables.documents(spark, sfDir)
      .select($"doc_id")
      .join(broadcast(keepers), Seq("doc_id"), "left")
      .withColumn("rep", coalesce($"cluster_keeper", $"doc_id"))
      .withColumn("split", splitAssign($"rep", valPct, testPct, salt))
      .select($"doc_id", $"rep", $"split")
      .orderBy($"doc_id")
  }

  def clusterSplitSql(minJac: Double = 0.9, valPct: Int = 1, testPct: Int = 1,
      salt: String = "split_v1"): String =
    s"""WITH RECURSIVE pairs AS (${Dedup.ngramJaccardSql(minJac).replaceAll("(?s)\nORDER BY [^\n]*$$", "")}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach AS (
       |  SELECT doc_id, doc_id AS reach FROM nodes
       |  UNION
       |  SELECT r.doc_id, e.dst
       |  FROM reach r JOIN edges e ON e.src = r.reach),
       |keepers AS (
       |  SELECT doc_id, min(reach) AS cluster_keeper
       |  FROM reach GROUP BY 1),
       |labeled AS (
       |  SELECT d.doc_id, coalesce(k.cluster_keeper, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN keepers k ON d.doc_id = k.doc_id)
       |SELECT doc_id, rep,
       |       ${splitAssignSql("rep", valPct, testPct, salt)} AS split
       |FROM labeled
       |ORDER BY doc_id""".stripMargin

  // ---- temperature-based domain mixing -----------------------------------

  /** Sampling-temperature rebalancing (the multilingual/multi-domain
    * mixing rule of mBERT/XLM-R/mT5: draw from domain s with
    * probability ∝ n_s^α, α < 1 flattening the head): realized as a
    * deterministic per-domain keep-rate r_s = (n_s / n_min)^(α−1), so
    * the SMALLEST domain keeps everything and a domain k× larger keeps
    * k^(α−1) of its rows — surviving counts scale as n_s^α up to the
    * shared constant. Rates are derived IN-PLAN from the domain counts
    * (tiny aggregate broadcast back over a second scan — the
    * quality-gate shape, no driver collect), membership is the
    * [[bucket]] content-hash, so the whole mix is a pure function of
    * (corpus, α, salt): recompute-stable, engine-reproducible,
    * oracle-gated on exact membership.
    *
    * At 100 TB: one |domains|-sized aggregate + one scan-level filter —
    * zero corpus shuffles, pushdown intact. */
  def temperatureMix(spark: SparkSession, sfDir: String,
      alpha: Double = 0.5, salt: String = "tempmix_v1"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n_lang"))
    val minN = counts.agg(min($"n_lang").as("n_min"))
    val rates = counts.crossJoin(minN)
      .select($"lang",
        round(pow($"n_lang".cast("double") / $"n_min", lit(alpha - 1))
          * buckets).cast("long").as("keep_buckets"))
    docs.join(broadcast(rates), "lang")
      .filter(bucket($"doc_id", salt) < $"keep_buckets")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  def temperatureMixSql(alpha: Double = 0.5, salt: String = "tempmix_v1"): String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1),
       |m AS (SELECT min(n_lang) AS n_min FROM c),
       |r AS (
       |  SELECT lang,
       |         CAST(round(pow(CAST(n_lang AS DOUBLE) / n_min, ${alpha - 1})
       |                    * $buckets) AS BIGINT) AS keep_buckets
       |  FROM c, m)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars
       |FROM documents d JOIN r ON d.lang = r.lang
       |WHERE ${bucketSql("d.doc_id", salt)} < r.keep_buckets
       |ORDER BY d.doc_id""".stripMargin

  // ---- weighted sampling (A-ES priorities) -------------------------------

  /** Weight-proportional sampling without replacement — Efraimidis &
    * Spirakis (2006) "Weighted random sampling with a reservoir": give
    * every row priority u^(1/w) for uniform u and weight w, take the k
    * largest. Selection probability is proportional to weight, the
    * sample is without replacement, and — the property that makes this
    * THE distributed shape — the k largest priorities commute with any
    * partitioning: each partition keeps its local top-k, the driver
    * merges (here Spark's TakeOrderedAndProject does exactly that).
    * A training pipeline uses it to sample documents proportional to
    * length/quality without a full sort or a sequential pass.
    *
    * Same reproducibility contract as every sampler here: u is not a
    * seeded RNG but the md5 content hash ([[bucket]] discipline), so
    * membership is a pure function of (doc_id, salt) — stable under
    * recompute, repartition, and engine (the DuckDB oracle recomputes
    * identical priorities). The only cross-engine hazard is two
    * priorities within one ulp of each other flipping order under
    * libm pow differences — with 60-bit uniforms the probability is
    * vanishing, and doc_id breaks exact ties.
    */
  def weightedSample(spark: SparkSession, sfDir: String, k: Int = 100,
      salt: String = "wsample_v1"): DataFrame = {
    import spark.implicits._
    val u = (Dedup.hash60(concat_ws("|", $"doc_id".cast("string"), lit(salt)))
      .cast("double") + lit(0.5)) / lit(math.pow(2, 60))
    Tables.documents(spark, sfDir)
      .filter($"n_chars" > 0)
      .withColumn("pri", pow(u, lit(1.0) / $"n_chars".cast("double")))
      .orderBy($"pri".desc, $"doc_id") // TakeOrderedAndProject with limit
      .limit(k)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  def weightedSampleSql(k: Int = 100, salt: String = "wsample_v1"): String = {
    val h = s"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || ${Sql.lit(salt)}), 1, 15)) AS BIGINT)"
    s"""SELECT doc_id, lang, source, n_chars FROM (
       |  SELECT doc_id, lang, source, n_chars
       |  FROM documents
       |  WHERE n_chars > 0
       |  ORDER BY pow(($h + 0.5) / 1152921504606846976.0,
       |               1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id
       |  LIMIT $k)
       |ORDER BY doc_id""".stripMargin
  }

  /** Token-budget corpus selection — the data-mixing step that turns
    * "use the best N tokens per source" into a deterministic set: rank
    * each source's documents by quality (ties broken by doc_id for a
    * total order), walk down the ranking accumulating token counts,
    * keep every document whose INCLUSIVE running total fits the
    * per-source budget. Quality and token counts reuse the gated
    * scoring/counting operators, so the whole selection is a pure
    * function of the corpus.
    *
    * Scale: one source-keyed shuffle for the ranking window; per-task
    * window state is a running LONG. The cumulative walk is per
    * SOURCE, so sources parallelize; a skew-heavy source is the same
    * hot-window shape as sequence packing and shards the same way
    * (coarse pre-buckets, carried boundary). */
  def tokenBudget(spark: SparkSession, sfDir: String,
      budgetPerSource: Long = 20000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokenCounts(spark, sfDir)
      .select($"doc_id", $"ws_tokens")
    val qual = TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"source")
      .join(toks, Seq("doc_id")).join(qual, Seq("doc_id"))
    val w = Window.partitionBy($"source")
      .orderBy($"quality_score".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum_tokens", sum($"ws_tokens").over(w))
      .filter($"cum_tokens" <= budgetPerSource)
      .select($"doc_id", $"source", $"ws_tokens", $"cum_tokens")
      .orderBy($"doc_id")
  }

  def tokenBudgetSql(budgetPerSource: Long = 20000L): String =
    s"""WITH toks AS (
       |  SELECT doc_id, len(string_split_regex(trim(lower(text)), '\\s+'))
       |           AS ws_tokens
       |  FROM documents),
       |q AS (SELECT doc_id, quality_score
       |      FROM (${TextAnalysis.qualityScoreSql})),
       |ranked AS (
       |  SELECT d.doc_id, d.source, t.ws_tokens,
       |         SUM(t.ws_tokens) OVER (
       |           PARTITION BY d.source
       |           ORDER BY q.quality_score DESC, d.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS cum_tokens
       |  FROM documents d
       |  JOIN toks t ON t.doc_id = d.doc_id
       |  JOIN q ON q.doc_id = d.doc_id)
       |SELECT doc_id, source, CAST(ws_tokens AS INT) AS ws_tokens,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM ranked
       |WHERE cum_tokens <= $budgetPerSource
       |ORDER BY doc_id""".stripMargin

  /** Quota sampling — eval-set construction: exactly `quota` documents
    * per (lang, source) cell (fewer when the cell is smaller), chosen
    * by deterministic md5 priority so membership survives reruns and
    * corpus appends that don't touch the winners. The per-cell
    * row_number window runs over cell-sized partitions (one keyed
    * shuffle); priorities are a narrow projection. */
  def quotaSample(spark: SparkSession, sfDir: String, quota: Int = 20,
      salt: String = "quota_v1"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pri = md5(concat_ws("|", $"doc_id".cast("string"), lit(salt)))
    val w = Window.partitionBy($"lang", $"source").orderBy($"pri", $"doc_id")
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source", pri.as("pri"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= quota)
      .select($"doc_id", $"lang", $"source", $"rk")
      .orderBy($"doc_id")
  }

  /** Quantile normalization — cross-source score calibration. Raw
    * quality scores are not comparable across sources (different length
    * and register distributions), so mixing decisions use each
    * document's PERCENTILE within its source instead. percent_rank over
    * a total order (score, doc_id) is a pure integer ratio — identical
    * cross-engine with no float discipline needed; the global
    * percentile rides along so the query also exposes the calibration
    * gap (how much a source's internal ranking disagrees with the
    * corpus-wide one). One source-keyed shuffle for the in-source
    * percentile; the global percentile is [[globalPercentRank]]'s
    * two-pass range-partitioned rank — no unpartitioned window ever
    * sees corpus-sized input. */
  def quantileNorm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scores = TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"quality_score")
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"source"),
        Seq("doc_id"))
    val bySource = Window.partitionBy($"source")
      .orderBy($"quality_score", $"doc_id")
    // two-pass rank FIRST (its pass-1 scans recompute their input, so
    // feed it the raw score table, not the windowed one), per-source
    // percentile after
    globalPercentRank(scores, "quality_score", "doc_id", "pct_global")
      .withColumn("pct_in_source", percent_rank().over(bySource))
      .select($"doc_id", $"source", $"quality_score",
        $"pct_in_source", $"pct_global")
      .orderBy($"doc_id")
  }

  /** Distributed global `percent_rank() OVER (ORDER BY score, id)` —
    * the two-pass range-partitioned rank (VERDICT r6 #1; replaces the
    * single-partition window the contract comment used to promise).
    *
    * Pass 1: bucket every row by its score against `rankBuckets−1`
    * approximate quantile split points (one Greenwald–Khanna scan;
    * bucketing on the score VALUE keeps ties together and makes bucket
    * order = score order by construction), then count each bucket —
    * the driver holds ≤ `rankBuckets` (bucket, count) rows, from which
    * exact prefix-sum offsets and the total `n` fall out. Pass 2: rank
    * locally inside each bucket-keyed window (~n/B rows per partition;
    * split-point skew only ever degrades balance, never correctness)
    * and add the broadcast offset. `idCol` must be unique and
    * `scoreCol` non-null, so the order is total, rank == row_number,
    * and percent_rank == (row_number−1)/(n−1) — the same integer
    * ratio the single-window form produces, bit-for-bit (pinned in
    * GlobalRankSpec), so the DuckDB oracle gates this path unchanged.
    *
    * DETERMINISM CONTRACT (alongside non-null score / unique id): the
    * three passes (quantile sketch, bucket counts, final rank job)
    * each recompute `df`'s lineage, so the input must be deterministic
    * across recomputations — no rand/sample/input_file-dependent
    * expressions upstream. A nondeterministic frame would get offsets
    * inconsistent with the ranked rows; `localCheckpoint` such a frame
    * first (the Dsir.gramBuckets pattern). All registered callers feed
    * parquet-derived deterministic frames. */
  def globalPercentRank(df: DataFrame, scoreCol: String, idCol: String,
      outCol: String, rankBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val probs = (1 until rankBuckets).map(_.toDouble / rankBuckets).toArray
    val bounds =
      if (rankBuckets <= 1) Array.empty[Double]
      else df.stat.approxQuantile(scoreCol, probs, 0.001).distinct.sorted
    val bucket =
      if (bounds.isEmpty) lit(0)
      else size(filter(array(bounds.toSeq.map(lit(_)): _*),
        b => col(scoreCol) >= b))
    val bucketed = df.withColumn("__rank_bucket", bucket)
    val counts = bucketed.groupBy(col("__rank_bucket")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.iterator.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (b, c) => val o = (b, acc); acc += c; o }
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__rank_bucket", "__rank_off")
    val local = Window.partitionBy(col("__rank_bucket"))
      .orderBy(col(scoreCol), col(idCol))
    bucketed
      .withColumn("__lrk", row_number().over(local))
      .join(broadcast(offDf), Seq("__rank_bucket"))
      .withColumn(outCol,
        if (n <= 1L) lit(0.0)
        else (col("__rank_off") + col("__lrk") - 1).cast("double") /
          lit((n - 1).toDouble))
      .drop("__rank_bucket", "__lrk", "__rank_off")
  }

  /** Single-window reference form of the global percentile — kept ONLY
    * for GlobalRankSpec's differential gate (the two-pass rank must
    * reproduce it bit-for-bit). Not on any registered query path: the
    * empty partition spec funnels the whole frame through one task. */
  private[graft] def globalPercentRankWindow(df: DataFrame, scoreCol: String,
      idCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn(outCol,
      percent_rank().over(Window.orderBy(col(scoreCol), col(idCol))))
  }

  val quantileNormSql: String =
    s"""WITH q AS (SELECT doc_id, quality_score
       |           FROM (${TextAnalysis.qualityScoreSql})),
       |s AS (
       |  SELECT q.doc_id, d.source, q.quality_score
       |  FROM q JOIN documents d ON d.doc_id = q.doc_id)
       |SELECT doc_id, source, quality_score,
       |       percent_rank() OVER (PARTITION BY source
       |                            ORDER BY quality_score, doc_id)
       |         AS pct_in_source,
       |       percent_rank() OVER (ORDER BY quality_score, doc_id)
       |         AS pct_global
       |FROM s
       |ORDER BY doc_id""".stripMargin

  def quotaSampleSql(quota: Int = 20, salt: String = "quota_v1"): String =
    s"""SELECT doc_id, lang, source, rk FROM (
       |  SELECT doc_id, lang, source,
       |         CAST(row_number() OVER (
       |           PARTITION BY lang, source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || ${Sql.lit(salt)}),
       |                    doc_id) AS INT) AS rk
       |  FROM documents)
       |WHERE rk <= $quota
       |ORDER BY doc_id""".stripMargin

  // ---- effective sample size of the weighted design -----------------------

  /** Kish effective sample size of the length-weighted sampling design
    * ([[weightedSample]]'s w = n_chars): ESS = (Σw)² / Σw² — how many
    * EQUAL-weight records the weighted corpus is statistically worth.
    * A pipeline reports this before trusting any estimate computed
    * under the weights: a heavy-tailed length distribution can make a
    * billion-document corpus behave like a few million (ess_ratio ≪ 1
    * is the warning). Σw and Σw² are exact BIGINTs; the ESS is one
    * IEEE multiply + one divide on exactly-converted doubles. (Σw²
    * passes int64 around 10¹⁹ weight-squared mass — ~10¹¹ docs at
    * n_chars ≈ 10⁴ — where the sum moves to DECIMAL(38,0); the gate
    * pins today's BIGINT path.) One combiner aggregate, one row out. */
  def sampleEss(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter($"n_chars" > 0)
      .agg(count(lit(1)).as("n"),
        sum($"n_chars").as("sum_w"),
        sum($"n_chars" * $"n_chars").as("sum_w2"))
      .select($"n", $"sum_w", $"sum_w2",
        ($"sum_w".cast("double") * $"sum_w".cast("double") /
          $"sum_w2".cast("double")).as("ess"),
        ($"sum_w".cast("double") * $"sum_w".cast("double") /
          $"sum_w2".cast("double") / $"n".cast("double")).as("ess_ratio"))
  }

  val sampleEssSql: String =
    """SELECT n, sum_w, sum_w2,
      |       CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
      |         / CAST(sum_w2 AS DOUBLE) AS ess,
      |       CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
      |         / CAST(sum_w2 AS DOUBLE) / CAST(n AS DOUBLE) AS ess_ratio
      |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |             CAST(SUM(n_chars) AS BIGINT) AS sum_w,
      |             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_w2
      |      FROM documents WHERE n_chars > 0)""".stripMargin

  // ---- deterministic bootstrap confidence interval ------------------------

  /** Poisson(1) CDF grid F(0)…F(16) — the per-resample multiplicity
    * law of the Poisson bootstrap (each record enters each resample
    * w ~ Poisson(1) times, the streaming-friendly bootstrap that needs
    * no global n). Truncation at 17 discards ~1e-15 mass — below any
    * per-record probability that matters, and in any case BOTH engines
    * share the same grid literals, so the mechanism is exact however
    * it is truncated (the [[Pii.DpCdf]] replay discipline). */
  private[graft] val PoissonCdf: Array[Double] = {
    var p = math.exp(-1.0)
    var acc = p
    (0 to 16).map { k =>
      if (k > 0) { p = p / k; acc += p }; acc
    }.toArray
  }

  /** Bootstrap confidence interval for the corpus mean document length
    * — deterministic Poisson bootstrap: record r's multiplicity in
    * resample b is the inverse-CDF of a salted md5-uniform over
    * (r, b), so the "random" resamples are a pure function of the data
    * (reruns and stragglers can't disagree, and the DuckDB oracle
    * replays them exactly). `b` resample means — each an exact-integer
    * Σw·x / Σw with ONE IEEE division — then percentile_cont bounds at
    * 2.5/97.5 %, interpolating identical doubles identically in both
    * engines (the q_duration_percentiles precedent).
    *
    * Scale: ONE corpus pass with a b-wide explode into a
    * combiner-reduced b-row aggregate — no per-resample scans, no
    * driver data; b is a constant, so this is O(b·n) map work and a
    * b-row exchange at any corpus size. */
  def bootstrapCi(spark: SparkSession, sfDir: String, b: Int = 32,
      salt: String = "boot_v1"): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"n_chars")
    val u = Dedup.hash60(concat_ws("|", $"doc_id".cast("string"),
      $"bi".cast("string"), lit(salt))).cast("double") /
      lit(1152921504606846976L).cast("double")
    // w = #{thresholds ≤ u} as a chained CASE over the ascending grid,
    // NOT an array-filter HOF: the lambda form runs interpreted and
    // inlines (so re-evaluates) the md5 subtree once PER GRID ELEMENT —
    // measured 17× the hash work and α 0.87 at the ×64 soak; the CASE
    // stays inside whole-stage codegen with the md5 as one eliminated
    // common subexpression (270 s → ~25 s at ×64)
    val w = PoissonCdf.zipWithIndex.foldRight(
        lit(PoissonCdf.length.toLong): Column) { case ((t, i), acc) =>
      when(u < t, i.toLong).otherwise(acc)
    }
    val means = docs
      .select($"doc_id", $"n_chars",
        explode(sequence(lit(1), lit(b))).as("bi"))
      .select($"bi", $"n_chars", w.as("w"))
      .groupBy($"bi")
      .agg(sum($"w" * $"n_chars").as("sx"), sum($"w").as("sw"))
      .filter($"sw" > 0)
      .select(($"sx".cast("double") / $"sw".cast("double")).as("mean_b"))
    val base = docs.agg(count(lit(1)).as("n"), sum($"n_chars").as("sx"))
      .select($"n",
        ($"sx".cast("double") / $"n".cast("double")).as("mean_chars"))
    means
      .agg(expr("percentile_cont(0.025) WITHIN GROUP (ORDER BY mean_b)")
          .as("ci_lo"),
        expr("percentile_cont(0.975) WITHIN GROUP (ORDER BY mean_b)")
          .as("ci_hi"))
      .crossJoin(base)
      .select($"n", lit(b).as("b"), $"mean_chars", $"ci_lo", $"ci_hi")
  }

  def bootstrapCiSql(b: Int = 32, salt: String = "boot_v1"): String = {
    val cases = PoissonCdf.zipWithIndex
      .map { case (t, i) => s"WHEN u < $t THEN $i" }
      .mkString("\n           ")
    s"""WITH d AS (SELECT doc_id, n_chars FROM documents),
       |r AS (SELECT doc_id, n_chars, UNNEST(range(1, ${b + 1})) AS bi FROM d),
       |withu AS (
       |  SELECT bi, n_chars,
       |         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
       |             || '|' || CAST(bi AS VARCHAR) || '|' || ${Sql.lit(salt)}),
       |             1, 15)) AS BIGINT) AS DOUBLE)
       |           / CAST(1152921504606846976 AS DOUBLE) AS u
       |  FROM r),
       |weighted AS (
       |  SELECT bi, n_chars,
       |         CAST(CASE $cases
       |              ELSE ${PoissonCdf.length} END AS BIGINT) AS w
       |  FROM withu),
       |m AS (SELECT bi, CAST(SUM(w * n_chars) AS BIGINT) AS sx,
       |             CAST(SUM(w) AS BIGINT) AS sw
       |      FROM weighted GROUP BY 1),
       |mb AS (SELECT CAST(sx AS DOUBLE) / CAST(sw AS DOUBLE) AS mean_b
       |       FROM m WHERE sw > 0),
       |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |                CAST(SUM(n_chars) AS BIGINT) AS sx FROM d)
       |SELECT base.n, CAST($b AS INTEGER) AS b,
       |       CAST(base.sx AS DOUBLE) / CAST(base.n AS DOUBLE) AS mean_chars,
       |       (SELECT percentile_cont(0.025) WITHIN GROUP (ORDER BY mean_b)
       |        FROM mb) AS ci_lo,
       |       (SELECT percentile_cont(0.975) WITHIN GROUP (ORDER BY mean_b)
       |        FROM mb) AS ci_hi
       |FROM base""".stripMargin
  }
}
