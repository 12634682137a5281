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
  * No UDFs anywhere: oracle-facing hashes use md5-prefix parsing
  * (cross-engine reproducible — DuckDB computes the identical 60-bit
  * integers); hot loops use the custom codegen expressions in
  * `graft.plans` (MinHashSignature one-pass signatures,
  * SortedIntersectSize merge intersections); SimHash bit votes are 60
  * conditional sums in one aggregate pass.
  *
  * Scale design:
  *  - exact dedup: one shuffle on the text hash; map-side partial agg.
  *  - n-gram Jaccard: the shingle self-join shuffles on shingle value —
  *    sparse (only co-occurring docs meet), but hot shingles fan out
  *    quadratically; [[hotShingleCap]] documents the mitigation used by
  *    the LSH path (prune shingles/buckets above a doc-frequency cap).
  *  - MinHash-LSH: cost is b bucket-joins instead of n²; an OPT-IN
  *    bucket cap ([[hotShingleCap]] is the suggested value) guards
  *    reducers against giant-duplicate-cluster blowup — opt-in, not
  *    default, because the cap trades recall and the correctness
  *    oracle demands the lossless variant.
  *  - SimHash: near-dup candidates via 4×15-bit band keys → equi-join,
  *    the standard way to find hamming-distance≤k pairs without n².
  */
object Dedup {

  /** Suggested `bucketCap` for [[minhashDupPairs]] at corpus scale:
    * buckets above this size are dropped (a hot bucket pairs every doc
    * in it with every other — quadratic — and near-always represents a
    * boilerplate cluster better handled by keeping one representative).
    * Opt-in: the default path is lossless (see minhashDupPairs). */
  val hotShingleCap = 1000

  // ---- shared text primitives -------------------------------------------

  /** Whitespace tokens of lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Distinct 3-token shingles from an already-materialized TOKEN ARRAY
    * column. Taking tokens (not raw text) matters twice over: the
    * `transform` lambda is interpreted, so if `t` were the split
    * expression inline it would re-split the text on every element_at —
    * O(shingles × text) per row; as an attribute it is one array read.
    * Guarded for <3 tokens: Spark's `sequence(1, 0)` counts DOWN
    * (auto-negative step), so the empty case must short-circuit. */
  def shinglesFromTokens(t: Column): Column = {
    val grams = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
    array_distinct(when(size(t) < 3, lit(Array.empty[String])).otherwise(grams))
  }

  /** Convenience form over raw text (small inputs / tests). */
  def shingles(text: Column): Column = shinglesFromTokens(tokens(text))

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

  /** (doc_id, sh) with the shingle set ASCENDING-SORTED — the contract
    * [[verifyPairsExact]]'s merge-intersection relies on; sorting costs
    * O(n log n) once per doc instead of per pair. This is the BUILDER;
    * query paths go through [[DedupStage.shingleDocs]], which
    * materializes it once per corpus and lets every downstream consumer
    * (Jaccard, MinHash, clusters, corpus) read the artifact. */
  private[functions] def buildSortedShingleDocs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Three deliberate plan choices, each measured at sf0.1:
    //  1. the documents parquet is one small file = ONE input partition;
    //     the repartition spreads the CPU-heavy shingle construction
    //     across all cores (and the exchange stops CollapseProject from
    //     inlining the token split into the per-element lambda, which
    //     would re-split the text per element access);
    //  2. the empty-doc filter runs on size(tokens) BEFORE the shingle
    //     projection — filtering on size(shingles) afterwards makes
    //     PushDownPredicates substitute the whole higher-order shingle
    //     expression into a non-codegen Filter (measured 30× slower);
    //  3. docs with ≥3 tokens always have ≥1 shingle, so the filters
    //     are equivalent.
    Tables.documents(spark, sfDir)
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= 3)
      .repartition(spark.sparkContext.defaultParallelism)
      // fused codegen expression (one pass: build + sort + dedup);
      // byte-identical to sort_array(shinglesFromTokens(t)) — the HOF
      // chain remains as this expression's differential oracle in tests
      .select($"doc_id", graft.plans.ShingleExpression.sortedShingles($"t").as("sh"))
  }

  /** All pairs with exact 3-gram Jaccard ≥ minJac.
    *
    * Algorithm: PPJoin-style prefix filtering. Shingles get a canonical
    * rarity order (global doc-frequency, ties by value); each doc joins
    * only on its first `n - ceil(t·n) + 1` shingles. The prefix-filter
    * lemma guarantees any pair with J ≥ t shares a prefix shingle, so
    * the candidate set is complete — results are EXACT (verified per
    * pair on the full shingle arrays), the filter only prunes the join.
    * This is the difference between joining every hot stop-shingle
    * (quadratic fan-out) and joining mostly-rare shingles: at corpus
    * scale it is the standard all-pairs similarity-join shape.
    * Equality with the naive sparse join is asserted in DedupSpec. */
  def ngramJaccardPairs(spark: SparkSession, sfDir: String, minJac: Double = 0.5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // staged parquet, not cache: the plan fans out into 4+ concurrent
    // stages (dfreq, prefix, two verify joins) that would race to
    // compute an un-materialized shingle subtree; a parquet leaf is
    // immune to that AND is shared with the MinHash/cluster queries
    val docs = DedupStage.shingleDocs(spark, sfDir)
    val sh = docs.select($"doc_id", size($"sh").as("n"), explode($"sh").as("shingle"))
    val dfreq = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"df", $"shingle")
    // candidate join on the shingle HASH, not the string: smaller
    // shuffle rows and long-compare joins. A hash collision can only
    // ADD candidates (still a superset of true pairs); the exact
    // verification below filters them, so correctness is unaffected.
    // CACHED + pinned: both sides of the candidate self-join read this —
    // uncached, the dfreq aggregation + window would run twice.
    // Doc frequency DELIBERATELY stays a groupBy + join-back (not a
    // window count, which would save one corpus-sized shuffle): hot
    // stop-shingles are EXPECTED here — Zipf's law guarantees them —
    // and a window partitioned by shingle buffers each hot group in
    // one unsplittable task, while this shape gets map-side partial
    // aggregation AND an AQE-skew-splittable join (each probe row
    // needs only its one dfreq row). The minhash banded path makes
    // the opposite call — see minhashDupPairsOn
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= $"n" - ceil(lit(minJac) * $"n") + 1)
      .select($"doc_id", xxhash64($"shingle").as("sh_h"))
      .cache()
    prefix.count()
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairsExact(candidates, docs, minJac)
  }

  /** Naive variant (full sparse self-join, no prefix filter) — the
    * completeness oracle for the prefix-filtered path in tests. */
  def ngramJaccardPairsNaive(spark: SparkSession, sfDir: String, minJac: Double = 0.5): DataFrame = {
    import spark.implicits._
    // deliberately does NOT use DedupStage: the naive path exercises the
    // raw builder, so the completeness spec also cross-checks the staged
    // artifact against a from-scratch computation
    val docs = buildSortedShingleDocs(spark, sfDir).cache()
    docs.count() // eager pin (see ngramJaccardPairs)
    val sh = docs.select($"doc_id", explode($"sh").as("shingle"))
    val candidates = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairsExact(candidates, docs, minJac)
  }

  /** Exact per-pair Jaccard on full shingle arrays, shared by every
    * candidate generator (prefix, naive, MinHash-LSH). Docs must carry
    * the `sh` arrays SORTED (see the cached doc frames): intersection
    * is a codegen'd zero-allocation merge ([[graft.plans.SortedIntersectSize]])
    * and |A∪B| = |A|+|B|−|A∩B| needs no union array. */
  private[functions] def verifyPairsExact(candidates: DataFrame, docs: DataFrame,
      minJac: Double): DataFrame = {
    import candidates.sparkSession.implicits._
    // ONE scan of the (array-heavy) docs frame, semi-filtered to the
    // candidate ids and pinned: joining docs directly on each side
    // re-scanned the full shingle parquet twice, and the scan — not the
    // merge-intersect — dominated the verify stage (profiled at sf0.1)
    val cand = candidates.localCheckpoint(true)
    val involved = cand.select($"doc_a".as("doc_id"))
      .unionByName(cand.select($"doc_b".as("doc_id"))).distinct()
    val d = docs.join(broadcast(involved), "doc_id").cache()
    d.count() // eager pin: both join sides must read the cache
    cand
      .join(d.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(d.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .withColumn("n_common",
        graft.plans.ArrayExpressions.sortedIntersectSize($"sh_a", $"sh_b"))
      .withColumn("jaccard",
        $"n_common".cast("double") / (size($"sh_a") + size($"sh_b") - $"n_common"))
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

  // ---- source-pair overlap matrix -----------------------------------------

  /** Source×source 3-gram overlap matrix — the corpus-provenance
    * contamination report: for every pair of sources, how much of their
    * shingle vocabulary is shared (Jaccard) and how much of EACH side
    * is contained in the other (directional containment, Broder'97) —
    * the data-card row that answers "which sources mirror which", at
    * source level where doc-level containment ([[containmentPairsOf]])
    * answers it per document.
    *
    * Scale: re-reads the staged shingle artifact ([[DedupStage
    * .shingleDocs]] — no re-shingling), collapses it to DISTINCT
    * (source, shingle) rows with a map-side-combinable aggregate, and
    * self-joins on shingle. Each shingle's fan-out is bounded by the
    * number of SOURCES carrying it (≤ |sources|, never |docs|), so the
    * join is skew-safe by construction and the output is ≤ |sources|²
    * rows — driver-readable at any corpus size. */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.documents(spark, sfDir).select($"doc_id", $"source")
    // pinned ONCE: sizes + both self-join sides consume this frame, and
    // without the checkpoint each consumer re-runs the corpus-sized
    // explode+distinct (4 towers in the physical plan — measured; alias
    // exprIds defeat ReuseExchange). The pinned frame is the DISTINCT
    // source-vocabulary — far smaller than the exploded input.
    val ss = DedupStage.shingleDocs(spark, sfDir)
      .join(src, "doc_id")
      .select($"source", explode($"sh").as("shingle"))
      .distinct()
      .localCheckpoint(true)
    val sizes = ss.groupBy($"source").agg(count(lit(1)).as("n"))
    val inter = ss.select($"source".as("source_a"), $"shingle")
      .join(ss.select($"source".as("source_b"), $"shingle"), "shingle")
      .filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select($"source".as("source_a"), $"n".as("n_a"))), "source_a")
      .join(broadcast(sizes.select($"source".as("source_b"), $"n".as("n_b"))), "source_b")
      .select($"source_a", $"source_b", $"n_common",
        round($"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common"), 6)
          .as("jaccard"),
        round($"n_common".cast("double") / $"n_a", 6).as("containment_a"),
        round($"n_common".cast("double") / $"n_b", 6).as("containment_b"))
      .orderBy($"source_a", $"source_b")
  }

  /** Oracle: identical shingle construction to [[ngramJaccardSql]]'s
    * CTEs, collapsed to source level. */
  val sourceOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT d.source, s.shingle
       |  FROM toks
       |  JOIN documents d USING (doc_id),
       |       LATERAL (SELECT unnest(list_distinct(
       |           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |            FOR i IN range(1, greatest(len(t) - 1, 1))])) AS shingle) s),
       |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, n_common,
       |       round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard,
       |       round(n_common * 1.0 / sa.n, 6) AS containment_a,
       |       round(n_common * 1.0 / sb.n, 6) AS containment_b
       |FROM inter
       |JOIN sizes sa ON source_a = sa.source
       |JOIN sizes sb ON source_b = sb.source
       |ORDER BY source_a, source_b""".stripMargin

  // ---- dedup funnel report ------------------------------------------------

  /** The one-row dedup funnel a corpus owner reads after the chain
    * runs: corpus size → exact-duplicate mass → mined near-dup pairs →
    * clustered docs → dropped docs → shipped corpus, with integer
    * per-mille retention. Pure composition over the staged artifacts
    * (the dbt-style DAG pays the chain once; this report re-reads it),
    * so the marginal cost is a handful of counts. Exact duplicates are
    * a SUBSET of the near-dup drop set (identical texts have J = 1 ≥
    * any threshold), which the report makes visible rather than
    * double-counting. */
  def dedupFunnel(spark: SparkSession, sfDir: String,
      minJac: Double = 0.9): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"))
    val uniq = exactDedup(spark, sfDir)
      .agg(count(lit(1)).as("n_exact_unique"))
    val prs = DedupStage.pairs(spark, sfDir, minJac)
      .agg(count(lit(1)).as("n_neardup_pairs"))
    val clAgg = DedupStage.clusters(spark, sfDir, minJac)
      .agg(count(lit(1)).as("n_docs_in_clusters"),
        coalesce(sum(($"doc_id" =!= $"cluster_keeper").cast("long")), lit(0L))
          .as("n_dropped"))
    docs.crossJoin(uniq).crossJoin(prs).crossJoin(clAgg)
      .select($"n_docs", $"n_exact_unique",
        ($"n_docs" - $"n_exact_unique").as("n_exact_dup_docs"),
        $"n_neardup_pairs", $"n_docs_in_clusters", $"n_dropped",
        ($"n_docs" - $"n_dropped").as("n_final"),
        floor(($"n_docs" - $"n_dropped") * 1000L / $"n_docs")
          .cast("long").as("retention_x1000"))
  }

  def dedupFunnelSql(minJac: Double = 0.9): String =
    s"""WITH RECURSIVE pairs AS (${ngramJaccardSql(minJac)}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach AS (
       |  SELECT doc_id, doc_id AS reach FROM nodes
       |  UNION
       |  SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.reach),
       |clusters AS (
       |  SELECT doc_id, min(reach) AS keeper FROM reach GROUP BY 1),
       |f AS (SELECT
       |  (SELECT COUNT(*) FROM documents) AS n_docs,
       |  (SELECT COUNT(DISTINCT md5(text)) FROM documents) AS n_exact_unique,
       |  (SELECT COUNT(*) FROM pairs) AS n_neardup_pairs,
       |  (SELECT COUNT(*) FROM clusters) AS n_docs_in_clusters,
       |  (SELECT COUNT(*) FROM clusters WHERE doc_id != keeper) AS n_dropped)
       |SELECT n_docs, n_exact_unique,
       |       n_docs - n_exact_unique AS n_exact_dup_docs,
       |       n_neardup_pairs, n_docs_in_clusters, n_dropped,
       |       n_docs - n_dropped AS n_final,
       |       CAST((n_docs - n_dropped) * 1000 // n_docs AS BIGINT)
       |         AS retention_x1000
       |FROM f""".stripMargin

  // ---- asymmetric containment (doc-in-doc) -------------------------------

  /** All ordered pairs where doc A's shingle set is ≥ `minCont`
    * CONTAINED in doc B's: C(A→B) = |S(A)∩S(B)| / |S(A)|.
    *
    * This is the near-dup axis Jaccard is blind to: a paragraph quoted
    * whole inside a much longer page has C ≈ 1 but J ≈ |A|/|B| ≈ 0, so
    * a Jaccard threshold can never catch it without also merging
    * everything — containment is the standard "is this document
    * swallowed by that one" signal (Broder's containment coefficient)
    * a dedup pipeline runs to drop quoted/boilerplate-wrapped copies.
    *
    * Candidates are PPJoin-style but one-sided, because containment is
    * asymmetric: only the CONTAINED side can prefix-filter (the
    * container's size says nothing about the threshold). The minimal
    * prefix — A's `n_a − ⌈minCont·n_a⌉ + 1` globally-rarest shingles —
    * is complete by pigeonhole but WEAK on its own: measured at the
    * ×64 soak it admitted 8.5 M candidates for 32 k true pairs, and
    * the exact array verify of the 99.6 % junk dominated end-to-end
    * cost (215 of 334 s). So A indexes the minimal prefix PLUS an
    * extra ~[[ContainmentIndexExtraFrac]]·n_a rarest shingles, and a
    * COUNT filter runs before the array verify: a true pair misses at
    * most `allowed = n_a − ⌈minCont·n_a⌉` of A's shingles anywhere, so
    * among the `idx` indexed ones it must match ≥ idx − allowed — any
    * pair below that is discarded sound-ly (no false negatives) by a
    * map-side-combined count, never touching the shingle arrays. The
    * join stays bounded for the PPJoin reason: the probe side is each
    * doc's rarest ~half, so per-shingle fan-out stays df-small even
    * though the build side is complete. Results are EXACT — survivors
    * are verified on the full sorted arrays (codegen merge-intersect),
    * both filters only prune.
    *
    * Scale: same shape as [[ngramJaccardPairs]] (shared staged shingle
    * artifact, hash-keyed candidate join, AQE-splittable); output is
    * collision-bounded (pairs that actually overlap), never corpus². */
  def containmentPairs(spark: SparkSession, sfDir: String,
      minCont: Double = 0.9): DataFrame =
    containmentPairsOf(DedupStage.shingleDocs(spark, sfDir), minCont)

  /** [[containmentPairs]]'s core over any (doc_id, sh) sorted-shingle
    * frame — the testable half (ClassifierCurveSpec runs it on a
    * hand corpus where the asymmetric answer is knowable). */
  /** Extra rarest-shingle fraction of the contained doc indexed BEYOND
    * the minimal prefix, purely to power the pre-verify count filter
    * (see the [[containmentPairs]] scaladoc). 0 degrades to the
    * minimal-prefix-only miner (still exact, slower verify); larger
    * values trade candidate-join fan-out for verify pruning — 0.4
    * (≈ rarest half indexed at t = 0.9) measured 4–5× end-to-end at
    * the ×64 soak. A constant: the sweep value is an explicit
    * `extraFrac` argument of [[containmentPairsOf]] (ADVICE r7 — a
    * mutable global read at plan-construction time could be observed
    * mid-sweep by a concurrent query build in the same JVM). */
  private[graft] val ContainmentIndexExtraFrac: Double = 0.4

  private[graft] def containmentPairsOf(docs: DataFrame,
      minCont: Double,
      extraFrac: Double = ContainmentIndexExtraFrac): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sh = docs.select($"doc_id", size($"sh").as("n"),
      explode($"sh").as("shingle"))
    val dfreq = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy($"df", $"shingle")
    val allowed = ($"n" - ceil(lit(minCont) * $"n")).cast("long")
    val idxLen = least($"n".cast("long"), allowed + 1L +
      floor(lit(extraFrac) * $"n").cast("long"))
    // cached + pinned: the candidate join's probe side (see
    // ngramJaccardPairs for why the stage fan-out needs the pin).
    // `thr` = idx − allowed rides along per row so the count filter
    // needs no join-back to sizes.
    val prefixA = sh.join(dfreq, "shingle")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= idxLen)
      .select($"doc_id", xxhash64($"shingle").as("sh_h"),
        (idxLen - allowed).as("thr"))
      .cache()
    prefixA.count()
    val fullB = sh.select($"doc_id", xxhash64($"shingle").as("sh_h"))
    // sound count filter: every surviving pair still gets the exact
    // array verify; pairs killed here CANNOT reach the threshold
    val candidates = prefixA.as("a").join(fullB.as("b"),
        col("a.sh_h") === col("b.sh_h") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_in"), col("b.doc_id").as("doc_of"),
        col("a.thr").as("thr"))
      .agg(count(lit(1)).as("c"))
      .filter($"c" >= $"thr")
      .select($"doc_in", $"doc_of")
    // exact verify — same one-scan semi-filtered shape as
    // verifyPairsExact, with the asymmetric denominator
    val cand = candidates.localCheckpoint(true)
    val involved = cand.select($"doc_in".as("doc_id"))
      .unionByName(cand.select($"doc_of".as("doc_id"))).distinct()
    val d = docs.join(broadcast(involved), "doc_id").cache()
    d.count()
    cand
      .join(d.select($"doc_id".as("doc_in"), $"sh".as("sh_a")), "doc_in")
      .join(d.select($"doc_id".as("doc_of"), $"sh".as("sh_b")), "doc_of")
      .withColumn("n_common",
        graft.plans.ArrayExpressions.sortedIntersectSize($"sh_a", $"sh_b"))
      .withColumn("containment", $"n_common".cast("double") / size($"sh_a"))
      .filter($"containment" >= minCont)
      .select($"doc_in", $"doc_of", $"n_common",
        round($"containment", 6).as("containment"))
      .orderBy($"doc_in", $"doc_of")
  }

  def containmentSql(minCont: Double = 0.9): String =
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
       |  SELECT a.doc_id AS doc_in, b.doc_id AS doc_of, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_in, doc_of, n_common,
       |       round(n_common * 1.0 / s1.n, 6) AS containment
       |FROM inter
       |JOIN sizes s1 ON doc_in = s1.doc_id
       |WHERE n_common * 1.0 / s1.n >= $minCont
       |ORDER BY doc_in, doc_of""".stripMargin

  // ---- edit-distance refinement of near-dup pairs ------------------------

  /** Levenshtein re-score of the staged near-dup pairs — the
    * SEQUENCE-aware second opinion on the set-based Jaccard verdict.
    * Shingle Jaccard is order-insensitive (a heavily reordered
    * template scores exactly like a verbatim copy with the same
    * shingle inventory) and character-blind inside tokens; normalized
    * edit distance is the complementary axis (the RETSim-style
    * character-level near-dup signal). A pipeline deciding "delete vs
    * keep-one vs keep-both" wants both numbers, so this emits every
    * staged pair with its Jaccard, its absolute edit distance over the
    * whitespace-normalized text, the integer-ratio relative distance
    * (×1e6 over the longer side — exact integer arithmetic in both
    * engines), and the `edit_confirms` verdict at `maxRelE6`.
    *
    * Scale: work is PAIRS-table-sized (the staged artifact), never
    * corpus²: one broadcast-side semi-filtered text join per side and
    * a per-pair O(len²) DP on ~doc-length strings. The candidate
    * generation cost was already paid by the shared LSH stage. */
  def editDistanceRefine(spark: SparkSession, sfDir: String,
      minJac: Double = 0.9, maxRelE6: Long = 300000L): DataFrame = {
    import spark.implicits._
    val pairs = DedupStage.pairs(spark, sfDir, minJac)
    val nt = Tables.documents(spark, sfDir).select($"doc_id",
      regexp_replace(trim(lower($"text")), "\\s+", " ").as("nt"))
    pairs
      .join(nt.select($"doc_id".as("doc_a"), $"nt".as("nt_a")), "doc_a")
      .join(nt.select($"doc_id".as("doc_b"), $"nt".as("nt_b")), "doc_b")
      .withColumn("edit_dist", levenshtein($"nt_a", $"nt_b").cast("long"))
      // numerator ≤ ~2e8 → exact in the double division; cast floors
      // the positive ratio, matching the oracle's integer `//`
      .withColumn("edit_rel_e6", floor(($"edit_dist" * 1000000L) /
        greatest(length($"nt_a"), length($"nt_b")).cast("long")).cast("long"))
      .select($"doc_a", $"doc_b", $"jaccard", $"edit_dist", $"edit_rel_e6",
        ($"edit_rel_e6" <= maxRelE6).as("edit_confirms"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Oracle: the exact-Jaccard pair set (the [[minhashDupSql]]
    * argument) re-scored with DuckDB's levenshtein — identical unit-
    * cost DP, so distances and the integer ratios match exactly. */
  def editDistanceRefineSql(minJac: Double = 0.9,
      maxRelE6: Long = 300000L): String =
    s"""WITH pairs AS (${ngramJaccardSql(minJac)}),
       |nt AS (
       |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt
       |  FROM documents)
       |SELECT p.doc_a, p.doc_b, p.jaccard,
       |       CAST(levenshtein(a.nt, b.nt) AS BIGINT) AS edit_dist,
       |       CAST(CAST(levenshtein(a.nt, b.nt) AS BIGINT) * 1000000
       |            // greatest(length(a.nt), length(b.nt)) AS BIGINT) AS edit_rel_e6,
       |       (CAST(levenshtein(a.nt, b.nt) AS BIGINT) * 1000000
       |            // greatest(length(a.nt), length(b.nt))) <= $maxRelE6 AS edit_confirms
       |FROM pairs p
       |JOIN nt a ON a.doc_id = p.doc_a
       |JOIN nt b ON b.doc_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- MinHash + LSH -----------------------------------------------------

  val numHashes = 64
  val numBands = 16 // × 4 rows per band

  /** MinHash signature: ONE higher-order pass string-hashes the
    * shingles (xxhash64), then the custom codegen expression
    * [[graft.plans.MinHashSignature]] computes all k affine-permutation
    * minima in a single primitive loop. The k-separate-`array_min`
    * formulation re-walked the array k times in interpreted mode and
    * was the bench bottleneck. Signatures never need oracle parity —
    * LSH candidates are re-verified with exact Jaccard. */
  def minhashSignature(shingleCol: Column): Column =
    graft.plans.MinHashExpression.minhashSig(
      transform(shingleCol, s => xxhash64(s)), numHashes)

  /** Near-duplicate pairs via banded MinHash-LSH, then EXACT Jaccard
    * verification of the candidates (so output precision is 1.0; recall
    * is the LSH band guarantee — ≥ 1-(1-j^4)^16, ≈ 1 for j ≥ 0.9).
    * Output is deterministic for a fixed corpus: seeds are constants.
    *
    * `bucketCap`: optional skew guard. A bucket of n near-identical
    * docs fans out n²/2 candidate pairs; capping drops such buckets at
    * the cost of RECALL on giant duplicate clusters. The oracle-checked
    * default is None (lossless — the exact-join oracle could not match
    * a lossy variant); at corpus scale pass Some(hotShingleCap) and
    * handle over-cap buckets by keeping one representative per bucket. */
  def minhashDupPairs(spark: SparkSession, sfDir: String, minJac: Double = 0.9,
      bucketCap: Option[Int] = None): DataFrame = bucketCap match {
    // lossless default: read the staged pairs artifact (built once per
    // corpus, shared with dupClusters / dedupedCorpus — the DAG edge
    // VERDICT r1 asked for). The artifact IS this function's output, so
    // only a re-sort is needed after the parquet round-trip.
    case None =>
      import spark.implicits._
      DedupStage.pairs(spark, sfDir, minJac).orderBy($"doc_a", $"doc_b")
    // lossy capped variant (skew guard): never staged — it trades
    // recall and must not be shareable with the exact consumers
    case Some(_) =>
      minhashDupPairsOn(DedupStage.shingleDocs(spark, sfDir), minJac, bucketCap)
  }

  /** The MinHash-LSH pipeline itself, over an already-materialized
    * sorted-shingle frame (see [[DedupStage.shingleDocs]]). */
  private[functions] def minhashDupPairsOn(docs: DataFrame, minJac: Double,
      bucketCap: Option[Int] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val sigs = docs.select($"doc_id", minhashSignature($"sh").as("sig"))
      // the exchange is load-bearing, not a tuning knob: without it
      // CollapseProject merges this projection into the band transform
      // below and the lambda re-evaluates the FULL MinHash signature
      // once per band (16×64 hash passes per row instead of 64).
      // A narrow (doc_id, 64-long sig) shuffle is orders cheaper.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    // band keys: hash of each 4-slice of the signature. CACHED + pinned:
    // three consumers (bucket sizing, both self-join sides) would each
    // recompute the full signature stage otherwise — banded is tiny
    // (numBands smallint rows per doc), the signatures are not
    val banded = sigs.select($"doc_id", posexplode(expr(
      s"transform(sequence(0, ${numBands - 1}), b -> hash(slice(sig, b * 4 + 1, 4)))")))
      .toDF("doc_id", "band_idx", "band_hash")
      .cache()
    banded.count() // eager pin: concurrent stages must not race the cache
    // singleton-bucket prune + skew guard (optional, lossy — see
    // scaladoc) as a map-side-combined groupBy count + LEFT-SEMI
    // join-back. NOT a window count over the bucket key (round-6
    // review): a window must shuffle the corpus-sized banded frame and
    // buffer each bucket in ONE task before the cap filter can drop it
    // — the degenerate hot bucket (many identical docs) that bucketCap
    // exists to bound is exactly the one that would be buffered whole.
    // Here the agg shuffle is combiner-reduced to one row per bucket
    // per map task, the surviving (multi-doc, ≤ cap) bucket list is
    // collision-bounded — small — so AQE broadcasts the semi-join and
    // the banded frame never shuffles; if a pathological corpus ever
    // makes it big, AQE falls back to a sort-merge that costs what the
    // window did, minus the buffering.
    val bucketsOk = banded.groupBy($"band_idx", $"band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .filter($"bucket_n" > 1 &&
        bucketCap.map(c => $"bucket_n" <= c).getOrElse(lit(true)))
      .select($"band_idx", $"band_hash")
    val active = banded.join(bucketsOk, Seq("band_idx", "band_hash"), "left_semi")
    val candidates = active.as("a").join(active.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verify on the (small) candidate set via per-pair array ops
    verifyPairsExact(candidates, docs, minJac)
  }

  /** Oracle for the LSH pipeline: the exact ≥ 0.9 pairs. Valid because
    * the band construction has ~1 recall at j ≥ 0.9 AND the output is
    * deterministic on the fixed corpus (validated by check_oracle). */
  def minhashDupSql(minJac: Double = 0.9): String = ngramJaccardSql(minJac)

  // ---- duplicate clusters (connected components) -------------------------

  /** Transitive duplicate clusters: near-dup PAIRS (A~B, B~C) become
    * components ({A,B,C} → keeper = min doc_id) — what a dedup pipeline
    * actually ships (drop all but the keeper of each cluster).
    *
    * Algorithm: iterative min-label propagation with pointer halving —
    * each round every node takes the min of its own and its neighbors'
    * labels, then shortcuts through its label's label (the
    * Kiveris-et-al. star-operation idea expressed as one extra
    * self-join), converging in O(log diameter) rounds rather than
    * O(diameter) — a 120-link pairwise-near-dup chain closes in 7
    * rounds (ChainClusterSpec). Driver-side loop with localCheckpoint
    * per round (breaks lineage; iterative algorithms legitimately
    * coordinate rounds at the driver — the DATA never leaves
    * executors).
    *
    * Oracle: DuckDB recursive CTE computing the same transitive
    * closure over the exact-Jaccard pairs — an independent algorithm
    * (fixpoint recursion vs label propagation) reaching the same
    * components. */
  def dupClusters(spark: SparkSession, sfDir: String, minJac: Double = 0.9): DataFrame =
    dupClustersFromPairs(DedupStage.pairs(spark, sfDir, minJac))

  /** Below this many mined pair rows, connected components run as ONE
    * driver-side union-find over the collected pair list instead of the
    * iterative distributed label propagation — the same small-regime
    * switch discipline as [[graft.operators.Graph.BfsBroadcastRowLimit]]
    * and PageRank's co-keyed regime. The pair list is
    * collision-bounded (≈ one row per duplicated document, NOT corpus-
    * sized), so at gate scale it is a few thousand rows while the
    * distributed loop still pays 4–6 Spark jobs per propagation round;
    * past the bound (a high-dup-rate 100 TB corpus mines millions of
    * pairs) the O(log diameter) label-propagation loop takes over.
    * Both regimes compute identical components — asserted in
    * ChainClusterSpec. Var so specs can force either regime. */
  private[graft] var ClusterLocalPairLimit: Long = 200000L

  /** Label propagation over an already-computed pairs frame — the
    * downstream half of [[dupClusters]], consuming the staged artifact. */
  private[graft] def dupClustersFromPairs(pairsIn: DataFrame): DataFrame = {
    val spark = pairsIn.sparkSession
    import spark.implicits._
    val pairs = pairsIn.select($"doc_a", $"doc_b")
    // regime pick: the count is one cheap aggregate over the staged
    // artifact (the same frame every regime reads anyway)
    if (pairs.count() <= ClusterLocalPairLimit)
      return dupClustersLocal(pairs)
    // undirected edges, both directions
    val edges = pairs
      .unionByName(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .toDF("src", "dst")
      .cache()
    var labels = edges.select($"src".as("doc_id")).distinct()
      .withColumn("label", $"doc_id")
      .localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val neighborMin = edges
        .join(labels, $"dst" === $"doc_id")
        .groupBy($"src").agg(min($"label").as("n_min"))
      // carry the previous label through the checkpoint: convergence is
      // then a cheap filter-count on the materialized frame instead of
      // a second join against the previous generation
      val prop = labels
        .join(neighborMin, $"doc_id" === $"src", "left")
        .select($"doc_id",
          least($"label", coalesce($"n_min", $"label")).as("label"),
          $"label".as("prev"))
      // pointer halving (label ← label(label)): labels are node ids, so
      // the label table doubles as a parent-pointer map. Composing it
      // with itself each round makes the distance-to-minimum shrink
      // geometrically — convergence in O(log diameter) rounds instead
      // of O(diameter), which is what keeps the 50-round cap safe for
      // chain-shaped duplicate components (a 100+-link chain of
      // pairwise near-dups would exceed a pure-propagation cap).
      // Invariants preserved: label(v) ∈ component(v) and label(v) ≤ v,
      // so the fixpoint (every label = component minimum) is unchanged.
      val lmap = prop.select($"doc_id".as("l_node"), $"label".as("l_label"))
      val next = prop
        .join(lmap, $"label" === $"l_node", "left")
        .select($"doc_id",
          least($"label", coalesce($"l_label", $"label")).as("label"),
          $"prev")
        .localCheckpoint()
      converged = next.filter($"label" =!= $"prev").isEmpty
      labels = next.select($"doc_id", $"label")
      rounds += 1
    }
    // loud failure beats silently-wrong clusters: a component whose
    // label chains outlast the cap would exit with non-minimal labels
    require(converged,
      s"dup-cluster label propagation did not converge in $rounds rounds " +
        "(pathological component — raise the round limit)")
    edges.unpersist()
    labels.select($"doc_id", $"label".as("cluster_keeper"))
      .orderBy($"doc_id")
  }

  /** Small-regime component solver: path-halving union-find over the
    * collected pair list (≤ [[ClusterLocalPairLimit]] rows by the
    * caller's count check). Union-by-minimum keeps the invariant the
    * distributed fixpoint also reaches — every node labeled with its
    * component's minimum doc_id — so the two regimes are value-equal,
    * not just cluster-equal. */
  private def dupClustersLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val es = pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrElse(p, p)
        parent(x) = gp; x = gp; p = parent.getOrElse(x, x)
      }
      x
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // union by minimum: the root IS the keeper
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      } else ()
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      union(a, b)
    }
    val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
    rows.toDF("doc_id", "cluster_keeper").orderBy($"doc_id")
  }

  def dupClustersSql(minJac: Double = 0.9): String =
    s"""WITH RECURSIVE pairs AS (${ngramJaccardSql(minJac)}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach AS (
       |  -- transitive closure: every (node, reachable-node) pair
       |  SELECT doc_id, doc_id AS reach FROM nodes
       |  UNION
       |  SELECT r.doc_id, e.dst
       |  FROM reach r JOIN edges e ON e.src = r.reach)
       |SELECT doc_id, min(reach) AS cluster_keeper
       |FROM reach
       |GROUP BY 1
       |ORDER BY doc_id""".stripMargin

  /** The deduplicated corpus: every document except non-keeper members
    * of duplicate clusters — the final "drop the dups" step, via a
    * broadcast anti-join of the (tiny) non-keeper set against the
    * corpus. */
  def dedupedCorpus(spark: SparkSession, sfDir: String, minJac: Double = 0.9): DataFrame = {
    import spark.implicits._
    val dropList = DedupStage.clusters(spark, sfDir, minJac)
      .filter($"doc_id" =!= $"cluster_keeper")
      .select($"doc_id")
    Tables.documents(spark, sfDir)
      .join(broadcast(dropList), Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  def dedupedCorpusSql(minJac: Double = 0.9): String =
    s"""WITH RECURSIVE pairs AS (${ngramJaccardSql(minJac)}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach AS (
       |  SELECT doc_id, doc_id AS reach FROM nodes
       |  UNION
       |  SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.reach),
       |clusters AS (
       |  SELECT doc_id, min(reach) AS keeper FROM reach GROUP BY 1),
       |drop_list AS (SELECT doc_id FROM clusters WHERE doc_id != keeper)
       |SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_list)
       |ORDER BY doc_id""".stripMargin

  /** Quality-aware canonical selection: where [[dedupedCorpus]] keeps
    * each cluster's MIN-ID member (arbitrary), this keeps its LONGEST
    * (n_chars desc, doc_id tie-break) — near-dup clusters usually mix
    * truncated/boilerplate copies with one fuller original, and a
    * training pipeline wants the fullest representative, not the one
    * that happened to be crawled first.
    *
    * Cost over [[dedupedCorpus]]: one extra broadcast-sized join of the
    * cluster table against (doc_id, n_chars) and a window partitioned
    * by cluster (cluster-sized partitions, not corpus-sized). The drop
    * list stays |dup docs| − |clusters| rows — the same broadcastable
    * kill-list. */
  def dedupedCorpusLongest(spark: SparkSession, sfDir: String,
      minJac: Double = 0.9): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val members = DedupStage.clusters(spark, sfDir, minJac)
      .join(docs.select($"doc_id", $"n_chars"), Seq("doc_id"))
    val w = Window.partitionBy($"cluster_keeper")
      .orderBy($"n_chars".desc, $"doc_id")
    val dropList = members.withColumn("rk", row_number().over(w))
      .filter($"rk" > 1).select($"doc_id")
    docs.join(broadcast(dropList), Seq("doc_id"), "left_anti")
      .orderBy($"doc_id")
  }

  def dedupedCorpusLongestSql(minJac: Double = 0.9): String =
    s"""WITH RECURSIVE pairs AS (${ngramJaccardSql(minJac)}),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach AS (
       |  SELECT doc_id, doc_id AS reach FROM nodes
       |  UNION
       |  SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.reach),
       |clusters AS (
       |  SELECT doc_id, min(reach) AS keeper FROM reach GROUP BY 1),
       |ranked AS (
       |  SELECT c.doc_id,
       |         row_number() OVER (PARTITION BY c.keeper
       |           ORDER BY d.n_chars DESC, c.doc_id) AS rk
       |  FROM clusters c JOIN documents d USING (doc_id)),
       |drop_list AS (SELECT doc_id FROM ranked WHERE rk > 1)
       |SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM drop_list)
       |ORDER BY doc_id""".stripMargin

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

  // ---- incremental dedup: new batch vs existing corpus -------------------

  /** Band keys (band_idx, band_hash) per document — the persistable
    * half of the LSH index. Computed in one narrow pass over a
    * shingle table; [[DedupStage.bandKeys]] stages it so per-batch
    * incremental dedup never re-hashes the corpus. */
  private[functions] def bandKeys(sh: DataFrame, idCol: String): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val sigs = sh.select(col(idCol), minhashSignature($"sh").as("sig"))
      // load-bearing exchange (see minhashDupPairsOn): stops
      // CollapseProject from re-evaluating the signature per band
      .repartition(spark.sparkContext.defaultParallelism)
    sigs.select(col(idCol), posexplode(expr(
      s"transform(sequence(0, ${numBands - 1}), b -> hash(slice(sig, b * 4 + 1, 4)))")))
      .toDF(idCol, "band_idx", "band_hash")
  }

  /** INCREMENTAL near-dup detection — the arrival-time shape of a
    * production ingest: a NEW batch of documents is checked against the
    * existing corpus WITHOUT re-scanning or re-shingling the corpus.
    * The corpus participates only through its index artifacts: the
    * staged sorted-shingle table ([[DedupStage.shingleDocs]]) and the
    * staged band-key table ([[DedupStage.bandKeys]]). The new batch
    * (tiny) is shingled and banded fresh; candidates are bucket
    * collisions new×corpus (never corpus×corpus); verification is the
    * same exact Jaccard as the batch path, so precision is 1.0 and
    * recall is the LSH band guarantee (~1 at j ≥ 0.9).
    *
    * Cost per batch: O(|batch| + collisions) — corpus-size-independent
    * except the index read. This is the operator that makes dedup
    * sustainable at 100 TB: the full [[minhashDupPairs]] runs once,
    * this runs per ingest batch.
    *
    * `corpusBands`: pass the STAGED corpus band table — deriving it
    * from `corpusSh` here (the None fallback, kept for ad-hoc calls)
    * re-runs the 64-hash signature over the whole corpus per batch,
    * which is exactly the cost this operator exists to avoid. */
  def incrementalDupPairs(corpusSh: DataFrame, newDocs: DataFrame,
      minJac: Double = 0.9, corpusBands: Option[DataFrame] = None): DataFrame = {
    val spark = corpusSh.sparkSession
    import spark.implicits._
    val newSh = newDocs
      .select($"new_id", tokens($"text").as("t"))
      .filter(size($"t") >= 3)
      .select($"new_id", graft.plans.ShingleExpression.sortedShingles($"t").as("sh"))
      .cache()
    val candidates = bandKeys(newSh, "new_id")
      .join(corpusBands.getOrElse(bandKeys(corpusSh, "doc_id")),
        Seq("band_idx", "band_hash"))
      .select($"new_id", $"doc_id")
      .distinct()
    val out = candidates
      .join(newSh.select($"new_id", $"sh".as("sh_a")), "new_id")
      .join(corpusSh.select($"doc_id", $"sh".as("sh_b")), "doc_id")
      .withColumn("n_common",
        graft.plans.ArrayExpressions.sortedIntersectSize($"sh_a", $"sh_b"))
      .withColumn("jaccard",
        $"n_common".cast("double") / (size($"sh_a") + size($"sh_b") - $"n_common"))
      .filter($"jaccard" >= minJac)
      .select($"new_id", $"doc_id", round($"jaccard", 6).as("jaccard"))
      .orderBy($"new_id", $"doc_id")
    // localCheckpoint returns a NEW frame over the checkpointed RDD —
    // returning the original would re-run the whole pipeline uncached
    val pinned = out.localCheckpoint(eager = true)
    newSh.unpersist()
    pinned
  }

  /** Gated query: a deterministic ingest batch — exact copies of every
    * 20th document (match at j = 1, plus whatever engineered near-dups
    * those documents already had) and reversed-text decoys (match
    * nothing) — against the staged corpus index. The oracle computes
    * the exact new×corpus Jaccard join in SQL, so both the hits AND the
    * decoys' absence are pinned. */
  def incrementalDedupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val newDocs = docs.filter($"doc_id" % 20 === 3)
      .select(($"doc_id" + 100000).as("new_id"), $"text")
      .unionByName(docs.filter($"doc_id" % 20 === 7)
        .select(($"doc_id" + 200000).as("new_id"), reverse($"text").as("text")))
    incrementalDupPairs(DedupStage.shingleDocs(spark, sfDir), newDocs,
      corpusBands = Some(DedupStage.bandKeys(spark, sfDir)))
  }

  val incrementalDedupSql: String =
    s"""WITH nd AS (
      |  SELECT doc_id + 100000 AS new_id, text FROM documents WHERE doc_id % 20 = 3
      |  UNION ALL
      |  SELECT doc_id + 200000, reverse(text) FROM documents WHERE doc_id % 20 = 7),
      |tc AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      |  FROM documents),
      |tn AS (
      |  SELECT new_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      |  FROM nd),
      |sc AS (
      |  SELECT doc_id, unnest(list_distinct(
      |           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |            FOR i IN range(1, greatest(len(t) - 1, 1))])) AS shingle
      |  FROM tc),
      |sn AS (
      |  SELECT new_id, unnest(list_distinct(
      |           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |            FOR i IN range(1, greatest(len(t) - 1, 1))])) AS shingle
      |  FROM tn),
      |szc AS (SELECT doc_id, count(*) AS n FROM sc GROUP BY 1),
      |szn AS (SELECT new_id, count(*) AS n FROM sn GROUP BY 1),
      |inter AS (
      |  SELECT sn.new_id, sc.doc_id, count(*) AS n_common
      |  FROM sn JOIN sc ON sn.shingle = sc.shingle
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT i.new_id, i.doc_id,
      |         CAST(i.n_common AS DOUBLE) / (szn.n + szc.n - i.n_common) AS jaccard
      |  FROM inter i
      |  JOIN szn ON szn.new_id = i.new_id
      |  JOIN szc ON szc.doc_id = i.doc_id)
      |SELECT new_id, doc_id, round(jaccard, 6) AS jaccard
      |FROM j WHERE jaccard >= 0.9
      |ORDER BY new_id, doc_id""".stripMargin

  // ---- exact substring-span dedup (positional grams + diagonals) ---------

  /** Maximal EXACT shared token spans across document pairs — the
    * substring-level dedup of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better"), which catches boilerplate and
    * quoted passages that set-based Jaccard dilutes away (a 30-token
    * license block inside two otherwise-different documents is invisible
    * to whole-doc similarity but is exactly what substring dedup cuts).
    *
    * Algorithm (the distributed equivalent of their suffix-array scan):
    *  1. positional k-token grams per doc — (doc_id, pos, gram);
    *  2. self-join on the gram (pairs sharing any k-gram), doc_a < doc_b;
    *  3. matches on the same DIAGONAL (pos_a − pos_b constant) at
    *     consecutive positions are one contiguous shared span: islands
    *     via the classic pos − row_number() trick, then one aggregate
    *     per island → span start and token length (island size + k − 1).
    *
    * Shuffle shape at 100 TB: one exchange keyed on the gram (the
    * candidate join), one on (doc_a, doc_b, diagonal) (the island
    * window+aggregate). Both keys are high-cardinality; the skew risk is
    * a corpus-hot gram (a k-token stop phrase) fanning out
    * quadratically — production setting caps gram doc-frequency first
    * (dropping grams seen in >F docs can only shorten spans that such
    * ubiquitous boilerplate dominates; [[Skew]] salting handles the
    * moderate cases). Here the join carries the gram STRING so results
    * are exact vs the oracle; at scale you join on xxhash64(gram) and
    * accept the 2⁻⁶⁴ collision odds, as the reference algorithm does
    * with its hashed suffix buckets.
    */
  def substringSpans(spark: SparkSession, sfDir: String, k: Int = 8,
      minSpan: Int = 16): DataFrame =
    substringSpansOn(spark, Tables.documents(spark, sfDir), k, minSpan)

  private[graft] def substringSpansOn(spark: SparkSession, docs: DataFrame,
      k: Int, minSpan: Int): DataFrame = {
    import spark.implicits._
    val toks = docs
      .select($"doc_id", tokens($"text").as("t"))
      .filter(size($"t") >= k)
      .repartition(spark.sparkContext.defaultParallelism)
    // positional k-grams via the fused codegen [[graft.plans.NGrams]]
    // (position mode: array index i ⇒ gram starting at token i+1)
    val grams = toks
      .select($"doc_id", posexplode(
        graft.plans.ShingleExpression.ngrams($"t", k, distinct = false))
        .as(Seq("p0", "gram")))
      .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"gram")
    val matches = grams.as("a").join(grams.as("b"),
        $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db"),
        $"a.pos".as("pa"), $"b.pos".as("pb"))
    // same diagonal + consecutive positions ⇒ same island
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"da", $"db", $"diag").orderBy($"pa")
    matches
      .withColumn("diag", $"pa" - $"pb")
      .withColumn("isl", $"pa" - row_number().over(w))
      .groupBy($"da", $"db", $"diag", $"isl")
      .agg(min($"pa").as("start_a"), (count(lit(1)) + (k - 1)).as("span_tokens"))
      .filter($"span_tokens" >= minSpan)
      .select($"da".as("doc_a"), $"db".as("doc_b"), $"start_a",
        ($"start_a" - $"diag").as("start_b"), $"span_tokens")
      .orderBy($"doc_a", $"doc_b", $"start_a", $"start_b")
  }

  def substringSpansSql(k: Int = 8, minSpan: Int = 16): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents
       |  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= $k),
       |grams AS (
       |  SELECT doc_id, i.i AS pos,
       |         array_to_string(t[i.i:i.i+${k - 1}], ' ') AS gram
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(t)-${k - 2})) AS i) i),
       |matches AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
       |  FROM grams a JOIN grams b
       |    ON a.gram = b.gram AND a.doc_id < b.doc_id),
       |islands AS (
       |  SELECT da, db, pa - pb AS diag, pa,
       |         pa - row_number() OVER (PARTITION BY da, db, pa - pb
       |                                 ORDER BY pa) AS isl
       |  FROM matches),
       |spans AS (
       |  SELECT da, db, diag, min(pa) AS start_a,
       |         count(*) + ${k - 1} AS span_tokens
       |  FROM islands GROUP BY da, db, diag, isl)
       |SELECT da AS doc_a, db AS doc_b, start_a,
       |       start_a - diag AS start_b, span_tokens
       |FROM spans WHERE span_tokens >= $minSpan
       |ORDER BY doc_a, doc_b, start_a, start_b""".stripMargin

  /** CCNet-style PARAGRAPH-level deduplication: drop repeated
    * paragraphs corpus-wide, keeping only the globally first
    * occurrence (by doc_id, then position), and reassemble each
    * document from its surviving paragraphs. This is the shape CCNet
    * and its successors run before document-level dedup — boilerplate
    * (headers, navbars, license blocks) repeats across documents that
    * are otherwise unique, so document-level hashing never catches it.
    * The synthetic corpus has no newlines, so "paragraph" here is a
    * fixed `window`-word block — same operator, deterministic splitter
    * (CCNet splits on newline; the dedup algebra is identical).
    *
    * Scale: paragraph blocks are a narrow `transform`/`slice` over the
    * split array (no explode-then-regroup — each paragraph is built by
    * slicing, so there is no (doc, word) shuffle at all). The ONE
    * corpus-sized shuffle keys the first-occurrence window by paragraph
    * text; at 100 TB key it by xxhash64(para) and carry the text only
    * through the winner join. Reassembly groups by doc_id (second
    * shuffle, output-sized) and sorts each doc's surviving blocks by
    * position — no global window anywhere.
    *
    * A full-duplicate document loses every paragraph to the earlier
    * copy and comes back empty (n_kept = 0) — exact-document dedup
    * falls out as a special case. */
  def paragraphDedup(spark: SparkSession, sfDir: String, window: Int = 20): DataFrame =
    paragraphDedupOn(Tables.documents(spark, sfDir), window)

  /** [[paragraphDedup]] over any (doc_id, text) frame. */
  def paragraphDedupOn(docs: DataFrame, window: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val w = window
    val words = split(col("text"), " ")
    val nParas = floor((size(words) + lit(w - 1)).cast("double") / lit(w)).cast("int")
    val paras = transform(sequence(lit(0), nParas - 1),
      i => array_join(slice(words, i * w + 1, lit(w)), " "))
    val exploded = docs.select($"doc_id", posexplode(paras).as(Seq("pidx", "para")))
    val firstWin = org.apache.spark.sql.expressions.Window
      .partitionBy($"para").orderBy($"doc_id", $"pidx")
    val kept = exploded
      .withColumn("rn", row_number().over(firstWin))
      .filter($"rn" === 1)
    val rebuilt = kept.groupBy($"doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct($"pidx", $"para"))),
          s => s.getField("para")), " ").as("text_dedup"))
    docs.select($"doc_id", nParas.cast("long").as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select($"doc_id", $"n_paras",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        md5(coalesce($"text_dedup", lit(""))).as("dedup_md5"),
        length(coalesce($"text_dedup", lit(""))).cast("long").as("n_chars_kept"))
      .orderBy($"doc_id")
  }

  /** Oracle: the identical first-occurrence rule in DuckDB (1-based
    * inclusive list slicing clamps exactly like Spark's `slice`). */
  def paragraphDedupSql(window: Int = 20): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ptext AS (
       |  SELECT doc_id, i.i AS pidx,
       |         array_to_string(t[i.i*$window+1 : i.i*$window+$window], ' ') AS para
       |  FROM toks, LATERAL (SELECT unnest(range(0,
       |         CAST(ceil(len(t) / $window.0) AS INT))) AS i) i),
       |ranked AS (
       |  SELECT doc_id, pidx, para,
       |         row_number() OVER (PARTITION BY para
       |                            ORDER BY doc_id, pidx) AS rn
       |  FROM ptext),
       |rebuilt AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(para, ' ' ORDER BY pidx) AS text_dedup
       |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
       |np AS (
       |  SELECT doc_id, CAST(ceil(len(t) / $window.0) AS BIGINT) AS n_paras
       |  FROM toks)
       |SELECT d.doc_id, np.n_paras,
       |       coalesce(r.n_kept, 0) AS n_kept,
       |       md5(coalesce(r.text_dedup, '')) AS dedup_md5,
       |       CAST(length(coalesce(r.text_dedup, '')) AS BIGINT) AS n_chars_kept
       |FROM documents d JOIN np ON d.doc_id = np.doc_id
       |LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
