package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** KMV/theta set-overlap sketch (Beyer, Haas, Reinwald, Sismanis &
  * Gemulla, "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD 2007; the theta-sketch framing is Dasgupta,
  * Lang, Rhodes & Thaler, "A framework for estimating stream
  * expression cardinalities", ICDT 2016) — the SET-OVERLAP member that
  * completes the sketch family: CountMin = frequency, HLL =
  * cardinality, DDSketch = quantiles, KMV-theta = intersection /
  * Jaccard between sets.
  *
  * This is the sketch-path twin of [[Dedup.sourceOverlap]]: that
  * operator pins the DISTINCT source-vocabulary and self-joins it —
  * exact, but the pinned frame grows with the vocabulary. Here each
  * source is collapsed to its k lowest deterministic shingle
  * priorities in ONE corpus pass (no staged shingle artifact, no
  * vocabulary pin), and every pairwise estimate is computed from the
  * |sources|·k-row sketch table:
  *
  *  - L        = bottom-k of K_A ∪ K_B (distinct priorities)
  *  - θ        = max priority in L
  *  - |A∪B|   ≈ (k−1)·2⁶⁰/θ when |L| = k, EXACT |L| otherwise
  *              (|L| < k ⟺ both sketches hold their whole set)
  *  - J(A,B)  ≈ |{p ∈ L : p ∈ K_A ∧ p ∈ K_B}| / |L|
  *  - |A∩B|   ≈ J·|A∪B|
  *
  * Mergeability is EXACT, the KMV identity: bottom-k of a union equals
  * bottom-k of the per-part bottom-k's (the
  * [[graft.operators.Analytics.quantileSketchRollup]] machinery, here
  * on distinct hash priorities) — proven generically in ThetaSpec and
  * the ×m soak.
  *
  * Determinism: priorities are [[Dedup.hash60]] md5 values (the corpus
  * discipline — rerun-, partitioning- and engine-stable), so the whole
  * sketch is SQL-replayable and the gate hashes sketch CONTENT, not
  * just estimates. Estimate doubles divide exact integers in an
  * identical operation sequence in both engines.
  *
  * Scale shape: one corpus scan → explode shingles → project to
  * (source, 60-bit pri) BEFORE the shuffle (no shingle strings move —
  * the [[Multimodal.mediaDedup]] asymmetry), map-side-combined
  * distinct, then a per-source bottom-k window over ≤ distinct-pri
  * rows. Everything after is |sources|·k-row arithmetic. The exact
  * n_common/jaccard audit columns reuse the staged exact path at gate
  * scale — the very computation the sketch exists to replace at 100 TB
  * (the [[DdSketch]] audit precedent); dropping them leaves the
  * sketch-only plan stage-free. */
object Theta {

  val K = 256
  val Salt = "theta_v1"
  /** hash60 range: priorities are uniform on [0, 2⁶⁰). */
  val HashMax: Double = 1152921504606846976.0 // 2^60, exact in double

  /** Per-source KMV sketch: the k lowest distinct shingle priorities.
    * The persistable, mergeable sketch state (k rows per source). */
  def sketches(spark: SparkSession, sfDir: String, k: Int = K): DataFrame = {
    import spark.implicits._
    val pri = Tables.documents(spark, sfDir)
      .select($"source", Dedup.tokens($"text").as("t"))
      .filter(size($"t") >= 3)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"source", explode(
        graft.plans.ShingleExpression.sortedShingles($"t")).as("shingle"))
      .select($"source",
        Dedup.hash60(concat_ws("|", $"shingle", lit(Salt))).as("pri"))
      .distinct()
    pri
      .withColumn("rn",
        row_number().over(Window.partitionBy($"source").orderBy($"pri")))
      .filter($"rn" <= k)
      .select($"source", $"pri")
  }

  /** Gated query: one row per source pair — sketch-union stats (union_k,
    * matches, θ), the three estimates, and the exact-path audit columns
    * (n_common, jaccard, abs_err). */
  def thetaOverlap(spark: SparkSession, sfDir: String, k: Int = K): DataFrame = {
    import spark.implicits._
    // |sources|·k rows — pinned once; sizes, both pair sides and the
    // match flags all read this frame
    val sk = sketches(spark, sfDir, k).localCheckpoint(eager = true)
    val agg = pairEstimates(sk, k)
    // exact audit (already 6-dp): reuses the staged exact path; absent
    // pairs share zero shingles → exact 0
    val exact = Dedup.sourceOverlap(spark, sfDir)
      .select($"source_a", $"source_b", $"n_common", $"jaccard")
    // estimates surface as e6-FLOORED integers (the repo's floor-then-
    // gate discipline): floor of an identically-computed double is
    // binary-exact in both engines, where round-6 ties diverge (Spark
    // rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    // binary value)
    agg.join(exact, Seq("source_a", "source_b"), "left")
      .select($"source_a", $"source_b", $"union_k", $"matches", $"theta",
        floor($"est_union_raw" * lit(1e6)).cast("long").as("est_union_e6"),
        floor($"matches".cast("double") / $"union_k".cast("double") * lit(1e6))
          .cast("long").as("est_jaccard_e6"),
        floor($"matches".cast("double") * $"est_union_raw"
          / $"union_k".cast("double") * lit(1e6)).cast("long").as("est_inter_e6"),
        coalesce($"n_common", lit(0L)).as("n_common"),
        coalesce($"jaccard", lit(0.0)).as("jaccard"),
        floor(abs($"matches".cast("double") / $"union_k".cast("double")
          - coalesce($"jaccard", lit(0.0))) * lit(1e6)).cast("long")
          .as("abs_err_e6"))
      .orderBy($"source_a", $"source_b")
  }

  /** The sketch-only pair aggregate both gated forms share: per-pair
    * union bottom-k stats and the three estimates, computed ENTIRELY
    * from the |sources|·k sketch table. */
  private def pairEstimates(sk: DataFrame, k: Int): DataFrame = {
    val spark = sk.sparkSession
    import spark.implicits._
    val srcs = sk.select($"source").distinct()
    val pe = sk.as("a")
      .join(srcs.as("sb"), col("a.source") < col("sb.source"))
      .select(col("a.source").as("source_a"), col("sb.source").as("source_b"),
        $"pri", lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(sk.as("b")
        .join(srcs.as("sa"), col("sa.source") < col("b.source"))
        .select(col("sa.source").as("source_a"), col("b.source").as("source_b"),
          $"pri", lit(0).as("in_a"), lit(1).as("in_b")))
    val u = pe.groupBy($"source_a", $"source_b", $"pri")
      .agg(max($"in_a").as("in_a"), max($"in_b").as("in_b"))
    val l = u.withColumn("rn", row_number().over(
      Window.partitionBy($"source_a", $"source_b").orderBy($"pri")))
      .filter($"rn" <= k)
    l.groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("union_k"),
        sum(when($"in_a" === 1 && $"in_b" === 1, 1L).otherwise(0L)).as("matches"),
        max($"pri").as("theta"))
      .withColumn("est_union_raw",
        when($"union_k" === k,
          lit((k - 1).toDouble) * lit(HashMax) / $"theta".cast("double"))
          .otherwise($"union_k".cast("double")))
  }

  /** Gated query — THE SCALE PATH ITSELF (r9 verdict #1): estimates
    * only, no [[Dedup.sourceOverlap]] audit join, no staged shingle
    * artifact. One corpus pass builds the |sources|·k sketch table;
    * everything after is sketch-sized arithmetic. ThetaSpec pins the
    * plan: no shuffled join of any kind appears — the only joins are
    * the broadcast pair expansions against the |sources|-row list.
    * The audited [[thetaOverlap]] remains the gate-scale twin. */
  def thetaOverlapSketch(spark: SparkSession, sfDir: String, k: Int = K): DataFrame = {
    import spark.implicits._
    val sk = sketches(spark, sfDir, k).localCheckpoint(eager = true)
    pairEstimates(sk, k)
      .select($"source_a", $"source_b", $"union_k", $"matches", $"theta",
        floor($"est_union_raw" * lit(1e6)).cast("long").as("est_union_e6"),
        floor($"matches".cast("double") / $"union_k".cast("double") * lit(1e6))
          .cast("long").as("est_jaccard_e6"),
        floor($"matches".cast("double") * $"est_union_raw"
          / $"union_k".cast("double") * lit(1e6)).cast("long").as("est_inter_e6"))
      .orderBy($"source_a", $"source_b")
  }

  /** DuckDB replay of the sketch-only form: the same CTE chain as
    * [[thetaOverlapSql]] with the exact-audit legs (sh self-join,
    * sizes) simply absent. */
  def thetaOverlapSketchSql(k: Int = K): String =
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
       |pri AS (
       |  SELECT DISTINCT source,
       |         CAST(('0x' || substr(md5(shingle || '|$Salt'), 1, 15)) AS BIGINT) AS pri
       |  FROM sh),
       |sk AS (
       |  SELECT source, pri FROM (
       |    SELECT source, pri,
       |           row_number() OVER (PARTITION BY source ORDER BY pri) AS rn
       |    FROM pri) WHERE rn <= $k),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pe AS (
       |  SELECT a.source AS source_a, s.source AS source_b, a.pri,
       |         1 AS in_a, 0 AS in_b
       |  FROM sk a JOIN srcs s ON a.source < s.source
       |  UNION ALL
       |  SELECT s.source, b.source, b.pri, 0, 1
       |  FROM sk b JOIN srcs s ON s.source < b.source),
       |u AS (
       |  SELECT source_a, source_b, pri,
       |         max(in_a) AS in_a, max(in_b) AS in_b
       |  FROM pe GROUP BY 1, 2, 3),
       |l AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY source_a, source_b ORDER BY pri) AS rn
       |  FROM u),
       |agg AS (
       |  SELECT source_a, source_b,
       |         CAST(count(*) AS BIGINT) AS union_k,
       |         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       |         CAST(max(pri) AS BIGINT) AS theta
       |  FROM l WHERE rn <= $k GROUP BY 1, 2),
       |est AS (
       |  SELECT *,
       |         CASE WHEN union_k = $k
       |              THEN CAST(${k - 1} AS DOUBLE) * 1152921504606846976.0 / CAST(theta AS DOUBLE)
       |              ELSE CAST(union_k AS DOUBLE) END AS est_union_raw
       |  FROM agg)
       |SELECT source_a, source_b, union_k, matches, theta,
       |       CAST(floor(est_union_raw * 1e6) AS BIGINT) AS est_union_e6,
       |       CAST(floor(CAST(matches AS DOUBLE) / CAST(union_k AS DOUBLE) * 1e6) AS BIGINT) AS est_jaccard_e6,
       |       CAST(floor(CAST(matches AS DOUBLE) * est_union_raw / CAST(union_k AS DOUBLE) * 1e6) AS BIGINT) AS est_inter_e6
       |FROM est
       |ORDER BY source_a, source_b""".stripMargin

  /** DuckDB replay: identical shingle construction ([[Dedup
    * .sourceOverlapSql]]'s CTEs), identical md5 priorities, identical
    * bottom-k walk and estimate arithmetic. */
  def thetaOverlapSql(k: Int = K): String =
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
       |pri AS (
       |  SELECT DISTINCT source,
       |         CAST(('0x' || substr(md5(shingle || '|$Salt'), 1, 15)) AS BIGINT) AS pri
       |  FROM sh),
       |sk AS (
       |  SELECT source, pri FROM (
       |    SELECT source, pri,
       |           row_number() OVER (PARTITION BY source ORDER BY pri) AS rn
       |    FROM pri) WHERE rn <= $k),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pe AS (
       |  SELECT a.source AS source_a, s.source AS source_b, a.pri,
       |         1 AS in_a, 0 AS in_b
       |  FROM sk a JOIN srcs s ON a.source < s.source
       |  UNION ALL
       |  SELECT s.source, b.source, b.pri, 0, 1
       |  FROM sk b JOIN srcs s ON s.source < b.source),
       |u AS (
       |  SELECT source_a, source_b, pri,
       |         max(in_a) AS in_a, max(in_b) AS in_b
       |  FROM pe GROUP BY 1, 2, 3),
       |l AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY source_a, source_b ORDER BY pri) AS rn
       |  FROM u),
       |agg AS (
       |  SELECT source_a, source_b,
       |         CAST(count(*) AS BIGINT) AS union_k,
       |         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS matches,
       |         CAST(max(pri) AS BIGINT) AS theta
       |  FROM l WHERE rn <= $k GROUP BY 1, 2),
       |est AS (
       |  SELECT *,
       |         CASE WHEN union_k = $k
       |              THEN CAST(${k - 1} AS DOUBLE) * 1152921504606846976.0 / CAST(theta AS DOUBLE)
       |              ELSE CAST(union_k AS DOUBLE) END AS est_union_raw
       |  FROM agg),
       |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT source_a, source_b, n_common,
       |         round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
       |  FROM inter
       |  JOIN sizes sa ON source_a = sa.source
       |  JOIN sizes sb ON source_b = sb.source)
       |SELECT e.source_a, e.source_b, e.union_k, e.matches, e.theta,
       |       CAST(floor(e.est_union_raw * 1e6) AS BIGINT) AS est_union_e6,
       |       CAST(floor(CAST(e.matches AS DOUBLE) / CAST(e.union_k AS DOUBLE) * 1e6) AS BIGINT) AS est_jaccard_e6,
       |       CAST(floor(CAST(e.matches AS DOUBLE) * e.est_union_raw / CAST(e.union_k AS DOUBLE) * 1e6) AS BIGINT) AS est_inter_e6,
       |       CAST(COALESCE(x.n_common, 0) AS BIGINT) AS n_common,
       |       COALESCE(x.jaccard, 0.0) AS jaccard,
       |       CAST(floor(abs(CAST(e.matches AS DOUBLE) / CAST(e.union_k AS DOUBLE)
       |                      - COALESCE(x.jaccard, 0.0)) * 1e6) AS BIGINT) AS abs_err_e6
       |FROM est e
       |LEFT JOIN exact x ON e.source_a = x.source_a AND e.source_b = x.source_b
       |ORDER BY e.source_a, e.source_b""".stripMargin
}
