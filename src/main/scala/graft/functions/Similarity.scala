package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over the embedding column (`Array[Float]`, 64-dim):
  * brute-force cosine top-k as the exact baseline, LSH-bucketed
  * (random-hyperplane signs) as the scale path, plus threshold near-dup
  * pairs.
  *
  * Numeric parity: every element is cast to DOUBLE before arithmetic and
  * the fold is `aggregate` (strict left-to-right), so Spark and the
  * DuckDB oracle (list comprehension + list_sum over the same doubles)
  * accumulate in the same order; cosines are rounded to 6 dp in the
  * output to absorb any last-ulp drift.
  *
  * Scale design:
  *  - brute force is O(|queries|·|corpus|): correct baseline, used with
  *    a broadcast query set so the corpus never shuffles. Per-query
  *    top-k via window row_number partitioned by query — the partition
  *    count equals |queries|, never a single global sort.
  *  - the LSH path buckets by hyperplane-sign signature; candidate set
  *    per query is one bucket (+ documented multi-probe extension), so
  *    cost is O(|queries|·bucket) — the 1000-executor shape: bucket by
  *    signature, co-partition corpus once, reuse across query batches.
  */
object Similarity {

  val dim = 64

  /** Elementwise-double dot product. Implemented as a custom codegen'd
    * Catalyst expression ([[graft.plans.DotProduct]]) — the higher-order
    * `aggregate(zip_with(...))` formulation is interpreted per element
    * and was the bench bottleneck; the custom expression emits a
    * primitive loop with the SAME left-to-right IEEE accumulation, so
    * results (and the oracle hash) are bit-identical. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** SQL fragment computing the identical cosine (1-based list indexing;
    * same double casts, same summation order). */
  def cosineSql(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_sum([CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) FOR i IN range(1, $dim + 1)])"
    s"(${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)})))"
  }

  /** Exact top-k neighbors (cosine) for each query vector (vec_id <
    * nQueries), excluding self. Query set is broadcast; ranking ties
    * break on neighbor id. */
  def knnBruteForce(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // norms are computed ONCE per vector on each side of the join (not
    // per pair): |corpus|+|queries| norm evaluations instead of 2×|pairs|
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding", norm($"embedding").as("e_norm"))
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"e_norm".as("q_norm"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dot($"q_emb", $"embedding") / ($"q_norm" * $"e_norm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        round($"cos", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  def knnBruteForceSql(nQueries: Int = 10, k: Int = 5): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb
       |  FROM embeddings WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         ${cosineSql("q.q_emb", "e.embedding")} AS cos
       |  FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id != q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
       |         round(cos, 6) AS cosine
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cosine
       |FROM ranked WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin

  /** Contrastive-training triplet mining: for each anchor, the top-k
    * HARD NEGATIVES — the most-similar vectors with a DIFFERENT label —
    * plus the anchor's hardest-positive cosine (the LEAST-similar
    * same-label vector) and a semi-hard flag in the FaceNet sense
    * (Schroff et al., CVPR'15): a negative that is farther than the
    * hardest positive but within the margin, the regime that makes
    * triplet losses converge. This is MINING (build training pairs),
    * not search — the label constraint and the positive-baseline margin
    * test are what distinguish it from [[knnBruteForce]].
    *
    * Scale: anchors are the small side (a labeled seed set) and are
    * broadcast; the corpus never shuffles, and the per-anchor top-k is
    * a window over |anchors| partitions. At 100 TB swap the scored
    * cross join for the banded sign-LSH candidate generator
    * ([[cosineNearDupLsh]]'s bucket join) exactly as the kNN family
    * does — the mining algebra downstream (hardest-positive min,
    * label-filtered top-k, margin test) is unchanged.
    *
    * Determinism: the semi-hard test runs on the 6-dp ROUNDED cosines
    * in both engines, so a last-ulp drift can never flip the flag. */
  def hardNegatives(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, margin: Double = 0.2): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding", $"label", norm($"embedding").as("e_norm"))
    val anchors = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"label".as("q_label"), $"e_norm".as("q_norm"))
    val scored = emb.crossJoin(broadcast(anchors))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(dot($"q_emb", $"embedding") / ($"q_norm" * $"e_norm"), 6))
    // hardest positive per anchor: the same-label vector the anchor is
    // LEAST similar to — the baseline the margin test is relative to
    val posCos = scored.filter($"label" === $"q_label")
      .groupBy($"query_id").agg(min($"cos").as("hard_pos_cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored.filter($"label" =!= $"q_label")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .join(broadcast(posCos), Seq("query_id"), "left")
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        $"cos".as("cosine"), $"hard_pos_cos",
        coalesce($"cos" < $"hard_pos_cos" &&
          $"cos" > $"hard_pos_cos" - margin, lit(false)).as("semi_hard"))
      .orderBy($"query_id", $"rank")
  }

  def hardNegativesSql(nQueries: Int = 10, k: Int = 5, margin: Double = 0.2): String =
    s"""WITH a AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
       |  FROM embeddings WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT a.query_id, a.q_label, e.vec_id, e.label,
       |         round(${cosineSql("a.q_emb", "e.embedding")}, 6) AS cos
       |  FROM embeddings e CROSS JOIN a
       |  WHERE e.vec_id != a.query_id),
       |pos AS (
       |  SELECT query_id, min(cos) AS hard_pos_cos
       |  FROM scored WHERE label = q_label GROUP BY query_id),
       |negs AS (
       |  SELECT query_id, vec_id AS neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored WHERE label != q_label)
       |SELECT n.query_id, n.neighbor_id, n.rank, n.cos AS cosine,
       |       p.hard_pos_cos,
       |       coalesce(n.cos < p.hard_pos_cos
       |                AND n.cos > p.hard_pos_cos - $margin, false) AS semi_hard
       |FROM negs n LEFT JOIN pos p ON n.query_id = p.query_id
       |WHERE n.rank <= $k
       |ORDER BY n.query_id, n.rank""".stripMargin

  /** All pairs above a cosine threshold — embedding near-dup detection.
    *
    * COMPLETE exact mining, distributed as a block-pair equi-join
    * (Okcan & Riedewald's 1-Bucket-Theta, SIGMOD'11): each vector is
    * hashed into one of `numBlocks` balanced blocks and replicated to
    * the `numBlocks` (block, block) keys it participates in; the
    * self-equi-join on the key then confines every comparison to one
    * bounded partition. Same n²/2 comparisons as a cross join — exact
    * completeness at an arbitrary threshold cannot beat that — but:
    *  - the plan is a shuffled EQUI-join (no CartesianProduct /
    *    BroadcastNestedLoopJoin node; pinned in SimilarityScaleSpec),
    *  - work is spread evenly over numBlocks·(numBlocks+1)/2 keys of
    *    ~2n/numBlocks rows each — bounded executor memory at any corpus
    *    size; scale numBlocks ~ √(2·parallelism),
    *  - replication cost is numBlocks× the (id, vector, norm) rows only.
    *
    * Sub-quadratic alternatives trade recall and live alongside:
    * [[cosineNearDupLsh]] (banded sign-LSH; recall ≥ 1-(1-p1^r)^b — ≈1
    * in the near-dup regime cos ≥ 0.9 but measurably lossy at this
    * gate's 0.45 threshold, where pairs sit at 63° and 16-40 band
    * configurations still missed 2-24 of 144 true sf0.1 pairs while
    * keeping 58-99% of all pairs as candidates), and the SemDeDup /
    * knnLsh cluster- and bucket-scoped paths. The registered complete
    * miner therefore stays exact — equal to the brute oracle on every
    * corpus by construction, not by a recall bound. */
  def cosineNearDupPairs(spark: SparkSession, sfDir: String,
      minCos: Double = 0.45, numBlocks: Int = 8): DataFrame =
    cosineNearDupPairsOn(Tables.embeddings(spark, sfDir), minCos, numBlocks)

  private[graft] def cosineNearDupPairsOn(embIn: DataFrame, minCos: Double,
      numBlocks: Int): DataFrame = {
    val spark = embIn.sparkSession
    import spark.implicits._
    val withNorm = embIn
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
      .withColumn("blk", pmod(xxhash64($"vec_id"), lit(numBlocks)).cast("int"))
    // replicate each vector to every (min(blk,j), max(blk,j)) key
    val rep = withNorm
      .withColumn("j", explode(sequence(lit(0), lit(numBlocks - 1))))
      .withColumn("k1", least($"blk", $"j"))
      .withColumn("k2", greatest($"blk", $"j"))
    val a = rep.select($"k1".as("ka1"), $"k2".as("ka2"), $"blk".as("blk_a"),
      $"vec_id".as("vec_a"), $"embedding".as("emb_a"), $"nrm".as("norm_a"))
    val b = rep.select($"k1".as("kb1"), $"k2".as("kb2"), $"blk".as("blk_b"),
      $"vec_id".as("vec_b"), $"embedding".as("emb_b"), $"nrm".as("norm_b"))
    // a cross-block pair co-occurs at exactly one key {blk_a, blk_b};
    // a same-block pair co-occurs at ALL its keys — keep only (blk, blk).
    // shuffle_hash: the per-key partitions are bounded by construction,
    // and hash build/probe streams pairs without SMJ's two sorts
    a.join(b.hint("shuffle_hash"),
        $"ka1" === $"kb1" && $"ka2" === $"kb2" && $"vec_a" < $"vec_b" &&
        ($"blk_a" =!= $"blk_b" || ($"ka1" === $"blk_a" && $"ka2" === $"blk_a")))
      .withColumn("cos", dot($"emb_a", $"emb_b") / ($"norm_a" * $"norm_b"))
      .filter($"cos" >= minCos)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** The O(n²)-partition brute twin (crossJoin) — retained ONLY as the
    * differential baseline for SimilarityScaleSpec; never registered. */
  private[graft] def cosineNearDupBrute(embIn: DataFrame,
      minCos: Double): DataFrame = {
    val spark = embIn.sparkSession
    import spark.implicits._
    val withNorm = embIn
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val a = withNorm.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"), $"nrm".as("norm_a"))
    val b = withNorm.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"), $"nrm".as("norm_b"))
    a.crossJoin(b).filter($"vec_a" < $"vec_b")
      .withColumn("cos", dot($"emb_a", $"emb_b") / ($"norm_a" * $"norm_b"))
      .filter($"cos" >= minCos)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  def cosineNearDupSql(minCos: Double = 0.45): String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cosine
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "b.embedding")} >= $minCos
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Array-column analytics: per-label vector statistics (count, mean
    * L2 norm) — the corpus-health profile an embedding pipeline runs
    * before indexing. One narrow pass + one group-count shuffle. */
  def labelNorms(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select($"label", norm($"embedding").as("nrm"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vectors"),
        graft.functions.Exact.avgExact($"nrm").as("avg_norm"))
      .orderBy($"label")
  }

  val labelNormsSql: String =
    s"""SELECT label, COUNT(*) AS n_vectors,
       |       ${graft.functions.Exact.avgExactSql(
            s"sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) FOR i IN range(1, $dim + 1)]))")} AS avg_norm
       |FROM embeddings
       |GROUP BY 1
       |ORDER BY label""".stripMargin

  // ---- LSH-bucketed ANN (scale path; verified in ScalaTest, not by the
  // SQL oracle — approximate results are recall-bounded, not equal) -----

  /** Deterministic pseudo-random hyperplanes: component h[p][i] derived
    * from a hash of (p, i), mapped to ±1 — reproducible with no RNG. */
  private def planeComponent(p: Int, i: Int): Double =
    if (((p * 1315423911L + i * 2654435761L) >>> 7) % 2 == 0) 1.0 else -1.0

  val numPlanes = 12

  /** Sign signature: bit p = sign(dot(v, plane_p)). Buckets cluster
    * cosine-similar vectors; expected per-bucket size n/2^12.
    *
    * Each projection is the codegen'd [[graft.plans.DotProduct]] against
    * a CONSTANT plane array — the `aggregate(zip_with(...))` HOF
    * formulation this replaces ran 12 interpreted per-element passes per
    * row (the exact cliff DotProduct was built to remove). Same
    * left-to-right accumulation, so bucket assignments are unchanged for
    * `dim`-length vectors (the embeddings contract). Ragged vectors are
    * now WELL-DEFINED rather than degenerate: the projection runs over
    * min(|v|, dim) elements, where the old zip_with null-padded and
    * collapsed every ragged vector into bucket 0. */
  def signSignature(v: Column): Column =
    (0 until numPlanes).map { p =>
      val plane = lit((0 until dim).map(i => planeComponent(p, i)).toArray)
      when(dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN: the corpus is partitioned into cells by
    * nearest centroid; a query probes only its `nProbes` closest cells
    * and ranks that candidate subset exactly.
    *
    * Centroid choice is deterministic (the `nCells` lowest corpus ids
    * outside the query range) — a real deployment would k-means these;
    * the cell-assignment / probe plumbing is identical either way.
    *
    * Scale shape: assignment is a broadcast join (centroids are tiny) +
    * one shuffle on cell id to co-locate each cell's vectors; each
    * query then touches |corpus|·nProbes/nCells candidates instead of
    * |corpus| — the standard IVF cost model. */
  /** IVF family knob derivation from the corpus size — the
    * [[nnGraphParams]] precedent applied to the partition index (r8
    * soak: fixed knobs decay, recall 0.84 → 0.32 by ×64; oversample
    * ∝ n restores 0.98):
    *  - nlist ≈ √(n/8) — cells track √n (the FAISS rule of thumb), so
    *    per-cell population grows only as √n;
    *  - nProbes = nlist/4 — constant probed fraction;
    *  - oversample ∝ n — holds the shortlist/candidate-pool ratio
    *    constant as the index outgrows its ADC resolution.
    * Floors are the r8 gate constants, and the rule REPRODUCES them at
    * every gate corpus (n = 500 and 2000 → (16, 4, 16)), which is what
    * lets the static DuckDB oracles keep those literals (the
    * [[nnGraphSql]] convention); past gate scale the defaults follow
    * the corpus, which the ×m soak drives. */
  def ivfParams(n: Long): (Int, Int, Int) = {
    val nCells = math.max(16, math.round(math.sqrt(n / 8.0)).toInt)
    val nProbes = math.max(4, nCells / 4)
    val oversample = math.max(16, math.ceil(16.0 * n / 2000.0).toInt)
    (nCells, nProbes, oversample)
  }

  /** Knob resolution: 0 = "derive from the corpus size" (the DEFAULT);
    * an explicit positive value pins the knob (spec twins, A/Bs). The
    * count is one parquet metadata scan, taken only when needed. */
  private def resolveIvfKnobs(spark: SparkSession, sfDir: String,
      nCells: Int, nProbes: Int, oversample: Int): (Int, Int, Int) =
    if (nCells > 0 && nProbes > 0 && oversample > 0) (nCells, nProbes, oversample)
    else {
      val (dc, dp, dov) = ivfParams(Tables.embeddings(spark, sfDir).count())
      (if (nCells > 0) nCells else dc,
        if (nProbes > 0) nProbes else dp,
        if (oversample > 0) oversample else dov)
    }

  def knnIvf(spark: SparkSession, sfDir: String, nQueries: Int = 10,
      k: Int = 5, nCells0: Int = 0, nProbes0: Int = 0): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (nCells, nProbes, _) =
      resolveIvfKnobs(spark, sfDir, nCells0, nProbes0, 1)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding", norm($"embedding").as("e_norm"))
    val centroids = emb.filter($"vec_id" >= nQueries && $"vec_id" < nQueries + nCells)
      .select($"vec_id".as("cell_id"), $"embedding".as("c_emb"), $"e_norm".as("c_norm"))
    def nearestCells(vecs: org.apache.spark.sql.DataFrame, n: Int, idCol: String) = {
      val w = Window.partitionBy(col(idCol)).orderBy($"c_cos".desc, $"cell_id")
      vecs.crossJoin(broadcast(centroids))
        .withColumn("c_cos", dot($"embedding", $"c_emb") / ($"e_norm" * $"c_norm"))
        .withColumn("c_rank", row_number().over(w))
        .filter($"c_rank" <= n)
        .drop("c_emb", "c_norm", "c_cos", "c_rank")
    }
    val corpusCells = nearestCells(emb, 1, "vec_id")
    val queryCells = nearestCells(emb.filter($"vec_id" < nQueries), nProbes, "vec_id")
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"e_norm".as("q_norm"), $"cell_id")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    corpusCells.join(queryCells, Seq("cell_id"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dot($"q_emb", $"embedding") / ($"q_norm" * $"e_norm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        round($"cos", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** Top-k via INT8 scalar quantization + oversampled exact re-rank —
    * the SQ8 recipe (FAISS ScalarQuantizer / Lucene int8_hnsw shape):
    *
    *  1. quantize the corpus once: q_i = round(v_i/s), s = max|v_i|/127
    *     (per-vector scale) — 256 B of float32 becomes ~68 B per row;
    *  2. score all candidates with the INTEGER dot product
    *     (approx cos = intDot·s_a·s_b / (‖a‖‖b‖), norms exact);
    *  3. keep the top k·oversample per query by approximate score, then
    *     re-rank those few with the full-precision [[DotProduct]] and
    *     emit the exact top-k.
    *
    * At 100 TB step 2 is the whole scan cost — 3.8× fewer bytes and
    * integer multiply-adds — while step 3 touches only k·oversample
    * rows per query, so output cosines are EXACT values; only the
    * candidate choice is approximate (recall vs [[knnBruteForce]]
    * measured in SimilaritySpec; composes with the IVF/LSH bucketing
    * above, which prune candidates rather than bytes). */
  def knnQuantized(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, oversample: Int = 4): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.plans.QuantExpressions._
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("qscale", vectorAbsMax($"embedding") / lit(127.0))
      .withColumn("qvec", quantize($"embedding", $"qscale"))
      .withColumn("e_norm", norm($"embedding"))
    // the approx pass carries ONLY the quantized representation
    // (int8 vector + 2 scalars per row) — shipping the float32
    // embedding through the candidate scoring and its window shuffle
    // would forfeit the byte reduction that motivates SQ8
    val corpusQ = emb.select($"vec_id", $"qvec", $"qscale", $"e_norm")
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"qvec".as("q_qvec"), $"qscale".as("q_qscale"), $"e_norm".as("q_norm"))
    val approx = corpusQ.crossJoin(broadcast(
        queries.select($"query_id", $"q_qvec", $"q_qscale", $"q_norm")))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("approx_cos",
        quantizedDot($"q_qvec", $"qvec") * $"q_qscale" * $"qscale" /
          ($"q_norm" * $"e_norm"))
    val wApprox = Window.partitionBy($"query_id").orderBy($"approx_cos".desc, $"vec_id")
    val survivors = approx
      .withColumn("arank", row_number().over(wApprox))
      .filter($"arank" <= k * oversample)
      .select($"query_id", $"vec_id", $"e_norm")
    // exact re-rank touches k·oversample rows per query: broadcast the
    // tiny survivor set back against the corpus for the float vectors,
    // and pick the query vector up from the (broadcast-sized) query set
    val wExact = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    broadcast(survivors)
      .join(Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding"), "vec_id")
      .join(broadcast(queries.select($"query_id", $"q_emb", $"q_norm")), "query_id")
      .withColumn("cos", dot($"q_emb", $"embedding") / ($"q_norm" * $"e_norm"))
      .withColumn("rank", row_number().over(wExact))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        round($"cos", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  /** ANN top-k: candidates share the query's sign-bucket; exact cosine +
    * ranking within the candidate set. Recall measured against
    * [[knnBruteForce]] in the test suite. */
  def knnLsh(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", signSignature($"embedding"))
      .withColumn("e_norm", norm($"embedding")) // once per vector, not per pair
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"e_norm".as("q_norm"), $"bucket")
    val cands = emb.join(broadcast(queries), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", dot($"q_emb", $"embedding") / ($"q_norm" * $"e_norm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    cands
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        round($"cos", 6).as("cosine"))
      .orderBy($"query_id", $"rank")
  }

  // ---- hash-gateable quantized twins of the ANN paths --------------------
  //
  // The FP knnLsh/knnIvf above are the SCALE path (codegen DotProduct,
  // recall-gated in SimilaritySpec). These twins pin the gate instead:
  // floor(x*1024) integer vectors, integer sign-projections / integer
  // micro-unit cosines, so bucket membership, probe choice and the
  // final top-k are all exact integer decisions a DuckDB oracle
  // replays verbatim (the graft.functions.Clustering recipe).

  private def quantCol(scale: Int): Column =
    transform(col("embedding"), x => floor(x.cast("double") * scale).cast("long"))
  // codegen'd exact integer MAC loop — the HOF aggregate/zip_with
  // formulation ran interpreted lambdas per element (see LongDotProduct)
  private def qnorm2(c: Column): Column =
    graft.plans.VectorExpressions.longDotProduct(c, c)
  private def qdot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.longDotProduct(a, b)
  private def cosMicro(d: Column, na: Column, nb: Column): Column =
    floor(d.cast("double") / sqrt((na * nb).cast("double")) * 1e6).cast("long")

  /** Integer sign signature: bit p = [Σ s(p,i)·q_i >= 0] with the same
    * ±1 pseudo-random planes as [[signSignature]] — but over quantized
    * components, so the sum is an exact integer and the bucket is
    * engine-independent. */
  /** The ±1 pseudo-random hyperplane for plane `pl`, as a literal sign
    * vector — THE single copy of the plane mixing formula, shared by the
    * knn bucket signature and the near-dup band keys (and mirrored
    * textually by both SQL oracles): a drift between the two Scala
    * sites would silently decouple knn buckets from near-dup bands. */
  private[graft] def planeSigns(pl: Int): Column =
    typedLit((0 until dim).map(i =>
      if (((pl * 1315423911L + i * 2654435761L) >>> 7) % 2 == 0) 1L else -1L))

  private def signSigQuant(p: Column): Column =
    (0 until numPlanes).map { pl =>
      when(qdot(p, planeSigns(pl)) >= 0, lit(1L << pl)).otherwise(lit(0L))
    }.reduce(_ + _)

  def knnLshQuant(spark: SparkSession, sfDir: String, nQueries: Int = 10,
      k: Int = 5, scale: Int = 1024): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantCol(scale).as("p"))
      .withColumn("nrm2", qnorm2($"p"))
      .withColumn("bucket", signSigQuant($"p"))
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"p".as("qp"),
        $"nrm2".as("q_nrm2"), $"bucket")
    val w = Window.partitionBy($"query_id").orderBy($"cos_micro".desc, $"vec_id")
    emb.join(broadcast(queries), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos_micro", cosMicro(qdot($"qp", $"p"), $"q_nrm2", $"nrm2"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", $"cos_micro")
      .orderBy($"query_id", $"rank")
  }

  /** Shared quantized-IVF cell resolution: nearest `n` frozen centroids
    * per vector — THE single copy of the integer argmax both the
    * one-shot index build and the incremental maintenance path use, so
    * their assignments can never drift apart. */
  private def ivfNearestCells(vecs: DataFrame, centroids: DataFrame,
      n: Int, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("c_cm", cosMicro(qdot(col("p"), col("cp")),
        col("nrm2"), col("cn")))
    if (n == 1)
      // corpus-side assignment: argmax(c_cm, tie min cell) as
      // min(struct(-c_cm, cell_id, payload)) — a map-side-combinable
      // aggregate, so the shuffle carries |corpus| combined rows
      // instead of the window path's nCells·|corpus| rows with the
      // quantized arrays attached (same integers, same tiebreak;
      // (neg, cell_id) totally orders the group, payload rides along)
      scored.groupBy(col(idCol))
        .agg(min(struct((-col("c_cm")).as("neg"), col("cell_id").as("cell_id"),
          col("p").as("p"), col("nrm2").as("nrm2"))).as("b"))
        .select(col(idCol), col("b.p").as("p"), col("b.nrm2").as("nrm2"),
          col("b.cell_id").as("cell_id"))
    else {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("c_cm").desc, col("cell_id"))
      scored
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= n)
        .drop("cp", "cn", "c_cm", "c_rank")
    }
  }

  /** Probe + exact-rank tail shared by the one-shot and incremental
    * IVF paths: probed-cell candidates, integer micro-cosine, top-k. */
  private def ivfProbeRank(corpusCells: DataFrame, queryCells: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_micro").desc, col("vec_id"))
    corpusCells.join(queryCells, Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_micro", cosMicro(qdot(col("qp"), col("p")),
        col("q_nrm2"), col("nrm2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cos_micro"))
      .orderBy(col("query_id"), col("rank"))
  }

  def knnIvfQuant(spark: SparkSession, sfDir: String, nQueries: Int = 10,
      k: Int = 5, nCells0: Int = 0, nProbes0: Int = 0,
      scale: Int = 1024): DataFrame = {
    import spark.implicits._
    // the IVF family shares one cell-structure derivation (ivfParams),
    // so the exact-in-probed-cells baseline and the PQ path always
    // probe the SAME cells at every corpus size
    val (nCells, nProbes, _) =
      resolveIvfKnobs(spark, sfDir, nCells0, nProbes0, 1)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantCol(scale).as("p"))
      .withColumn("nrm2", qnorm2($"p"))
    val centroids = emb
      .filter($"vec_id" >= nQueries && $"vec_id" < nQueries + nCells)
      .select($"vec_id".as("cell_id"), $"p".as("cp"), $"nrm2".as("cn"))
    val corpusCells = ivfNearestCells(emb, centroids, 1, "vec_id")
    val queryCells = ivfNearestCells(emb.filter($"vec_id" < nQueries),
        centroids, nProbes, "vec_id")
      .select($"vec_id".as("query_id"), $"p".as("qp"),
        $"nrm2".as("q_nrm2"), $"cell_id")
    ivfProbeRank(corpusCells, queryCells, k)
  }

  /** Incremental IVF maintenance (r11 verdict #6) — the ANN sibling of
    * [[Dedup.incrementalDedupQuery]]: a growing corpus adds batches to
    * the index WITHOUT re-clustering. The existing index is the STAGED
    * base cell table (built once per corpus, re-read thereafter — the
    * on-disk artifact a deployment maintains); a new batch costs one
    * broadcast-frozen-centroid assignment over |batch| rows plus an
    * append — never a corpus re-scan. Because quantized cell
    * assignment is per-vector (integer argmax against FIXED
    * centroids), the incrementally-maintained index is BIT-IDENTICAL
    * to a full rebuild over the unioned corpus — exactly what the gate
    * pins: the oracle is the one-shot q_knn_ivf SQL replayed over the
    * full corpus, so any drift between the maintained and rebuilt
    * structures (a stale centroid, a missed batch row, a tie broken
    * differently) hash-fails.
    *
    * The batch is the deterministic newest slice (vec_id ≡ 7 mod 10
    * past the query+centroid prefix, ~10% of the corpus); queries
    * probe the merged table with the standard knobs. A real
    * deployment re-clusters only when cell-population skew degrades
    * recall — the soak tracks the incremental step's cost scaling as
    * O(batch) (SCALE.md). */
  def knnIvfIncremental(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, nCells0: Int = 0, nProbes0: Int = 0,
      scale: Int = 1024): DataFrame = {
    import spark.implicits._
    val (nCells, nProbes, _) =
      resolveIvfKnobs(spark, sfDir, nCells0, nProbes0, 1)
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantCol(scale).as("p"))
      .withColumn("nrm2", qnorm2($"p"))
    val isBatch = $"vec_id" >= nQueries + nCells &&
      pmod($"vec_id", lit(10)) === 7
    val centroids = emb
      .filter($"vec_id" >= nQueries && $"vec_id" < nQueries + nCells)
      .select($"vec_id".as("cell_id"), $"p".as("cp"), $"nrm2".as("cn"))
    // the pre-existing index: base assignments materialized once per
    // corpus (centroid ids live in the base by construction)
    val baseCells = Staged.materialize(
      s"ivf_cells_base_${Staged.sfKey(sfDir)}", spark) {
      ivfNearestCells(emb.filter(!isBatch), centroids, 1, "vec_id")
    }
    // the incremental step: assign ONLY the batch, append
    val batchCells = ivfNearestCells(emb.filter(isBatch), centroids, 1, "vec_id")
    val corpusCells = baseCells.unionByName(batchCells)
    val queryCells = ivfNearestCells(emb.filter($"vec_id" < nQueries),
        centroids, nProbes, "vec_id")
      .select($"vec_id".as("query_id"), $"p".as("qp"),
        $"nrm2".as("q_nrm2"), $"cell_id")
    ivfProbeRank(corpusCells, queryCells, k)
  }

  private def vqCtes(scale: Int): String =
    s"""vq AS MATERIALIZED (
       |  SELECT vec_id, i AS dim,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale.0) AS BIGINT) AS px
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS i) dd),
       |nr AS MATERIALIZED (SELECT vec_id, CAST(SUM(px * px) AS BIGINT) AS nrm2
       |       FROM vq GROUP BY vec_id)""".stripMargin

  /** Scoring tail shared by both oracles: exact integer pair dots over
    * a (query_id, neighbor_id) candidate CTE named `cand`, micro-unit
    * cosine, per-query rank, top-k. */
  private def scoreTail(k: Int): String =
    s"""sc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         CAST(floor(CAST(CAST(SUM(qv.px * ev.px) AS BIGINT) AS DOUBLE)
       |           / sqrt(CAST(nq.nrm2 * ne.nrm2 AS DOUBLE)) * 1e6) AS BIGINT) AS cos_micro
       |  FROM cand c
       |  JOIN vq qv ON qv.vec_id = c.query_id
       |  JOIN vq ev ON ev.vec_id = c.neighbor_id AND ev.dim = qv.dim
       |  JOIN nr nq ON nq.vec_id = c.query_id
       |  JOIN nr ne ON ne.vec_id = c.neighbor_id
       |  GROUP BY c.query_id, c.neighbor_id, nq.nrm2, ne.nrm2),
       |rk AS (
       |  SELECT query_id, neighbor_id, cos_micro,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY cos_micro DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos_micro
       |FROM rk WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  def knnLshQuantSql(nQueries: Int = 10, k: Int = 5,
      scale: Int = 1024): String =
    s"""WITH ${vqCtes(scale)},
       |planes AS (
       |  SELECT pp.p, ii.i,
       |         CASE WHEN ((pp.p * 1315423911 + ii.i * 2654435761) >> 7) % 2 = 0
       |              THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(0, $numPlanes)) AS p) pp
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) ii),
       |proj AS (
       |  SELECT v.vec_id, pl.p, CAST(SUM(pl.s * v.px) AS BIGINT) AS t
       |  FROM vq v JOIN planes pl ON pl.i = v.dim - 1
       |  GROUP BY v.vec_id, pl.p),
       |bk AS MATERIALIZED (
       |  SELECT vec_id,
       |         -- CAST(1 AS BIGINT): a bare 1 is INT32 in DuckDB and the
       |         -- shift would overflow if numPlanes ever exceeds 31
       |         CAST(SUM(CASE WHEN t >= 0 THEN CAST(1 AS BIGINT) << p
       |                       ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id),
       |cand AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
       |  FROM bk q JOIN bk e ON q.bucket = e.bucket AND e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $nQueries),
       |${scoreTail(k)}""".stripMargin

  // ---- banded sign-LSH near-dup pair miner -------------------------------

  /** LSH band parameters hitting a target miss probability `eps` at the
    * threshold: p1 = 1 - θ/π is the per-plane agreement probability at
    * cos = minCos; rows-per-band r is sized so a band matches with
    * probability ≈ 1/2 at the threshold, and the band count b then
    * satisfies (1 - p1^r)^b ≤ eps. Recall for a pair at cosine c is
    * 1-(1-p1(c)^r)^b — monotone in c, so everything above the tuning
    * point is recalled with higher probability. */
  def lshBandParams(minCos: Double, eps: Double = 1e-2): (Int, Int) = {
    val p1 = 1.0 - math.acos(minCos) / math.Pi
    // capped at 63: the band key packs one sign BIT per row into a
    // 64-bit long (1L << j), and a JVM shift count wraps mod 64 while
    // DuckDB's does not — r = 64 would silently alias row 0 on the
    // Spark side only and decouple the gate from its oracle. Very high
    // thresholds (minCos ≥ ~0.9995) ask for r > 63; the cap trades a
    // little extra candidate density there, never correctness.
    val r = math.min(63,
      math.max(1, math.round(math.log(0.5) / math.log(p1)).toInt))
    val pBand = math.pow(p1, r)
    val b = math.max(1, math.ceil(math.log(eps) / math.log1p(-pBand)).toInt)
    (b, r)
  }

  /** Candidate pairs sharing at least one sign-LSH band. Projections are
    * INTEGER (quantized components × ±1 planes — exact, engine-neutral),
    * so the candidate set is deterministic and a SQL oracle can replay
    * it verbatim; the verify stage then scores candidates with the exact
    * FP cosine. Band key b = the `rowsPerBand` sign bits of planes
    * [b·r, (b+1)·r). */
  private[graft] def lshBandCandidates(embIn: DataFrame, bands: Int,
      rowsPerBand: Int, scale: Int): DataFrame = {
    require(rowsPerBand <= 63,
      s"rowsPerBand=$rowsPerBand: band keys pack one sign bit per row " +
        "into a 64-bit long; a JVM shift count wraps mod 64 (silent " +
        "plane aliasing) while the SQL oracle's does not")
    val spark = embIn.sparkSession
    import spark.implicits._
    // all band keys in ONE codegen loop (SignBandKeys): the per-band
    // composition of `rowsPerBand` LongDotProduct trees stopped fitting
    // whole-stage codegen at production band counts (32×16 = 512
    // trees) and ran interpreted — the expression computes the same
    // integers from the same plane formula, bit for bit
    val banded = embIn
      .select($"vec_id", posexplode(graft.plans.VectorExpressions
        .signBandKeys(quantCol(scale), bands, rowsPerBand)))
      .toDF("vec_id", "band_idx", "band_key")
    banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
  }

  /** Banded sign-LSH near-dup pair MINER: LSH candidates + exact-cosine
    * verify — the corpus-scale counterpart of [[cosineNearDupPairs]]
    * (mirrors [[Dedup.minhashDupPairs]]' candidates→verify shape).
    * Output precision is 1.0 (every emitted pair really is ≥ minCos,
    * with the exact FP cosine); recall is the band bound of
    * [[lshBandParams]] — ≈1 in the production near-dup regime
    * (cos ≥ 0.9: miss < 1e-5 at the default 8×4 bands) and measured in
    * SimilarityScaleSpec on planted near-duplicates. Cost is
    * O(n·bands + Σ bucket²) instead of n²/2.
    *
    * Gate: registered as q_cosine_neardup_lsh with an oracle that
    * REPLAYS the integer banding (the [[knnLshQuant]] recipe), so the
    * gate is hash-exact for any corpus — the recall bound is a quality
    * property (spec-checked), not a gate precondition. */
  def cosineNearDupLsh(spark: SparkSession, sfDir: String,
      minCos: Double = 0.45, bands: Int = 8, rowsPerBand: Int = 4,
      scale: Int = 1024): DataFrame =
    cosineNearDupLshOn(Tables.embeddings(spark, sfDir), minCos, bands,
      rowsPerBand, scale)

  private[graft] def cosineNearDupLshOn(embIn: DataFrame, minCos: Double,
      bands: Int, rowsPerBand: Int, scale: Int): DataFrame = {
    val spark = embIn.sparkSession
    import spark.implicits._
    val cand = lshBandCandidates(embIn, bands, rowsPerBand, scale)
    val e = embIn.select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    cand
      .join(e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"),
        $"nrm".as("norm_a")), "vec_a")
      .join(e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"),
        $"nrm".as("norm_b")), "vec_b")
      .withColumn("cos", dot($"emb_a", $"emb_b") / ($"norm_a" * $"norm_b"))
      .filter($"cos" >= minCos)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cosine"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** Oracle: replay the integer banding (planes, quantization, band
    * keys), the distinct candidate self-join, then the exact FP cosine
    * verify — engine-identical by the same integer/pinned-IEEE argument
    * as [[knnLshQuantSql]]. */
  def cosineNearDupLshSql(minCos: Double = 0.45, bands: Int = 8,
      rowsPerBand: Int = 4, scale: Int = 1024): String =
    s"""WITH ${vqCtes(scale)},
       |planes AS (
       |  SELECT pp.p, ii.i,
       |         CASE WHEN ((pp.p * 1315423911 + ii.i * 2654435761) >> 7) % 2 = 0
       |              THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(0, ${bands * rowsPerBand})) AS p) pp
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) ii),
       |proj AS (
       |  SELECT v.vec_id, pl.p, CAST(SUM(pl.s * v.px) AS BIGINT) AS t
       |  FROM vq v JOIN planes pl ON pl.i = v.dim - 1
       |  GROUP BY v.vec_id, pl.p),
       |bk AS MATERIALIZED (
       |  SELECT vec_id, p // $rowsPerBand AS band_idx,
       |         CAST(SUM(CASE WHEN t >= 0
       |                       THEN CAST(1 AS BIGINT) << (p % $rowsPerBand)
       |                       ELSE 0 END) AS BIGINT) AS band_key
       |  FROM proj GROUP BY vec_id, p // $rowsPerBand),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bk x JOIN bk y ON x.band_idx = y.band_idx
       |   AND x.band_key = y.band_key AND x.vec_id < y.vec_id)
       |SELECT c.vec_a, c.vec_b,
       |       round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cosine
       |FROM cand c
       |JOIN embeddings a ON a.vec_id = c.vec_a
       |JOIN embeddings b ON b.vec_id = c.vec_b
       |WHERE ${cosineSql("a.embedding", "b.embedding")} >= $minCos
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Corpus-wide nearest-neighbor GRAPH: for every vector, its top-1
    * neighbor among the sign-LSH band candidates — the k=1 NN-graph an
    * embedding-dedup/clustering pipeline builds over the WHOLE corpus
    * (SemDeDup-style pipelines and connected-component dedup both
    * start here), as opposed to [[knnLsh]]'s fixed query set.
    *
    * Vectors whose buckets are singletons have no candidates and emit
    * no row (an ANN graph is partial by construction; the knob is the
    * band count). Scoring is the integer micro-cosine, so the edge
    * choice is deterministic and the oracle replays it. Scale: one
    * banding pass (narrow), bucket-equi-join for candidates, per-source
    * keyed argmax — no global window, no corpus self-join.
    *
    * BAND WIDTH IS THE SCALE KNOB (r8 soak finding): at r rows/band a
    * RANDOM pair collides on a band w.p. 2^-r, so expected junk
    * candidates per vector ≈ n·b/2^r — fixed-width banding is
    * inherently n²/2^r, and the old 8×4 sizing admitted ~40 % of all
    * n² pairs on a mean-zero corpus (the ×4 soak read α ≈ 1.5 from
    * pure junk mass; the first refit to 32×16 still went α ≈ 1.3 by
    * ×16). Production sizes r WITH THE CORPUS — [[nnGraphParams]]
    * implements r ≈ log₂ n + 8 (junk per vector stays O(bands) AND the
    * keyspace stays ≥ 256·n so clustered corpora — whose distinct
    * signature count ≪ n — cannot birthday-merge tight buckets) with
    * the band count refit to hold recall ≈ 0.85 at the SemDeDup twin
    * threshold cos 0.95, and the soak drives the graph through it.
    * The registered gate uses the rule's sf0.1-sized output (14×19)
    * as its fixed default, because the DuckDB oracle is one static
    * string and must replay the exact band family. */
  def nnGraph(spark: SparkSession, sfDir: String, bands: Int = 14,
      rowsPerBand: Int = 19, scale: Int = 1024): DataFrame = {
    import spark.implicits._
    // VERIFY SHAPE (r8): score pairs INSIDE the bucket join and fold
    // the per-source argmax through a map-side-combinable aggregate.
    // The previous shape (distinct candidate pairs → join quantized
    // vectors back on each side → global window) shuffled every
    // candidate pair twice with 64-long arrays attached and paid a
    // pair-count-sized sort — ~20 GB of shuffle at the ×64 soak. Here
    // the arrays ride the b×n banding explode once, each bucket joins
    // locally, and duplicate pairs (same pair in several bands) cost
    // only a repeated codegen dot product before the argmax absorbs
    // them — argmax(cos DESC, dst ASC) ≡ max(struct(cos, −dst)), the
    // window's exact tiebreak, so results are bit-identical and the
    // oracle (distinct-then-argmax) replays them unchanged.
    val banded = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantCol(scale).as("p"))
      .withColumn("nrm2", qnorm2($"p"))
      .select($"vec_id", $"p", $"nrm2", posexplode(graft.plans.VectorExpressions
        .signBandKeys($"p", bands, rowsPerBand)))
      .toDF("vec_id", "p", "nrm2", "band_idx", "band_key")
    banded.select($"vec_id".as("src"), $"p".as("sp"), $"nrm2".as("sn"),
        $"band_idx", $"band_key")
      .join(banded.select($"vec_id".as("dst"), $"p".as("dp"),
        $"nrm2".as("dn"), $"band_idx", $"band_key"),
        Seq("band_idx", "band_key"))
      .filter($"src" =!= $"dst")
      .select($"src", struct(
        cosMicro(qdot($"sp", $"dp"), $"sn", $"dn").as("cos_micro"),
        (-$"dst").as("neg_dst")).as("cand"))
      .groupBy($"src")
      .agg(max($"cand").as("best"))
      .select($"src".as("vec_id"), (-$"best.neg_dst").as("nn_id"),
        $"best.cos_micro".as("cos_micro"))
      .orderBy($"vec_id")
  }

  /** Oracle: the [[cosineNearDupLshSql]] banding replay + symmetrized
    * candidates + integer-cosine argmax per source. */
  /** Corpus-sized NN-graph banding. Two failure modes size `r`:
    *  - random pairs collide on a band w.p. 2^-r → junk candidates per
    *    vector ≈ n·b/2^r, so r must track log₂ n;
    *  - CLUSTERED corpora emit far fewer distinct signatures than
    *    vectors (the sf0.1 corpus: 954 keys for 2000 vectors, buckets
    *    of 40-50), and once the number of cluster keys approaches
    *    √keyspace, birthday collisions MERGE tight buckets — pairs of
    *    colliding clusters each contribute |A|·|B| junk verifies. The
    *    r8 ×64 soak hit exactly this: 61 k cluster keys in a 2¹⁸
    *    keyspace (23 % load) went quadratic even though random-pair
    *    junk was negligible.
    * Hence r = log₂ n + 8: keyspace ≥ 256·n keeps the load factor
    * ≤ 1/256 even if every vector had a distinct cluster. b then holds
    * recall ≈ 1−eps at the SemDeDup twin threshold (cos 0.95 — the
    * regime a k=1 near-dup graph exists for) via the
    * [[lshBandParams]] bound. */
  def nnGraphParams(n: Long, minCos: Double = 0.95,
      eps: Double = 0.15): (Int, Int) = {
    val r = math.min(63, math.max(16,
      math.ceil(math.log(math.max(2L, n).toDouble) / math.log(2.0)).toInt + 8))
    val p1 = 1.0 - math.acos(minCos) / math.Pi
    val b = math.max(1, math.ceil(math.log(eps) / math.log1p(-math.pow(p1, r))).toInt)
    (b, r)
  }

  def nnGraphSql(bands: Int = 14, rowsPerBand: Int = 19,
      scale: Int = 1024): String =
    s"""WITH ${vqCtes(scale)},
       |planes AS (
       |  SELECT pp.p, ii.i,
       |         CASE WHEN ((pp.p * 1315423911 + ii.i * 2654435761) >> 7) % 2 = 0
       |              THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(0, ${bands * rowsPerBand})) AS p) pp
       |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) ii),
       |proj AS (
       |  SELECT v.vec_id, pl.p, CAST(SUM(pl.s * v.px) AS BIGINT) AS t
       |  FROM vq v JOIN planes pl ON pl.i = v.dim - 1
       |  GROUP BY v.vec_id, pl.p),
       |bk AS MATERIALIZED (
       |  SELECT vec_id, p // $rowsPerBand AS band_idx,
       |         CAST(SUM(CASE WHEN t >= 0
       |                       THEN CAST(1 AS BIGINT) << (p % $rowsPerBand)
       |                       ELSE 0 END) AS BIGINT) AS band_key
       |  FROM proj GROUP BY vec_id, p // $rowsPerBand),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bk x JOIN bk y ON x.band_idx = y.band_idx
       |   AND x.band_key = y.band_key AND x.vec_id < y.vec_id),
       |sym AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM cand
       |  UNION ALL
       |  SELECT vec_b AS src, vec_a AS dst FROM cand),
       |sc AS (
       |  SELECT s.src, s.dst,
       |         CAST(floor(CAST(CAST(SUM(a.px * b.px) AS BIGINT) AS DOUBLE)
       |           / sqrt(CAST(na.nrm2 * nb.nrm2 AS DOUBLE)) * 1e6) AS BIGINT) AS cos_micro
       |  FROM sym s
       |  JOIN vq a ON a.vec_id = s.src
       |  JOIN vq b ON b.vec_id = s.dst AND b.dim = a.dim
       |  JOIN nr na ON na.vec_id = s.src
       |  JOIN nr nb ON nb.vec_id = s.dst
       |  GROUP BY s.src, s.dst, na.nrm2, nb.nrm2),
       |rk AS (
       |  SELECT src, dst, cos_micro, row_number() OVER (
       |    PARTITION BY src ORDER BY cos_micro DESC, dst) AS r
       |  FROM sc)
       |SELECT src AS vec_id, dst AS nn_id, cos_micro
       |FROM rk WHERE r = 1 ORDER BY vec_id""".stripMargin

  def knnIvfQuantSql(nQueries: Int = 10, k: Int = 5, nCells: Int = 16,
      nProbes: Int = 4, scale: Int = 1024): String =
    s"""WITH ${vqCtes(scale)},
       |cdots AS (
       |  SELECT v.vec_id, c.vec_id AS cell_id,
       |         CAST(floor(CAST(CAST(SUM(v.px * c.px) AS BIGINT) AS DOUBLE)
       |           / sqrt(CAST(nv.nrm2 * nc.nrm2 AS DOUBLE)) * 1e6) AS BIGINT) AS c_cm
       |  FROM vq v
       |  JOIN vq c ON c.vec_id >= $nQueries AND c.vec_id < ${nQueries + nCells}
       |            AND c.dim = v.dim
       |  JOIN nr nv ON nv.vec_id = v.vec_id
       |  JOIN nr nc ON nc.vec_id = c.vec_id
       |  GROUP BY v.vec_id, c.vec_id, nv.nrm2, nc.nrm2),
       |cranks AS (
       |  SELECT vec_id, cell_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY c_cm DESC, cell_id) AS c_rank
       |  FROM cdots),
       |corpus_cell AS MATERIALIZED (
       |  SELECT vec_id, cell_id FROM cranks WHERE c_rank = 1),
       |query_cell AS (
       |  SELECT vec_id AS query_id, cell_id FROM cranks
       |  WHERE c_rank <= $nProbes AND vec_id < $nQueries),
       |cand AS (
       |  SELECT qc.query_id, cc.vec_id AS neighbor_id
       |  FROM query_cell qc JOIN corpus_cell cc ON cc.cell_id = qc.cell_id
       |  WHERE cc.vec_id <> qc.query_id),
       |${scoreTail(k)}""".stripMargin

  // ---- IVF-PQ: product quantization over the IVF cells -------------------
  //
  // The 100 TB ANN endgame (Jégou/Douze/Schmid, "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011; the FAISS IVFPQ index):
  // IVF prunes WHICH vectors are scanned (cells), PQ shrinks WHAT is
  // scanned per vector — dim floats become pqM byte-ish codes, and
  // query-vs-candidate scoring becomes pqM table lookups (ADC,
  // asymmetric distance computation) instead of a dim-wide dot. The
  // scan cost per candidate drops ~dim/pqM arithmetic AND ~16× bytes,
  // which is exactly what a memory-bandwidth-bound scan at corpus
  // scale needs. An oversampled exact re-rank then restores exact
  // top-k quality on the survivors, so approximation only ever affects
  // CANDIDATE CHOICE, never reported scores.
  //
  // Determinism discipline (the knnIvfQuant/kmeans convention): all
  // arithmetic is exact integers over scale-quantized components —
  // codebooks are SAMPLED rows (codewords = subvectors of designated
  // corpus vectors, the same convention as the IVF cell centroids;
  // k-means-refined codebooks drop in without changing any shape
  // here), assignment is integer-L2 argmin with (d2, code) tie-break,
  // reconstruction norms are exact subspace sums (disjoint coordinates
  // ⇒ |recon|² = Σ_m |cw_m|²), so the DuckDB oracle replays candidate
  // choice bit-for-bit and the gate hash-matches end to end.

  val pqM = 8 // subspaces (subDim = dim/pqM = 8 components each)
  val pqKsub = 64 // codewords per subspace
  private val subDim = dim / pqM

  /** Top-k per query via IVF cells + PQ-coded ADC scan + exact re-rank.
    *
    * Plan shape at scale: codebooks/centroids/LUTs are broadcast
    * (pqM·pqKsub rows; LUT is nQueries·pqM·pqKsub); the corpus is
    * touched by (1) the one-pass encode — a broadcast join + two keyed
    * windows, no corpus self-join — and (2) the probe scan, which
    * carries ONLY (vec_id, cell_id, m, code) rows into the candidate
    * join. The float embedding reappears solely for the
    * k·oversample·nQueries re-rank rows. */
  def knnIvfPq(spark: SparkSession, sfDir: String, nQueries: Int = 10,
      k: Int = 5, nCells0: Int = 0, nProbes0: Int = 0,
      oversample0: Int = 0, scale: Int = 1024): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // knobs self-size from the corpus by default (ivfParams); explicit
    // values pin them for A/Bs and spec twins
    val (nCells, nProbes, oversample) =
      resolveIvfKnobs(spark, sfDir, nCells0, nProbes0, oversample0)
    val cbOff = nQueries + nCells // codebook sample rows follow the centroids
    val emb = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantCol(scale).as("p"))
      .withColumn("nrm2", qnorm2($"p"))
    val centroids = emb
      .filter($"vec_id" >= nQueries && $"vec_id" < nQueries + nCells)
      .select($"vec_id".as("cell_id"), $"p".as("cp"), $"nrm2".as("cn"))
    def nearestCells(vecs: DataFrame, n: Int, idCol: String) = {
      val scored = vecs.crossJoin(broadcast(centroids))
        .withColumn("c_cm", cosMicro(qdot($"p", $"cp"), $"nrm2", $"cn"))
      if (n == 1)
        // corpus-side assignment: argmax(c_cm, tie min cell) as
        // min(struct(-c_cm, cell_id, payload)) — a map-side-combinable
        // aggregate, so the shuffle carries |corpus| combined rows
        // instead of the window path's nCells·|corpus| rows with the
        // quantized arrays attached (same integers, same tiebreak;
        // (neg, cell_id) totally orders the group, payload rides along)
        scored.groupBy(col(idCol))
          .agg(min(struct((-$"c_cm").as("neg"), $"cell_id".as("cell_id"),
            $"p".as("p"), $"nrm2".as("nrm2"))).as("b"))
          .select(col(idCol), $"b.p".as("p"), $"b.nrm2".as("nrm2"),
            $"b.cell_id".as("cell_id"))
      else {
        val w = Window.partitionBy(col(idCol)).orderBy($"c_cm".desc, $"cell_id")
        scored
          .withColumn("c_rank", row_number().over(w))
          .filter($"c_rank" <= n)
          .drop("cp", "cn", "c_cm", "c_rank")
      }
    }
    def subs(df: DataFrame) = df.select($"vec_id", $"nrm2",
      posexplode(array((0 until pqM).map(m =>
        slice($"p", m * subDim + 1, subDim)): _*)).as(Seq("m", "sub")))
    // codebooks: (m, code, cw, cw_nrm2) — pqM·pqKsub tiny rows
    val cw = subs(emb.filter($"vec_id" >= cbOff && $"vec_id" < cbOff + pqKsub))
      .select((($"vec_id" - cbOff)).cast("int").as("code"), $"m",
        $"sub".as("cw"))
      .withColumn("cw_nrm2", qnorm2($"cw"))
    // one-pass corpus encode: integer-L2 argmin per (vec, subspace).
    // min(struct(d2, code, …)) IS the (d2 asc, code asc) argmin —
    // lexicographic struct ordering — but as an AGGREGATE it partial-
    // combines map-side and never sorts, where the former row_number
    // window sorted all |corpus|·pqKsub candidate rows per partition
    // (the dominant encode cost at the ×64 soak, α ≈ 0.95 of a 230 s
    // run). Same integers, same tiebreak, oracle unchanged.
    val codes = subs(emb).join(broadcast(cw), Seq("m"))
      .withColumn("d2",
        qnorm2($"sub") - lit(2L) * qdot($"sub", $"cw") + $"cw_nrm2")
      .groupBy($"vec_id", $"m")
      .agg(min(struct($"d2", $"code", $"cw_nrm2")).as("best"))
      .select($"vec_id", $"m", $"best.code".as("code"),
        $"best.cw_nrm2".as("cw_nrm2"))
    val recon = codes.groupBy($"vec_id")
      .agg(sum($"cw_nrm2").as("recon_nrm2"))
    // ADC lookup tables: (query_id, m, code, ld) — nQueries·pqM·pqKsub
    val lut = subs(emb.filter($"vec_id" < nQueries))
      .join(broadcast(cw.drop("cw_nrm2")), Seq("m"))
      .select($"vec_id".as("query_id"), $"m", $"code",
        qdot($"sub", $"cw").as("ld"))
    val corpusCells = nearestCells(emb, 1, "vec_id")
      .select($"vec_id", $"cell_id")
    val queryCells = nearestCells(emb.filter($"vec_id" < nQueries), nProbes, "vec_id")
      .select($"vec_id".as("query_id"), $"nrm2".as("q_nrm2"), $"cell_id")
    // ADC scan of the probed cells: codes only, pqM lookup rows per
    // candidate, pair-keyed map-side-combined sum
    val adcW = Window.partitionBy($"query_id").orderBy($"adc_cm".desc, $"vec_id")
    val shortlist = corpusCells.join(queryCells, Seq("cell_id"))
      .filter($"vec_id" =!= $"query_id")
      .join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "m", "code"))
      .groupBy($"query_id", $"vec_id", $"q_nrm2")
      .agg(sum($"ld").as("adc"))
      .join(recon, Seq("vec_id"))
      .withColumn("adc_cm", cosMicro($"adc", $"q_nrm2", $"recon_nrm2"))
      .withColumn("a_rank", row_number().over(adcW))
      .filter($"a_rank" <= k * oversample)
      .select($"query_id", $"vec_id")
    // exact re-rank of the shortlist (same units as knnIvfQuant)
    val rkW = Window.partitionBy($"query_id").orderBy($"cos_micro".desc, $"vec_id")
    shortlist
      .join(emb.select($"vec_id", $"p", $"nrm2"), Seq("vec_id"))
      .join(broadcast(emb.filter($"vec_id" < nQueries)
        .select($"vec_id".as("query_id"), $"p".as("qp"), $"nrm2".as("q_nrm2"))),
        Seq("query_id"))
      .withColumn("cos_micro", cosMicro(qdot($"qp", $"p"), $"q_nrm2", $"nrm2"))
      .withColumn("rank", row_number().over(rkW))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", $"cos_micro")
      .orderBy($"query_id", $"rank")
  }

  def knnIvfPqSql(nQueries: Int = 10, k: Int = 5, nCells: Int = 16,
      nProbes: Int = 4, oversample: Int = 16, scale: Int = 1024): String = {
    val cbOff = nQueries + nCells
    s"""WITH ${vqCtes(scale)},
       |cw AS MATERIALIZED (
       |  SELECT CAST(vec_id - $cbOff AS INTEGER) AS code,
       |         CAST((dim - 1) // $subDim AS INTEGER) AS m,
       |         ((dim - 1) % $subDim) AS j, px
       |  FROM vq WHERE vec_id >= $cbOff AND vec_id < ${cbOff + pqKsub}),
       |cwn AS (SELECT m, code, CAST(SUM(px * px) AS BIGINT) AS cw_nrm2
       |        FROM cw GROUP BY m, code),
       |enc0 AS (
       |  SELECT v.vec_id, w.m, w.code,
       |         CAST(SUM((v.px - w.px) * (v.px - w.px)) AS BIGINT) AS d2
       |  FROM vq v
       |  JOIN cw w ON w.m = CAST((v.dim - 1) // $subDim AS INTEGER)
       |           AND w.j = ((v.dim - 1) % $subDim)
       |  GROUP BY v.vec_id, w.m, w.code),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS e_rank
       |    FROM enc0) e WHERE e_rank = 1),
       |recon AS (
       |  SELECT c.vec_id, CAST(SUM(n.cw_nrm2) AS BIGINT) AS recon_nrm2
       |  FROM codes c JOIN cwn n ON n.m = c.m AND n.code = c.code
       |  GROUP BY c.vec_id),
       |lut AS (
       |  SELECT q.vec_id AS query_id, w.m, w.code,
       |         CAST(SUM(q.px * w.px) AS BIGINT) AS ld
       |  FROM vq q
       |  JOIN cw w ON w.m = CAST((q.dim - 1) // $subDim AS INTEGER)
       |           AND w.j = ((q.dim - 1) % $subDim)
       |  WHERE q.vec_id < $nQueries
       |  GROUP BY q.vec_id, w.m, w.code),
       |cdots AS (
       |  SELECT v.vec_id, c.vec_id AS cell_id,
       |         CAST(floor(CAST(CAST(SUM(v.px * c.px) AS BIGINT) AS DOUBLE)
       |           / sqrt(CAST(nv.nrm2 * nc.nrm2 AS DOUBLE)) * 1e6) AS BIGINT) AS c_cm
       |  FROM vq v
       |  JOIN vq c ON c.vec_id >= $nQueries AND c.vec_id < ${nQueries + nCells}
       |            AND c.dim = v.dim
       |  JOIN nr nv ON nv.vec_id = v.vec_id
       |  JOIN nr nc ON nc.vec_id = c.vec_id
       |  GROUP BY v.vec_id, c.vec_id, nv.nrm2, nc.nrm2),
       |cranks AS (
       |  SELECT vec_id, cell_id,
       |         row_number() OVER (PARTITION BY vec_id
       |           ORDER BY c_cm DESC, cell_id) AS c_rank
       |  FROM cdots),
       |corpus_cell AS MATERIALIZED (
       |  SELECT vec_id, cell_id FROM cranks WHERE c_rank = 1),
       |query_cell AS (
       |  SELECT vec_id AS query_id, cell_id FROM cranks
       |  WHERE c_rank <= $nProbes AND vec_id < $nQueries),
       |adc AS (
       |  SELECT qc.query_id, cc.vec_id,
       |         CAST(floor(CAST(CAST(SUM(l.ld) AS BIGINT) AS DOUBLE)
       |           / sqrt(CAST(nq.nrm2 * r.recon_nrm2 AS DOUBLE)) * 1e6) AS BIGINT) AS adc_cm
       |  FROM query_cell qc
       |  JOIN corpus_cell cc ON cc.cell_id = qc.cell_id
       |                     AND cc.vec_id <> qc.query_id
       |  JOIN codes cd ON cd.vec_id = cc.vec_id
       |  JOIN lut l ON l.query_id = qc.query_id AND l.m = cd.m
       |            AND l.code = cd.code
       |  JOIN nr nq ON nq.vec_id = qc.query_id
       |  JOIN recon r ON r.vec_id = cc.vec_id
       |  GROUP BY qc.query_id, cc.vec_id, nq.nrm2, r.recon_nrm2),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc_cm DESC, vec_id) AS a_rank
       |    FROM adc) a WHERE a_rank <= ${k * oversample}),
       |${scoreTail(k)}""".stripMargin
  }
}
