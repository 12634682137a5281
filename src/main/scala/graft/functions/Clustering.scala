package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.plans.VectorExpressions.dotProduct

/** Lloyd's k-means over the embeddings table — the iterative
  * centroid-training loop (the same driver-coordinated shape as the
  * dup-cluster label propagation: tiny model state on the driver, all
  * data-parallel work on executors).
  *
  * Per iteration: centroids (k×dim, a few KB) are inlined as LITERAL
  * arrays into a single projection — squared L2 via the codegen
  * [[dotProduct]] expansion ‖v‖² − 2·v·c + ‖c‖² (‖v‖² computed once per
  * row, ‖c‖² folded into the literal), argmin via `array_min` over k
  * (d2, cluster_id) structs so distance ties break on the lower cluster
  * id in every engine and run. The assignment step is therefore a pure
  * map — NO crossJoin row blow-up, NO shuffle, no grouping on an array
  * key (r2 assigned via crossJoin + groupBy(vec_id, embedding): an 8×
  * row explosion shuffled on the embedding itself, 8 s of the r2 bench).
  * New centroids from a posexplode + (cluster, dim) average — one narrow
  * partial-aggregated shuffle keyed finer than the cluster count, so a
  * hot cluster never funnels one reducer. Empty clusters keep their
  * previous centroid (the standard Lloyd fix).
  *
  * At 100 TB: per-iteration cost is one codegen scan + one
  * partial-aggregated shuffle of (cluster, dim, sum, n) — model state
  * never grows with the corpus; iterations are the only sequential
  * dependency. Convergence/inertia sums are decimal-routed so the
  * reported numbers are partition-order-independent.
  */
object Clustering {

  /** Full result: (assignments, final centroids, per-iteration inertia).
    * `trackInertia` adds one extra action per iteration — the spec's
    * monotonicity gate needs the series; the query path does not (its
    * final inertia comes out of the summary aggregate itself). */
  def kmeansFull(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 5, trackInertia: Boolean = true)
      : (DataFrame, Array[(Int, Seq[Double])], Seq[Double]) = {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
      .withColumn("v_sq", dotProduct($"embedding", $"embedding"))
      .cache()

    // deterministic init: the k smallest vec_ids
    var centroids: Array[(Int, Seq[Double])] = vecs
      .orderBy($"vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble))
      }

    val inertias = scala.collection.mutable.ArrayBuffer[Double]()
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      // one struct per centroid, all literals folded into the codegen:
      // greatest(..., 0) clamps the expansion's negative-epsilon case
      val distStructs = centroids.toSeq.map { case (cid, c) =>
        val cSq = c.map(x => x * x).sum
        struct(
          greatest($"v_sq" - lit(2.0) * dotProduct($"embedding", typedLit(c)) + lit(cSq),
            lit(0.0)).as("d2"),
          lit(cid).as("cluster_id"))
      }
      assigned = vecs
        .select($"vec_id", $"embedding", array_min(array(distStructs: _*)).as("best"))
        .select($"vec_id", $"embedding",
          $"best.cluster_id".as("cluster_id"), $"best.d2".as("d2"))
      // only the FINAL assignment is cached (summary/specs re-scan it);
      // intermediate assignments are a pure map over the cached corpus —
      // recomputing one costs less than churning the block store
      if (it == iters) assigned = assigned.cache()
      if (trackInertia) inertias += assigned
        .agg(sum($"d2".cast("decimal(27,6)")).cast("double")).collect().head.getDouble(0)
      // no update after the FINAL assignment: the returned centroids
      // must be exactly the model the returned assignment is nearest to
      if (it < iters) {
        val means = assigned
          .select($"cluster_id", posexplode($"embedding").as(Seq("dim", "x")))
          .groupBy($"cluster_id", $"dim")
          // decimal-routed mean (Exact.avgExact discipline): a raw
          // double avg merges partials in shuffle-fetch order and can
          // drift a ulp run-to-run, breaking the determinism contract
          .agg(Exact.avgExact($"x".cast("double")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
          }
        // empty clusters keep their previous centroid
        centroids = centroids.map { case (cid, prevC) =>
          (cid, means.getOrElse(cid, prevC))
        }
      }
    }
    vecs.unpersist()
    (assigned, centroids, inertias.toSeq)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): semantic near-dup
    * removal via k-means partitioning — pairwise cosine is computed
    * only WITHIN each cluster, which is the paper's whole trick: the
    * quadratic pair search drops from |corpus|² to Σ|cluster|², and
    * cross-cluster near-dups are the accepted approximation.
    *
    * Drop rule (deterministic): vector v is dropped iff some
    * same-cluster vector u with u.id < v.id has cos(u, v) ≥ τ.
    * Consequence (spec-pinned): no two KEPT vectors in a cluster are
    * ≥ τ — if u < v were both kept with cos ≥ τ, v would have been
    * dropped by u.
    *
    * Output: one row per DROPPED vector with its nearest smaller-id
    * witness. Shuffle shape at 100 TB: the self-join shuffles both
    * sides once on cluster_id; within-cluster pair cost is bounded by
    * the cluster-size distribution (k scales with the corpus in the
    * paper — clusters stay roughly constant-sized). */
  def semDedup(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 3, tau: Double = 0.4): DataFrame = {
    import spark.implicits._
    val (assigned, _, _) = kmeansFull(spark, sfDir, k, iters, trackInertia = false)
    val vecs = assigned
      .select($"cluster_id", $"vec_id", $"embedding",
        sqrt(dotProduct($"embedding", $"embedding")).as("nrm"))
    val pairs = vecs.as("x").join(vecs.as("y"),
        $"x.cluster_id" === $"y.cluster_id" && $"x.vec_id" < $"y.vec_id")
      .withColumn("cos",
        dotProduct($"x.embedding", $"y.embedding") / ($"x.nrm" * $"y.nrm"))
      .filter($"cos" >= tau)
    // witness = the smaller-id neighbor with the highest cosine
    // (ties to the lower id) — struct-max carries both atomically
    val out = pairs
      .groupBy($"y.vec_id".as("vec_id"), $"y.cluster_id".as("cluster_id"))
      .agg(max(struct($"cos", (-$"x.vec_id").as("neg_id"))).as("w"))
      .select($"vec_id", $"cluster_id", (-$"w.neg_id").as("witness_id"),
        round($"w.cos", 6).as("cosine"))
      .orderBy($"vec_id")
      .localCheckpoint(eager = true)
    assigned.unpersist()
    out
  }

  /** Gated query (rows-only): per-cluster size and decimal-exact
    * inertia after `iters` Lloyd iterations. Materializes the k-row
    * summary and releases the corpus-sized assignment cache — the
    * assignment must not stay pinned for the rest of a 66-query
    * session. ([[kmeansFull]] callers own that cache themselves.) */
  def kmeansSummary(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 5): DataFrame = {
    import spark.implicits._
    val (assigned, _, _) = kmeansFull(spark, sfDir, k, iters, trackInertia = false)
    val summary = assigned.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum($"d2".cast("decimal(27,6)")).cast("double"), 6).as("inertia"))
      .orderBy($"cluster_id")
      .localCheckpoint(eager = true)
    assigned.unpersist()
    summary
  }

  // ---- integer-quantized Lloyd's (the hash-gateable twin) ----------------

  /** Quantize an embedding to integers: `floor(x · scale)` per dim.
    * float→double is exact, ×scale (a power of two) is exact, floor is
    * deterministic — so the quantized vector is a PURE function of the
    * stored floats, identical in any engine. Every downstream distance/
    * centroid/inertia op is then integer arithmetic: exact, overflow-
    * safe (|q| ≤ 2.2e3, d² ≤ 1.2e9, inertia ≤ 6e11), and
    * order-independent — which is what makes the whole iterative loop
    * reproducible by a DuckDB oracle ([[kmeansQuantSql]]), where the
    * double-precision twin ([[kmeansFull]]) can only be spec-gated. */
  private def quantized(scale: Int): Column =
    transform(col("embedding"),
      x => floor(x.cast("double") * scale).cast("long"))

  /** Lloyd's over quantized vectors — same structure as [[kmeansFull]]
    * (deterministic init from the k smallest vec_ids, literal-centroid
    * assignment map, argmin tie → lower cluster id, empty clusters keep
    * their centroid) with integer centroids: the update is
    * `floor(sum / n)` per dim (double divide of small exact ints +
    * floor — deterministic). Returns the final (vec_id, cluster_id, d2)
    * assignment. */
  def kmeansQuantAssign(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 5, scale: Int = 4096): DataFrame =
    // staged: q_kmeans and q_semdedup both consume this assignment —
    // the 5-iteration loop runs once per (params, corpus) per process,
    // downstream reads the artifact (the DedupStage DAG-edge pattern)
    Staged.materialize(
        s"kmeans_quant_${k}_${iters}_${scale}_${Staged.sfKey(sfDir)}", spark) {
      kmeansQuantAssignBuild(spark, sfDir, k, iters, scale)
    }

  private def kmeansQuantAssignBuild(spark: SparkSession, sfDir: String,
      k: Int, iters: Int, scale: Int): DataFrame = {
    import spark.implicits._
    import graft.plans.VectorExpressions.longDotProduct
    val vq = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantized(scale).as("q"))
      .withColumn("q_sq", longDotProduct($"q", $"q"))
      .cache()
    var centroids: Array[(Int, Seq[Long])] = vq
      .orderBy($"vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1)) }
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      // exact-integer expansion ||q - c||^2 = q.q - 2 q.c + c.c through
      // the codegen MAC loop (algebraically identical over longs, so
      // the oracle hash cannot move; the HOF zip_with form interpreted
      // its lambda 64x per row per centroid)
      val distStructs = centroids.toSeq.map { case (cid, c) =>
        val cSq = c.map(x => x * x).sum
        struct(
          ($"q_sq" - lit(2L) * longDotProduct($"q", typedLit(c)) + lit(cSq)).as("d2"),
          lit(cid).as("cluster_id"))
      }
      assigned = vq
        .select($"vec_id", $"q", array_min(array(distStructs: _*)).as("best"))
        .select($"vec_id", $"q",
          $"best.cluster_id".as("cluster_id"), $"best.d2".as("d2"))
      if (it == iters) assigned = assigned.localCheckpoint(eager = true)
      if (it < iters) {
        val sums = assigned
          .select($"cluster_id", posexplode($"q").as(Seq("dim", "x")))
          .groupBy($"cluster_id", $"dim")
          .agg(sum($"x").as("s"), count(lit(1)).as("n"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            (cid, rows.sortBy(_.getInt(1))
              .map(r => math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
              .toSeq)
          }
        centroids = centroids.map { case (cid, prevC) =>
          (cid, sums.getOrElse(cid, prevC))
        }
      }
    }
    vq.unpersist()
    assigned.drop("q")
  }

  /** Gated query (hash-exact): per-cluster size + integer inertia of
    * the quantized Lloyd's run — [[kmeansQuantSql]] replays the whole
    * loop in DuckDB. */
  def kmeansQuantSummary(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 5): DataFrame = {
    import spark.implicits._
    kmeansQuantAssign(spark, sfDir, k, iters)
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_vecs"), sum($"d2").as("inertia"))
      .orderBy($"cluster_id")
  }

  /** The unrolled oracle: `vq` (one row per vec×dim, quantized), `c0`
    * (init centroids), then per iteration an assignment CTE (argmin by
    * (d2, cid) via row_number) and — for all but the last — a centroid
    * update CTE with floor-div means and keep-previous for empty
    * clusters. Pure integer arithmetic end to end, so the hash gate is
    * exact, not approximate. */
  def kmeansQuantSql(k: Int = 8, iters: Int = 5, scale: Int = 4096,
      dims: Int = 64): String =
    s"""WITH ${kmeansQuantCtes(k, iters, scale, dims)}
      |SELECT CAST(cid AS INTEGER) AS cluster_id, COUNT(*) AS n_vecs,
      |       CAST(SUM(d2) AS BIGINT) AS inertia
      |FROM best$iters GROUP BY cid ORDER BY cluster_id""".stripMargin

  /** The CTE body (everything after WITH, ending at `best$iters`) —
    * shared by [[kmeansQuantSql]] and [[semDedupQuantSql]]. */
  private def kmeansQuantCtes(k: Int, iters: Int, scale: Int,
      dims: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""vq AS (
      |  SELECT vec_id, i AS dim,
      |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale.0) AS BIGINT) AS qx
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i) d),
      |init AS (
      |  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
      |  FROM (SELECT DISTINCT vec_id FROM vq ORDER BY vec_id LIMIT $k)),
      |c0 AS (
      |  SELECT init.cid, vq.dim, vq.qx FROM init JOIN vq USING (vec_id))""".stripMargin
    for (t <- 1 to iters) {
      val prev = s"c${t - 1}"
      sb ++= s""",
        |d$t AS (
        |  SELECT v.vec_id, c.cid, SUM((v.qx - c.qx) * (v.qx - c.qx)) AS d2
        |  FROM vq v JOIN $prev c USING (dim) GROUP BY v.vec_id, c.cid),
        |best$t AS (
        |  SELECT vec_id, cid, d2 FROM (
        |    SELECT vec_id, cid, d2,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |    FROM d$t) WHERE rn = 1)""".stripMargin
      if (t < iters) sb ++= s""",
        |u$t AS (
        |  SELECT b.cid, v.dim,
        |         CAST(floor(CAST(SUM(v.qx) AS DOUBLE) / COUNT(*)) AS BIGINT) AS qx
        |  FROM best$t b JOIN vq v USING (vec_id) GROUP BY b.cid, v.dim),
        |c$t AS (
        |  SELECT p.cid, p.dim, COALESCE(u.qx, p.qx) AS qx
        |  FROM $prev p LEFT JOIN u$t u ON p.cid = u.cid AND p.dim = u.dim)""".stripMargin
    }
    sb.toString
  }

  /** SemDeDup, hash-gateable twin of [[semDedup]]: clusters come from
    * the quantized Lloyd's run ([[kmeansQuantAssign]]) and the cosine
    * threshold is decided in EXACT integer arithmetic at `scale` 1024 —
    * cos(u,v) ≥ τ (= tauNum/tauDen) ⇔ dot > 0 ∧ tauDen²·dot² ≥
    * tauNum²·‖u‖²·‖v‖² (all BIGINT-safe at this scale: dot ≤ 1.9e7,
    * 25·dot² ≤ 8.6e15). The REPORTED cosine is one pinned IEEE op
    * sequence over those exact integers (÷, ×, sqrt are each correctly
    * rounded, so both engines produce bit-identical doubles — the
    * statsMoments discipline). Same drop rule / witness semantics as
    * the FP twin: drop v iff a same-cluster u < v passes τ; witness =
    * the u with the highest cosine, ties to the lower id. */
  def semDedupQuant(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 5, scale: Int = 1024, tauNum: Int = 2, tauDen: Int = 5)
      : DataFrame = {
    import spark.implicits._
    val assigned = kmeansQuantAssign(spark, sfDir, k, iters)
      .select($"vec_id", $"cluster_id")
    val vq = Tables.embeddings(spark, sfDir)
      .select($"vec_id", quantized(scale).as("p"))
    val vecs = assigned.join(vq, "vec_id")
      .withColumn("nrm2", graft.plans.VectorExpressions.longDotProduct($"p", $"p"))
      .localCheckpoint(eager = true) // tiny (n × (d+2)); break the lineage
    val pairs = vecs.as("x").join(vecs.as("y"),
        $"x.cluster_id" === $"y.cluster_id" && $"x.vec_id" < $"y.vec_id")
      .withColumn("dot",
        graft.plans.VectorExpressions.longDotProduct($"x.p", $"y.p"))
      .filter($"dot" > 0 &&
        lit(tauDen.toLong * tauDen) * $"dot" * $"dot" >=
          lit(tauNum.toLong * tauNum) * $"x.nrm2" * $"y.nrm2")
      .withColumn("cos",
        $"dot".cast("double") / sqrt(($"x.nrm2" * $"y.nrm2").cast("double")))
    pairs
      .groupBy($"y.vec_id".as("vec_id"), $"y.cluster_id".as("cluster_id"))
      .agg(max(struct($"cos", (-$"x.vec_id").as("neg_id"))).as("w"))
      .select($"vec_id", $"cluster_id", (-$"w.neg_id").as("witness_id"),
        round($"w.cos", 6).as("cosine"))
      .orderBy($"vec_id")
  }

  def semDedupQuantSql(k: Int = 8, iters: Int = 5, kmScale: Int = 4096,
      scale: Int = 1024, tauNum: Int = 2, tauDen: Int = 5,
      dims: Int = 64): String =
    s"""WITH ${kmeansQuantCtes(k, iters, kmScale, dims)},
      |vp AS (
      |  SELECT vec_id, i AS dim,
      |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale.0) AS BIGINT) AS px
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i) d2_),
      |nr AS (SELECT vec_id, CAST(SUM(px * px) AS BIGINT) AS nrm2
      |       FROM vp GROUP BY vec_id),
      |dots AS (
      |  SELECT bx.vec_id AS xid, by_.vec_id AS yid, by_.cid,
      |         CAST(SUM(xv.px * yv.px) AS BIGINT) AS dot
      |  FROM best$iters bx
      |  JOIN best$iters by_ ON bx.cid = by_.cid AND bx.vec_id < by_.vec_id
      |  JOIN vp xv ON xv.vec_id = bx.vec_id
      |  JOIN vp yv ON yv.vec_id = by_.vec_id AND yv.dim = xv.dim
      |  GROUP BY bx.vec_id, by_.vec_id, by_.cid),
      |cand AS (
      |  SELECT d.xid, d.yid, d.cid, d.dot, nx.nrm2 AS nx, ny.nrm2 AS ny
      |  FROM dots d
      |  JOIN nr nx ON nx.vec_id = d.xid
      |  JOIN nr ny ON ny.vec_id = d.yid
      |  WHERE d.dot > 0
      |    AND ${tauDen.toLong * tauDen} * d.dot * d.dot >=
      |        ${tauNum.toLong * tauNum} * nx.nrm2 * ny.nrm2),
      |wit AS (
      |  SELECT yid, cid, xid,
      |         CAST(dot AS DOUBLE) / sqrt(CAST(nx * ny AS DOUBLE)) AS cos,
      |         row_number() OVER (PARTITION BY yid
      |           ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(nx * ny AS DOUBLE)) DESC,
      |                    xid ASC) AS rn
      |  FROM cand)
      |SELECT yid AS vec_id, CAST(cid AS INTEGER) AS cluster_id,
      |       xid AS witness_id, round(cos, 6) AS cosine
      |FROM wit WHERE rn = 1 ORDER BY vec_id""".stripMargin
}
