package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
