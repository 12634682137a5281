package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Staged
import graft.sources.Tables

/** Materialized shared intermediates for the customer co-purchase
  * graph — the [[graft.functions.DedupStage]] pattern applied to the
  * basket domain.
  *
  * Both graph-flavored consumers of customer baskets pay the same two
  * expensive stages before they diverge:
  *
  *   distinct (customer, item) baskets  →  co-purchase pair supports
  *
  * and the pair build is the quadratic step (per-basket item² via the
  * self-join). Built independently per query, that step ran twice at
  * sf0.1 (~2 s each inside q_item_neighbors and q_triangles); a dbt-ish
  * DAG materializes it once and both models read the artifact.
  *
  * The pair table is staged at the MINIMUM floor over its consumers
  * ([[SharedFloor]]): support counts are exact regardless of floor, so
  * a consumer at a higher floor just filters the artifact — same rows
  * it would have computed itself (asserted by the unchanged oracles of
  * q_item_neighbors and q_triangles).
  *
  * At 100 TB the same edge holds: the pair table is the expensive,
  * reusable asset (power-law-bounded by the per-basket cap, far smaller
  * than the raw corpus), and recomputing it per consumer would be the
  * scale bug. */
object BasketStage {

  /** Minimum pair-support floor across consumers (triangles uses 3,
    * item-neighbors 4). Consumers below this floor must build their own
    * pairs — enforced where the artifact is consumed. */
  val SharedFloor: Long = 3L

  /** Distinct (bk, item) customer baskets — bk = o_custkey, item joined
    * through the order's lineitems. */
  def custBaskets(spark: SparkSession, sfDir: String): DataFrame =
    Staged.materialize(s"baskets_cust_${Staged.sfKey(sfDir)}", spark) {
      Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("bk"), col("l_partkey").as("item"))
        .distinct()
    }

  /** Canonical co-purchase pairs (pa < pb, n_ab) with n_ab ≥
    * [[SharedFloor]] — exact counts, shared by every ≥-floor consumer. */
  def pairSupports(spark: SparkSession, sfDir: String): DataFrame =
    Staged.materialize(s"baskets_pairs_${Staged.sfKey(sfDir)}", spark) {
      val b = custBaskets(spark, sfDir)
      b.as("a")
        .join(b.as("b"), col("a.bk") === col("b.bk") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("pa"), col("b.item").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= SharedFloor)
    }

  /** Force-build every stage (Bench times the shared build once,
    * explicitly, instead of burying it in whichever consumer runs
    * first). */
  def prebuild(spark: SparkSession, sfDir: String): Unit = {
    pairSupports(spark, sfDir).count()
    ()
  }
}
