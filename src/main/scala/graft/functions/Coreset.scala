package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.plans.VectorExpressions.longDotProduct

/** Greedy k-center coreset selection over the embeddings table
  * (Gonzalez, "Clustering to minimize the maximum intercluster
  * distance", TCS 1985; the active-learning/data-pruning use is Sener
  * & Savarese, "Active Learning for Convolutional Neural Networks: A
  * Core-Set Approach", ICLR 2018) — the diversity-selection pass a
  * training-data pipeline runs to pick a small, maximally-spread
  * subset: each round selects the point FARTHEST from everything
  * selected so far, a 2-approximation of the optimal k-center cover.
  *
  * Hash-gateable by the [[Clustering]] quantized-Lloyd's recipe:
  * vectors quantize to `floor(x·1024)` longs (float→double exact,
  * ×2¹⁰ exact, floor deterministic), every distance is the exact
  * integer ‖q−c‖² = q·q − 2·q·c + c·c through the codegen
  * [[longDotProduct]] MAC loop, and ties (equal max-min distance)
  * break on the lower vec_id in both engines. The selection trajectory
  * is therefore a pure function of the stored floats, replayed
  * round-for-round by the DuckDB oracle.
  *
  * Output: rows 0..k−1 are the selected centers in selection order,
  * each with `d2_sel` = its exact squared distance to the
  * previously-selected set at the moment of selection (NULL for the
  * seed — Gonzalez's max-min radii, non-increasing by construction,
  * spec-pinned); row k is the COVERAGE CERTIFICATE — the farthest
  * still-unselected point and its distance, i.e. the k-center
  * objective value the greedy cover achieves.
  *
  * Scale: per round, ONE narrow codegen scan (centers inlined as
  * literals, exactly the k-means assignment shape) feeding a
  * TakeOrderedAndProject argmax — no shuffle, no crossJoin, driver
  * state = k quantized vectors. The k sequential scans are the honest
  * Gonzalez cost; at 100 TB one keeps the running `mind` column
  * materialized between rounds (localCheckpoint) instead of re-scanning
  * the lineage, and k scans of an IO-bound corpus is the known price
  * of the 2-approximation (cheaper sketches exist but lose the bound).
  */
object Coreset {

  /** Selected-coreset size for the gate. */
  val K = 8

  private val Scale = 1024

  private def quantized: Column =
    transform(col("embedding"),
      x => floor(x.cast("double") * Scale).cast("long"))

  /** The cached quantized projection every round scans. */
  private[graft] def quantFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), quantized.as("q"))
      .withColumn("q_sq", longDotProduct(col("q"), col("q")))

  private def d2To(c: Seq[Long]): Column = {
    val cSq = c.map(x => x * x).sum
    col("q_sq") - lit(2L) * longDotProduct(col("q"), typedLit(c)) + lit(cSq)
  }

  /** One greedy round as a plan fragment (spec-pinned shape): centers
    * inlined as literals into a single `least` projection, argmax via
    * orderBy+limit → TakeOrderedAndProject, ZERO shuffles. Recomputing
    * the full min over ≤ k centers per round keeps the fragment pure
    * (k²/2 codegen dot products total — negligible; the 100 TB form
    * materializes the running min instead, see the scaladoc above). */
  private[graft] def pickFrame(vq: DataFrame, centers: Seq[Seq[Long]],
      exclude: Seq[Long]): DataFrame = {
    val ds = centers.map(d2To)
    val mind = if (ds.size == 1) ds.head else least(ds: _*)
    vq.withColumn("mind", mind)
      .filter(!col("vec_id").isin(exclude: _*))
      .orderBy(desc("mind"), asc("vec_id")).limit(1)
  }

  /** Gated query: the greedy trajectory — (sel_order, vec_id, d2_sel)
    * for the k centers plus the row-k coverage certificate. */
  def kCenter(spark: SparkSession, sfDir: String, k: Int = K): DataFrame = {
    import spark.implicits._
    val vq = quantFrame(spark, sfDir).cache()
    // deterministic seed: the smallest vec_id
    val seed = vq.orderBy($"vec_id").limit(1).collect()(0)
    var selected = Vector[(Int, Long, Option[Long])]((0, seed.getLong(0), None))
    var centers = Vector[Seq[Long]](seed.getSeq[Long](1))
    for (r <- 1 to k) { // round k picks the coverage certificate
      val pick = pickFrame(vq, centers, selected.map(_._2)).collect()(0)
      selected :+= ((r, pick.getLong(0), Some(pick.getLong(3))))
      centers :+= pick.getSeq[Long](1)
    }
    vq.unpersist()
    spark.createDataFrame(selected)
      .toDF("sel_order", "vec_id", "d2_sel")
      .orderBy($"sel_order")
  }

  /** The greedy loop unrolled in SQL: per round, a distance CTE against
    * the new center (the exploded per-dim join, [[Clustering]]'s oracle
    * shape), a LEAST-accumulated running min, and a NOT IN-excluded
    * argmax with the same (mind DESC, vec_id) tiebreak. */
  def kCenterSql(k: Int = K, dims: Int = 64): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH vq AS MATERIALIZED (
      |  SELECT vec_id, i AS dim,
      |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $Scale.0) AS BIGINT) AS qx
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i) d),
      |seed AS MATERIALIZED (SELECT MIN(vec_id) AS vec_id FROM vq),
      |ctr0 AS MATERIALIZED (SELECT vq.dim, vq.qx FROM vq JOIN seed USING (vec_id)),
      |m0 AS MATERIALIZED (
      |  SELECT v.vec_id,
      |         CAST(SUM((v.qx - c.qx) * (v.qx - c.qx)) AS BIGINT) AS mind
      |  FROM vq v JOIN ctr0 c USING (dim) GROUP BY v.vec_id),
      |sel0 AS MATERIALIZED (SELECT 0 AS sel_order, vec_id, CAST(NULL AS BIGINT) AS d2_sel
      |         FROM seed)""".stripMargin
    for (r <- 1 to k) {
      val prevM = s"m${r - 1}"
      val prevSel = s"sel${r - 1}"
      sb ++= s""",
        |pick$r AS MATERIALIZED (
        |  SELECT m.vec_id, m.mind FROM $prevM m
        |  WHERE m.vec_id NOT IN (SELECT vec_id FROM $prevSel)
        |  ORDER BY m.mind DESC, m.vec_id LIMIT 1),
        |sel$r AS MATERIALIZED (
        |  SELECT * FROM $prevSel
        |  UNION ALL SELECT $r, vec_id, mind FROM pick$r)""".stripMargin
      if (r < k) sb ++= s""",
        |ctr$r AS MATERIALIZED (SELECT vq.dim, vq.qx FROM vq JOIN pick$r USING (vec_id)),
        |d$r AS MATERIALIZED (
        |  SELECT v.vec_id,
        |         CAST(SUM((v.qx - c.qx) * (v.qx - c.qx)) AS BIGINT) AS d2
        |  FROM vq v JOIN ctr$r c USING (dim) GROUP BY v.vec_id),
        |m$r AS MATERIALIZED (
        |  SELECT m.vec_id, LEAST(m.mind, d.d2) AS mind
        |  FROM $prevM m JOIN d$r d USING (vec_id))""".stripMargin
    }
    sb ++= s"""
      |SELECT CAST(sel_order AS INTEGER) AS sel_order, vec_id, d2_sel
      |FROM sel$k ORDER BY sel_order""".stripMargin
    sb.toString
  }
}
