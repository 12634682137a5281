package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed custom aggregation — the `Aggregator[IN, BUF, OUT]` surface
  * (SURVEY §2.11: the reference needs none; provided as the documented
  * path for aggregation semantics `functions._` can't express, with the
  * vector mean as the working example — it doubles as the centroid
  * builder a k-means/IVF refinement would use).
  *
  * Scale: the buffer is one dense double[dim] + count per group per
  * partition; merges are O(dim). Distributed merge ORDER is
  * nondeterministic, so results carry last-ulp float variance across
  * runs — which is WHY the oracle-verified queries use the decimal
  * route instead; this aggregator is compared with tolerance in tests.
  * The two coexist deliberately: exact-decimal for verifiable
  * pipelines, typed buffers for ML-shaped state.
  */
object TypedAggs {

  /** Single source of truth for the embedding width. */
  val dim: Int = Similarity.dim

  /** Mean vector aggregator; `extract` adapts any row type. */
  class VectorMean[IN](extract: IN => Array[Float])
      extends Aggregator[IN, (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), row: IN): (Array[Double], Long) = {
      val v = extract(row)
      // loud on malformed input: silently zero-padding a short vector
      // while counting the row drags the centroid toward 0
      require(v.length == dim, s"expected $dim-dim vector, got ${v.length}")
      val (sums, n) = b
      var i = 0
      while (i < dim) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      val (sa, na) = a; val (sb, nb) = b
      var i = 0
      while (i < dim) { sa(i) += sb(i); i += 1 }
      (sa, na + nb)
    }
    override def finish(b: (Array[Double], Long)): Array[Double] = {
      val (sums, n) = b
      if (n == 0) sums else sums.map(_ / n)
    }
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Per-label centroid vectors via the typed aggregator. */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val agg = new VectorMean[(Int, Array[Float])](_._2)
    graft.sources.Tables.embeddings(spark, sfDir)
      .select($"label", $"embedding").as[(Int, Array[Float])]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("centroid"))
      .toDF("label", "centroid")
      .orderBy($"label")
  }
}
