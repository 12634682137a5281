package graft

import org.apache.spark.sql.functions._
import graft.functions.Pca

/** Specs for exact covariance + PCA (round 3). */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("covariance matches a plain-Scala computation on the corpus") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select($"embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val n = vecs.length
    val d = Pca.dim
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Pca.covariance(spark, sf).collect()
    assert(cov.length == d * (d + 1) / 2)
    var maxErr = 0.0
    cov.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      val exact = vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
      maxErr = math.max(maxErr, math.abs(c - exact))
    }
    // decimal truncation at 1e-12 per term; moment-form vs centered-form
    // double error is the dominant term — micro-tolerance, not equality
    assert(maxErr < 1e-6, s"max abs err $maxErr")
  }

  test("jacobi: equal diagonal entries still rotate (theta = 0 case)") {
    // [[1, .5], [.5, 1]] has theta = 0 at (0,1); a signum(0)-based
    // rotation would be the identity and never converge
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(1.0, 0.5), Array(0.5, 1.0)))
    assert(math.abs(vals(0) - 1.5) < 1e-12 && math.abs(vals(1) - 0.5) < 1e-12)
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(vecs(0)(0)) - inv) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(1)) - inv) < 1e-12)
  }

  test("jacobi: orthonormal eigvecs, descending eigvals, small residual") {
    val (mean, vals, vecs) = Pca.fitFrom(graft.sources.Tables.embeddings(spark, sf))
    val d = Pca.dim
    assert(mean.length == d && vals.length == d && vecs.length == d)
    // descending order
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    // orthonormality
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => vecs(a)(k) * vecs(b)(k)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$a,v$b> = $dot")
    }
    // residual ||A v - lambda v|| for the top component
    val cov = Pca.covarianceFrom(graft.sources.Tables.embeddings(spark, sf)).collect()
    val mat = Array.ofDim[Double](d, d)
    cov.foreach { r => mat(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      mat(r.getInt(1))(r.getInt(0)) = r.getDouble(2) }
    val v0 = vecs(0)
    val av = Array.tabulate(d)(i => (0 until d).map(k => mat(i)(k) * v0(k)).sum)
    val res = math.sqrt(Array.tabulate(d)(i => {
      val e = av(i) - vals(0) * v0(i); e * e
    }).sum)
    assert(res < 1e-8, s"residual $res")
  }

  test("projection matches the driver-side computation and is deterministic") {
    val out1 = Pca.pcaProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val out2 = Pca.pcaProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out1.toSeq == out2.toSeq) // bit-identical across runs
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (mean, _, vecs) = Pca.fitFrom(emb)
    val byId = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    out1.take(20).foreach { case (id, p1, p2) =>
      val v = byId(id).map(_.toDouble).toArray
      // same accumulation order as the codegen dot: left-to-right
      var d1 = 0.0; var d2 = 0.0
      for (k <- 0 until Pca.dim) { d1 += v(k) * vecs(0)(k); d2 += v(k) * vecs(1)(k) }
      var o1 = 0.0; var o2 = 0.0
      for (k <- 0 until Pca.dim) { o1 += vecs(0)(k) * mean(k); o2 += vecs(1)(k) * mean(k) }
      assert(math.abs(p1 - (d1 - o1)) < 1e-9 && math.abs(p2 - (d2 - o2)) < 1e-9)
    }
  }

  test("pc1 sample variance equals the top eigenvalue") {
    val (_, vals, _) = Pca.fitFrom(graft.sources.Tables.embeddings(spark, sf))
    val scores = Pca.pcaProject(spark, sf).select($"pc1").as[Double].collect()
    val n = scores.length
    val m = scores.sum / n
    val varPc1 = scores.map(x => (x - m) * (x - m)).sum / (n - 1)
    assert(math.abs(varPc1 - vals(0)) / math.max(vals(0), 1e-12) < 1e-6)
  }
}

/** The Gramian (mapPartitions) covariance twin: bit-identical to the
  * pair-join form — same fixed-point longs, associative addition. */
class GramianSpec extends SparkSuite {
  import graft.functions.Pca

  test("gramian covariance is bit-identical to the join covariance") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val a = Pca.covarianceFrom(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val b = Pca.covarianceGramian(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(a.length == Pca.dim * (Pca.dim + 1) / 2)
    assert(a.toSeq == b.toSeq) // full bit equality, not tolerance
  }

  test("gramian covariance survives empty partitions") {
    val emb = graft.sources.Tables.embeddings(spark, sf).repartition(64)
    val b = graft.functions.Pca.covarianceGramian(emb).count()
    assert(b == Pca.dim * (Pca.dim + 1) / 2)
  }
}
