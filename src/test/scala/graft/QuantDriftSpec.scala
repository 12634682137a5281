package graft

import org.apache.spark.sql.functions._
import graft.functions.{Clustering, Retrieval, Similarity}
import graft.sources.Tables

/** FP ↔ quantized twin drift gates (VERDICT r5 #3).
  *
  * Five CORRECTNESS rows certify integer-quantized twins (q_kmeans,
  * q_semdedup, q_mmr_rerank, q_knn_lsh, q_knn_ivf) while the float
  * operators are the production scale paths. These specs pin the two
  * paths together at the gate SF so a change to either twin that
  * decouples the certified output from the production output fails
  * loudly instead of shipping silently.
  *
  * MMR and knn-LSH agree EXACTLY on this corpus and are pinned exactly.
  * The other three can legitimately differ on decisions that sit within
  * one quantization step of a boundary (integer centroids drift the
  * Lloyd's boundaries; a micro-unit cosine can order a near-tie either
  * way), so their gates assert that every disagreement is EXPLAINED by
  * such a boundary — gross drift (wrong init, broken update, decoupled
  * params) produces unexplained disagreements and still fails. */
class QuantDriftSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  /** (vec_id → embedding as doubles) for the given ids. */
  private def embOf(ids: Set[Long]): Map[Long, Array[Double]] =
    Tables.embeddings(spark, gateSf)
      .filter($"vec_id".isin(ids.toSeq: _*))
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cosOf(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  test("kmeans: quant memberships agree with FP except FP-boundary vectors") {
    val (fpAssigned, fpCentroids, _) =
      Clustering.kmeansFull(spark, gateSf, k = 8, iters = 5, trackInertia = false)
    val fp = fpAssigned.select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    fpAssigned.unpersist()
    val qt = Clustering.kmeansQuantAssign(spark, gateSf, k = 8, iters = 5)
      .select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(fp.keySet == qt.keySet)
    val diff = fp.keys.filter(id => fp(id) != qt(id)).toSet
    // coarse bound: the twins must agree on the overwhelming majority
    assert(diff.size <= fp.size / 20,
      s"membership drift on ${diff.size}/${fp.size} vectors — more than boundary noise")
    // every disagreeing vector must be a boundary case IN FP SPACE: the
    // quant-chosen cluster's FP centroid is within 5% squared-distance
    // of the FP-chosen one (a decoupled model violates this grossly)
    val cent = fpCentroids.toMap
    val vecs = embOf(diff)
    diff.foreach { id =>
      def d2(cid: Int): Double = {
        val c = cent(cid); val v = vecs(id)
        var s = 0.0; var i = 0
        while (i < v.length) { val dx = v(i) - c(i); s += dx * dx; i += 1 }
        s
      }
      // bound: integer centroids drift from FP centroids by
      // O(iters/scale) per dim, compounding over 5 rounds — observed
      // ≤ 1.07× at this SF; a decoupled model (wrong init/update/k)
      // assigns to clusters ≥ 2× away
      val (dFp, dQt) = (d2(fp(id)), d2(qt(id)))
      assert(dQt <= dFp * 1.15,
        s"vec $id: quant cluster ${qt(id)} is ${dQt / dFp}x the FP-best " +
          s"distance — not a boundary case, the twins have decoupled")
    }
  }

  test("semdedup: every drop-set disagreement is a cluster-drift or near-tau boundary") {
    val tau = 0.4
    val fp = Clustering.semDedup(spark, gateSf, k = 8, iters = 5, tau = tau)
      .select($"vec_id", $"witness_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val qt = Clustering.semDedupQuant(spark, gateSf)
      .select($"vec_id", $"witness_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // the twins must agree on the large common core
    val common = fp.keySet & qt.keySet
    assert(common.size * 4 >= (fp.keySet | qt.keySet).size * 3,
      s"drop sets barely overlap: fp=${fp.size} qt=${qt.size} common=${common.size}")
    // FP cluster assignments, for explaining disagreements
    val (fpAssigned, _, _) =
      Clustering.kmeansFull(spark, gateSf, k = 8, iters = 5, trackInertia = false)
    val fpCl = fpAssigned.select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    fpAssigned.unpersist()
    val qtCl = Clustering.kmeansQuantAssign(spark, gateSf, k = 8, iters = 5)
      .select($"vec_id", $"cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val disagreements = // (dropped vec, that twin's witness) on either side
      (fp.keySet -- qt.keySet).map(v => (v, fp(v))) ++
        (qt.keySet -- fp.keySet).map(v => (v, qt(v)))
    val ids = disagreements.flatMap { case (v, w) => Seq(v, w) }
    val vecs = embOf(ids)
    disagreements.foreach { case (v, w) =>
      val clusterDrift = fpCl(v) != qtCl(v) || fpCl(w) != qtCl(w)
      val nearTau = math.abs(cosOf(vecs(v), vecs(w)) - tau) < 5e-3
      assert(clusterDrift || nearTau,
        s"drop of $v (witness $w) differs between twins with stable " +
          s"clusters and cos ${cosOf(vecs(v), vecs(w))} far from tau=$tau")
    }
  }

  test("mmr: FP and fixed-point greedy select the same ids in the same order") {
    val fp = Retrieval.mmrRerank(spark, gateSf)
      .select($"rank", $"vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    val qt = Retrieval.mmrRerankQuant(spark, gateSf)
      .select($"rank", $"vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(fp == qt, s"selection drift: fp=$fp qt=$qt")
  }

  test("knn lsh: FP and quantized twins return the same neighbors and ranks") {
    val fp = Similarity.knnLsh(spark, gateSf)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val qt = Similarity.knnLshQuant(spark, gateSf)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fp == qt,
      s"top-k drift: fp-only=${(fp -- qt).take(5)} quant-only=${(qt -- fp).take(5)}")
  }

  test("knn ivf: same neighbor sets; rank swaps only on micro-tied cosines") {
    val fpRows = Similarity.knnIvf(spark, gateSf)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val qtRows = Similarity.knnIvfQuant(spark, gateSf)
      .select($"query_id", $"rank", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // the RETRIEVAL decision — which neighbors — must agree exactly
    val fpSets = fpRows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val qtSets = qtRows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(fpSets == qtSets, "neighbor sets differ between FP and quant IVF")
    // ranks may swap ONLY between neighbors whose FP cosines sit within
    // the scale-1024 quantized-cosine error band (component error
    // < 1/1024 → cosine error ~1e-3; observed swap gap 2.4e-4)
    val fpCos = fpRows.map(r => (r._1, r._3) -> r._4).toMap
    val fpAt = fpRows.map(r => (r._1, r._2) -> r._3).toMap
    qtRows.foreach { case (q, rank, n) =>
      val fpN = fpAt((q, rank))
      if (fpN != n)
        assert(math.abs(fpCos((q, n)) - fpCos((q, fpN))) < 2e-3,
          s"query $q rank $rank: quant ranks $n where FP ranks $fpN and " +
            s"their cosines differ beyond the quantization error band")
    }
  }
}
