package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import graft.functions.Similarity

/** Scale shape + completeness of the embedding near-dup miners
  * (VERDICT r5 #1: the registered q_cosine_neardup path must not be an
  * all-pairs crossJoin).
  *
  *  - block-pair (1-Bucket-Theta) miner: plan is an equi-join (no
  *    CartesianProduct / BroadcastNestedLoopJoin) and the output is
  *    EXACTLY the brute crossJoin's — completeness by construction.
  *  - banded sign-LSH miner: subset-of-brute with exact cosines
  *    (precision 1.0), no cartesian in the plan, and on planted
  *    near-duplicates at the production threshold (cos ≥ 0.9) recall is
  *    1.0 while the candidate set is a small fraction of all pairs.
  */
class SimilarityScaleSpec extends SparkSuite {
  import spark.implicits._

  private def noCartesian(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val plan = walkPlan(df)
    assert(!plan.exists(_.isInstanceOf[CartesianProductExec]),
      s"$what must not plan a CartesianProduct")
    assert(!plan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"$what must not plan a BroadcastNestedLoopJoin")
  }

  test("block-pair miner: equi-join plan, output identical to brute crossJoin") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val blocked = Similarity.cosineNearDupPairsOn(emb, 0.45, numBlocks = 16)
    noCartesian(blocked, "cosineNearDupPairs")
    val brute = Similarity.cosineNearDupBrute(emb, 0.45).collect().toSeq
    assert(blocked.collect().toSeq == brute,
      "block-pair mining must be a drop-in for the brute miner")
    // a different block count must not change the result either
    assert(Similarity.cosineNearDupPairsOn(emb, 0.45, numBlocks = 5)
      .collect().toSeq == brute)
  }

  test("LSH miner: precision 1.0 (subset of brute, exact cosines), no cartesian") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val lsh = Similarity.cosineNearDupLshOn(emb, 0.45, bands = 8,
      rowsPerBand = 4, scale = 1024)
    noCartesian(lsh, "cosineNearDupLsh")
    val bruteRows = Similarity.cosineNearDupBrute(emb, 0.45).collect().toSet
    val lshRows = lsh.collect().toSet
    assert(lshRows.subsetOf(bruteRows),
      "every LSH pair must appear in the exact miner's output with the identical cosine")
  }

  /** Deterministic synthetic corpus for the production regime: 200 base
    * vectors (hash-derived components) + 20 planted near-duplicates
    * (tiny perturbation → cos ≥ 0.99). */
  private def plantedCorpus() = {
    def comp(id: Int, i: Int): Float = {
      // murmur3-style finalizer: full avalanche, so components are
      // i.i.d.-looking in [-1, 1) (a weak mixer here once made every
      // component of a vector identical and collapsed all LSH buckets)
      var h = (id * 2654435761L + i * 1315423911L) ^ 0x9E3779B97F4A7C15L
      h = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
      h = (h ^ (h >>> 33)) * 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      (((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0).toFloat
    }
    val base = (0 until 200).map(id =>
      (id.toLong, (0 until Similarity.dim).map(i => comp(id, i)).toArray))
    val dups = (0 until 20).map { d =>
      val src = base(d)._2
      (1000L + d, src.zipWithIndex.map { case (x, i) =>
        x + 0.02f * comp(5000 + d, i) })
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("LSH miner: full recall and real pruning in the near-dup regime") {
    val emb = plantedCorpus()
    val minCos = 0.95
    val truePairs = Similarity.cosineNearDupBrute(emb, minCos)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.size >= 20, s"fixture must plant >= 20 near-dup pairs, got ${truePairs.size}")
    // auto-tuned bands at the production threshold: miss < 1e-4 per pair
    val (bands, rows) = Similarity.lshBandParams(minCos, eps = 1e-4)
    val found = Similarity.cosineNearDupLshOn(emb, minCos, bands, rows, 1024)
      .select($"vec_a", $"vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == truePairs,
      s"recall must be 1.0 at cos >= $minCos: missed ${(truePairs -- found).take(5)}")
    // pruning: the candidate set must be a small fraction of all pairs
    val n = emb.count()
    val allPairs = n * (n - 1) / 2
    val cands = Similarity.lshBandCandidates(emb, bands, rows, 1024).count()
    assert(cands < allPairs / 4,
      s"LSH must prune: $cands candidates of $allPairs pairs (bands=$bands rows=$rows)")
  }

  test("lshBandParams: recall bound tightens with cosine, bands grow with eps") {
    val (b1, r1) = Similarity.lshBandParams(0.9, 1e-2)
    val (b2, _) = Similarity.lshBandParams(0.9, 1e-4)
    assert(b2 > b1, "smaller eps needs more bands")
    val p1 = 1.0 - math.acos(0.9) / math.Pi
    val recall = 1.0 - math.pow(1.0 - math.pow(p1, r1), b1)
    assert(recall >= 0.99)
  }
}
