package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Retrieval, Sampling, Similarity}
import graft.sources.Tables

/** Exact substring-span dedup: hand-checkable geometry on synthetic
  * docs (the DuckDB oracle gates the corpus run). */
class SubstringSpanSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))

  test("one shared run: exact start positions and token length") {
    // shared run "c d e f g h i j" (8 tokens): d0 pos 3..10, d1 pos 2..9
    val d = docs(
      0L -> "x1 x2 c d e f g h i j x3 x4",
      1L -> "y1 c d e f g h i j y2 y3")
    val out = Dedup.substringSpansOn(spark, d, k = 4, minSpan = 6).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((0L, 1L, 3L, 2L, 8L)))
  }

  test("two separate runs on different diagonals stay separate spans") {
    val d = docs(
      0L -> "a b c d e p q r s t",
      1L -> "a b c d e zz p q r s t")
    // k=3: run1 "a b c d e" (5 tokens, diag 0), run2 "p q r s t" (5, diag -1)
    val out = Dedup.substringSpansOn(spark, d, k = 3, minSpan = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 1L, 5L), (6L, 7L, 5L)))
  }

  test("below-threshold spans and within-doc repeats are excluded") {
    val d = docs(
      0L -> "a b c d x x x x x x",
      1L -> "a b c d y y y y y y")
    // shared run is 4 tokens; minSpan 5 → nothing (and the x/y
    // within-doc repetitions never pair across docs)
    assert(Dedup.substringSpansOn(spark, d, k = 3, minSpan = 5).count() == 0)
  }

  test("corpus: every reported span is a true exact token match") {
    val spans = Dedup.substringSpans(spark, sf, k = 5, minSpan = 8).collect()
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", Dedup.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    spans.foreach { r =>
      val (a, b, sa, sb, n) =
        (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getLong(3).toInt,
          r.getLong(4).toInt)
      val runA = toks(a).slice(sa - 1, sa - 1 + n)
      val runB = toks(b).slice(sb - 1, sb - 1 + n)
      assert(runA == runB && runA.length == n, s"span ($a,$b,$sa,$sb,$n)")
      // maximality: extending one token either way must break the match
      val leftA = if (sa >= 2) toks(a).lift(sa - 2) else None
      val leftB = if (sb >= 2) toks(b).lift(sb - 2) else None
      assert(leftA.isEmpty || leftB.isEmpty || leftA != leftB, s"left-extensible ($a,$b)")
      val rightA = toks(a).lift(sa - 1 + n)
      val rightB = toks(b).lift(sb - 1 + n)
      assert(rightA.isEmpty || rightB.isEmpty || rightA != rightB, s"right-extensible ($a,$b)")
    }
  }
}

/** Weighted (A-ES) sampling: determinism, partitioning-independence,
  * and the weight-bias property. Membership itself is oracle-gated. */
class WeightedSampleSpec extends SparkSuite {
  import spark.implicits._

  test("deterministic and partitioning-independent") {
    val a = Sampling.weightedSample(spark, sf, k = 20).collect().toSeq
    val b = Sampling.weightedSample(spark, sf, k = 20).collect().toSeq
    assert(a == b)
    assert(a.length == 20)
    // doc_id-sorted output, unique members
    val ids = a.map(_.getLong(0))
    assert(ids == ids.sorted && ids.distinct.length == ids.length)
  }

  test("selection is biased toward heavier (longer) documents") {
    val sample = Sampling.weightedSample(spark, sf, k = 100)
      .agg(avg($"n_chars")).as[Double].head()
    val corpus = Tables.documents(spark, sf)
      .filter($"n_chars" > 0).agg(avg($"n_chars")).as[Double].head()
    assert(sample > corpus,
      s"weighted sample mean n_chars $sample should exceed corpus mean $corpus")
  }

  test("different salts decorrelate the sample") {
    val a = Sampling.weightedSample(spark, sf, k = 50, salt = "s1")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(spark, sf, k = 50, salt = "s2")
      .select($"doc_id").as[Long].collect().toSet
    assert(a != b && (a intersect b).nonEmpty)
  }
}

/** SemDeDup: the drop rule verified against an independent pairwise
  * recomputation restricted to the SAME cluster assignment. */
class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  test("dropped iff a smaller-id same-cluster neighbor >= tau; kept set is tau-free") {
    val tau = 0.35
    val (assigned, _, _) = graft.functions.Clustering
      .kmeansFull(spark, sf, k = 4, iters = 2, trackInertia = false)
    val clusters = assigned.select($"vec_id", $"cluster_id", $"embedding")
      .as[(Long, Int, Seq[Float])].collect()
      .map { case (id, c, e) => (id, c, e.map(_.toDouble).toArray) }
    assigned.unpersist()
    val out = graft.functions.Clustering.semDedup(spark, sf, k = 4, iters = 2, tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty, "tau chosen so the gate is non-vacuous")
    def cos(a: Array[Double], b: Array[Double]) = {
      def d(x: Array[Double], y: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    // independent recomputation of the rule over the SAME assignment
    val expectedDrops = (for {
      (v, cv, ev) <- clusters
      smaller = clusters.filter(u => u._2 == cv && u._1 < v && cos(u._3, ev) >= tau)
      if smaller.nonEmpty
    } yield v -> smaller.map(u => (cos(u._3, ev), -u._1)).max).toMap
    val gotDrops = out.map(r => r._1 -> ((r._4, -r._3))).toMap
    assert(gotDrops.keySet == expectedDrops.keySet)
    gotDrops.foreach { case (v, (c, negW)) =>
      val (ec, eNegW) = expectedDrops(v)
      assert(negW == eNegW && math.abs(c - ec) < 1e-6, s"vec $v")
    }
    // kept set carries no intra-cluster pair >= tau
    val kept = clusters.filterNot(c => gotDrops.contains(c._1))
    for ((u, cu, eu) <- kept; (v, cv, ev) <- kept if u < v && cu == cv)
      assert(cos(eu, ev) < tau, s"kept pair ($u,$v) violates tau")
  }
}

/** MMR re-ranking: step-wise optimality verified against an
  * independent recomputation from the raw embeddings. */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  private val lambda = 0.7
  private val nCand = 30
  private val k = 8

  private def pool() = {
    val embs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => (id, e.map(_.toDouble).toArray) }.toMap
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val q = embs(0L)
    val cands = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, e) => (id, e, cos(q, e)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(nCand)
    (cands, cos _)
  }

  test("greedy picks are step-wise optimal under the MMR objective") {
    val out = Retrieval.mmrRerank(spark, sf, 0L, nCand, k, lambda)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == k && out.map(_._1).toSeq == (1 to k))
    val (cands, cos) = pool()
    val byId = cands.map(c => c._1 -> c).toMap
    var selected = List.empty[Long]
    out.foreach { case (_, pickedId, rel, mmr) =>
      val remaining = cands.filterNot(c => selected.contains(c._1))
      def objective(c: (Long, Array[Double], Double)): Double = {
        val maxSim = if (selected.isEmpty) 0.0
          else selected.map(s => cos(c._2, byId(s)._2)).max
        lambda * c._3 - (1 - lambda) * maxSim
      }
      val best = remaining.maxBy(c => (objective(c), -c._1))
      assert(best._1 == pickedId, s"step ${selected.size + 1}")
      assert(math.abs(objective(best) - mmr) < 1e-6)
      assert(math.abs(best._3 - rel) < 1e-6)
      selected = selected :+ pickedId
    }
  }

  test("diversity: MMR ranking differs from pure relevance order") {
    val mmrIds = Retrieval.mmrRerank(spark, sf, 0L, nCand, k, lambda)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    val (cands, _) = pool()
    val relIds = cands.take(k).map(_._1).toSeq
    assert(mmrIds.head == relIds.head) // first pick is pure relevance
    assert(mmrIds != relIds, "with redundant corpora MMR must reorder")
    // against a degenerate re-ranker: all picks distinct, from the pool
    assert(mmrIds.distinct.length == k)
    assert(mmrIds.toSet.subsetOf(cands.map(_._1).toSet))
  }
}
