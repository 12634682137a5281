package graft

import graft.functions.Retrieval

/** Pins the nDCG/MRR/P@k mechanics on the gate corpus: the hash gate
  * pins the exact values; these pin the internal consistency any
  * correct implementation must satisfy, so a formula regression is
  * caught even when the corpus hash moves legitimately. */
class RetrievalMetricsSpec extends SparkSuite {

  private val gateSf = "/root/testdata/sf0.01"

  test("retrieval metrics: ranking shape + metric consistency") {
    val rows = Retrieval.retrievalMetrics(spark, gateSf).collect()
    assert(rows.length == 10, "one row per rank 1..k")
    val ranks = rows.map(_.getInt(0)).toSeq
    assert(ranks == (1 to 10), s"ranks must be 1..10 in order, saw $ranks")
    // per-rank gain = rel * floor(1e9/log2(r+1))
    rows.foreach { r =>
      val w = math.floor(1e9 / (math.log(r.getInt(0) + 1.0) / math.log(2.0))).toLong
      assert(r.getLong(4) == r.getLong(3) * w,
        s"gain at rank ${r.getInt(0)} must be rel*discount")
    }
    // constant metric columns, and each derivable from the rank rows
    val (idcg, ndcg, mrr, patk) =
      (rows.head.getLong(5), rows.head.getLong(6),
        rows.head.getLong(7), rows.head.getLong(8))
    assert(rows.forall(r => r.getLong(5) == idcg && r.getLong(6) == ndcg &&
      r.getLong(7) == mrr && r.getLong(8) == patk))
    val dcg = rows.map(_.getLong(4)).sum
    assert(ndcg == dcg * 1000000L / math.max(idcg, 1L))
    assert(ndcg <= 1000000L, "nDCG cannot exceed 1 (ideal ordering bound)")
    val firstHit = rows.find(_.getLong(3) > 0).map(_.getInt(0))
    assert(mrr == firstHit.map(1000000000L / _).getOrElse(0L))
    assert(patk == rows.count(_.getLong(3) > 0).toLong * 1000000L / 10)
    // BM25's top ranks for a query of corpus terms must actually hit
    assert(patk > 0, "BM25 top-10 for corpus terms found no relevant doc")
  }
}
