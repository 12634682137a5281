package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** The NN-graph edge choice must be exactly "argmax integer cosine
  * over that vector's band-candidate set" — recomputed here from the
  * same candidate generator the operator uses, so a drift between the
  * graph and the banding (different planes, different tie-break) trips
  * CI even when the oracle corpus happens to agree. */
class NnGraphSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("nn graph: one edge per covered vector, no self-edges, argmax over candidates") {
    val g = Similarity.nnGraph(spark, gateSf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.nonEmpty)
    assert(g.map(_._1).distinct.length == g.length, "duplicate source rows")
    assert(g.forall(e => e._1 != e._2), "self edge")
    // recompute the candidate sets with the operator's own generator
    val emb = graft.sources.Tables.embeddings(spark, gateSf)
    val cand = Similarity.lshBandCandidates(emb, 14, 19, 1024).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val neigh = (cand ++ cand.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // coverage: exactly the vectors with >=1 candidate appear
    assert(g.map(_._1).toSet == neigh.keySet,
      "graph sources != vectors with band candidates")
    // every edge points at a candidate of its source
    g.foreach { case (src, dst, _) =>
      assert(neigh(src).contains(dst), s"edge $src->$dst not a band candidate")
    }
  }
}
