package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Convergence-shape and regime-equivalence specs for the
  * duplicate-cluster components solver.
  *
  * Two regimes exist behind `dupClustersFromPairs`: below
  * `ClusterLocalPairLimit` a single driver-side union-find over the
  * collected pair list; above it the distributed pointer-halving
  * min-label propagation. The distributed loop caps at 50 rounds; pure
  * min-label propagation needs O(component diameter) rounds, so a
  * 120-link chain of pairwise near-dups — the classic template-drift
  * shape at corpus scale — would trip the cap. The pointer-halving
  * step makes the distance to the component minimum shrink
  * geometrically, so the same cap covers any realistic component.
  * These specs pin both regimes with synthetic pair graphs,
  * independent of the staged corpus artifacts, and pin their
  * value-equality on the same inputs.
  */
class ChainClusterSpec extends SparkSuite {
  import spark.implicits._

  /** Run in a forced regime: limit -1 ⇒ distributed loop even on an
    * empty list (0 ⇒ distributed only for non-empty inputs, since the
    * regime pick is `count <= limit`), a large limit ⇒ driver
    * union-find. */
  private def clustersOf(pairs: Seq[(Long, Long)],
      localLimit: Long): Map[Long, Long] = {
    val saved = Dedup.ClusterLocalPairLimit
    Dedup.ClusterLocalPairLimit = localLimit
    try Dedup.dupClustersFromPairs(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally Dedup.ClusterLocalPairLimit = saved
  }

  test("a 120-link chain converges under the round cap (O(log d) rounds)") {
    // forced DISTRIBUTED regime (limit 0): this is the convergence
    // property of the label-propagation loop itself.
    // diameter 120 > the 50-round cap: pure propagation would throw
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = clustersOf(chain, localLimit = 0L)
    assert(got.size == 121)
    assert(got.values.forall(_ == 0L), "every chain node labels to the minimum")
    // and the small-regime union-find agrees exactly
    assert(clustersOf(chain, localLimit = 1000000L) == got)
  }

  test("random pair graph: both regimes match an independent union-find") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val pairs = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // independent driver union-find over the same edges (no path
    // compression, union-by-min — deliberately a different shape from
    // the production dupClustersLocal)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(v => v -> {
        // component minimum among nodes that appear in pairs
        val root = find(v.toInt)
        pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .filter(u => find(u.toInt) == root).min
      }).toMap
    assert(clustersOf(pairs, localLimit = 0L) == want,
      "distributed label propagation")
    assert(clustersOf(pairs, localLimit = 1000000L) == want,
      "driver union-find small regime")
  }

  test("isolated pairs and a star component label to their minima") {
    val star = (1L to 30L).map(i => (0L, i))
    val extra = Seq((100L, 101L), (200L, 201L), (201L, 202L))
    for (limit <- Seq(0L, 1000000L)) {
      val got = clustersOf(star ++ extra, limit)
      assert(star.flatMap(p => Seq(p._1, p._2)).distinct.forall(got(_) == 0L))
      assert(got(100L) == 100L && got(101L) == 100L)
      assert(Seq(200L, 201L, 202L).forall(got(_) == 200L))
    }
  }

  test("empty pair list yields an empty cluster frame in both regimes") {
    // -1 forces the DISTRIBUTED branch (0 <= 0 would route the empty
    // list to the local union-find and leave the distributed path's
    // empty-edge-set behavior untested)
    for (limit <- Seq(-1L, 1000000L))
      assert(clustersOf(Seq.empty, limit).isEmpty)
  }
}
