package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Convergence-shape specs for the duplicate-cluster components loop.
  *
  * The production loop caps at 50 rounds; pure min-label propagation
  * needs O(component diameter) rounds, so a 120-link chain of pairwise
  * near-dups — the classic template-drift shape at corpus scale —
  * would trip the cap. The pointer-halving step makes the distance to
  * the component minimum shrink geometrically, so the same cap covers
  * any realistic component. These specs pin that behavior with
  * synthetic pair graphs, independent of the staged corpus artifacts.
  */
class ChainClusterSpec extends SparkSuite {
  import spark.implicits._

  private def clustersOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.dupClustersFromPairs(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 120-link chain converges under the round cap (O(log d) rounds)") {
    // diameter 120 > the 50-round cap: pure propagation would throw
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = clustersOf(chain)
    assert(got.size == 121)
    assert(got.values.forall(_ == 0L), "every chain node labels to the minimum")
  }

  test("random pair graph matches a driver-side union-find") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val pairs = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // driver union-find over the same edges
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
    assert(clustersOf(pairs) == want)
  }

  test("isolated pairs and a star component label to their minima") {
    val star = (1L to 30L).map(i => (0L, i))
    val extra = Seq((100L, 101L), (200L, 201L), (201L, 202L))
    val got = clustersOf(star ++ extra)
    assert(star.flatMap(p => Seq(p._1, p._2)).distinct.forall(got(_) == 0L))
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(Seq(200L, 201L, 202L).forall(got(_) == 200L))
  }
}
