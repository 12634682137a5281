package graft

import org.apache.spark.sql.functions._
import graft.functions.{Coreset, Pii, Preference}

/** Invariant checks for the round-9 additions — t-closeness (privacy
  * trio), Bradley–Terry MM (preference aggregation), greedy k-center
  * (coreset selection). The hash gates pin the values; these pin the
  * CONTRACTS: distribution-distance recomputation, MM fixed-point
  * direction, Gonzalez's non-increasing radii + the coverage
  * certificate. */
class PreferenceCoresetSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("t-closeness: groups partition the join; tvd bounded; hand-recompute") {
    val out = Pii.tCloseness(spark, gateSf).collect()
    val joined = spark.read.parquet(s"$gateSf/customer.parquet")
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
      .join(spark.read.parquet(s"$gateSf/orders.parquet")
        .select($"o_custkey".as("c_custkey"), $"o_orderpriority"), "c_custkey")
    val n = joined.count()
    assert(out.map(_.getLong(2)).sum == n, "group sizes must partition the join")
    out.foreach { r =>
      val tvd = r.getLong(3)
      assert(tvd >= 0 && tvd <= 1000000000L, s"tvd_e9 $tvd out of [0, 1e9]")
      assert(r.getBoolean(4) == (tvd <= Pii.TCloseE9))
    }
    // exact recompute of one group's distance from raw cell counts
    val cells = joined.groupBy($"c_nationkey", $"c_mktsegment", $"o_orderpriority")
      .count().collect()
      .map(r => ((r.getAs[Number](0).longValue, r.getString(1)),
        r.getString(2), r.getLong(3)))
    val vals = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val first = out.head
    val gKey = (first.getAs[Number](0).longValue, first.getString(1))
    val gCells = cells.filter(_._1 == gKey).map(t => t._2 -> t._3).toMap
    val nG = gCells.values.sum
    val num = vals.map { case (v, nv) =>
      math.abs(gCells.getOrElse(v, 0L) * n - nv * nG)
    }.sum
    val expect = BigInt(num) * 1000000000L / (BigInt(2) * nG * n)
    assert(first.getLong(3) == expect.toLong,
      s"tvd_e9 ${first.getLong(3)} != recomputed $expect for $gKey")
  }

  test("bradley-terry: mass conservation; normalized trajectories; MM direction") {
    val out = Preference.bradleyTerry(spark, gateSf).collect()
    assert(out.nonEmpty)
    val wins = out.map(_.getLong(1)).sum
    val games = out.map(_.getLong(2)).sum
    assert(games == 2 * wins, "every duel is one win and two game-slots")
    // each round's strengths renormalize to 1e9 up to per-item floor loss
    val k = out.length
    (3 to 7).foreach { c =>
      val s = out.map(_.getLong(c)).sum
      assert(s <= 1000000000L && s >= 1000000000L - k,
        s"round ${c - 3} strengths sum $s not within floor slack of 1e9")
    }
    // known tiny matrix: A beats B 3:1 from a hand-built duel corpus —
    // the MM step must move strength toward the 3:1 fixed point
    val step1 = Preference.step(
      IndexedSeq(3L, 1L), Map((0, 1) -> 4L), IndexedSeq(500000000L, 500000000L))
    assert(step1(0) > step1(1), "MM must upweight the majority winner")
    assert(step1(0) + step1(1) <= 1000000000L &&
      step1(0) + step1(1) >= 999999998L)
    // exact fixed point of BT for 2 items is pi_A/pi_B = w_A/w_B = 3:
    // iterate a few more rounds and check convergence direction
    val step3 = Iterator.iterate(step1)(
      Preference.step(IndexedSeq(3L, 1L), Map((0, 1) -> 4L), _))
      .drop(5).next()
    assert(math.abs(step3(0).toDouble / step3(1) - 3.0) < 0.01,
      s"2-item MM should approach 3:1, got ${step3(0)}:${step3(1)}")
  }

  test("preference pairs: margin recompute, anti-symmetry, keep rule") {
    val pis = Preference.bradleyTerry(spark, gateSf).collect()
      .map(r => r.getString(0) -> r.getLong(7)).toMap // pi4_e9
    val out = Preference.preferencePairs(spark, gateSf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (_, chosen, rejected, ct, rt, margin) =>
      assert(chosen != rejected)
      // the local judgment: chosen's engagement total strictly larger
      assert(ct > rt, s"chosen_tot $ct must exceed rejected_tot $rt")
      // margin recompute off the gated trajectory's round-4 strengths
      assert(margin == pis(chosen) - pis(rejected),
        s"margin $margin != pi4($chosen) - pi4($rejected)")
      // the keep rule: strictly BT-consistent pairs only
      assert(margin > 0)
    }
    // anti-symmetry: a (user, pair) appears at most once, in one direction
    val keys = out.map(t => (t._1, Seq(t._2, t._3).sorted))
    assert(keys.distinct.length == keys.length,
      "a user's duel pair must be emitted in exactly one direction")
    // pairs are a subset of the user's decisive duels (no invented rows)
    val duels = Preference.userDuels(spark, gateSf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out.forall(t => duels((t._1, t._2, t._3))))
    // plan pin: the strength joins BROADCAST (k-row frames) — pair
    // emission must add no shuffled join beyond the duel construction
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val plan = walkPlan(Preference.preferencePairs(spark, gateSf))
    assert(plan.count(_.isInstanceOf[BroadcastHashJoinExec]) >= 2,
      "strength joins must broadcast")
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]),
      "pair emission must not introduce a shuffled join")
  }

  test("plan shapes: no cartesian anywhere; coreset round is shuffle-free top-1") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def keyedShuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      var keyed = 0
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: ShuffleExchangeLike =>
          if (s.outputPartitioning.numPartitions > 1) keyed += 1
          s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      keyed
    }
    // t-closeness: the QI×value expansion must be broadcast, never a
    // partitioned cartesian — BroadcastNestedLoopJoin is the expected
    // physical form of the dimension-sized cross joins
    val tc = Pii.tCloseness(spark, gateSf)
    tc.collect()
    assert(!tc.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "t-closeness cross joins must broadcast")
    // bradley-terry corpus fragment: per-user equi-join (no cartesian),
    // bounded exchange count (agg + join re-partitions + wins agg)
    val duels = Preference.duelMatrix(spark, gateSf)
    assert(!duels.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "duel expansion must be an equi-join on user_id")
    assert(keyedShuffles(duels) <= 4,
      "duel matrix must stay within the agg + self-join exchange budget")
    // one coreset round: centers are literals in a single projection —
    // zero shuffles, argmax via TakeOrderedAndProject (per-partition
    // heap + driver merge of 1 row, never a global sort)
    val vq = graft.functions.Coreset.quantFrame(spark, gateSf)
    val seed = vq.orderBy($"vec_id").limit(1).collect()(0)
    val pick = graft.functions.Coreset.pickFrame(vq,
      Seq(seed.getSeq[Long](1)), Seq(seed.getLong(0)))
    assert(keyedShuffles(pick) == 0, "coreset round must not shuffle")
    assert(pick.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "coreset argmax must be a top-1 heap, not a sort")
  }

  test("coreset: k+1 rows, distinct ids, non-increasing radii, exact recompute") {
    val k = Coreset.K
    val out = Coreset.kCenter(spark, gateSf, k).collect()
    assert(out.length == k + 1)
    assert(out.map(_.getInt(0)).toSeq == (0 to k))
    assert(out.map(_.getLong(1)).distinct.length == k + 1)
    assert(out.head.isNullAt(2), "seed has no prior set")
    val radii = out.tail.map(_.getLong(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"Gonzalez radii must be non-increasing: ${radii.mkString(",")}")

    // full driver-side recompute of the greedy trajectory on the
    // quantized vectors — the operator must match it exactly
    val vecs = spark.read.parquet(s"$gateSf/embeddings.parquet")
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * 1024).cast("long"))
          .as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var sel = Vector(vecs.head._1)
    var mind = vecs.map(v => v._1 -> d2(v._2, vecs.head._2)).toMap
    val byId = vecs.toMap
    val expect = Vector.newBuilder[(Long, Long)]
    for (_ <- 1 to k) {
      val cand = vecs.filter(v => !sel.contains(v._1))
        .map(v => (v._1, mind(v._1)))
        .maxBy { case (id, d) => (d, -id) }
      expect += cand
      sel :+= cand._1
      mind = mind.map { case (id, d) => id -> math.min(d, d2(byId(id), byId(cand._1))) }
    }
    val exp = expect.result()
    out.tail.zip(exp).foreach { case (row, (id, d)) =>
      assert(row.getLong(1) == id && row.getLong(2) == d,
        s"sel_order ${row.getInt(0)}: got (${row.getLong(1)}, ${row.getLong(2)}), expected ($id, $d)")
    }
  }
}
