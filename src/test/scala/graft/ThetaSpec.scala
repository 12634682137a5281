package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Theta}

class ThetaSpec extends SparkSuite {
  import spark.implicits._

  test("KMV merge identity: bottom-k of per-part bottom-k's == bottom-k of the union") {
    val k = 16
    // two overlapping synthetic hash-priority sets
    def pris(tag: String, els: Seq[Int]) =
      els.toDF("el").select(lit(tag).as("part"),
        Dedup.hash60(concat($"el".cast("string"), lit("|t"))).as("pri"))
    val partA = pris("a", 1 to 200)
    val partB = pris("b", 150 to 350)
    val whole = partA.unionByName(partB).select($"pri").distinct()
      .orderBy($"pri").limit(k).collect().map(_.getLong(0)).toSeq
    // per-part bottom-k first, then bottom-k of the merged sketches
    def bottomK(df: org.apache.spark.sql.DataFrame) =
      df.select($"pri").distinct().orderBy($"pri").limit(k)
    val merged = bottomK(partA).unionByName(bottomK(partB))
      .distinct().orderBy($"pri").limit(k).collect().map(_.getLong(0)).toSeq
    assert(merged == whole)
  }

  test("theta estimates track exact Jaccard on the gate corpus") {
    val out = Theta.thetaOverlap(spark, sf).cache()
    assert(out.count() > 0)
    // complete-sketch pairs (union_k < k) estimate EXACTLY (≤ the 6-dp
    // quantization of the audit column)
    val completeBad = out.filter($"union_k" < Theta.K)
      .filter($"abs_err_e6" > 1L).count()
    assert(completeBad == 0, "complete sketches must be exact")
    // sampled pairs stay inside ~4σ of the k=256 binomial error
    val worst = out.agg(max($"abs_err_e6")).collect().head.getLong(0)
    assert(worst <= 200000L, s"worst abs_err_e6 $worst exceeds KMV bound")
    // union estimate is positive and ≥ matches for every pair
    assert(out.filter($"est_union_e6" < $"matches" * 1000000L).count() == 0)
    out.unpersist()
  }

  test("plan shape: no cartesian product; pair fan-out only against the broadcast source list") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = walkPlan(Theta.thetaOverlap(spark, sf))
    assert(!plan.exists(_.isInstanceOf[CartesianProductExec]),
      "theta overlap must never go corpus x corpus")
    // the a.source < b.source pair expansion is a non-equi join and may
    // only appear as a broadcast NLJ whose build side is the
    // |sources|-row list, never a shuffled pair join
    val nlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nlj.nonEmpty, "expected the broadcast pair expansion")
  }

  test("sketch-only twin: estimates agree with the audited form; plan is stage-free (no shuffled join, no shingle self-join)") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val sk = Theta.thetaOverlapSketch(spark, sf).cache()
    // estimate columns are identical to the audited query's (same sketch
    // table, same arithmetic — the audit legs must change nothing)
    val audited = Theta.thetaOverlap(spark, sf)
      .select($"source_a", $"source_b", $"union_k", $"matches", $"theta",
        $"est_union_e6", $"est_jaccard_e6", $"est_inter_e6")
    assert(sk.exceptAll(audited).count() == 0 && audited.exceptAll(sk).count() == 0)
    // THE plan pin (r9 verdict #1): the scale path carries no shuffled
    // join of any kind — in particular no shingle self-join (the exact
    // audit's SortMergeJoin) and no staged-artifact scan. The only
    // joins are the broadcast pair expansions over the source list.
    val plan = walkPlan(Theta.thetaOverlapSketch(spark, sf))
    assert(!plan.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!plan.exists(_.isInstanceOf[SortMergeJoinExec]),
      "sketch-only plan must not contain the exact audit's shingle self-join")
    assert(!plan.exists(_.isInstanceOf[ShuffledHashJoinExec]))
    assert(plan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "expected the broadcast pair expansion")
    assert(!plan.exists(p => p.nodeName.toLowerCase.contains("inmemory") &&
      p.toString.toLowerCase.contains("staged")),
      "sketch-only plan must not read a staged exact artifact")
    sk.unpersist()
  }

  test("sketch state: k rows per source max, priorities strictly increasing per source") {
    val sk = Theta.sketches(spark, sf).cache()
    val over = sk.groupBy($"source").count().filter($"count" > Theta.K)
    assert(over.count() == 0)
    val dup = sk.groupBy($"source", $"pri").count().filter($"count" > 1)
    assert(dup.count() == 0)
    sk.unpersist()
  }
}
