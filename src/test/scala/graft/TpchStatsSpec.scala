package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, TpchQueries}

/** Q10/Q18 plan shapes and the bit-exact moments sweep. */
class TpchStatsSpec extends SparkSuite {

  test("q10/q18: dims broadcast, top-k compiles to TakeOrderedAndProject") {
    for (df <- Seq(TpchQueries.q10(spark, sf), TpchQueries.q18(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), "dim joins should broadcast")
      assert(plan.contains("TakeOrderedAndProject"),
        "LIMIT after ORDER BY must not global-sort")
    }
  }

  test("q18: every surviving order really exceeds the quantity threshold") {
    val rows = TpchQueries.q18(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 250.0))
  }

  test("stats moments: matches Spark's built-in corr/stddev within cents-quantization error") {
    val exact = Analytics.statsMoments(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val builtin = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c"),
        stddev_samp("l_quantity").as("sq"),
        covar_samp("l_quantity", "l_extendedprice").as("cv"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == builtin.keySet && exact.nonEmpty)
    for ((flag, b) <- builtin) {
      val e = exact(flag)
      // floor-to-cents moves each value < 0.01 → tiny relative drift
      assert(math.abs(e.getAs[Double]("corr_qty_price") - b.getAs[Double]("c")) < 1e-3)
      assert(math.abs(e.getAs[Double]("stddev_qty") - b.getAs[Double]("sq")) < 1e-2)
      assert(math.abs(e.getAs[Double]("covar_qty_price") - b.getAs[Double]("cv")) /
        math.abs(b.getAs[Double]("cv")) < 1e-2)
    }
  }

  test("triangles: K4 has 4, a path has 0, clustering is 3T/W") {
    import spark.implicits._
    // one shared basket of 4 items = complete graph K4
    val k4 = (1 to 4).flatMap(i => Seq((100L, i.toLong), (200L, i.toLong)))
      .toDF("bk", "item")
    val r = graft.operators.Graph.trianglesOn(k4, minCo = 2).collect().head
    assert((r.getLong(0), r.getLong(2)) == ((6L, 4L))) // C(4,2) edges, C(4,3) triangles
    assert(r.getDouble(3) == 3.0 * r.getLong(2) / r.getLong(1))
    // a 4-path: overlapping pair-baskets, no closure
    val path = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 3L), (3L, 4L))
      .flatMap { case (b, i) => Seq((b, i), (b + 10, i)) } // duplicate per pair → n_co=2
      .toDF("bk", "item")
    val p = graft.operators.Graph.trianglesOn(path, minCo = 2).collect().head
    assert(p.getLong(0) == 3L && p.getLong(2) == 0L)
  }

  test("stats moments: slope is covariance over variance (internal identity)") {
    Analytics.statsMoments(spark, sf).collect().foreach { r =>
      val slope = r.getAs[Double]("slope_price_on_qty")
      val ratio = r.getAs[Double]("covar_qty_price") * 10000.0 /
        math.pow(r.getAs[Double]("stddev_qty") * 100.0, 2)
      assert(math.abs(slope - ratio) / math.abs(slope) < 1e-9)
    }
  }
}
