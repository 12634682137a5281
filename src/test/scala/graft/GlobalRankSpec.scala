package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.{MapPartitionsExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec}
import graft.functions.{Retrieval, Sampling}
import graft.operators.Skyline

/** VERDICT r6 #1/#2/#7: the three single-partition corpus funnels are
  * gone. The two-pass range-partitioned global rank must reproduce the
  * single-window percent_rank bit-for-bit; the distributive skyline
  * must survive ties and dominance across partition boundaries; and
  * every remaining unpartitioned window must sit above a limit or a
  * local prune, never above a corpus-sized frame. */
class GlobalRankSpec extends SparkSuite {
  import spark.implicits._

  private def emptyPartWindows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] =
    walkPlan(df).collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  // ---- two-pass global percent_rank --------------------------------------

  test("two-pass rank == single-window percent_rank, bit-for-bit, any bucket count") {
    // length(text) has heavy ties — the tie-handling stress the
    // bucket-boundary logic must survive (ties bucket together by
    // construction: bucketing is on the score VALUE)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", length($"text").cast("double").as("score"))
    val ref = Sampling.globalPercentRankWindow(docs, "score", "doc_id", "pct")
      .select($"doc_id", $"pct").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (b <- Seq(1, 2, 5, 32)) {
      val got = Sampling.globalPercentRank(docs, "score", "doc_id", "pct",
          rankBuckets = b)
        .select($"doc_id", $"pct").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == ref, s"rankBuckets=$b drifted from the window form")
    }
  }

  test("two-pass rank hand cases: ties, single row, all-equal scores") {
    def rank2(rows: Seq[(Long, Double)]): Map[Long, Double] =
      Sampling.globalPercentRank(rows.toDF("id", "s"), "s", "id", "pct",
          rankBuckets = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // (score, id) total order: ranks 1,2,3 → 0, 0.5, 1
    assert(rank2(Seq((1L, 10.0), (2L, 10.0), (3L, 20.0))) ==
      Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
    // single row: percent_rank is defined 0, no 0/0
    assert(rank2(Seq((7L, 5.0))) == Map(7L -> 0.0))
    // all-equal scores: degenerate single bucket, id breaks the order
    assert(rank2(Seq((3L, 1.0), (1L, 1.0))) == Map(1L -> 0.0, 3L -> 1.0))
  }

  test("q_quantile_norm plans NO unpartitioned window at all") {
    val df = Sampling.quantileNorm(spark, sf)
    assert(emptyPartWindows(df).isEmpty,
      "the registered path must never funnel the corpus through one window partition")
  }

  // ---- skyline: distributive local-prune plan ----------------------------

  test("skyline: every unpartitioned window sits above the mapPartitions local prune") {
    val df = Skyline.orderSkyline(spark, sf)
    val ws = emptyPartWindows(df)
    assert(ws.nonEmpty, "final-pass prefix-MIN window expected")
    ws.foreach { w =>
      assert(walkFrom(w).exists(_.isInstanceOf[MapPartitionsExec]),
        "global window must consume the locally-pruned candidate set, not the scan")
    }
  }

  test("skyline: identical (price,date) ties in DIFFERENT partitions both survive") {
    // dominance requires strict improvement — cross-partition ties must
    // not eliminate each other in the final pass
    def part(rows: (Long, Double, String)*) =
      rows.toSeq.toDF("o_orderkey", "o_totalprice", "s")
        .select($"o_orderkey", $"o_totalprice", $"s".cast("date").as("o_orderdate"))
    val a = part((1L, 100.0, "2024-01-05"), (3L, 50.0, "2024-01-01"))
    val b = part((2L, 100.0, "2024-01-05"), (4L, 90.0, "2024-01-07"))
    assert(a.rdd.getNumPartitions + b.rdd.getNumPartitions >= 2)
    val got = Skyline.skylineOf(a.unionByName(b))
      .collect().map(_.getLong(0)).sorted
    // 1 and 2 tie (both survive); 3 has the earliest date (survives);
    // 4 is dominated by 1/2 (lower price, later date) — only cross-
    // partition information can eliminate it
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("skyline: distributive result == NOT-EXISTS semantics on orders") {
    val o = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice", to_date($"o_orderdate").as("d"))
    val keys = Skyline.orderSkyline(spark, sf).collect().map(_.getLong(0)).toSet
    // brute-force reference on the driver (sf0.001: 1 500 orders)
    val rows = o.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDate(2).toLocalDate))
    val brute = rows.filter { case (_, p, d) =>
      !rows.exists { case (_, p2, d2) =>
        p2 >= p && !d2.isAfter(d) && (p2 > p || d2.isBefore(d))
      }
    }.map(_._1).toSet
    assert(keys == brute)
  }

  // ---- hybrid search: vector leg is TakeOrderedAndProject ----------------

  test("hybrid search: ranks only ever window over limited frames") {
    val df = Retrieval.hybridSearch(spark, sf)
    val plan = walkPlan(df)
    assert(plan.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "top-kEach must compile to TakeOrderedAndProject")
    emptyPartWindows(df).foreach { w =>
      assert(walkFrom(w).exists(p => p.isInstanceOf[TakeOrderedAndProjectExec] ||
          p.isInstanceOf[GlobalLimitExec] || p.isInstanceOf[CollectLimitExec]),
        s"unpartitioned window over an unlimited frame:\n$w")
    }
  }
}
