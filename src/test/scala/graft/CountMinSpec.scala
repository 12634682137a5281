package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** The property that makes CMS a 100 TB summary: cell-wise mergeability
  * (executor partials / shard sketches add), plus the one-sided error
  * contract on the registered gate. */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("cms: sketch(A union B) == sketch(A) + sketch(B), cell-wise") {
    val toks = spark.read.parquet(s"$gateSf/documents.parquet")
      .select($"doc_id",
        explode(regexp_extract_all(lower($"text"),
          lit("[a-z0-9]+"), lit(0))).as("tok"))
    val a = toks.filter($"doc_id" % 2 === 0).select($"tok")
    val b = toks.filter($"doc_id" % 2 =!= 0).select($"tok")
    def cells(df: org.apache.spark.sql.DataFrame) =
      CountMin.sketchOf(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val whole = cells(toks.select($"tok"))
    assert(merged == whole,
      s"merge mismatch on ${ (merged.keySet ++ whole.keySet).count(k => merged.get(k) != whole.get(k)) } cells")
  }

  test("cms: estimates are one-sided and exact for the unambiguous heavy hitters") {
    val out = CountMin.estimateQuery(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 20)
    assert(out.forall(_._4), "CMS underestimated a count — broken hash/merge")
    // with depth 4 over a ~40-token vocabulary, at least one top token
    // should have a collision-free row and estimate exactly
    assert(out.exists(t => t._2 == t._3),
      "no exact estimate among the top tokens — width/depth misconfigured")
  }

  test("mg: canonical form recomputes; merge bound holds over doc shards") {
    import graft.functions.CountMin
    val k = CountMin.MgK
    val out = CountMin.mgTopk(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    // exact counts to recompute the canonical form against
    val counts = CountMin.mgCounts(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bySrc = counts.toSeq.groupBy(_._1._1)
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.length <= k, s"$src keeps ${rows.length} > k survivors")
      val lam = rows.head._4
      val descending = bySrc(src).map(_._2).sortBy(-_)
      val expectLam = if (descending.length > k) descending(k) else 0L
      assert(lam == expectLam, s"$src lambda $lam != (k+1)-th largest $expectLam")
      rows.foreach { case (_, tok, est, l, n, wb) =>
        assert(l == lam && est + lam == counts((src, tok)),
          s"$src/$tok est $est + lambda $lam != true ${counts((src, tok))}")
        assert(wb && lam * (k + 1) <= n, s"$src bound column wrong")
      }
      // completeness: every token with true count > lambda survived
      val kept = rows.map(_._2).toSet
      bySrc(src).foreach { case ((_, tok), c) =>
        assert((c > lam) == kept(tok), s"$src/$tok survival rule broken")
      }
    }
    // MERGE: per-shard canonical summaries, merged by adding estimates
    // and adding lambdas — est_merged <= true <= est_merged + sum(lambda)
    // for every surviving token, and any token with true > sum(lambda)
    // must be in the merged support (Berinde et al. / PODS'12 algebra)
    val docs = spark.read.parquet(s"$gateSf/documents.parquet")
      .select($"source", $"doc_id",
        explode(regexp_extract_all(lower($"text"),
          lit("[a-z0-9]+"), lit(0))).as("tok"))
    val shardCnts = (0 until 4).map { s4 =>
      docs.filter($"doc_id" % 4 === s4)
        .groupBy($"source", $"tok").agg(count(lit(1)).as("cnt"))
    }
    val shards = shardCnts.map { cnts =>
      CountMin.mgSummaryOf(cnts, k).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    }
    // per-source lambda-sum across shards from the META table — NOT off
    // survivor rows (r9 ADVICE: a shard where a source has zero
    // survivors still carries a lambda; reading it off survivors loses
    // it and understates the union bound). mgMetaOf emits one row per
    // source unconditionally.
    val lamSum = shardCnts
      .flatMap(cnts => CountMin.mgMetaOf(cnts, k).collect()
        .map(r => (r.getString(0), r.getLong(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // the meta table covers every source each shard saw, survivors or
    // not — the lost-lambda gap closed
    shardCnts.zip(shards).foreach { case (cnts, summ) =>
      val metaSrcs = CountMin.mgMetaOf(cnts, k).collect()
        .map(_.getString(0)).toSet
      val cntSrcs = cnts.select($"source").distinct().collect()
        .map(_.getString(0)).toSet
      assert(metaSrcs == cntSrcs, "meta table must cover every shard source")
      assert(summ.map(_._1).toSet.subsetOf(metaSrcs))
    }
    val estMerged = shards.flatten.groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(_._3).sum).toMap
    estMerged.foreach { case ((src, tok), est) =>
      val truth = counts((src, tok))
      val ls = lamSum(src)
      assert(est <= truth && truth <= est + ls,
        s"merge bound broken for $src/$tok: est $est true $truth lamSum $ls")
    }
    // no false negatives above the summed threshold
    counts.foreach { case ((src, tok), c) =>
      if (c > lamSum.getOrElse(src, 0L))
        assert(estMerged.contains((src, tok)),
          s"$src/$tok true count $c > lambda-sum yet missing from merge")
    }
  }

  test("mg merge gate: bound true everywhere; merged support covers heavy tokens; lam_sum covers all shards") {
    val out = CountMin.mgMerge(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
    assert(out.nonEmpty)
    // the gated algebra: est <= true <= est + lam_sum for every row,
    // shards-present within range, n_tokens = full corpus token count
    out.foreach { case (src, tok, est, nsh, lam, n, truth, ok) =>
      assert(ok && est <= truth && truth <= est + lam, s"$src/$tok")
      assert(nsh >= 1 && nsh <= CountMin.MgShards)
    }
    val corpusN = CountMin.mgCounts(spark, gateSf).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.head._6 == corpusN(src), s"$src n_tokens != corpus sum")
      // completeness (PODS'12): any token with true > lam_sum survived
      // in at least one shard and is therefore in the merged support
      val lam = rows.head._5
      val support = rows.map(_._2).toSet
      CountMin.mgCounts(spark, gateSf).filter(col("source") === src).collect()
        .foreach { r =>
          if (r.getLong(2) > lam)
            assert(support(r.getString(1)),
              s"$src/${r.getString(1)} true ${r.getLong(2)} > lam_sum $lam missing from merge")
        }
    }
  }

  test("mg: heap regime == window regime (ChainClusterSpec parity pattern)") {
    val k = CountMin.MgK
    val cnts = CountMin.mgCounts(spark, gateSf)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(t => (t._1, t._2))
    val win = canon(CountMin.mgSummaryWindow(cnts, k))
    val heap = canon(CountMin.mgSummaryHeap(cnts, k))
    assert(win.nonEmpty && win.toSeq == heap.toSeq,
      "bounded-buffer heap aggregate must reproduce the window canonical form")
    // the auto switch picks the heap on gate data when forced low (via
    // the heapLimit parameter — no shared-state mutation, r10 ADVICE),
    // and the GATED query stays oracle-identical through it
    val forced = canon(CountMin.mgTopk(spark, gateSf, heapLimit = 0L))
    assert(forced.toSeq == win.toSeq)
  }
}
