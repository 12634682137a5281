package graft

import org.apache.spark.sql.functions._
import graft.functions.{Decontaminate, Divergence}

/** Invariants of the slice-divergence and fuzzy-decontamination
  * operators that the hash gate can't show. */
class DivergenceSpec extends SparkSuite {
  import spark.implicits._

  test("KL is non-negative and zero only for a corpus-identical slice") {
    // two sources with IDENTICAL word multisets, one heavily skewed:
    // the identical pair must tie at (near-)zero divergence, the skewed
    // slice must diverge strictly more. Quantization floor error is
    // ≤ vocab·1e-9, far below the asserted gaps.
    val docs = Seq(
      ("a", "red green blue red green blue"),
      ("b", "blue green red blue red green"),
      ("c", "red red red red red red"))
      .toDF("source", "text")
    val r = Divergence.sliceDivergenceOf(docs)
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Long]("kl_e9")).toMap
    assert(r("a") == r("b"), s"identical slices diverged apart: $r")
    assert(r("c") > r("a") + 1000000L, s"skewed slice not detected: $r")
    // floor quantization can dip a true-zero-ish KL a few units negative
    // at most vocab-many times 1 unit; nothing should be meaningfully < 0
    r.values.foreach(v => assert(v >= -100L, s"negative KL beyond floor error: $r"))
  }

  test("n_tokens and vocab_used reconcile with direct counts at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Divergence.sliceDivergence(spark, sfDir).collect()
    assert(got.nonEmpty)
    val direct = graft.sources.Tables.documents(spark, sfDir)
      .select($"source", explode(split(trim(lower($"text")), "\\s+")).as("w"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), countDistinct($"w").as("vu"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { r =>
      val (n, vu) = direct(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("vocab_used") == vu)
      assert(r.getAs[Long]("kl_e9") >= 0L)
    }
  }

  test("plan shapes: no cartesian in the fuzzy miner; divergence broadcasts are model-sized only") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val fz = Decontaminate.fuzzyContamination(spark, "/root/testdata/sf0.001")
    val fzPlan = walkPlan(fz)
    assert(!fzPlan.exists(_.isInstanceOf[CartesianProductExec]),
      "fuzzy decontamination must not plan a CartesianProduct")
    assert(!fzPlan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "fuzzy decontamination must stay an equi-join pipeline")
    val dv = Divergence.sliceDivergence(spark, "/root/testdata/sf0.001")
    val dvPlan = walkPlan(dv)
    assert(!dvPlan.exists(_.isInstanceOf[CartesianProductExec]),
      "slice divergence must not plan a CartesianProduct")
    // the two deliberate broadcasts (per-source scalars, 1-row totals)
    // are the ONLY nested-loop joins — both model-sized by construction
    assert(dvPlan.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 2,
      "slice divergence grew an unplanned nested-loop join")
  }

  test("fuzzy decontamination: LSH path is complete vs brute cross-set verify") {
    val sfDir = "/root/testdata/sf0.01"
    val minJac = 0.8
    // brute truth: every cross-set pair through the SAME exact-Jaccard
    // arithmetic, no LSH candidate pruning
    val side = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", ($"source" === "src0").as("is_bench"))
    val sh = graft.functions.DedupStage.shingleDocs(spark, sfDir)
      .join(side, Seq("doc_id"))
    val ex = sh.select($"doc_id", $"is_bench", explode($"sh").as("s"))
    val brute = ex.filter(!$"is_bench").as("a")
      .join(ex.filter($"is_bench").as("b"), col("a.s") === col("b.s"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sh.select($"doc_id".as("doc_a"), size($"sh").as("na"), $"sh".as("sa")), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), size($"sh").as("nb"), $"sh".as("sb")), "doc_b")
      .withColumn("nc", graft.plans.ArrayExpressions.sortedIntersectSize($"sa", $"sb"))
      .withColumn("j", $"nc".cast("double") / ($"na" + $"nb" - $"nc"))
      .filter($"j" >= minJac)
      .groupBy($"doc_a").agg(count(lit(1)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Decontaminate.fuzzyContamination(spark, sfDir, "src0", minJac)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_bench_matches").toLong).toMap
    assert(lsh == brute, s"LSH path drifted from brute truth:\n lsh=$lsh\n brute=$brute")
    assert(lsh.nonEmpty, "gate corpus has no fuzzy contamination — spec is vacuous")
  }
}
