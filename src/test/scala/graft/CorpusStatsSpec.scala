package graft

import org.apache.spark.sql.functions._
import graft.functions.{Divergence, TextAnalysis}

/** Invariants of the embedding-drift and Zipf-slope reports that the
  * hash gates can't show: the Fréchet formula's metric properties on
  * constructed distributions, and the OLS fit's exact behavior on a
  * synthetic power law plus its replication invariance. */
class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  test("embedding drift: identical slices read zero, a shifted slice reads its exact offset") {
    // labels 0 and 1 identical (and together = the corpus), label 2 is
    // label 0 shifted by +1.0 in every dim. All vectors per label equal
    // => per-label variance 0, so the diagonal-Fréchet term is exactly
    // (mu_l - mu_c)^2 + var_c - 2*0 ... with var_c > 0 the absolute
    // values are messy; use a SINGLE-label-vs-corpus design instead:
    // corpus = {v, v} under labels {0, 1} => corpus moments == each
    // label's moments => drift 0 for both.
    val v = Seq.fill(4)(0.5f)
    val same = Seq((0, v), (1, v)).toDF("label", "embedding")
    val r0 = Divergence.embeddingDriftOf(same).collect()
    r0.foreach(r => assert(r.getAs[Long]("frechet_e9") == 0L,
      s"identical slice drifted: $r"))

    // two labels, constant vectors a and b: corpus mean is the midpoint,
    // per-label and corpus variance per dim are 0 and d^2/4 (d = a-b
    // per-dim). term_l = (d/2)^2 + d^2/4 - 0 = d^2/2 per dim.
    val a = Seq.fill(4)(1.0f); val b = Seq.fill(4)(3.0f) // d = 2 (exact in fp)
    val two = Seq((0, a), (1, b)).toDF("label", "embedding")
    val r1 = Divergence.embeddingDriftOf(two, scale = 1024).collect()
    // per dim: (1024)^2 quantized units... in FLOAT units: d=2 => term
    // = 2.0 per dim, 4 dims => 8.0; quantized exactly (all values exact
    // in binary), so frechet_e9 = 8e9 * (quant scale cancels? no — the
    // formula runs in QUANTIZED units: d_q = 2048, term_q = d_q^2/2 =
    // 2097152 per dim, x4 dims = 8388608, e9-scaled).
    r1.foreach { r =>
      assert(r.getAs[Long]("frechet_e9") == 8388608L * 1000000000L,
        s"exact constant-shift drift wrong: $r")
    }
  }

  test("embedding drift: gate output is non-negative with sane shape at sf0.001") {
    val rows = Divergence.embeddingDrift(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getAs[Int]("label"))
    assert(labels.toSeq == labels.sorted.toSeq)
    rows.foreach { r =>
      // each per-dim term is >= 0 up to the e9 floor (at most 1 unit
      // per dim below zero), so the sum is >= -dims
      assert(r.getAs[Long]("frechet_e9") >= -64L, s"negative drift: $r")
      assert(r.getAs[Long]("n_vecs") > 0L)
    }
  }

  test("zipf slope: an exact power law fits slope -s with r2 = 1") {
    // counts c(r) = 2^(24 - 3*log2 r) over ranks 1,2,4,8: ln c =
    // ln 2^24 - 3 ln r ... ranks must be 1..n though (row_number).
    // Use 4 words with counts 1000, 500, 250, 125 => c(r) = 1000/2^(r-1):
    // that's exponential in rank, not a power law. Instead pick counts
    // = floor(K / r) with K large so ln-ln is NEAR -1 but not exact;
    // for an EXACT fit use 2 points: any two points fit exactly, r2=1.
    val docs = Seq(("s", Array.fill(64)("aa").mkString(" ") + " " +
      Array.fill(16)("bb").mkString(" "))).toDF("source", "text")
    val r = TextAnalysis.zipfSlopeOf(docs).collect().head
    assert(r.getAs[Long]("n_terms") == 2L)
    // slope = (ln16 - ln64)/(ln2 - ln1) = -2 exactly
    val slope = r.getAs[Long]("slope_e9")
    assert(math.abs(slope + 2000000000L) <= 10L, s"two-point slope: $slope")
    assert(math.abs(r.getAs[Long]("r2_e9") - 1000000000L) <= 10L,
      s"two-point fit must be perfect: $r")
  }

  test("zipf slope is replication-invariant: scaling every count x m shifts intercept only") {
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"source", $"text")
    val rep = (0 until 3).map(_ => base).reduce(_ unionByName _)
    val s1 = TextAnalysis.zipfSlopeOf(base).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("slope_e9"), r.getAs[Long]("n_terms"))).toMap
    val s3 = TextAnalysis.zipfSlopeOf(rep).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("slope_e9"), r.getAs[Long]("n_terms"))).toMap
    assert(s1.keySet == s3.keySet)
    s1.foreach { case (src, (sl1, n1)) =>
      val (sl3, n3) = s3(src)
      assert(n1 == n3, s"$src vocab changed under replication")
      // ln(3c) = ln 3 + ln c: y shifts by a constant, slope invariant up
      // to the e9 floor of each ln (<= ~2 units through the OLS)
      assert(math.abs(sl1 - sl3) <= 16L, s"$src slope moved: $sl1 vs $sl3")
    }
  }

  test("zipf slope: real sources read negative slope and bounded r2 at sf0.01") {
    val rows = TextAnalysis.zipfSlope(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val slope = r.getAs[Long]("slope_e9")
      val r2 = r.getAs[Long]("r2_e9")
      assert(slope < 0L, s"non-negative Zipf slope: $r")
      assert(r2 >= 0L && r2 <= 1000000000L, s"r2 out of [0,1]: $r")
    }
  }
}
