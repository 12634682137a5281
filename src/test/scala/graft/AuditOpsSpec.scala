package graft

import org.apache.spark.sql.functions._
import graft.functions.{Pii, QualityModel, TextAnalysis}
import graft.operators.Profile

/** Invariant checks for the round-7 audit/report operators — the hash
  * gates pin values; these pin the CONTRACTS a reader relies on. */
class AuditOpsSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("calibration: bins partition the corpus; gaps consistent; ranges sane") {
    val out = QualityModel.calibration(spark, gateSf).collect()
    val docs = spark.read.parquet(s"$gateSf/documents.parquet").count()
    assert(out.map(_.getLong(1)).sum == docs, "bins must partition all scored docs")
    out.foreach { r =>
      val (bin, conf, pos, gap) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bin >= 0 && bin <= 9)
      assert(conf >= 0 && conf <= 1000000L && pos >= 0 && pos <= 1000000L)
      assert(gap == math.abs(conf - pos))
      // mean confidence must sit in (or at the edge of) its own bin —
      // the last bin also absorbs the score==1.0 overflow
      assert(conf >= bin * 100000L && conf <= (bin + 1) * 100000L + (if (bin == 9) 1 else 0) * 100000L)
    }
  }

  test("key skew: totals match the tables; skew factor >= uniform floor") {
    val out = Profile.keySkewProfile(spark, gateSf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set("lineitem.l_orderkey", "orders.o_custkey", "events.user_id"))
    val li = spark.read.parquet(s"$gateSf/lineitem.parquet").count()
    assert(out("lineitem.l_orderkey")._1 == li)
    out.values.foreach { case (rows, keys, maxK, skew) =>
      assert(maxK <= rows && keys <= rows)
      // max >= ceil(rows/keys) => factor >= ~1000 (uniform floor, up
      // to integer-floor slack)
      assert(skew >= 999L, s"skew factor $skew below the uniform floor")
      assert(maxK * keys * 1000L / rows == skew)
    }
  }

  test("pmi: reported bigrams meet the count floor and the formula recomputes") {
    val out = TextAnalysis.pmiCollocations(spark, gateSf).collect()
    assert(out.length == 20)
    val docs = spark.read.parquet(s"$gateSf/documents.parquet")
      .select(split(trim(lower($"text")), "\\s+").as("t"))
    val nUni = docs.select(explode($"t").as("w")).filter($"w" =!= "").count()
    val nBi = docs.filter(size($"t") >= 2)
      .agg(sum(size($"t") - 1)).collect()(0).getLong(0)
    out.foreach { r =>
      val (cab, ca, cb, pmi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cab >= 5, "count floor violated")
      val expect = math.floor(math.log(cab.toDouble / nBi) * 1e9).toLong -
        math.floor(math.log(ca.toDouble / nUni) * 1e9).toLong -
        math.floor(math.log(cb.toDouble / nUni) * 1e9).toLong
      assert(pmi == expect, s"pmi_e9 $pmi != recomputed $expect for ${r.getString(0)}")
    }
  }

  test("kappa: cells partition the corpus; formula recomputes; bounded") {
    val r = QualityModel.kappa(spark, gateSf).head()
    val (n, n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val docs = spark.read.parquet(s"$gateSf/documents.parquet").count()
    assert(n == docs && n11 + n10 + n01 + n00 == n)
    val chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val expect = (n * (n11 + n00) - chance).toDouble / (n * n - chance)
    assert(r.getDouble(5) == expect && expect >= -1.0 && expect <= 1.0)
    // two real opinions, not one rater twice: agreements AND
    // disagreements both occur. (On this corpus κ ≈ 0.04 — the median
    // gate and the row/key weak label rate nearly independent axes,
    // which is exactly the fact a κ report exists to surface.)
    assert(n11 + n00 > 0 && n10 + n01 > 0, "raters must be distinct")
    assert(expect < 0.999, s"raters look like clones: $expect")
  }

  test("chi2: cell terms recompute; dof exact; independence would be ~0") {
    val r = Profile.chi2Independence(spark, gateSf).head()
    val (n, ns, nl, dof, chi2e9) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(dof == (ns - 1) * (nl - 1) && chi2e9 >= 0)
    assert(r.getDouble(5) == chi2e9.toDouble / 1e9)
    // independent recompute from raw counts
    val cells = spark.read.parquet(s"$gateSf/documents.parquet")
      .groupBy($"source", $"lang").count().collect()
      .map(row => (row.getString(0), row.getString(1)) -> row.getLong(2)).toMap
    val rTot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cTot = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = cells.values.sum
    assert(nn == n && rTot.size == ns && cTot.size == nl)
    val expect = cells.map { case ((s, l), o) =>
      val e = (rTot(s) * cTot(l)).toDouble / nn.toDouble
      math.floor((o - e) * (o - e) / e * 1e9).toLong
    }.sum
    assert(chi2e9 == expect, s"chi2_e9 $chi2e9 != recomputed $expect")
  }

  test("langid confusion: cells partition the corpus; shares recompute") {
    val out = TextAnalysis.langIdConfusion(spark, gateSf).collect()
    val docs = spark.read.parquet(s"$gateSf/documents.parquet").count()
    assert(out.map(_.getLong(2)).sum == docs, "cells must partition the corpus")
    val rowTot = out.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    out.foreach { r =>
      val (lab, n, nLab, share) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nLab == rowTot(lab), "row total must match the labeled mass")
      assert(share == n * 1000L / nLab, "per-mille share must recompute")
    }
    // the matrix is informative, not degenerate: some mass lands on
    // the diagonal, and more than one prediction occurs. (It need NOT
    // dominate every row — on this word-salad corpus the detector
    // never fires for 'fr', and SURFACING that is the report's job.)
    val diag = out.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(diag > 0, "all-miss detector")
    assert(out.map(_.getString(1)).distinct.length > 1, "constant predictor")
  }

  test("mixture report: entropy/simpson recompute; bounds hold") {
    val out = Profile.mixtureReport(spark, gateSf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(out.keySet == Set("lang", "source"))
    for ((ax, col) <- Seq("lang" -> "lang", "source" -> "source")) {
      val cells = spark.read.parquet(s"$gateSf/documents.parquet")
        .groupBy(col).count().collect().map(_.getLong(1))
      val n = cells.sum
      val (nRows, nCells, entE9, simpE9) = out(ax)
      assert(nRows == n && nCells == cells.length)
      val expEnt = cells.map { c =>
        val p = c.toDouble / n.toDouble
        math.floor((p * math.log(p)) * -1e9).toLong
      }.sum
      val expSimp = cells.map { c =>
        val p = c.toDouble / n.toDouble
        math.floor((p * p) * 1e9).toLong
      }.sum
      assert(entE9 == expEnt, s"$ax entropy_e9 $entE9 != $expEnt")
      assert(simpE9 == expSimp, s"$ax simpson_e9 $simpE9 != $expSimp")
      // bounds: 0 <= H <= ln(cells); 1/cells <= Simpson <= 1 (up to
      // the e9 quantization slack)
      assert(entE9 >= 0 &&
        entE9 <= math.ceil(math.log(nCells.toDouble) * 1e9).toLong)
      assert(simpE9 >= (1e9 / nCells).toLong - nCells && simpE9 <= 1000000000L)
    }
  }

  test("tfidf terms: scores recompute; universal terms never surface positive") {
    val out = TextAnalysis.tfidfTopTerms(spark, gateSf).collect()
    val srcs = out.map(_.getString(0)).distinct
    assert(out.groupBy(_.getString(0)).values.forall(_.length == 5))
    val nS = spark.read.parquet(s"$gateSf/documents.parquet")
      .select($"source").distinct().count()
    assert(srcs.length == nS)
    out.foreach { r =>
      val (tf, df, score) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(df >= 1 && df <= nS)
      // idf quantized FIRST (idf_e9 = floor(ln·1e9)), then integer tf
      // multiply — the ulp-safe ADVICE-r7 discipline the engine uses
      val expect =
        tf * math.floor(math.log(nS.toDouble / df.toDouble) * 1e9).toLong
      assert(score == expect, s"score_e9 $score != $expect for ${r.getString(2)}")
      // a term present in EVERY source has idf exactly 0 — it can only
      // appear if a source has fewer than k positive-scoring terms
      if (df == nS) assert(score == 0L)
    }
    // ranks are 1..5 and descending in score within each source
    out.groupBy(_.getString(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      assert(sorted.map(_.getLong(5)).toSeq.reverse.sorted.reverse ==
        sorted.map(_.getLong(5)).toSeq)
    }
  }

  test("bootstrap ci: weights replay; interval brackets the mean sanely") {
    import graft.functions.Sampling
    val grid = Sampling.PoissonCdf
    assert(grid.length == 17 && grid.sameElements(grid.sorted))
    assert(math.abs(grid.head - math.exp(-1.0)) < 1e-15 && grid.last > 1 - 1e-14)
    val r = graft.functions.Sampling.bootstrapCi(spark, gateSf).head()
    val (n, b, mean, lo, hi) = (r.getLong(0), r.getInt(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(b == 32)
    assert(n == spark.read.parquet(s"$gateSf/documents.parquet").count())
    assert(lo <= hi, "interval must be ordered")
    assert(lo <= mean && mean <= hi,
      s"32-resample CI [$lo,$hi] should bracket the point mean $mean here")
    // CI width is resampling noise around the mean, not the data range
    assert((hi - lo) < mean * 0.5, s"CI implausibly wide: [$lo,$hi] vs $mean")
    // replay one weight end-to-end: doc 1, resample 7
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("1|7|boot_v1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(md5.take(15), 16).toDouble /
      1152921504606846976L.toDouble
    val w = grid.count(u >= _)
    assert(w >= 0 && w <= 17)
  }

  test("sample ess: Kish formula recomputes; ratio in (0, 1]") {
    val r = graft.functions.Sampling.sampleEss(spark, gateSf).head()
    val (n, sw, sw2, ess, ratio) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))
    val ws = spark.read.parquet(s"$gateSf/documents.parquet")
      .filter($"n_chars" > 0).select($"n_chars").collect().map(_.getLong(0))
    assert(n == ws.length && sw == ws.sum && sw2 == ws.map(w => w * w).sum)
    assert(ess == sw.toDouble * sw.toDouble / sw2.toDouble)
    assert(ratio == ess / n.toDouble)
    // Cauchy–Schwarz: ESS ≤ n always, = n only for constant weights
    assert(ess > 0 && ess <= n.toDouble && ratio <= 1.0)
  }

  test("dp release: CDF grid sane; noise bounded, replayable, clamped") {
    val grid = Pii.DpCdf
    assert(grid.length == 80 && grid.sameElements(grid.sorted))
    assert(grid.last > 0.999999 && grid.head < 1e-17)
    val out = Pii.dpRelease(spark, gateSf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lang, nTrue, noise, rel) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(noise >= -40 && noise <= 40)
      assert(rel == math.max(nTrue + noise, 0L))
      // replay the mechanism end-to-end: salted md5 → uniform → grid
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$lang|dp_v1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.take(15), 16).toDouble /
        1152921504606846976L.toDouble
      assert(noise == grid.count(u >= _) - 40L,
        s"noise $noise not the inverse-CDF of u=$u for $lang")
    }
  }
}
