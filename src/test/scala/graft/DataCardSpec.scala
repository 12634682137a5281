package graft

import org.apache.spark.sql.functions._
import graft.functions.{Decontaminate, Divergence, TextAnalysis}
import graft.operators.DataCard

/** The data card is pure COMPOSITION — its values must be exactly the
  * component queries' own outputs (which the hash gates already pin),
  * reshaped. This spec recomputes a representative value from each
  * section off the component operator and requires equality, plus the
  * structural contract (sections present, (section, item, metric)
  * unique, everything integer-valued). */
class DataCardSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  private lazy val card = DataCard.dataCard(spark, gateSf).collect()
    .map(r => (r.getString(0), r.getString(1), r.getString(2),
      if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))

  private def v(section: String, item: String, metric: String): Long =
    card.find(t => t._1 == section && t._2 == item && t._3 == metric)
      .getOrElse(fail(s"missing $section/$item/$metric"))._4.longValue()

  test("structure: all eleven sections, unique keys, total order") {
    val sections = card.map(_._1).distinct.sorted.toSeq
    assert(sections == Seq("contamination", "contamination_fuzzy",
      "dedup_funnel", "drift_kl", "drift_ks", "lang_id", "mixture",
      "pii", "quality_auc", "quality_calibration", "zipf"))
    val keys = card.map(t => (t._1, t._2, t._3)).toSeq
    assert(keys.distinct.length == keys.length, "(section,item,metric) unique")
    assert(keys == keys.sorted, "report carries its total order")
  }

  test("values are the components' own outputs, reshaped") {
    // mixture: entropy_e9 for the lang axis == mixtureReport's cell
    val mix = graft.operators.Profile.mixtureReport(spark, gateSf)
      .filter($"axis" === "lang").collect()(0)
    assert(v("mixture", "lang", "entropy_e9") == mix.getLong(3))
    assert(v("mixture", "lang", "n_cells") == mix.getLong(2))
    // funnel: retention straight off dedupFunnel
    val fn = graft.functions.Dedup.dedupFunnel(spark, gateSf).collect()(0)
    assert(v("dedup_funnel", "corpus", "retention_x1000") == fn.getLong(7))
    assert(v("dedup_funnel", "corpus", "n_neardup_pairs") == fn.getLong(3))
    // contamination: rollup of the per-doc gate output
    val ct = Decontaminate.contamination(spark, gateSf).collect()
    assert(v("contamination", "src0", "n_docs_flagged") == ct.length.toLong)
    assert(v("contamination", "src0", "n_contaminated_grams") ==
      ct.map(_.getInt(2).toLong).sum)
    assert(v("contamination", "src0", "max_ratio_x1e6") ==
      ct.map(r => r.getInt(2).toLong * 1000000L / r.getInt(1)).max)
    // lang_id: diagonal of the confusion matrix
    val conf = TextAnalysis.langIdConfusion(spark, gateSf).collect()
    val en = conf.filter(_.getString(0) == "en")
    val enCorrect = en.filter(r => r.getString(1) == "en").map(_.getLong(2)).sum
    assert(v("lang_id", "en", "n_correct") == enCorrect)
    assert(v("lang_id", "en", "acc_x1000") ==
      enCorrect * 1000L / en.head.getLong(3))
    // drift: kl_e9 and the floored ks stat per source
    val kl0 = Divergence.sliceDivergence(spark, gateSf).collect().head
    assert(v("drift_kl", kl0.getString(0), "kl_e9") == kl0.getLong(3))
    val ks0 = Divergence.ksTest(spark, gateSf).collect().head
    assert(v("drift_ks", ks0.getString(0), "ks_d_e9") ==
      math.floor(ks0.getDouble(3) * 1e9).toLong)
    // zipf: slope straight off the OLS gate
    val z0 = TextAnalysis.zipfSlope(spark, gateSf).collect().head
    assert(v("zipf", z0.getString(0), "slope_e9") == z0.getLong(2))
    // pii: per-family totals off the per-doc scan (r12: release sections)
    val pii = graft.functions.Pii.piiScan(spark, gateSf).collect()
    assert(v("pii", "corpus", "n_docs_flagged") ==
      pii.count(_.getBoolean(6)).toLong)
    assert(v("pii", "corpus", "n_email") ==
      pii.map(_.getInt(1).toLong).sum)
    assert(v("pii", "corpus", "n_ssn") == pii.map(_.getInt(3).toLong).sum)
    // fuzzy contamination: rollup of the LSH-mined kill list
    val fz = Decontaminate.fuzzyContamination(spark, gateSf).collect()
    assert(v("contamination_fuzzy", "src0", "n_docs_flagged") ==
      fz.length.toLong)
    assert(v("contamination_fuzzy", "src0", "max_jaccard_e6") ==
      (if (fz.isEmpty) 0L
       else math.floor(fz.map(_.getDouble(2)).max * 1e6).toLong))
    // quality: calibration bins + AUC straight off the classifier gates
    val cal = graft.functions.QualityModel.calibration(spark, gateSf)
      .collect()
    cal.foreach { b =>
      assert(v("quality_calibration", b.getLong(0).toString, "gap_micro")
        == b.getLong(4))
    }
    val auc = graft.functions.QualityModel.rocAuc(spark, gateSf)
      .collect().head
    assert(v("quality_auc", "holdout", "n_pos") == auc.getLong(0))
    assert(v("quality_auc", "holdout", "auc_e9") ==
      math.floor(auc.getDouble(3) * 1e9).toLong)
  }
}
