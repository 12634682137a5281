package graft

import org.apache.spark.sql.functions._
import graft.functions.{QualityModel, TextAnalysis}
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
}
