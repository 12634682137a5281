package graft

import org.apache.spark.sql.functions._
import graft.functions.Hll

/** HLL contracts the hash gate can't show: register-MAX mergeability
  * (the property that makes the sketch shard-safe), the estimate's
  * standard-error band on real data, insertion-order/duplication
  * invariance, and the linear-counting regime for tiny sets. */
class HllSpec extends SparkSuite {
  import spark.implicits._

  private val sfGate = "/root/testdata/sf0.01"

  private def toks = graft.sources.Tables.documents(spark, sfGate)
    .select($"source", explode(
      regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("tok"))

  test("mergeability: registers of A ∪ B = element-wise max of A's and B's") {
    val two = toks.filter($"source".isin("src0", "src1"))
    val perSource = graft.functions.Hll.registersOf(two)
    val merged = perSource.groupBy($"reg").agg(max($"r").as("r"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val direct = graft.functions.Hll.registersOf(
        two.withColumn("source", lit("union")))
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(merged == direct, "register merge != union sketch")
  }

  test("estimate lands inside 3 standard errors on every gate source") {
    // sigma = 1.04/sqrt(256) = 6.5% relative; 3 sigma = 19.5%
    val rows = Hll.distinctSketch(spark, sfGate).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (truth, est) = (r.getAs[Long]("n_distinct"), r.getAs[Long]("hll_est"))
      assert(est > 0L)
      assert(math.abs(est - truth).toDouble / truth <= 0.195,
        s"estimate off by > 3 sigma: $r")
    }
  }

  test("duplication invariance: token multiplicity never moves a register") {
    val once = Seq(("s", "alpha"), ("s", "beta"), ("s", "gamma")).toDF("source", "tok")
    val thrice = (once union once union once)
    val a = Hll.distinctSketchOf(once).select($"hll_est", $"regs_used").collect().head
    val b = Hll.distinctSketchOf(thrice).select($"hll_est", $"regs_used").collect().head
    assert(a == b, s"duplication moved the sketch: $a vs $b")
  }

  test("linear-counting regime: tiny sets estimate near-exactly") {
    val tiny = (1 to 20).map(i => ("s", s"tok$i")).toDF("source", "tok")
    val r = Hll.distinctSketchOf(tiny).collect().head
    val est = r.getAs[Long]("hll_est")
    // 20 distinct into 256 registers: linear counting is exact up to
    // register collisions (<= a couple at this load factor)
    assert(math.abs(est - 20L) <= 2L, s"linear-counting estimate off: $r")
    assert(r.getAs[Long]("regs_used") <= 20L)
  }

  test("rho is the true leading-zero rank: cross-check against BigInt bits") {
    val sample = toks.limit(200).select($"tok").distinct()
      .withColumn("rho", graft.functions.Hll.rhoCol($"tok"))
      .withColumn("h", md5(concat(lit("hll|"), $"tok")))
      .collect()
    sample.foreach { r =>
      val tail = r.getAs[String]("h").substring(2, 17) // 15 hex chars
      val v = BigInt(tail, 16)
      val expected = if (v == 0) 61 else 61 - v.bitLength
      assert(r.getAs[Int]("rho") == expected,
        s"rho mismatch for ${r.getAs[String]("tok")}: got ${r.getAs[Int]("rho")}, want $expected")
    }
  }
}
