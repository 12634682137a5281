package graft

import graft.functions.DomainReweight

/** Closed-form + property pins for the DoReMi-style multiplicative
  * reweighting: the corpus gate hashes the trajectory; these pin the
  * FORMULA on inputs whose answers are knowable by hand. */
class DomainReweightSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.001"

  test("step: two-domain hand case (exact integers)") {
    // losses 2e9 / 6e9 at uniform weights: weighted ref = 4e9, only the
    // hard domain has excess 2e9 -> multiplier 1.5e9/1e9, normalized
    // weights exactly (0.4, 0.6) of 1e9
    val w1 = DomainReweight.step(
      Seq((2000000000L, 500000000L), (6000000000L, 500000000L)))
    assert(w1 == Seq(400000000L, 600000000L))
    // next round: ref = 0.4*2e9 + 0.6*6e9 = 4.4e9, excess (0, 1.6e9),
    // raws (4e17, 8.4e17) -> floors of 1e9 * raw / 1.24e18
    val w2 = DomainReweight.step(
      Seq((2000000000L, 400000000L), (6000000000L, 600000000L)))
    assert(w2 == Seq(322580645L, 677419354L))
  }

  test("step: equal losses are a fixed point; weight order follows loss order") {
    val eq = DomainReweight.step(
      Seq((3000000000L, 250000000L), (3000000000L, 250000000L),
        (3000000000L, 250000000L), (3000000000L, 250000000L)))
    assert(eq.forall(_ == 250000000L),
      "zero excess everywhere must leave weights unchanged")
    val losses = Seq(1000000000L, 5000000000L, 3000000000L, 9000000000L)
    var ws: Seq[Long] = losses.map(_ => 250000000L)
    (1 to DomainReweight.Rounds).foreach { _ =>
      ws = DomainReweight.step(losses.zip(ws))
    }
    assert(losses.zip(ws).sortBy(_._1).map(_._2) == ws.sorted,
      "final weights must be ordered like the losses")
    assert(ws(losses.indexOf(losses.max)) > 250000000L,
      "the hardest domain must gain weight")
    assert(ws(losses.indexOf(losses.min)) < 250000000L,
      "the easiest domain must lose weight")
  }

  test("gate frame: trajectory invariants on the corpus") {
    val df = DomainReweight.domainReweight(spark, gateSf).collect()
    assert(df.nonEmpty)
    val e9 = 1000000000L
    val d = df.length
    // each round's weights sum to 1e9 up to the per-domain floor loss
    Seq(4, 5, 6, 7, 8).foreach { c =>
      val s = df.map(_.getLong(c)).sum
      assert(s <= e9 && s > e9 - d,
        s"round weights must normalize to ~1e9 (col $c saw $s)")
    }
    // monotone dynamics: the max-loss domain never loses weight
    val hardest = df.maxBy(_.getLong(3))
    val traj = (4 to 8).map(hardest.getLong)
    assert(traj.zip(traj.tail).forall { case (a, b) => b >= a },
      s"hardest domain's weight must be non-decreasing, saw $traj")
  }
}
