package graft

import graft.functions.Preference

/** Length-bias audit (r10 verdict #4): planted length-biased duels
  * must surface as a skewed longer-win rate, and the integer
  * bucket/median arithmetic must match a hand recompute. The hash gate
  * (q_preference_length_bias) pins the corpus values; this pins the
  * DETECTION behavior on a corpus engineered to be biased. */
class PreferenceLengthBiasSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  /** (user, type, value) × n copies → one events row per copy. */
  private def events(rows: Seq[(Long, String, Double, Int)]) =
    spark.createDataFrame(
      rows.flatMap { case (u, t, v, n) => Seq.fill(n)((u, t, v)) })
      .toDF("user_id", "event_type", "value")

  test("planted length bias: longer side always wins -> win rate 1000") {
    // users 1..10: A = 10 events of 1.0 (tot 10, len 10) beats
    //              B =  2 events of 0.5 (tot  1, len  2)  — longer wins
    // user 11:     B = 5 events of 2.0 beats A = 1 event of 1.0 — gives
    //              B its regularity win (dropped by the margin rule:
    //              pi(A) > pi(B) from 11 wins to 1)
    // user 12:     A = 3×3.0 beats B = 3×1.0 — a LENGTH TIE pair
    val ev = events(
      (1L to 10L).flatMap(u => Seq((u, "A", 1.0, 10), (u, "B", 0.5, 2))) ++
        Seq((11L, "B", 2.0, 5), (11L, "A", 1.0, 1),
          (12L, "A", 3.0, 3), (12L, "B", 1.0, 3)))
    val out = Preference.preferenceLengthBiasFrom(spark, ev).collect()
    // combined lengths: 12 for users 1..10 (two-sig-digit bucket
    // 2·100+12 = 212); 6 for user 12 (bucket 1·100+6 = 106); user 11's
    // pair is B-chosen with margin < 0 → dropped
    assert(out.length == 2, s"expected 2 buckets, got ${out.length}")
    val b1 = out.find(_.getInt(0) == 106).get
    assert(b1.getLong(1) == 1 && b1.getLong(2) == 0 && b1.getLong(3) == 1,
      "bucket 1 must hold the single all-tie pair")
    assert(b1.isNullAt(4), "all-tie bucket has no longer-win rate")
    assert(b1.getLong(5) == 3 && b1.getLong(6) == 3 && b1.getLong(7) == 0)
    val b2 = out.find(_.getInt(0) == 212).get
    assert(b2.getLong(1) == 10 && b2.getLong(2) == 10 && b2.getLong(3) == 0)
    assert(b2.getLong(4) == 1000, "planted bias must read as 1000/1000")
    assert(b2.getLong(5) == 10 && b2.getLong(6) == 2 && b2.getLong(7) == 8,
      "medians must be the planted lengths 10/2/8")
  }

  test("planted anti-bias: shorter side always wins -> win rate 0") {
    // A wins on VALUE with FEWER events everywhere; B gets one
    // regularity win (user 21, dropped by the margin rule)
    val ev = events(
      (1L to 8L).flatMap(u => Seq((u, "A", 9.0, 2), (u, "B", 0.5, 9))) ++
        Seq((21L, "B", 99.0, 9), (21L, "A", 1.0, 2)))
    val out = Preference.preferenceLengthBiasFrom(spark, ev).collect()
    assert(out.length == 1)
    val b = out.head
    assert(b.getLong(1) == 8 && b.getLong(2) == 0 && b.getLong(3) == 0)
    assert(b.getLong(4) == 0, "anti-bias must read as 0/1000")
    assert(b.getLong(7) == -7, "median delta must be negative (2 - 9)")
  }

  test("gate corpus: buckets partition the kept pairs; rates bounded") {
    val pairs = Preference.preferencePairs(spark, gateSf).count()
    val out = Preference.preferenceLengthBias(spark, gateSf).collect()
    // r11 verdict #4: the gate must pin real bucket geometry — the
    // two-sig-digit log buckets give ≥5 rows at gate SF (vs the old
    // digit-count bucket's 1)
    assert(out.length >= 5, s"expected >=5 buckets, got ${out.length}")
    assert(out.map(_.getLong(1)).sum == pairs,
      "bucket pair counts must partition the kept set")
    out.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1),
        "longer-chosen + ties cannot exceed the bucket")
      if (!r.isNullAt(4))
        assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000)
      assert(r.getLong(7) == r.getLong(7), "delta median present")
    }
  }
}
