package graft

import graft.operators.Scheduler
import graft.operators.Scheduler.Trigger

/** Randomized differential for the cadence expansion: 120 seeded
  * random triggers vs a brute-force driver-side tick walker (generate
  * every tick from the anchor, filter — O(elapsed), the formulation
  * the distributed query deliberately avoids). Catches off-by-one
  * boundary drift (strict lower / closed upper), k0 arithmetic, and
  * policy coalescing across the whole parameter space, not just the
  * fixture. */
class SchedulerPropSpec extends SparkSuite {

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")

  private def str(e: Long): String =
    java.time.LocalDateTime
      .ofEpochSecond(e, 0, java.time.ZoneOffset.UTC).format(fmt)

  private def epoch(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toEpochSecond(java.time.ZoneOffset.UTC)

  /** Brute reference: walk every tick from the anchor. */
  private def bruteDue(t: Trigger, nowE: Long): Seq[(String, Long, Long)] = {
    if (!t.enabled) return Nil
    val a = epoch(t.anchor)
    val p = t.everyMinutes * 60
    val lb = t.lastRun.map(epoch).getOrElse(a - 1)
    val all = Iterator.from(0)
      .map(k => (k.toLong, a + k * p))
      .takeWhile(_._2 <= nowE)
      .filter(_._2 > lb)
      .map { case (k, e) => (t.pipeline, k, e) }
      .toSeq
    if (t.policy == "latest") all.takeRight(1) else all
  }

  test("120 random triggers match the brute tick walker") {
    val rnd = new scala.util.Random(42)
    val base = epoch("2024-01-01 00:00:00")
    val triggers = (1 to 120).map { i =>
      val anchor = base + rnd.nextInt(86400 * 30)
      val every = 1 + rnd.nextInt(180) // minutes
      val lastRun =
        if (rnd.nextInt(4) == 0) None
        // may precede, hit, or trail the anchor grid arbitrarily
        else Some(str(anchor + rnd.nextInt(86400 * 2) - 3600))
      Trigger(s"t$i", every.toLong, str(anchor), lastRun,
        if (rnd.nextBoolean()) "all" else "latest", rnd.nextInt(10) > 0)
    }
    val now = str(base + 86400 * 31) // ≤ ~2 days of backlog per trigger
    val nowE = epoch(now)
    val expected = triggers.flatMap(bruteDue(_, nowE))
      .sortBy(r => (r._1, r._2))
    val got = Scheduler.dueRuns(spark, triggers, now).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(r => (r._1, r._2))
    assert(got == expected)
  }

  test("a last_run BEFORE the anchor owes the anchor tick and everything after") {
    val t = Seq(Trigger("pre", 60, "2024-03-01 10:00:00",
      Some("2024-03-01 08:00:00"), "all", enabled = true))
    val got = Scheduler.dueRuns(spark, t, "2024-03-01 12:00:00").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(0L, 1L, 2L).map(k =>
      (k, epoch("2024-03-01 10:00:00") + k * 3600)))
  }
}
