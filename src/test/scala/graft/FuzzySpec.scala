package graft

import org.apache.spark.sql.functions._
import graft.functions.Fuzzy

/** Specs for edit-distance fuzzy matching (round 3). */
class FuzzySpec extends SparkSuite {
  import spark.implicits._

  private def items(rows: (Long, String)*) = rows.toDF("id", "str")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("blocking is lossless vs naive all-pairs on insert/delete/substitute edits") {
    // deletions and insertions SHIFT gram positions — the case that
    // breaks positional blocking and that the tagged-bag bound covers
    val df = items(
      (1L, "kitten"), (2L, "sitten"),      // substitute: d=1
      (3L, "kitte"),                       // delete:     d=1 vs 1
      (4L, "kittten"),                     // insert:     d=1 vs 1
      (5L, "sittin"),                      // d=1 vs 2
      (6L, "banana"), (7L, "bananas"),     // insert at end
      (8L, "xyzzy"),                       // no neighbor
      (9L, "abcdefgh"), (10L, "bcdefgh")   // delete at FRONT (max shift)
    )
    for (d <- 1 to 2) {
      val fast = pairs(Fuzzy.editDistancePairs(df, d = d))
      val naive = pairs(Fuzzy.editDistancePairsNaive(df, d))
      assert(fast == naive, s"d=$d: fast=$fast naive=$naive")
      assert(naive.nonEmpty)
    }
  }

  test("short-string pool: pairs with no shared grams are still found") {
    // "a" vs "b": zero 2-grams each, edit distance 1 — only the
    // short-pool fallback can produce this pair
    val df = items((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "ba"), (5L, "longishname"))
    val fast = pairs(Fuzzy.editDistancePairs(df, d = 1))
    val naive = pairs(Fuzzy.editDistancePairsNaive(df, 1))
    assert(fast == naive)
    assert(fast.contains((1L, 2L, 1)))
  }

  test("duplicate strings match at distance 0 and survive the prefix filter") {
    val df = items((1L, "same-name"), (2L, "same-name"), (3L, "other"))
    val fast = pairs(Fuzzy.editDistancePairs(df, d = 1))
    assert(fast.contains((1L, 2L, 0)))
  }

  test("a pair reachable via both gram-prefix and short pool appears once") {
    // "ab"/"ab": len 2 >= q (gram path) AND len <= shortMax (pool) —
    // the union of the two candidate paths must be deduplicated
    val df = items((1L, "ab"), (2L, "ab"), (3L, "xy"))
    val rows = Fuzzy.editDistancePairs(df, d = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == rows.toSet.size, s"duplicate output rows: ${rows.toSeq}")
    assert(rows.toSet == Set((1L, 2L, 0)))
  }

  test("gated query agrees with the naive twin on testdata") {
    val sup = graft.sources.Tables.supplier(spark, sf)
      .select($"s_suppkey".as("id"), $"s_name".as("str"))
    val fast = pairs(Fuzzy.fuzzyMatch(spark, sf))
    val naive = pairs(Fuzzy.editDistancePairsNaive(sup, 1))
    assert(fast == naive && fast.nonEmpty)
  }
}
