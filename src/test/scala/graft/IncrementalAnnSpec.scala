package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, Staged}

/** Incremental IVF maintenance (r11 verdict #6): appending a batch to
  * the staged cell table must be INDISTINGUISHABLE from rebuilding the
  * index on the unioned corpus — the property a growing corpus relies
  * on when it skips re-clustering. The hash gate pins this vs the
  * DuckDB one-shot oracle; this spec pins it engine-internally plus
  * the maintenance-cost structure. */
class IncrementalAnnSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.001"

  test("incrementally maintained index == full rebuild, bit for bit") {
    val inc = Similarity.knnIvfIncremental(spark, gateSf).collect().toSeq
    val full = Similarity.knnIvfQuant(spark, gateSf).collect().toSeq
    assert(inc.nonEmpty)
    assert(inc == full,
      "maintained and rebuilt indexes must agree on every (query, rank)")
  }

  test("base is a staged artifact; the batch is the only assignment work") {
    Similarity.knnIvfIncremental(spark, gateSf).count()
    val key = s"ivf_cells_base_${Staged.sfKey(gateSf)}"
    assert(Staged.buildTimes.contains(key),
      "base cell table must be a staged (build-once) artifact")
    val t1 = Staged.buildTimes(key)
    // a second maintenance round re-reads the artifact — no rebuild
    Similarity.knnIvfIncremental(spark, gateSf).count()
    assert(Staged.buildTimes(key) == t1,
      "second batch round must not rebuild the base cell table")
  }

  test("batch slice is disjoint from queries and centroids, ~10% of corpus") {
    val n = graft.sources.Tables.embeddings(spark, gateSf).count()
    val batch = graft.sources.Tables.embeddings(spark, gateSf)
      .filter($"vec_id" >= 26 && pmod($"vec_id", lit(10)) === 7)
    val nb = batch.count()
    assert(nb > 0 && nb < n / 5, s"batch $nb of $n must be a small slice")
    assert(batch.filter($"vec_id" < 26).count() == 0,
      "batch must exclude the query and frozen-centroid prefix")
  }
}
