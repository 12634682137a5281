package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, DedupStage, Fuzzy}

/** Contract checks for the composition queries: entity resolution
  * (block → match → close → canonicalize) and the dedup funnel. */
class ResolutionFunnelSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("entity resolution: total, fixpoints, edge-consistency, sizes") {
    val out = Fuzzy.entityResolution(spark, gateSf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nSup = spark.read.parquet(s"$gateSf/supplier.parquet").count()
    assert(out.size == nSup, "every record resolves")
    // canonical ids are fixpoints and cluster minimums
    out.foreach { case (id, (ent, _)) =>
      assert(ent <= id, s"entity_id must be the cluster minimum: $id -> $ent")
      assert(out(ent)._1 == ent, s"canonical $ent must resolve to itself")
    }
    // every matched pair shares an entity (closure consistency)
    Fuzzy.fuzzyMatch(spark, gateSf).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(out(a)._1 == out(b)._1, s"matched pair ($a,$b) split entities")
    }
    // n_members is the true entity size, and sizes sum to the total
    val sizes = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    out.foreach { case (id, (ent, n)) =>
      assert(n == sizes(ent), s"n_members wrong for $id")
    }
    assert(sizes.values.sum == nSup)
    // the chain actually merges something on the gate corpus
    assert(sizes.values.exists(_ > 1), "expected at least one multi-record entity")
  }

  test("dedup funnel: every column recomputes from the artifacts it reads") {
    val r = Dedup.dedupFunnel(spark, gateSf).head()
    val (nDocs, nUniq, nExactDup, nPairs, nInCl, nDrop, nFinal, ret) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(nDocs == spark.read.parquet(s"$gateSf/documents.parquet").count())
    assert(nUniq == Dedup.exactDedup(spark, gateSf).count())
    assert(nExactDup == nDocs - nUniq)
    assert(nPairs == DedupStage.pairs(spark, gateSf, 0.9).count())
    val cl = DedupStage.clusters(spark, gateSf, 0.9)
    assert(nInCl == cl.count())
    assert(nDrop == cl.filter($"doc_id" =!= $"cluster_keeper").count())
    assert(nFinal == Dedup.dedupedCorpus(spark, gateSf).count(),
      "n_final must equal the shipped deduped corpus")
    assert(ret == (nFinal * 1000L) / nDocs)
    // exact dups are inside the near-dup drop mass, never double-counted
    assert(nExactDup <= nDrop)
    assert(nDrop <= nInCl && nInCl <= nDocs)
  }
}
