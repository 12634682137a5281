package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, DedupStage, Sampling}

/** Specs for cluster-aware splits and incremental dedup (round 3). */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  test("cluster split: zero leakage over the staged near-dup pairs") {
    val split = Sampling.clusterSplit(spark, sf)
      .select($"doc_id", $"split")
    val pairs = DedupStage.pairs(spark, sf)
    val straddling = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .filter($"split_a" =!= $"split_b")
    assert(straddling.count() == 0, "cluster-keyed split must be leakage-free")
  }

  test("cluster split: singletons keep the per-document assignment") {
    val split = Sampling.clusterSplit(spark, sf)
    val clustered = DedupStage.clusters(spark, sf).select($"doc_id")
    val singles = split.join(clustered, Seq("doc_id"), "left_anti")
      .withColumn("own", Sampling.splitAssign($"doc_id", 1, 1, "split_v1"))
    assert(singles.filter($"split" =!= $"own").count() == 0)
    assert(singles.filter($"rep" =!= $"doc_id").count() == 0)
    // and the corpus has at least one real cluster to make the test bite
    assert(clustered.count() > 0)
  }

  test("incremental dedup: copies hit at j=1, decoys miss, naive-differential") {
    val out = Dedup.incrementalDedupQuery(spark, sf).cache()
    // every copied doc (id%20==3, >=3 tokens) matches its source exactly
    val selfHits = out.filter($"new_id" - 100000 === $"doc_id")
    assert(selfHits.filter($"jaccard" =!= 1.0).count() == 0)
    assert(selfHits.count() > 0)
    // reversed decoys never match
    assert(out.filter($"new_id" >= 200000).count() == 0)
    // completeness: equals the naive exact cross-join on shingle arrays
    val corpusSh = DedupStage.shingleDocs(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val newSh = docs.filter($"doc_id" % 20 === 3)
      .select(($"doc_id" + 100000).as("new_id"), $"text")
      .unionByName(docs.filter($"doc_id" % 20 === 7)
        .select(($"doc_id" + 200000).as("new_id"), reverse($"text").as("text")))
      .select($"new_id", Dedup.tokens($"text").as("t"))
      .filter(size($"t") >= 3)
      .select($"new_id", graft.plans.ShingleExpression.sortedShingles($"t").as("sh"))
    val naive = newSh.as("n").crossJoin(corpusSh.as("c"))
      .withColumn("n_common", graft.plans.ArrayExpressions
        .sortedIntersectSize($"n.sh", $"c.sh"))
      .withColumn("jaccard",
        $"n_common".cast("double") / (size($"n.sh") + size($"c.sh") - $"n_common"))
      .filter($"jaccard" >= 0.9)
      .select($"n.new_id", $"c.doc_id", round($"jaccard", 6).as("jaccard"))
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = naive.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    out.unpersist()
  }
}
