package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Fixture-contract tripwires: every assumption the code PINS about the
  * driver-owned testdata, asserted loudly in one place. The round-4
  * events timestamp-unit regen proved these assumptions drift silently
  * and poison whole query families; the loader now probes timestamp
  * units itself (TsUnitSpec), and this spec covers the rest — so the
  * NEXT regeneration that changes shape fails here with a named
  * contract, not as 29 red hash gates. */
class FixtureContractSpec extends SparkSuite {

  test("embeddings: 64-dim float vectors, labels in a small domain") {
    val e = Tables.embeddings(spark, sf).cache()
    // quantized oracles (Clustering/Similarity/Pca) generate SQL with a
    // literal 64-dim unnest — a dim change must fail HERE by name
    val dims = e.select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"embedding dim drift: $dims — update Similarity.dim/Pca.dim and the " +
        "generated quantized oracles (kmeansQuantSql, knnLshQuantSql, ...)")
    // quantization headroom: |x| < 2 keeps floor(x*4096) within the
    // overflow analysis in the quantized-gate Scaladocs
    val mx = e.select(max(abs(expr("aggregate(embedding, CAST(0.0 AS FLOAT), " +
      "(a, x) -> greatest(a, abs(x)))")))).collect()(0).getFloat(0)
    assert(mx < 2.0f, s"embedding magnitude drift: max |x| = $mx >= 2")
    assert(e.filter(col("vec_id").isNull || col("vec_id") < 0).isEmpty)
    e.unpersist()
    ()
  }

  test("documents: non-null ids and text; n_chars matches text length") {
    val d = Tables.documents(spark, sf).cache()
    assert(d.filter(col("doc_id").isNull || col("text").isNull).isEmpty)
    val bad = d.filter(col("n_chars") =!= length(col("text"))).count()
    assert(bad == 0, s"n_chars no longer equals length(text) on $bad rows")
    d.unpersist()
    ()
  }

  test("events: ids/users present, value finite, type domain stable") {
    val ev = Tables.events(spark, sf).cache()
    assert(ev.filter(col("event_id").isNull || col("user_id").isNull).isEmpty)
    assert(ev.filter(isnan(col("value"))).isEmpty)
    val types = ev.select("event_type").distinct().count()
    assert(types >= 2 && types <= 32,
      s"event_type cardinality drift: $types (stream-enrich dim + attribution " +
        "assume a small stable domain)")
    ev.unpersist()
    ()
  }

  test("tpch: keys join-complete (no dangling FKs in the fixture)") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    val dangling = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(dangling == 0,
      s"orders->customer FK drift: $dangling dangling keys — demand/revenue " +
        "analytics assume inner joins lose no rows")
    val nat = Tables.nation(spark, sf)
    val reg = Tables.region(spark, sf)
    assert(nat.join(reg, nat("n_regionkey") === reg("r_regionkey"),
      "left_anti").isEmpty)
  }
}
