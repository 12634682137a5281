package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** The property that makes CMS a 100 TB summary: cell-wise mergeability
  * (executor partials / shard sketches add), plus the one-sided error
  * contract on the registered gate. */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("cms: sketch(A union B) == sketch(A) + sketch(B), cell-wise") {
    val toks = spark.read.parquet(s"$gateSf/documents.parquet")
      .select($"doc_id",
        explode(regexp_extract_all(lower($"text"),
          lit("[a-z0-9]+"), lit(0))).as("tok"))
    val a = toks.filter($"doc_id" % 2 === 0).select($"tok")
    val b = toks.filter($"doc_id" % 2 =!= 0).select($"tok")
    def cells(df: org.apache.spark.sql.DataFrame) =
      CountMin.sketchOf(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val whole = cells(toks.select($"tok"))
    assert(merged == whole,
      s"merge mismatch on ${ (merged.keySet ++ whole.keySet).count(k => merged.get(k) != whole.get(k)) } cells")
  }

  test("cms: estimates are one-sided and exact for the unambiguous heavy hitters") {
    val out = CountMin.estimateQuery(spark, gateSf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 20)
    assert(out.forall(_._4), "CMS underestimated a count — broken hash/merge")
    // with depth 4 over a ~40-token vocabulary, at least one top token
    // should have a collision-free row and estimate exactly
    assert(out.exists(t => t._2 == t._3),
      "no exact estimate among the top tokens — width/depth misconfigured")
  }
}
