package graft

import org.apache.spark.sql.functions._
import graft.functions.DdSketch

/** DDSketch contracts the hash gate can't show: bin-wise-add
  * mergeability (the shard-safe property), the α relative-error
  * guarantee on adversarial data, exactness for point masses, and
  * replication invariance of the sketch answer. */
class DdSketchSpec extends SparkSuite {
  import spark.implicits._

  test("mergeability: sketch of A ∪ B = bin-wise count sum") {
    val a = (1 to 500).map(i => ("a", (i * 7 % 997) + 1L)).toDF("source", "x")
    val b = (1 to 300).map(i => ("b", (i * 13 % 499) + 1L)).toDF("source", "x")
    val merged = graft.functions.DdSketch.sketchOf(a unionByName b)
      .groupBy($"bin").agg(sum($"cnt").as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = graft.functions.DdSketch.sketchOf(
        (a unionByName b).withColumn("source", lit("u")))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(merged == direct, "bin-wise sum != union sketch")
  }

  test("relative-error guarantee holds on a heavy-tailed value set") {
    // powers-of-two tail: the worst case for rank-error sketches, the
    // designed-for case for relative-error ones
    val vals = (0 until 12).flatMap(k =>
      Seq.fill(1 << (11 - k))(("s", (1L << k) * 100L))).toDF("source", "x")
    val rows = DdSketch.quantileSketchOf(vals).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"), s"alpha bound broken: $r")
      val est = r.getAs[Long]("est_e6").toDouble / 1e6
      val t = r.getAs[Double]("true_q")
      assert(math.abs(est - t) <= 0.0102 * t, s"recomputed bound broken: $r")
    }
  }

  test("point mass: a constant column estimates itself within alpha") {
    val vals = Seq.fill(100)(("s", 12345L)).toDF("source", "x")
    val rows = DdSketch.quantileSketchOf(vals).collect()
    rows.foreach { r =>
      val est = r.getAs[Long]("est_e6").toDouble / 1e6
      assert(math.abs(est - 12345.0) <= 0.01 * 12345.0,
        s"constant not recovered within alpha: $r")
      assert(r.getAs[Double]("true_q") == 12345.0)
    }
  }

  test("replication: the alpha guarantee survives x3 copies (rank boundary shifts included)") {
    // x3 replication re-lands every rank inside same-value runs; the
    // addressed item can change near boundaries, but the guarantee —
    // est within alpha of the item the walk addresses — must hold in
    // both the base and replicated sketches
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"source", $"n_chars".as("x"))
    val rep = (0 until 3).map(_ => base).reduce(_ unionByName _)
    val b = DdSketch.quantileSketchOf(base).collect()
    val m = DdSketch.quantileSketchOf(rep).collect()
    assert(b.map(r => (r.getString(0), r.getString(1))).toSet ==
      m.map(r => (r.getString(0), r.getString(1))).toSet)
    (b ++ m).foreach(r =>
      assert(r.getAs[Boolean]("within_bound"), s"bound broken: $r"))
    // n scales exactly x3
    val bn = b.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    m.foreach(r => assert(r.getAs[Long]("n") ==
      3L * bn((r.getString(0), r.getString(1)))))
  }

  test("gate output: every source within bound at sf0.01") {
    val rows = DdSketch.quantileSketch(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length >= 3)
    assert(rows.forall(_.getAs[Boolean]("within_bound")),
      rows.filterNot(_.getAs[Boolean]("within_bound")).mkString("\n"))
  }
}
