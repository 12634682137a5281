package graft

import org.apache.spark.sql.functions._
import graft.functions.QualityModel

/** The trained quality classifier: learning actually happens (accuracy
  * beats the majority baseline by a wide margin), and the distributed
  * fixed-point GD matches a from-scratch single-threaded
  * re-implementation bit-for-bit — the union-find-differential
  * discipline applied to a training loop. */
class QualityModelSpec extends SparkSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val scored = QualityModel.trainAndScore(spark, sfDir).collect()

  test("classifier beats the majority baseline decisively") {
    val n = scored.length
    val pos = scored.count(_.getLong(1) == 1L)
    val baseline = math.max(pos, n - pos).toDouble / n
    val acc = scored.count(r =>
      r.getBoolean(3) == (r.getLong(1) == 1L)).toDouble / n
    assert(n > 0)
    assert(acc >= 0.90, s"accuracy $acc")
    assert(acc >= baseline + 0.15,
      s"accuracy $acc vs majority baseline $baseline — no learning")
  }

  test("distributed GD matches a driver-side reimplementation exactly") {
    // independent single-threaded trainer over the same raw text
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("t"))
      .as[(Long, Seq[String])].collect()
    val D = QualityModel.Dim
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % D
    }
    val feats = docs.map { case (id, t) =>
      val m = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      t.foreach(tk => m(bucket(tk)) += 1)
      m(-1L) = 1L // bias
      id -> m.toMap
    }.toMap
    val labels = docs.map { case (id, t) =>
      id -> (if (t.count(_ == "row") > t.count(_ == "key")) 1L else 0L)
    }.toMap
    val n = docs.length
    val micro = 1000000L
    def sOf(z: Long): Long =
      math.min(math.max(math.floorDiv(z, 4L) + micro / 2, 0L), micro)
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to QualityModel.Iters) {
      val g = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      feats.foreach { case (id, fm) =>
        val z = fm.map { case (j, x) => w(j) * x }.sum
        val r = sOf(z) - labels(id) * micro
        fm.foreach { case (j, x) => g(j) += x * r }
      }
      g.foreach { case (j, gj) =>
        w = w.updated(j,
          w(j) - Math.floorDiv(gj, QualityModel.LrDen * n.toLong))
      }
    }
    val expected = feats.map { case (id, fm) =>
      id -> sOf(fm.map { case (j, x) => w(j) * x }.sum)
    }
    assert(scored.length == expected.size)
    scored.foreach { r =>
      assert(r.getLong(2) == expected(r.getLong(0)),
        s"doc ${r.getLong(0)}: distributed ${r.getLong(2)} vs " +
          s"reference ${expected(r.getLong(0))}")
    }
  }

  test("held-out eval: confusion partitions the test split; metrics consistent") {
    val r = QualityModel.evalHoldout(spark, sfDir).collect().head
    val Seq(tp, fp, fn, tn, prec, rec, f1) = (0 to 6).map(r.getLong)
    // the split itself, recomputed independently
    val test = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id",
        graft.functions.Sampling.splitAssign($"doc_id", 0, 30, "split_v1")
          .as("split"),
        (size(filter(split(trim(lower($"text")), "\\s+"), t => t === "row")) >
          size(filter(split(trim(lower($"text")), "\\s+"), t => t === "key")))
          .cast("long").as("y"))
      .filter($"split" === "test")
    assert(tp + fp + fn + tn == test.count())
    assert(tp + fn == test.agg(sum($"y")).collect().head.getLong(0),
      "actual positives partition into tp + fn")
    if (tp + fp > 0) assert(prec == tp * 1000000L / (tp + fp))
    if (tp + fn > 0) assert(rec == tp * 1000000L / (tp + fn))
    assert(f1 >= math.min(prec, rec) && f1 <= math.max(prec, rec),
      "F1 is the harmonic mean — between precision and recall")
    // generalization: the held-out F1 clears a floor far above chance
    assert(f1 >= 700000L, s"held-out f1_micro $f1")
  }

  test("scores are valid probabilities in micro units; decisions match scores") {
    scored.foreach { r =>
      val s = r.getLong(2)
      assert(s >= 0L && s <= 1000000L)
      assert(r.getBoolean(3) == (s >= 500000L))
    }
  }
}
