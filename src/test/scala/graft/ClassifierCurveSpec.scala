package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, DedupStage, Divergence, QualityModel}

/** Closed-form hand cases for the round-7 distribution/ranking
  * reports (ROC-AUC, PR curve, KS drift, containment) — the hash
  * gates pin the corpus values; these pin the FORMULAS on inputs
  * whose answers are knowable by inspection. */
class ClassifierCurveSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  private def scored(rows: (Long, Long)*) = rows.toDF("y", "s")

  test("roc-auc: perfect, reversed, tied, and interleaved rankings") {
    // perfect separation: every positive above every negative
    val perfect = QualityModel.rocAucOf(
      scored((1L, 90L), (1L, 80L), (0L, 20L), (0L, 10L))).head()
    assert(perfect.getDouble(3) == 1.0 && perfect.getLong(2) == 8L)
    // reversed: AUC 0
    assert(QualityModel.rocAucOf(
      scored((0L, 90L), (1L, 10L))).head().getDouble(3) == 0.0)
    // all scores tied: AUC exactly 0.5 from the ½·P(=) term
    assert(QualityModel.rocAucOf(
      scored((1L, 50L), (1L, 50L), (0L, 50L), (0L, 50L))).head()
      .getDouble(3) == 0.5)
    // interleaved n+ = n− = 2: pairs (p80: both negs below or tied →
    // 2 concordant... enumerate: pos{80,30} neg{60,10};
    // (80,60)+(80,10)+(30,10) concordant, (30,60) discordant → 3/4
    assert(QualityModel.rocAucOf(
      scored((1L, 80L), (0L, 60L), (1L, 30L), (0L, 10L))).head()
      .getDouble(3) == 0.75)
    // one-class holdout: NULL, not a fabricated value
    assert(QualityModel.rocAucOf(scored((1L, 5L), (1L, 7L))).head().isNullAt(3))
  }

  test("pr curve: inclusive cumulatives, exact ratios, recall reaches 1") {
    val rows = QualityModel.prCurveOf(
      scored((1L, 90L), (0L, 70L), (1L, 70L), (0L, 10L)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // threshold 90: tp=1 fp=0 → precision 1, recall 1/2
    assert(rows(90L) == ((1L, 0L, 1.0, 0.5)))
    // threshold 70: the tied pos+neg group joins → tp=2 fp=1
    assert(rows(70L) == ((2L, 1L, 2.0 / 3.0, 1.0)))
    // threshold 10: everything kept
    assert(rows(10L) == ((2L, 2L, 0.5, 1.0)))
  }

  test("ks: identical slices → 0; disjoint supports → 1 at the boundary") {
    def frame(rows: (String, Double)*) = rows.toDF("source", "v")
    val same = Divergence.ksTestOf(frame(
      ("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(same == Map("a" -> 0.0, "b" -> 0.0))
    val split = Divergence.ksTestOf(frame(
      ("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    // a sits entirely below b: D = 1, attained from a's top value
    assert(split("a") == ((1.0, 2.0)) && split("b") == ((1.0, 2.0)))
  }

  test("containment: complete vs the naive sparse join; asymmetry real") {
    val mined = Dedup.containmentPairs(spark, gateSf)
    val got = mined.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got.nonEmpty, "gate corpus must surface containment pairs")
    // independent completeness oracle: shingles rebuilt from scratch
    // with plain HOFs, then the FULL sparse self-join (no prefix
    // filter) → exact per-pair containment at the threshold
    val sh = spark.read.parquet(s"$gateSf/documents.parquet")
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", array_distinct(expr(
        "transform(sequence(0, size(t)-3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
      .cache()
    val ex = sh.select($"doc_id", explode($"sh").as("g"))
    val naive = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_in"), col("b.doc_id").as("doc_of"))
      .agg(count(lit(1)).as("n_common"))
      .join(sh.select($"doc_id".as("doc_in"), size($"sh").as("n_in")), "doc_in")
      .filter($"n_common".cast("double") / $"n_in" >= 0.9)
      .select($"doc_in", $"doc_of", $"n_common",
        round($"n_common".cast("double") / $"n_in", 6).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got == naive, "prefix-filtered miner must equal the naive join")
    // the count-filter extension is pruning-only: with NO extension
    // (minimal prefix, thr = 1 — the count filter degenerates to
    // "shares a prefix shingle") the output is identical
    val minimal = Dedup.containmentPairsOf(
        DedupStage.shingleDocs(spark, gateSf), 0.9, extraFrac = 0.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(minimal == got, "index-extension regimes must agree")
    sh.unpersist()
  }

  test("containment: plan shape — no cartesian, no corpus nested-loop") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = walkPlan(Dedup.containmentPairs(spark, gateSf))
    assert(!plan.exists(_.isInstanceOf[CartesianProductExec]),
      "containment miner must never go cartesian")
    assert(!plan.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "containment miner must never nested-loop the corpus")
  }

  test("containment: asymmetric by construction — doc-in-doc, Jaccard-blind") {
    // A is swallowed whole by B (every shingle of A appears in B), but
    // B is 4× larger: C(A→B) = 1 while J(A,B) = 1/4 — below any sane
    // Jaccard near-dup threshold. C(B→A) = 1/4: no reverse row.
    val a = (1 to 10).map(i => s"w$i").mkString(" ")
    val b = a + " " + (11 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, "x1 x2 x3 x4"))
      .toDF("doc_id", "text")
      .select($"doc_id", split(trim(lower($"text")), "\\s+").as("t"))
      .select($"doc_id", sort_array(array_distinct(expr(
        "transform(sequence(0, size(t)-3), " +
          "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))).as("sh"))
    val rows = Dedup.containmentPairsOf(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(rows == Map((1L, 2L) -> 1.0),
      s"expected exactly the contained direction, got $rows")
  }
}
