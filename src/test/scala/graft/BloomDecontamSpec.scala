package graft

import org.apache.spark.sql.functions._
import graft.functions.Decontaminate

/** Properties of the Bloom-filter decontamination path that the
  * hash-exact oracle gate cannot express: the no-false-negative
  * guarantee vs the exact path, expression/bitmap agreement with a
  * reference Scala model, and the fixed-memory plan shape (no raw-gram
  * broadcast, corpus side unshuffled before the per-doc aggregate). */
class BloomDecontamSpec extends SparkSuite {
  import spark.implicits._

  /** Mixed corpus: doc 0/1 are the "benchmark"; 10-11 embed verbatim
    * benchmark 4-grams (true contamination), 20-29 are clean. */
  private def docs = {
    val bench = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "bench"),
      (1L, "pack my box with five dozen liquor jugs", "bench"))
    val dirty = Seq(
      (10L, "intro text then the quick brown fox jumps away", "train"),
      (11L, "pack my box with five dozen eggs instead", "train"))
    val clean = (20L until 30L).map(i =>
      (i, s"completely unrelated document number $i about weather patterns", "train"))
    (bench ++ dirty ++ clean).toDF("doc_id", "text", "source")
  }

  test("bloom flags are a superset of exact contamination hits (no false negatives)") {
    val exact = Decontaminate.contaminationOf(docs, "bench", 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val bloom = Decontaminate.bloomContaminationOf(docs, "bench", 4,
      numBits = 1L << 12, numHashes = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"exact-contaminated docs ${exact.keySet} must all be bloom-flagged, got ${bloom.keySet}")
    exact.foreach { case (id, nExact) =>
      assert(bloom(id) >= nExact,
        s"doc $id: bloom hit count ${bloom(id)} < exact count $nExact")
    }
    assert(exact.keySet == Set(10L, 11L), "fixture sanity: the planted dirty docs")
  }

  test("an undersized filter errs toward false positives, never negatives") {
    // 64 bits for ~11 bench grams: collisions by construction. Extra
    // docs may surface (false positives — the promised failure
    // direction), but the exact-contaminated set must still be covered.
    val exactIds = Decontaminate.contaminationOf(docs, "bench", 4)
      .collect().map(_.getLong(0)).toSet
    val tinyIds = Decontaminate.bloomContaminationOf(docs, "bench", 4,
      numBits = 64, numHashes = 2).collect().map(_.getLong(0)).toSet
    assert(exactIds.subsetOf(tinyIds),
      s"even saturated, flags must cover exact hits: $exactIds vs $tinyIds")
    assert(tinyIds.size > exactIds.size,
      s"fixture sanity: 64 bits should collide into at least one false positive " +
        s"(exact $exactIds, bloom $tinyIds)")
  }

  test("BloomContains agrees with a reference Scala model, bit for bit") {
    val numBits = 1L << 10
    val k = 5
    val grams = docs.filter($"source" === "bench")
      .select(explode(split(lower($"text"), "\\s+")).as("g"))
    val bitmap = Decontaminate.bloomBitmap(grams, numBits, k)
    // reference model over raw hashes via the same md5-prefix hash
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    def refContains(s: String): Boolean = {
      val h = h60(s); val h1 = h % numBits; val h2 = 1L + (h >> 20) % (numBits - 1L)
      (0 until k).forall { j =>
        val p = (h1 + j * h2) % numBits
        ((bitmap((p >> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L
      }
    }
    val probeWords = Seq("fox", "jugs", "weather", "casino", "the",
      "patterns", "zebra", "quick", "dozen", "unseen-token-xyz")
    val got = probeWords.toDF("g")
      .select($"g", graft.plans.BloomExpression.bloomContains(
        graft.functions.Dedup.hash60($"g"),
        typedLit(bitmap.toSeq), numBits, k).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probeWords.foreach { w =>
      assert(got(w) == refContains(w), s"probe '$w': expr ${got(w)} != model ${refContains(w)}")
    }
    assert(probeWords.exists(got), "sanity: some probes hit")
    assert(probeWords.exists(w => !got(w)), "sanity: some probes miss")
  }

  test("BloomContains codegen compiles past 2^31 bits (the advertised 1 GB sizing)") {
    // regression: the generated h2 literal (numBits-1) printed without an
    // L suffix, so Janino rejected any filter over Int.MaxValue bits and
    // Spark silently fell back to interpreted eval at exactly the corpus
    // scale the expression exists for. Compile the generated Java
    // directly — no eval (a real 2^33-bit words array would be 1 GB).
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val expr = graft.plans.BloomContains(
      Literal(123456789L),
      Literal.create(Seq(0L), ArrayType(LongType)),
      numBits = 1L << 33, numHashes = 7)
    GenerateMutableProjection.generate(Seq(expr)) // throws on bad codegen
  }

  test("plan: no raw-gram broadcast and no corpus shuffle before the per-doc aggregate") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    val df = Decontaminate.bloomContaminationOf(docs, "bench", 4,
      numBits = 1L << 12, numHashes = 5)
    val plan = walkPlan(df)
    assert(!plan.exists(p => p.isInstanceOf[BroadcastExchangeExec] ||
        p.isInstanceOf[BroadcastHashJoinExec] ||
        p.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "the probe side must carry the bitmap as a literal — no join, no broadcast")
    // the corpus branch shuffles exactly once on doc_id (partial agg →
    // hash exchange → final agg); the only other exchange is the range
    // partitioning of the deterministic output sort. The eval branch is
    // not in this plan at all — it ran eagerly inside bloomBitmap.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    val parts = plan.collect { case s: ShuffleExchangeExec => s.outputPartitioning }
    assert(parts.count(_.isInstanceOf[HashPartitioning]) == 1,
      s"corpus branch should hash-shuffle once (doc_id agg), got $parts")
    assert(parts.forall(p => p.isInstanceOf[HashPartitioning] ||
        p.isInstanceOf[RangePartitioning]),
      s"unexpected exchange kinds: $parts")
  }
}
