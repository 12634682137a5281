package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Trainable document-quality classifier — the learned counterpart of
  * [[TextAnalysis.qualityScore]]'s hand-set heuristic: a linear
  * classifier over hashed bag-of-token counts (the fastText/CCNet
  * quality-filter shape), trained IN the engine with full-batch
  * gradient descent.
  *
  * Training arithmetic is fixed-point ("micro" = 1e-6 units) with a
  * hard sigmoid σ̂(z) = clamp(z/4 + ½, 0, 1) — the quantized-training
  * formulation: weights, scores, residuals, and gradient sums are all
  * exact integers, so the entire T-round optimization is
  * order-independent, bit-reproducible, and DuckDB-oracle-gateable
  * (the same discipline as the k-means/ANN quantized gates, applied to
  * the TRAINING loop itself, unrolled to T CTE rounds in the oracle).
  *
  * Distributed shape (the k-means control pattern): features are
  * corpus-sized and stay put — built once, localCheckpoint-pinned,
  * re-joined each round; the MODEL (D+1 weights) is the only thing
  * that moves, broadcast out per round and collected back as the D+1
  * gradient rows. Per round: one broadcast-join + doc-keyed partial
  * agg for scores, one feature-keyed partial agg for the gradient —
  * two map-side-combined shuffles of bounded width, zero corpus-sized
  * driver traffic. At 100 TB the same loop holds: rounds cost
  * O(|corpus features|) map work and |model|-sized exchanges.
  *
  * Supervision is a deterministic weak label (count("row") >
  * count("key")) — separable by construction on the synthetic corpus,
  * so the gate proves the LEARNING MACHINERY (accuracy rises from the
  * ~0.56 majority baseline to ~0.95; total |residual| falls) rather
  * than a modeling claim. A real pipeline swaps in curated labels; the
  * plumbing is identical.
  *
  * Feature hashing is md5-prefix mod D (the [[TextAnalysis.fingerprint]]
  * cross-engine discipline); bucket −1 carries the bias (x = 1 on
  * every doc), so one update rule covers all D+1 parameters.
  */
object QualityModel {

  /** Hashed feature dimension. Sized with HEADROOM over the corpus
    * vocabulary, not snug to it — the fastText rule (its default
    * bucket count is 2M against million-token vocabs): model quality
    * falls off through bucket collisions as vocab/D grows, and that is
    * a DATA property the engine must leave room for, not an engine
    * property. Measured by the ×64 soak (round 7): at D = 512 a ×64
    * vocabulary (~2.5 k distinct tokens over 512 buckets) drowned the
    * two label-signal buckets in collision counts and held-out F1
    * degenerated to the all-positive baseline (0.62 vs 0.81); at 8192
    * the load factor stays < 1/3 at ×64 and F1 is scale-stable. Cost
    * is unchanged where it matters: the feature table is keyed by
    * OBSERVED buckets (≤ per-doc distinct tokens, independent of D),
    * so only the broadcast weight frame and the D+1-row gradient
    * aggregate grow — both still model-sized. */
  val Dim = 8192
  val Iters = 16
  val LrDen = 16 // step = floor(gradient / (LrDen · n))
  private val Micro = 1000000L

  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  private def hashBucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % Dim

  /** (doc_id, j, x): hashed token counts + the j = −1 bias feature.
    *
    * r12 optimization (guide §1.2 "per-task work" after the shape is
    * right): md5 + base-16 string conv per TOKEN OCCURRENCE was the
    * dominant cost of the feature build (~1M evaluations at sf0.1 for
    * a ~2.5k vocabulary). Count per (doc, token) first (map-side
    * combinable), hash only the DISTINCT tokens, and broadcast the
    * tiny token→bucket dictionary back — the fastText dictionary
    * shape. Counts regroup by (doc, bucket) afterwards, so the output
    * rows are bit-identical (sum of per-token counts per bucket ==
    * direct per-bucket count). At 100 TB the vocabulary is still
    * megabytes — the dictionary broadcast holds. */
  private def features(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val docTok = docs.select($"doc_id", explode($"t").as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("x0"))
    val vocab = docTok.select($"tok").distinct()
      .select($"tok", hashBucket($"tok").as("j"))
    docTok.join(broadcast(vocab), "tok")
      .groupBy($"doc_id", $"j").agg(sum($"x0").as("x"))
      .unionByName(docs.select($"doc_id", lit(-1L).as("j"), lit(1L).as("x")))
  }

  /** Hard-sigmoid score in micro units from a raw margin; floor keeps
    * the integer image identical in both engines (CAST would round). */
  private def sMicro(z: Column): Column =
    least(greatest(floor(z / 4.0).cast("long") + Micro / 2, lit(0L)),
      lit(Micro))

  /** Staged feature/label artifacts for a corpus — the tokenize +
    * hash + count pass runs once per process and BOTH model variants
    * (full fit, held-out fit) and all 8×2 GD rounds read the parquet. */
  private def prepare(spark: SparkSession,
      sfDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    def docs = Tables.documents(spark, sfDir)
      .select($"doc_id", toks($"text").as("t"))
    // label via exploded codegen sums instead of two non-codegen HOF
    // array filters per doc (r12, guide §4.1 — prefer built-ins with
    // codegen): COUNT(tok = 'row') > COUNT(tok = 'key') per doc is the
    // same integer comparison (split() never yields an empty array, so
    // explode drops no doc). The two independent staged builds overlap
    // from two driver threads (guide §2.6), shaving the shorter build
    // off the stage wall; Staged's per-key cells make this safe.
    def featF = features(docs)
    def labF = docs.select($"doc_id", explode($"t").as("tok"))
      .groupBy($"doc_id")
      .agg((sum(when($"tok" === "row", 1L).otherwise(0L)) >
        sum(when($"tok" === "key", 1L).otherwise(0L))).cast("long").as("y"))
    val featK = s"qm_feat_${Staged.sfKey(sfDir)}"
    val labK = s"qm_lab_${Staged.sfKey(sfDir)}"
    val threads = Seq(
      new Thread(() => { Staged.materialize(featK, spark)(featF); () }),
      new Thread(() => { Staged.materialize(labK, spark)(labF); () }))
    threads.foreach(_.start()); threads.foreach(_.join())
    (Staged.materialize(featK, spark)(featF),
      Staged.materialize(labK, spark)(labF))
  }

  /** Attach the broadcast weight column (`w`, default 0) — the ONE
    * definition shared by training rounds and serving-time scoring, so
    * the two can never drift on join type / default / broadcast. */
  private def withWeights(df: DataFrame, wm: Map[Long, Long]): DataFrame = {
    import df.sparkSession.implicits._
    if (wm.isEmpty) df.withColumn("w", lit(0L))
    else df.join(broadcast(wm.toSeq.toDF("j", "w")), Seq("j"), "left")
      .withColumn("w", coalesce($"w", lit(0L)))
  }

  /** (doc_id, y, s, r) under weight map `wm` over `feat`⋈`lab`. */
  private def scoresWith(wm: Map[Long, Long], feat: DataFrame,
      lab: DataFrame): DataFrame = {
    import feat.sparkSession.implicits._
    withWeights(feat, wm).groupBy($"doc_id").agg(sum($"x" * $"w").as("z"))
      .join(lab, "doc_id")
      .select($"doc_id", $"y", sMicro($"z").as("s"),
        (sMicro($"z") - $"y" * Micro).as("r"))
  }

  /** T rounds of fixed-point batch GD over the given (already
    * train-filtered) feature/label frames. Model state lives on the
    * driver: D+1 longs (the k-means control shape).
    *
    * Round shape (r12 optimization, guide §1.2/§2.4 — fix the
    * algorithm before the per-task work): the SparkLR pattern. The
    * label-carrying feature rows are packed ONCE into cached per-doc
    * primitive arrays (one shuffle, paid once), and every round is a
    * single map-only job — each task folds its docs into a local
    * D+1-long gradient array against the closure-shipped weights, and
    * the driver sums the per-partition partials. Zero per-round
    * shuffles, zero per-round broadcasts, zero window sorts — the
    * previous plan paid a broadcast weight join + doc-window + D+1
    * hash aggregate per round (16 rounds × 2 fits ≈ 10.5 + 11.6 s at
    * sf0.1; see OPTIMIZATION_r12.md "quality-model fit").
    *
    * Bit-parity: every sum this loop computes (the per-doc margin z,
    * the per-bucket gradient g) is a sum of the SAME long terms the
    * SQL plan summed — long addition is commutative/associative with
    * identical wrap semantics, the hard sigmoid replays the oracle's
    * floor(z / 4.0) double-division exactly, and the weight update
    * keeps the floor-of-double-quotient form — so the returned map is
    * bit-identical to the previous plan and to the DuckDB oracle's
    * unrolled rounds (QualityModelSpec's single-threaded differential
    * pins this).
    *
    * Scale: per round one map pass over the cached packed corpus and
    * (#partitions · (D+1)) longs to the driver — strictly less traffic
    * than the per-round model-sized exchanges of the SQL form; at real
    * corpus scale swap the collect for treeReduce to keep the driver
    * fan-in logarithmic. */
  private def fit(feat0: DataFrame, lab0: DataFrame): Map[Long, Long] = {
    val spark = feat0.sparkSession
    import spark.implicits._
    val n = lab0.count() // control-plane scalar (the lr normalizer)
    // pack per doc: (y, feature buckets as array index j+1, counts).
    // collect_list order is nondeterministic — harmless, the loop only
    // ever SUMS over the arrays. 8 partitions: rounds are map-only, so
    // partition count is pure task-scheduling overhead at gate scale
    // (the pageRankQuery rationale); at 100 TB size it from the input.
    val packed = feat0.join(lab0, "doc_id")
      .groupBy($"doc_id")
      .agg(first($"y").as("y"),
        collect_list(struct($"j", $"x")).as("fx"))
      .select($"y", $"fx.j".as("js"), $"fx.x".as("xs"))
      .as[(Long, Array[Long], Array[Long])]
      .rdd.map { case (y, js, xs) =>
        (y, js.map(j => (j + 1L).toInt), xs)
      }
      .coalesce(8) // narrow — no second shuffle after the pack groupBy
      .persist()
    packed.count()
    try {
      val w = new Array[Long](Dim + 1) // index j+1; j = -1 is the bias
      val observed = new Array[Boolean](Dim + 1)
      for (round <- 1 to Iters) {
        val wB = w.clone() // ship a stable copy in the task closure
        val parts = packed.mapPartitions { it =>
          val g = new Array[Long](Dim + 1)
          val seen = new Array[Boolean](Dim + 1)
          it.foreach { case (y, js, xs) =>
            var z = 0L
            var i = 0
            while (i < js.length) { z += xs(i) * wB(js(i)); i += 1 }
            // hard sigmoid: floor of the DOUBLE quotient, exactly the
            // oracle's floor(z / 4.0) (sMicro's integer image)
            val s = math.min(math.max(
              math.floor(z.toDouble / 4.0).toLong + Micro / 2, 0L), Micro)
            val r = s - y * Micro
            i = 0
            while (i < js.length) {
              g(js(i)) += xs(i) * r
              seen(js(i)) = true
              i += 1
            }
          }
          Iterator((g, seen))
        }.collect()
        val g = new Array[Long](Dim + 1)
        parts.foreach { case (pg, pSeen) =>
          var j = 0
          while (j <= Dim) {
            g(j) += pg(j)
            if (round == 1 && pSeen(j)) observed(j) = true
            j += 1
          }
        }
        var j = 0
        while (j <= Dim) {
          // floor of the DOUBLE quotient, not Math.floorDiv: the
          // oracle's unrolled rounds divide in double space
          // (floor(g / (16.0 · n))), and the two only agree while
          // |g| stays clear of 2^53 — same-expression-both-engines
          // is the house parity discipline (Scheduler.dueRuns)
          w(j) -= math.floor(g(j).toDouble / (LrDen.toDouble * n)).toLong
          j += 1
        }
      }
      // same key set as the previous plan's gradient rows: exactly the
      // OBSERVED buckets (unobserved j never surfaced from groupBy(j))
      (0 to Dim).collect {
        case j if observed(j) => (j - 1L) -> w(j)
      }.toMap.withDefaultValue(0L)
    } finally { packed.unpersist(); () }
  }

  /** The trained model as a staged artifact (dbt-table semantics: fit
    * once per process + corpus, every consumer serves from it — what a
    * real pipeline does with a trained filter). The 513-row weight
    * table round-trips through parquet and back to a driver map; the
    * fit itself is deterministic, so the artifact is too. */
  private def weightsMap(spark: SparkSession, sfDir: String,
      variant: String, feat: => DataFrame,
      lab: => DataFrame): Map[Long, Long] = {
    import spark.implicits._
    Staged.materialize(s"qm_weights_${variant}_${Staged.sfKey(sfDir)}",
      spark)(fit(feat, lab).toSeq.toDF("j", "w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
  }

  /** Force-fit both model variants (Bench times the shared train cost
    * once, explicitly — the [[graft.operators.BasketStage.prebuild]]
    * convention). */
  def prebuild(spark: SparkSession, sfDir: String): Unit = {
    // the two fits (full corpus / train split) are independent GD loops
    // whose rounds are latency-, not throughput-, bound (each is a
    // 2-stage job over ~8 small partitions on a 32-core box) — overlap
    // them from two driver threads (guide §2.6: concurrent jobs
    // back-fill idle executors; [[fit]] is thread-safe since each fit
    // runs on its own cloned session, and [[Staged]] locks per key).
    // The shared feature/label artifacts are built ONCE up front so the
    // two threads don't both pay a wait on the same cell.
    prepare(spark, sfDir)
    val threads = Seq(
      new Thread(() => { trainAndScore(spark, sfDir).count(); () }),
      new Thread(() => { evalHoldout(spark, sfDir).count(); () }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    ()
  }

  /** Train T rounds and score the corpus: (doc_id, label,
    * score_micro, predicted) — exact integers, hash-gated. */
  def trainAndScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (feat, lab) = prepare(spark, sfDir)
    scoresWith(weightsMap(spark, sfDir, "full", feat, lab), feat, lab)
      .select($"doc_id", $"y".as("label"), $"s".as("score_micro"),
        ($"s" >= Micro / 2).as("predicted"))
      .orderBy($"doc_id")
  }

  /** Honest held-out evaluation: fit on the deterministic hash-split
    * train share ([[Sampling.splitAssign]] — the SAME assignment the
    * split/leakage gates use), score the held-out share, and report
    * the confusion matrix with exact integer precision / recall / F1
    * (micro units, floor division — identical in both engines). One
    * row; generalization, not memorization, is what's measured. */
  def evalHoldout(spark: SparkSession, sfDir: String, testPct: Int = 30,
      salt: String = "split_v1"): DataFrame = {
    import spark.implicits._
    val test = holdoutScores(spark, sfDir, testPct, salt)
    val pred = ($"s" >= Micro / 2).cast("long")
    def ratio(num: Column, den: Column): Column =
      when(den > 0, floor(num * Micro / den.cast("double")).cast("long"))
        .otherwise(0L)
    test
      .select($"y", pred.as("p"))
      .agg(sum(($"p" * $"y")).as("tp"),
        sum($"p" * (lit(1L) - $"y")).as("fp"),
        sum((lit(1L) - $"p") * $"y").as("fn"),
        sum((lit(1L) - $"p") * (lit(1L) - $"y")).as("tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        ratio($"tp", $"tp" + $"fp").as("precision_micro"),
        ratio($"tp", $"tp" + $"fn").as("recall_micro"),
        ratio($"tp" * 2, $"tp" * 2 + $"fp" + $"fn").as("f1_micro"))
  }

  /** Held-out (doc_id, y, s, r) under the train-split-fitted weights —
    * the scored frame [[evalHoldout]], [[rocAuc]] and [[prCurve]] all
    * read, so the three reports can never disagree on what the model
    * said. */
  private def holdoutScores(spark: SparkSession, sfDir: String,
      testPct: Int, salt: String): DataFrame = {
    import spark.implicits._
    val (feat, lab) = prepare(spark, sfDir)
    val sp = lab.select($"doc_id",
      Sampling.splitAssign($"doc_id", 0, testPct, salt).as("split"))
    def side(s: String) = sp.filter($"split" === s).select($"doc_id")
    val w = weightsMap(spark, sfDir, s"train$testPct$salt",
      feat.join(side("train"), "doc_id"),
      lab.join(side("train"), "doc_id"))
    scoresWith(w, feat.join(side("test"), "doc_id"),
      lab.join(side("test"), "doc_id"))
  }

  /** Held-out per-(distinct micro score) positive/negative counts —
    * the shared funnel under [[rocAuc]] and [[prCurve]]. The output is
    * RESOLUTION-bounded, not corpus-bounded: `s` takes at most
    * Micro + 1 values by construction (the hard sigmoid clamps to
    * [0, 1e6] integers), so the global windows the two reports run
    * over this frame stay ≤ ~1e6 narrow rows at ANY corpus size — the
    * corpus itself is only touched by the map-side-combined groupBy. */
  private def histogramOf(scores: DataFrame): DataFrame = {
    import scores.sparkSession.implicits._
    scores.groupBy($"s")
      .agg(sum($"y").as("pos"), sum(lit(1L) - $"y").as("neg"))
  }

  /** Threshold-free ranking quality of the held-out scores: ROC-AUC by
    * the Mann–Whitney U identity, AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻) —
    * the metric a quality-FILTER pipeline actually cares about (the
    * kept/dropped decision is a moving threshold over the score, so
    * ranking, not any one confusion matrix, is what must be good).
    *
    * Exactness: over the score histogram, 2·U = Σ_s pos_s·(2·neg_<s +
    * neg_s) is pure BIGINT arithmetic (ties handled by the ½ term
    * exactly), and AUC = 2U / (2·n⁺·n⁻) is ONE IEEE division of exact
    * integers — bit-identical cross-engine. Degenerate one-class
    * holdouts yield NULL, not a fake 0.5. (The integer 2U overflows
    * int64 only past ~6×10⁹ held-out rows; an eval set that size would
    * be subsampled long before arithmetic is the problem.)
    *
    * Scale: one corpus-sized map-side-combined groupBy; the cumulative
    * window runs over the resolution-bounded histogram (see
    * [[histogramOf]]). */
  def rocAuc(spark: SparkSession, sfDir: String, testPct: Int = 30,
      salt: String = "split_v1"): DataFrame =
    rocAucOf(holdoutScores(spark, sfDir, testPct, salt))

  /** [[rocAuc]]'s core over any (y, s) scored frame — the testable
    * half (ClassifierCurveSpec pins the closed-form hand cases). */
  private[graft] def rocAucOf(scores: DataFrame): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"s")
      .rowsBetween(Window.unboundedPreceding, -1)
    histogramOf(scores)
      .withColumn("neg_below", coalesce(sum($"neg").over(w), lit(0L)))
      .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
        sum($"pos" * (lit(2L) * $"neg_below" + $"neg")).as("u2"))
      .select($"n_pos", $"n_neg", $"u2",
        when($"n_pos" > 0 && $"n_neg" > 0,
          $"u2".cast("double") /
            (lit(2L) * $"n_pos" * $"n_neg").cast("double")).as("auc"))
  }

  /** The full precision/recall tradeoff curve: one row per distinct
    * held-out score, reporting the confusion counts of the classifier
    * "keep iff score ≥ threshold" at that threshold — the table a
    * pipeline owner reads to PICK the quality-filter cutoff (each row
    * is "keep this much, at this purity"). tp/fp are inclusive
    * descending cumulatives over the score histogram; precision and
    * recall are each ONE IEEE division of exact integers (tp+fp ≥ 1 by
    * construction — every emitted threshold has at least its own
    * docs); recall is NULL on a positive-free holdout. Scale: same
    * two-part shape as [[rocAuc]] — corpus groupBy, then
    * resolution-bounded window. */
  def prCurve(spark: SparkSession, sfDir: String, testPct: Int = 30,
      salt: String = "split_v1"): DataFrame =
    prCurveOf(holdoutScores(spark, sfDir, testPct, salt))

  /** [[prCurve]]'s core over any (y, s) scored frame. */
  private[graft] def prCurveOf(scores: DataFrame): DataFrame = {
    val spark = scores.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wd = Window.orderBy($"s".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val hist = histogramOf(scores)
    val nPos = hist.agg(sum($"pos").as("n_pos"))
    hist
      .withColumn("tp", sum($"pos").over(wd))
      .withColumn("fp", sum($"neg").over(wd))
      .crossJoin(broadcast(nPos))
      .select($"s".as("threshold_micro"), $"tp", $"fp",
        ($"tp".cast("double") / ($"tp" + $"fp").cast("double"))
          .as("precision"),
        when($"n_pos" > 0,
          $"tp".cast("double") / $"n_pos".cast("double")).as("recall"))
      .orderBy($"threshold_micro")
  }

  /** Shared oracle prelude: docs, labels, hashed features, zero
    * weights. The feature space (`w0`) always spans ALL docs so served
    * docs score under the full weight vector (unseen features stay 0,
    * matching the Scala default-0 map). */
  private def preludeSql: String =
    s"""WITH docs AS MATERIALIZED (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |lab AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(len(list_filter(t, tk -> tk = 'row'))
       |              > len(list_filter(t, tk -> tk = 'key')) AS BIGINT) AS y
       |  FROM docs),
       |feat AS MATERIALIZED (
       |  SELECT doc_id, j, COUNT(*) AS x FROM (
       |    SELECT doc_id,
       |           CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % $Dim AS j
       |    FROM (SELECT doc_id, unnest(t) AS tok FROM docs))
       |  GROUP BY doc_id, j
       |  UNION ALL SELECT doc_id, -1, 1 FROM docs),
       |w0 AS MATERIALIZED (SELECT DISTINCT j, CAST(0 AS BIGINT) AS w FROM feat)""".stripMargin

  /** T unrolled GD rounds reading training features from `featName`
    * (docs absent from it contribute nothing to any gradient). */
  private def roundsSql(featName: String): String =
    (1 to Iters).map { t =>
      val (wp, z, r, g, wn) = (s"w${t - 1}", s"z$t", s"r$t", s"g$t", s"w$t")
      s"""$z AS MATERIALIZED (
         |  SELECT f.doc_id, SUM(f.x * $wp.w) AS z
         |  FROM $featName f JOIN $wp ON f.j = $wp.j GROUP BY f.doc_id),
         |$r AS MATERIALIZED (
         |  SELECT l.doc_id,
         |         least(greatest(CAST(floor(z.z / 4.0) AS BIGINT)
         |           + ${Micro / 2}, 0), $Micro) - l.y * $Micro AS r
         |  FROM $z z JOIN lab l ON z.doc_id = l.doc_id),
         |$g AS MATERIALIZED (
         |  SELECT f.j, SUM(f.x * r.r) AS g
         |  FROM $featName f JOIN $r r ON f.doc_id = r.doc_id GROUP BY f.j),
         |$wn AS MATERIALIZED (
         |  SELECT $wp.j,
         |         $wp.w - CAST(floor(COALESCE(g.g, 0)
         |                 / ($LrDen.0 * n.n)) AS BIGINT) AS w
         |  FROM $wp LEFT JOIN $g g ON $wp.j = g.j CROSS JOIN n)""".stripMargin
    }.mkString(",\n")

  private def sMicroSql(zExpr: String): String =
    s"least(greatest(CAST(floor($zExpr / 4.0) AS BIGINT) + ${Micro / 2}, 0), $Micro)"

  /** The full T-round optimization unrolled into CTE rounds — an
    * independent re-derivation of the same exact integers. */
  /** Reliability diagram for the trained classifier: scores bucketed
    * into `bins` confidence bins, each reporting its member count,
    * mean confidence, and observed positive rate — the per-bin
    * |confidence − accuracy| gap column is the integrand of ECE
    * (expected calibration error), the standard "can you trust the
    * score as a probability" audit a quality-filter pipeline runs
    * before thresholding on scores. All integer micro-unit arithmetic
    * (sums exact, floored ratios), so the DuckDB oracle — which
    * re-derives the scores through the same unrolled-GD CTE — matches
    * bit-for-bit. Scale: one pass over the score table into a
    * bins-sized aggregate. */
  def calibration(spark: SparkSession, sfDir: String,
      bins: Int = 10): DataFrame = {
    import spark.implicits._
    val width = Micro / bins
    trainAndScore(spark, sfDir)
      .withColumn("bin",
        least(floor($"score_micro" / lit(width)), lit(bins - 1L)).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        sum($"score_micro").as("sc"),
        sum($"label").as("np"))
      .select($"bin", $"n",
        floor($"sc" / $"n").cast("long").as("avg_conf_micro"),
        floor($"np" * Micro / $"n").cast("long").as("pos_rate_micro"),
        abs(floor($"sc" / $"n") - floor($"np" * Micro / $"n"))
          .cast("long").as("gap_micro"))
      .orderBy($"bin")
  }

  def calibrationSql(bins: Int = 10): String = {
    val width = Micro / bins
    s"""SELECT bin, n,
       |       CAST(sc // n AS BIGINT) AS avg_conf_micro,
       |       CAST(np * $Micro // n AS BIGINT) AS pos_rate_micro,
       |       CAST(abs(sc // n - np * $Micro // n) AS BIGINT) AS gap_micro
       |FROM (
       |  SELECT least(score_micro // $width, ${bins - 1}) AS bin,
       |         COUNT(*) AS n,
       |         CAST(SUM(score_micro) AS BIGINT) AS sc,
       |         CAST(SUM(CAST(label AS BIGINT)) AS BIGINT) AS np
       |  FROM ($trainAndScoreSql) scored
       |  GROUP BY 1) b
       |ORDER BY bin""".stripMargin
  }

  val trainAndScoreSql: String = {
    val serve =
      s"""zf AS MATERIALIZED (
         |  SELECT f.doc_id, SUM(f.x * w$Iters.w) AS z
         |  FROM feat f JOIN w$Iters ON f.j = w$Iters.j GROUP BY f.doc_id)
         |SELECT z.doc_id, l.y AS label,
         |       ${sMicroSql("z.z")} AS score_micro,
         |       ${sMicroSql("z.z")} >= ${Micro / 2} AS predicted
         |FROM zf z JOIN lab l ON z.doc_id = l.doc_id
         |ORDER BY z.doc_id""".stripMargin
    s"""$preludeSql,
       |n AS (SELECT COUNT(*) AS n FROM docs),
       |${roundsSql("feat")},
       |$serve""".stripMargin
  }

  /** Cohen's κ between the two quality raters this engine ships — the
    * hand-set heuristic gate (score ≥ corpus median, the
    * [[TextAnalysis.qualityGate]] membership rule) and the trained
    * classifier's prediction — over the full corpus. κ is the
    * chance-corrected agreement a labeling pipeline reports before
    * trusting weak labels: raw agreement p_o flatters any pair of
    * raters that both mostly say "keep"; κ subtracts the agreement
    * their marginals would produce by luck.
    *
    * Exactness: κ = (n·(n11+n00) − Σ_c r_c·c_c) / (n² − Σ_c r_c·c_c)
    * — the confusion cells and marginal products are exact BIGINTs and
    * κ is ONE IEEE division (NULL when the denominator degenerates:
    * both raters constant). n² passes int64 around n ≈ 3×10⁹; a rater
    * audit at that size subsamples first. Scale: two score passes that
    * reuse the staged feature/weight artifacts, one broadcast of the
    * 1-row median, one corpus-keyed join, one 5-cell aggregate. */
  def kappa(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val heur = TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"quality_score")
    val thr = heur.agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY quality_score)")
        .as("m"))
    val a = heur.crossJoin(broadcast(thr))
      .select($"doc_id", ($"quality_score" >= $"m").cast("long").as("ha"))
    val b = trainAndScore(spark, sfDir)
      .select($"doc_id", $"predicted".cast("long").as("cb"))
    val chance = ($"n11" + $"n10") * ($"n11" + $"n01") +
      ($"n01" + $"n00") * ($"n10" + $"n00")
    a.join(b, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum($"ha" * $"cb").as("n11"),
        sum($"ha" * (lit(1L) - $"cb")).as("n10"),
        sum((lit(1L) - $"ha") * $"cb").as("n01"),
        sum((lit(1L) - $"ha") * (lit(1L) - $"cb")).as("n00"))
      .select($"n", $"n11", $"n10", $"n01", $"n00",
        when($"n" * $"n" - chance > 0,
          ($"n" * ($"n11" + $"n00") - chance).cast("double") /
            ($"n" * $"n" - chance).cast("double")).as("kappa"))
  }

  def kappaSql(): String =
    s"""WITH hq AS (SELECT doc_id, quality_score
       |            FROM (${TextAnalysis.qualityScoreSql})),
       |thr AS (SELECT percentile_cont(0.5) WITHIN GROUP
       |               (ORDER BY quality_score) AS m FROM hq),
       |a AS (SELECT doc_id,
       |             CAST(quality_score >= t.m AS BIGINT) AS ha
       |      FROM hq CROSS JOIN thr t),
       |b AS (SELECT doc_id, CAST(predicted AS BIGINT) AS cb
       |      FROM ($trainAndScoreSql)),
       |conf AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(ha * cb) AS BIGINT) AS n11,
       |         CAST(SUM(ha * (1 - cb)) AS BIGINT) AS n10,
       |         CAST(SUM((1 - ha) * cb) AS BIGINT) AS n01,
       |         CAST(SUM((1 - ha) * (1 - cb)) AS BIGINT) AS n00
       |  FROM a JOIN b USING (doc_id))
       |SELECT n, n11, n10, n01, n00,
       |       CASE WHEN n * n - ((n11 + n10) * (n11 + n01)
       |                          + (n01 + n00) * (n10 + n00)) > 0
       |            THEN CAST(n * (n11 + n00)
       |                      - ((n11 + n10) * (n11 + n01)
       |                         + (n01 + n00) * (n10 + n00)) AS DOUBLE)
       |                 / CAST(n * n - ((n11 + n10) * (n11 + n01)
       |                         + (n01 + n00) * (n10 + n00)) AS DOUBLE)
       |       END AS kappa
       |FROM conf""".stripMargin

  /** Oracle prefix shared by every held-out report: split, train-only
    * GD rounds, and `hs` — the held-out (y, s) scores, the exact twin
    * of [[holdoutScores]]. */
  private def holdoutScoresSqlPrefix(testPct: Int, salt: String): String = {
    val split = Sampling.splitAssignSql("doc_id", 0, testPct, salt)
    s"""$preludeSql,
       |sp AS MATERIALIZED (SELECT doc_id, $split AS split FROM docs),
       |n AS (SELECT COUNT(*) AS n FROM sp WHERE split = 'train'),
       |tfeat AS MATERIALIZED (SELECT f.* FROM feat f
       |          JOIN sp ON f.doc_id = sp.doc_id WHERE sp.split = 'train'),
       |${roundsSql("tfeat")},
       |zf AS MATERIALIZED (
       |  SELECT f.doc_id, SUM(f.x * w$Iters.w) AS z
       |  FROM feat f JOIN sp ON f.doc_id = sp.doc_id
       |  JOIN w$Iters ON f.j = w$Iters.j
       |  WHERE sp.split = 'test' GROUP BY f.doc_id),
       |hs AS MATERIALIZED (
       |  SELECT l.y, ${sMicroSql("z.z")} AS s
       |  FROM zf z JOIN lab l ON z.doc_id = l.doc_id)""".stripMargin
  }

  /** Histogram CTE over `hs` — twin of [[histogramOf]]. */
  private val histSql: String =
    """hist AS (
      |  SELECT s, CAST(SUM(y) AS BIGINT) AS pos,
      |         CAST(SUM(1 - y) AS BIGINT) AS neg
      |  FROM hs GROUP BY 1)""".stripMargin

  /** Oracle twin of [[rocAuc]]: same histogram, same 2U integer, same
    * single division. */
  def rocAucSql(testPct: Int = 30, salt: String = "split_v1"): String =
    s"""${holdoutScoresSqlPrefix(testPct, salt)},
       |$histSql,
       |cum AS (
       |  SELECT pos, neg,
       |         COALESCE(CAST(SUM(neg) OVER (ORDER BY s
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS BIGINT), 0) AS neg_below
       |  FROM hist)
       |SELECT n_pos, n_neg, u2,
       |       CASE WHEN n_pos > 0 AND n_neg > 0
       |            THEN CAST(u2 AS DOUBLE)
       |                 / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc
       |FROM (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       |             CAST(SUM(neg) AS BIGINT) AS n_neg,
       |             CAST(SUM(pos * (2 * neg_below + neg)) AS BIGINT) AS u2
       |      FROM cum)""".stripMargin

  /** Oracle twin of [[prCurve]]. */
  def prCurveSql(testPct: Int = 30, salt: String = "split_v1"): String =
    s"""${holdoutScoresSqlPrefix(testPct, salt)},
       |$histSql,
       |cum AS (
       |  SELECT s,
       |         CAST(SUM(pos) OVER (ORDER BY s DESC
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS tp,
       |         CAST(SUM(neg) OVER (ORDER BY s DESC
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) AS fp
       |  FROM hist),
       |np AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos FROM hist)
       |SELECT s AS threshold_micro, tp, fp,
       |       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS "precision",
       |       CASE WHEN n_pos > 0
       |            THEN CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE)
       |       END AS recall
       |FROM cum, np
       |ORDER BY threshold_micro""".stripMargin

  /** Oracle twin of [[evalHoldout]]: same split hash, train-only
    * gradients, held-out confusion + integer metrics. */
  def evalHoldoutSql(testPct: Int = 30, salt: String = "split_v1"): String = {
    val serve =
      s"""conf AS MATERIALIZED (
         |  SELECT CAST(SUM(p * y) AS BIGINT) AS tp,
         |         CAST(SUM(p * (1 - y)) AS BIGINT) AS fp,
         |         CAST(SUM((1 - p) * y) AS BIGINT) AS fn,
         |         CAST(SUM((1 - p) * (1 - y)) AS BIGINT) AS tn
         |  FROM (SELECT y, CAST(s >= ${Micro / 2} AS BIGINT) AS p FROM hs))
         |SELECT tp, fp, fn, tn,
         |       CASE WHEN tp + fp > 0
         |            THEN CAST(floor(tp * $Micro / CAST(tp + fp AS DOUBLE)) AS BIGINT)
         |            ELSE 0 END AS precision_micro,
         |       CASE WHEN tp + fn > 0
         |            THEN CAST(floor(tp * $Micro / CAST(tp + fn AS DOUBLE)) AS BIGINT)
         |            ELSE 0 END AS recall_micro,
         |       CASE WHEN 2 * tp + fp + fn > 0
         |            THEN CAST(floor(2 * tp * $Micro
         |                 / CAST(2 * tp + fp + fn AS DOUBLE)) AS BIGINT)
         |            ELSE 0 END AS f1_micro
         |FROM conf""".stripMargin
    s"""${holdoutScoresSqlPrefix(testPct, salt)},
       |$serve""".stripMargin
  }
}
