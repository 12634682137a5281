package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** BPE tokenizer induction (Sennrich et al., ACL 2016) — the vocabulary
  * a training-data pipeline learns before it can count tokens, pack
  * sequences, or price a corpus.
  *
  * Two surfaces:
  *  - [[pairCounts]] — the DISTRIBUTED hot loop: frequency-weighted
  *    adjacent-symbol-pair counts over the distinct-word table. At
  *    100 TB this aggregate over (word, freq) is the entire cost of
  *    BPE (the corpus collapses to distinct words ONCE; every merge
  *    iteration re-counts pairs over that much smaller table). Exact
  *    and DuckDB-oracle-gated.
  *  - [[learnMerges]] — the driver-coordinated merge loop (the same
  *    control shape as Lloyd's k-means here: tiny model state on the
  *    driver, one distributed aggregate per iteration, merge applied
  *    executor-side as a typed map). Tie-breaks are total
  *    (count desc, left, right), so the learned merge table is
  *    deterministic; gated by a plain-Scala differential spec plus a
  *    rows-only driver check.
  *
  * Pair counting counts OVERLAPPING adjacencies ("aaaa" contributes
  * (a,a) three times) and merging is greedy left-to-right
  * non-overlapping ("aaaa" -> "aa"·"aa") — the reference algorithm's
  * exact semantics, pinned by the spec.
  */
object Bpe {

  /** Lowercase alnum words — the same cross-engine-safe pre-tokenizer
    * family as [[TextAnalysis]] (regexp_extract_all agrees between
    * Spark and DuckDB on this character-class-only pattern). */
  private[graft] def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Iteration-0 pair statistics: for every adjacent character pair,
    * the frequency-weighted number of occurrences across the corpus.
    * One narrow explode over the distinct-word table, one aggregate. */
  def pairCounts(spark: SparkSession, sfDir: String): DataFrame =
    pairCountsFrom(Tables.documents(spark, sfDir))

  private[graft] def pairCountsFrom(docs: DataFrame): DataFrame = {
    val f = wordFreqs(docs)
      .filter(length(col("word")) >= 2)
    f.select(col("freq"), explode(expr(
        """transform(sequence(1, length(word) - 1),
          |  i -> struct(substring(word, i, 1) AS l,
          |              substring(word, i + 1, 1) AS r))""".stripMargin)).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
  }

  val pairCountsSql: String =
    """WITH w AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |  FROM documents),
      |f AS (
      |  SELECT word, count(*) AS freq FROM w
      |  WHERE length(word) >= 2 GROUP BY word),
      |p AS (
      |  SELECT substring(word, CAST(i AS INTEGER), 1) AS left_sym,
      |         substring(word, CAST(i AS INTEGER) + 1, 1) AS right_sym,
      |         freq
      |  FROM f, unnest(range(1, length(word))) AS t(i))
      |SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS pair_count
      |FROM p GROUP BY 1, 2
      |ORDER BY pair_count DESC, left_sym, right_sym""".stripMargin

  // ---- the merge loop ----------------------------------------------

  private[graft] case class WordSyms(syms: Seq[String], freq: Long)

  /** Greedy left-to-right non-overlapping replacement of (l, r). */
  private[graft] def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges over the corpus' distinct words. Returns
    * (rank, left_sym, right_sym, merged). Stops early if no pair
    * occurs at least twice (merging a count-1 pair is vocabulary
    * noise).
    *
    * BATCHED rounds (r5 bench finding: one Spark aggregate per merge
    * made the driver round-trips the stage cost): each round collects
    * the full pair-count table (symbol-pair-sized — model state, not
    * corpus state) and applies the maximal SAFE PREFIX of the sorted
    * list in one pass over the words. [[selectMergeBatch]] proves the
    * prefix is exactly what sequential BPE would pick, so the learned
    * table is unchanged (pinned by the differential spec); the
    * distributed aggregates drop from nMerges to ~nMerges/batch. */
  def learnMerges(spark: SparkSession, sfDir: String, nMerges: Int = 30): DataFrame =
    learnMergesFrom(spark, Tables.documents(spark, sfDir), nMerges)

  private[graft] def learnMergesFrom(spark: SparkSession, docs: DataFrame,
      nMerges: Int): DataFrame = {
    import spark.implicits._
    var ds: Dataset[WordSyms] = wordFreqs(docs)
      .as[(String, Long)]
      .map { case (w, f) => WordSyms(w.map(_.toString), f) }
      .localCheckpoint(eager = true)

    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = ds.flatMap(w =>
          if (w.syms.length < 2) Iterator.empty
          else w.syms.iterator.zip(w.syms.iterator.drop(1)).map(p => (p._1, p._2, w.freq)))
        .toDF("l", "r", "freq")
        .groupBy($"l", $"r").agg(sum($"freq").as("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val batch = selectMergeBatch(counts, nMerges - merges.length)
      if (batch.isEmpty) done = true
      else {
        batch.foreach { case (l, r) => merges += ((merges.length + 1, l, r)) }
        val prev = ds
        ds = ds.map(w => WordSyms(
            batch.foldLeft(w.syms) { case (s, (l, r)) => applyMerge(s, l, r) },
            w.freq))
          .localCheckpoint(eager = true)
        prev.unpersist()
      }
    }
    ds.unpersist()
    merges.toSeq.toDF("rank", "left_sym", "right_sym")
      .withColumn("merged", concat(col("left_sym"), col("right_sym")))
      .orderBy(col("rank"))
  }

  /** The maximal prefix of the (count desc, left, right)-sorted pair
    * list that sequential BPE provably picks in exactly this order, so
    * a whole prefix can be applied in ONE distributed pass.
    *
    * A candidate at position i is admitted only while ALL hold:
    *  - its symbols are disjoint from every earlier batch member's
    *    (earlier merges then cannot destroy its occurrences) and from
    *    their merged strings (string-identified symbols would conflate);
    *  - its count strictly exceeds every earlier member's NEW-PAIR
    *    BOUND: a merge of (l, r) only creates pairs (x, lr)/(lr, y),
    *    whose counts are bounded by the pre-merge counts of (x, l) and
    *    (r, y) — so bound = max(max count ending in l, max count
    *    starting with r). Strictly below that, no created pair can
    *    out-rank the candidate;
    *  - no earlier member's merged string collides with the existing
    *    alphabet (a collision conflates future counts — close the
    *    batch and let the next round re-count).
    * The scan STOPS at the first inadmissible pair (prefix semantics:
    * skipping it would reorder sequential picks). Worst case the batch
    * is 1 — the unbatched algorithm. */
  /** Code-point string order == UTF-8 binary order (what both engines'
    * ORDER BY use), without allocating byte arrays per comparison. */
  private[graft] val codePointOrdering: Ordering[String] =
    new Ordering[String] {
      def compare(a: String, b: String): Int = {
        var i = 0; var j = 0
        while (i < a.length && j < b.length) {
          val ca = a.codePointAt(i); val cb = b.codePointAt(j)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca); j += Character.charCount(cb)
        }
        Integer.compare(a.length - i, b.length - j)
      }
    }

  private[graft] def selectMergeBatch(counts: Array[(String, String, Long)],
      maxN: Int): Seq[(String, String)] = {
    if (counts.isEmpty) return Seq.empty
    // tie-break by CODE POINT (≡ UTF-8 byte order, what Spark's orderBy
    // and DuckDB's ORDER BY both use) — Java String.compareTo is UTF-16
    // code-unit order, which disagrees for supplementary-plane symbols
    // vs U+E000..U+FFFF and would pick a different merge than the oracle
    val sorted = counts.sorted(
      Ordering.Tuple3(Ordering.Long.reverse, codePointOrdering, codePointOrdering)
        .on[(String, String, Long)](t => (t._3, t._1, t._2)))
    val maxEndingIn = counts.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val maxStartingWith = counts.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val alphabet: Set[String] =
      counts.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
    val used = scala.collection.mutable.Set[String]()
    var boundSoFar = Long.MinValue
    var collided = false
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    var stop = false
    while (!stop && i < sorted.length && out.length < maxN) {
      val (l, r, c) = sorted(i)
      val admissible = c >= 2 && (out.isEmpty ||
        (!collided && c > boundSoFar && !used(l) && !used(r)))
      if (!admissible) stop = true
      else {
        out += ((l, r))
        used += l; used += r
        val m = l + r
        if (alphabet(m)) collided = true
        used += m // later candidates must not touch the new symbol either
        boundSoFar = math.max(boundSoFar,
          math.max(maxEndingIn.getOrElse(l, 0L), maxStartingWith.getOrElse(r, 0L)))
      }
      i += 1
    }
    out.toSeq
  }

  // ---- encoding with a learned merge table -------------------------

  /** Apply a learned merge table to one word — the CANONICAL encoder
    * loop (Sennrich reference / GPT-2 encoder): repeatedly apply the
    * lowest-RANK merge currently applicable, until none is. This is
    * not the same as one pass in rank order: a later merge can create
    * a symbol that re-enables an earlier merge (e.g. merges
    * [(ab,c), (a,b)] on "abcab" — (a,b) must fire first to produce
    * "ab", after which rank-0 (ab,c) applies), and the single-pass
    * fold would have already moved past it. Each application is
    * [[applyMerge]]'s greedy left-to-right non-overlapping sweep. */
  private[graft] def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] = {
    // first occurrence wins if the learner ever emitted a duplicate pair
    val rank = merges.zipWithIndex.reverse.toMap
    var syms: Seq[String] = w.map(_.toString)
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach(r => if (r < best) best = r)
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        syms = applyMerge(syms, l, r)
      }
    }
    syms
  }

  /** The merge table, learned once per (corpus, nMerges) and staged —
    * q_bpe_merges and q_bpe_encode both read the artifact instead of
    * paying the 30-round driver loop twice (the [[DedupStage]] DAG-edge
    * discipline). */
  def stagedMerges(spark: SparkSession, sfDir: String, nMerges: Int = 30): DataFrame =
    Staged.materialize(s"bpe_merges_${nMerges}_${Staged.sfKey(sfDir)}", spark) {
      learnMerges(spark, sfDir, nMerges)
    }

  /** Per-document BPE token counts under the learned vocabulary — the
    * "price the corpus" step every training pipeline runs before
    * packing. Distributed shape mirrors [[learnMerges]]: the corpus
    * collapses to DISTINCT words, each distinct word is encoded exactly
    * once (typed map; the merge table rides the closure — it is
    * model-state-sized, ~nMerges rows), and per-doc totals come from a
    * (doc, word) occurrence join + aggregate. At 100 TB encoding cost
    * is |distinct words| × nMerges, independent of corpus row count;
    * the joins are narrow (word → n_syms is a broadcast-sized table).
    *
    * No SQL oracle (the encoder is iterative); rows-only gate + BpeSpec
    * pins a hand-computed example and the invariant that counts equal
    * the reference encoder's on every distinct word.
    */
  def encodeTokenCounts(spark: SparkSession, sfDir: String,
      nMerges: Int = 30): DataFrame = {
    import spark.implicits._
    val merges: Seq[(String, String)] = stagedMerges(spark, sfDir, nMerges)
      .orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val docWords = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("n_occ"))
    val encoded = docWords.select($"word").distinct().as[String]
      .map(w => (w, encodeWord(w, merges).length.toLong))
      .toDF("word", "n_syms")
    docWords.join(encoded, "word")
      .groupBy($"doc_id")
      .agg(sum($"n_occ").cast("long").as("n_words"),
        sum($"n_occ" * $"n_syms").cast("long").as("bpe_tokens"))
      .orderBy($"doc_id")
  }

  // ---- contract gates (the hll_union pattern) ----------------------------

  /** Hash-gateable CONTRACT of the merge learner: the full merge table
    * is the iterative loop's private output, but its anchors are not —
    * the FIRST merge must equal the pair-count argmax (exactly
    * recomputable in SQL: q_bpe_pairs' own ordering), ranks must be
    * contiguous from 1, every `merged` must be `left||right`, and the
    * table must not exceed nMerges. One row; any broken loop step
    * (wrong tie-break, skipped rank, corrupt concat) flips it red. */
  def mergesContract(spark: SparkSession, sfDir: String,
      nMerges: Int = 30): DataFrame = {
    import spark.implicits._
    val mt = stagedMerges(spark, sfDir, nMerges).orderBy(col("rank")).collect()
    if (mt.isEmpty) {
      // degenerate corpus (no pair reaches count 2): the learner
      // legitimately emits nothing, but the oracle always selects the
      // pair-count argmax row — mirror it with vacuous booleans so the
      // gate stays self-describing instead of dying on a deleted dump
      pairCounts(spark, sfDir).limit(1)
        .select(col("left_sym").as("first_left"),
          col("right_sym").as("first_right"),
          lit(true).as("ranks_contiguous"), lit(true).as("merged_is_concat"),
          lit(true).as("n_merges_le_max"))
    } else {
      val first = mt.head
      val ranksContiguous = mt.map(_.getInt(0)).toSeq == (1 to mt.length)
      val mergedIsConcat =
        mt.forall(r => r.getString(3) == r.getString(1) + r.getString(2))
      Seq((first.getString(1), first.getString(2), ranksContiguous,
          mergedIsConcat, mt.length <= nMerges))
        .toDF("first_left", "first_right", "ranks_contiguous",
          "merged_is_concat", "n_merges_le_max")
    }
  }

  val mergesContractSql: String =
    s"""SELECT left_sym AS first_left, right_sym AS first_right,
       |       TRUE AS ranks_contiguous, TRUE AS merged_is_concat,
       |       TRUE AS n_merges_le_max
       |FROM ($pairCountsSql)
       |LIMIT 1""".stripMargin

  /** Hash-gateable CONTRACT of the encoder: per doc, the exact word
    * count (SQL-recomputable) plus the pinned bound n_words ≤
    * bpe_tokens ≤ n_chars — every word encodes to between 1 symbol and
    * its own length. An encoder that drops words, double-counts, or
    * merges across word boundaries flips the boolean. */
  def encodeContract(spark: SparkSession, sfDir: String,
      nMerges: Int = 30): DataFrame = {
    import spark.implicits._
    val enc = encodeTokenCounts(spark, sfDir, nMerges)
    val bounds = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words_b"), sum(length($"word")).as("n_chars"))
    enc.join(bounds, "doc_id")
      .select($"doc_id", $"n_words",
        ($"bpe_tokens" >= $"n_words" && $"bpe_tokens" <= $"n_chars")
          .as("tokens_in_bounds"))
      .orderBy($"doc_id")
  }

  val encodeContractSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |  FROM documents)
      |SELECT doc_id, COUNT(*) AS n_words, TRUE AS tokens_in_bounds
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Plain-Scala reference BPE for the differential spec — same
    * counting (overlapping), same merge (greedy non-overlapping),
    * same tie-break. */
  private[graft] def learnMergesReference(words: Map[String, Long],
      nMerges: Int): Seq[(Int, String, String)] = {
    var ws: Map[Seq[String], Long] = words.toSeq
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- ws; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          rank += 1
          merges += ((rank, l, r))
          ws = ws.toSeq.map { case (syms, f) => (applyMerge(syms, l, r), f) }
            .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
        case _ => done = true
      }
    }
    merges.toSeq
  }
}
