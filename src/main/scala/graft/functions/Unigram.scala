package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Unigram-LM tokenizer induction (Kudo, ACL 2018 — the SentencePiece
  * unigram model): the OTHER tokenizer family a training-data pipeline
  * learns, complementing [[Bpe]]. Where BPE grows a vocab bottom-up by
  * merging, unigram starts from an over-complete substring candidate
  * set and fits piece probabilities by EM, segmenting each word with
  * Viterbi under the current model.
  *
  * Distributed shape (the [[Bpe]] discipline): the corpus collapses to
  * the DISTINCT-WORD frequency table once; every EM iteration is ONE
  * typed flatMap over that table (Viterbi per distinct word — the
  * model rides the closure, it is vocab-sized) plus ONE map-side-
  * combined aggregate of piece counts. At 100 TB the iteration cost is
  * |distinct words| × |word|·maxLen, independent of corpus row count;
  * only the vocab-sized count table crosses the driver per round
  * (see SCALE.md's driver-coordinated-loop table).
  *
  * Determinism: piece log-probs are quantized to integer e9 nats
  * (floor(ln p ·1e9)) BEFORE Viterbi, so the DP maximizes exact Long
  * sums — segmentations cannot drift with platform libm or summation
  * order. Ties break on (score, fewer pieces, earlier split), all
  * total. The seed candidate table is plain SQL (substring counts) and
  * hash-gated; the EM loop itself is gated by contract anchors
  * (the [[Bpe.mergesContract]] pattern) + a differential spec against
  * a plain-Scala reference implementation.
  */
object Unigram {

  val DefaultMaxLen = 4
  val DefaultSeedK = 400
  val DefaultVocabSize = 120
  val DefaultIters = 3

  /** Candidate piece counts: every substring of length 1..maxLen of
    * every distinct word, frequency-weighted, top-K by (count desc,
    * piece) — the over-complete seed vocabulary. SQL-exact. */
  def seedCandidates(spark: SparkSession, sfDir: String,
      maxLen: Int = DefaultMaxLen, topK: Int = DefaultSeedK): DataFrame = {
    val f = Bpe.wordFreqs(Tables.documents(spark, sfDir))
    f.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, least(length(word), $maxLen)),
           |  l -> transform(sequence(1, length(word) - l + 1),
           |       i -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topK)
  }

  def seedCandidatesSql(maxLen: Int = DefaultMaxLen,
      topK: Int = DefaultSeedK): String =
    s"""WITH w AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |  FROM documents),
       |wf AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY 1),
       |subs AS (
       |  SELECT freq, unnest(flatten(list_transform(
       |           range(1, least(length(word), $maxLen) + 1),
       |           l -> list_transform(range(1, length(word) - l + 2),
       |                i -> substr(word, i, l))))) AS piece
       |  FROM wf)
       |SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
       |FROM subs GROUP BY 1
       |ORDER BY cnt DESC, piece
       |LIMIT $topK""".stripMargin

  // ---- the model ---------------------------------------------------------

  /** Integer-nat log-probs: floor(ln((cnt+1)/(total+C))·1e9), Laplace-
    * smoothed over the full candidate set so every candidate stays
    * scoreable each round (pruning happens once, at the end). */
  private def logProbsE9(counts: Map[String, Long]): Map[String, Long] = {
    val c = counts.size.toLong
    val total = counts.valuesIterator.sum
    counts.map { case (p, n) =>
      p -> math.floor(math.log((n + 1).toDouble / (total + c).toDouble) * 1e9).toLong
    }
  }

  /** Viterbi segmentation of `w` under integer piece scores. Returns
    * the max-score cover; ties prefer FEWER pieces, then the earlier
    * (longer-last-piece) split — all total, so the path is unique. */
  private[graft] def viterbi(w: String, maxLen: Int,
      scoreE9: Map[String, Long]): Seq[String] = {
    val n = w.length
    // best(i): (score, pieces, backpointer j) for prefix of length i
    val score = Array.fill(n + 1)(Long.MinValue)
    val npc = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    score(0) = 0L; npc(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (score(j) != Long.MinValue) {
          scoreE9.get(w.substring(j, i)).foreach { s =>
            val cand = score(j) + s
            val candN = npc(j) + 1
            if (cand > score(i) ||
              (cand == score(i) && (candN < npc(i) ||
                (candN == npc(i) && j < back(i))))) {
              score(i) = cand; npc(i) = candN; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    require(score(n) != Long.MinValue,
      s"word '$w' not coverable — single-char candidates missing from the model")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var k = n
    while (k > 0) { out += w.substring(back(k), k); k = back(k) }
    out.reverse.toSeq
  }

  /** The learned model: (piece, cnt, logp_e9), all single corpus chars
    * guaranteed present, at most `vocabSize` rows. Driver-coordinated
    * EM exactly like [[Bpe.learnMerges]] — `iters` distributed
    * aggregates, vocab-sized state on the driver. */
  private[graft] def learnModel(words: DataFrame, maxLen: Int, seedK: Int,
      vocabSize: Int, iters: Int): Seq[(String, Long, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val seed = words.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, least(length(word), $maxLen)),
           |  l -> transform(sequence(1, length(word) - l + 1),
           |       i -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedK)
      .as[(String, Long)].collect()
    // coverage floor: every single char, even below the top-K cut
    val chars = words.select(explode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")).as("piece"))
      .distinct().as[String].collect().toSet
    var counts: Map[String, Long] =
      seed.toMap ++ (chars -- seed.map(_._1)).map(_ -> 0L)
    val wds = words.as[(String, Long)]
    for (_ <- 1 to iters) {
      val sc = logProbsE9(counts)
      val newCounts = wds.flatMap { case (w, f) =>
        viterbi(w, maxLen, sc).map(p => (p, f)) }
        .toDF("piece", "freq")
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .as[(String, Long)].collect().toMap
      // unused candidates drop to 0 but stay scoreable via smoothing
      counts = counts.map { case (p, _) => p -> newCounts.getOrElse(p, 0L) }
    }
    // final prune: all single chars + best multi-char pieces
    val multiKeep = counts.toSeq
      .filter { case (p, _) => p.length > 1 }
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(vocabSize - chars.size, 0))
    val kept = (counts.toSeq.filter { case (p, _) => p.length == 1 } ++ multiKeep)
      .sortBy { case (p, n) => (-n, p) }
    val lp = logProbsE9(kept.toMap)
    kept.map { case (p, n) => (p, n, lp(p)) }
  }

  /** Model learned once per (corpus, params) and staged — both gates
    * below read the artifact ([[DedupStage]] DAG-edge discipline). */
  def stagedModel(spark: SparkSession, sfDir: String,
      maxLen: Int = DefaultMaxLen, seedK: Int = DefaultSeedK,
      vocabSize: Int = DefaultVocabSize, iters: Int = DefaultIters): DataFrame =
    Staged.materialize(
        s"unigram_${maxLen}_${seedK}_${vocabSize}_${iters}_${Staged.sfKey(sfDir)}",
        spark) {
      import spark.implicits._
      learnModel(Bpe.wordFreqs(Tables.documents(spark, sfDir)),
        maxLen, seedK, vocabSize, iters)
        .toDF("piece", "cnt", "logp_e9")
    }

  /** Contract gate for the EM loop ([[Bpe.mergesContract]] pattern):
    * SQL-exact anchors — the seed argmax piece and the single-char
    * count — plus structural booleans the oracle asserts as TRUE. */
  def modelContract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = stagedModel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = m.map(_._1).toSet
    val chars = Tables.documents(spark, sfDir)
      .select(explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]"), lit(0))).as("ch"))
      .distinct().as[String].collect().toSet
    val topSeed = seedCandidates(spark, sfDir).limit(1).collect()(0).getString(0)
    val nSingle = m.count(_._1.length == 1).toLong
    Seq((topSeed, nSingle,
        chars.subsetOf(pieces),
        m.length <= DefaultVocabSize,
        m.forall(_._3 < 0L),
        m.forall(x => x._1.length <= DefaultMaxLen)))
      .toDF("top_seed_piece", "n_single_chars", "covers_all_chars",
        "vocab_size_le_max", "logp_negative", "piece_len_le_max")
  }

  val modelContractSql: String =
    s"""WITH seed AS (${seedCandidatesSql()}),
       |chars AS (
       |  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS ch
       |  FROM documents)
       |SELECT (SELECT piece FROM seed ORDER BY cnt DESC, piece LIMIT 1) AS top_seed_piece,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM chars) AS n_single_chars,
       |       TRUE AS covers_all_chars, TRUE AS vocab_size_le_max,
       |       TRUE AS logp_negative, TRUE AS piece_len_le_max""".stripMargin

  /** Per-document token counts under the learned unigram vocab — the
    * corpus-pricing step, gated like [[Bpe.encodeContract]]: exact
    * word counts (SQL-recomputable) + the 1-to-len-pieces bound. */
  def encodeContract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val model = stagedModel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val docWords = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("n_occ"))
    val encoded = docWords.select($"word").distinct().as[String]
      .map(w => (w, viterbi(w, DefaultMaxLen, model).length.toLong))
      .toDF("word", "n_syms")
    docWords.join(encoded, "word")
      .groupBy($"doc_id")
      .agg(sum($"n_occ").cast("long").as("n_words"),
        sum($"n_occ" * $"n_syms").cast("long").as("uni_tokens"),
        sum($"n_occ" * length($"word")).cast("long").as("n_chars"))
      .select($"doc_id", $"n_words",
        ($"uni_tokens" >= $"n_words" && $"uni_tokens" <= $"n_chars")
          .as("tokens_in_bounds"))
      .orderBy($"doc_id")
  }

  val encodeContractSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |  FROM documents)
      |SELECT doc_id, COUNT(*) AS n_words, TRUE AS tokens_in_bounds
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Plain-Scala reference for the differential spec: same seeding,
    * same smoothing, same Viterbi, no Spark. */
  private[graft] def learnModelReference(words: Map[String, Long], maxLen: Int,
      seedK: Int, vocabSize: Int, iters: Int): Seq[(String, Long, Long)] = {
    val subs = scala.collection.mutable.Map[String, Long]()
    for ((w, f) <- words; l <- 1 to math.min(maxLen, w.length);
         i <- 0 to w.length - l)
      subs(w.substring(i, i + l)) = subs.getOrElse(w.substring(i, i + l), 0L) + f
    val seed = subs.toSeq.sortBy { case (p, n) => (-n, p) }.take(seedK)
    val chars = words.keysIterator.flatMap(_.toSeq).map(_.toString).toSet
    var counts: Map[String, Long] =
      seed.toMap ++ (chars -- seed.map(_._1)).map(_ -> 0L)
    for (_ <- 1 to iters) {
      val sc = logProbsE9(counts)
      val nc = scala.collection.mutable.Map[String, Long]()
      for ((w, f) <- words; p <- viterbi(w, maxLen, sc))
        nc(p) = nc.getOrElse(p, 0L) + f
      counts = counts.map { case (p, _) => p -> nc.getOrElse(p, 0L) }
    }
    val multiKeep = counts.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(vocabSize - chars.size, 0))
    val kept = (counts.toSeq.filter(_._1.length == 1) ++ multiKeep)
      .sortBy { case (p, n) => (-n, p) }
    val lp = logProbsE9(kept.toMap)
    kept.map { case (p, n) => (p, n, lp(p)) }
  }
}
