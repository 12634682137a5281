package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** WordPiece tokenizer — the third member of the tokenizer family
  * (BPE = merge-rank encode, Unigram = Viterbi likelihood encode,
  * WordPiece = greedy longest-match-first encode; Wu et al., "Google's
  * Neural Machine Translation System", 2016 — the BERT
  * WordpieceTokenizer shape).
  *
  * The piece INVENTORY here is deterministic rather than learned —
  * the top `vocabWords` corpus words by (count DESC, word ASC) plus
  * the corpus alphabet, every piece usable in start and continuation
  * position (continuations render with the `##` prefix) — which is
  * exactly what makes this gate stronger than the BPE/unigram ones:
  * with the inventory recomputable in SQL, the DuckDB oracle replays
  * the greedy encode ITSELF (longest-match table + linear recursive
  * walk), so actual piece sequences are hash-gated end to end, not
  * just bounds-contracted.
  *
  * Scale shape (the [[Bpe.encodeTokenCounts]] discipline): one word
  * shuffle for frequencies; the greedy matcher runs as a typed map
  * over DISTINCT words only (vocabulary-scale, not corpus-scale) with
  * the piece set riding the closure (60 strings); piece counts then
  * weight each word's encoding by its corpus frequency — explode +
  * one piece-keyed map-side-combined aggregate. No corpus-sized
  * driver state anywhere; at 100 TB the distinct-word frame is the
  * only thing the matcher touches.
  */
object WordPiece {

  val VocabWords = 24

  /** Greedy longest-match-first split; `None` = OOV ([UNK]) — only
    * possible when a character is outside the piece set, which cannot
    * happen for a corpus-derived alphabet. */
  private[graft] def encodeWord(w: String, pieces: Set[String]): Option[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = 0
    while (p < w.length) {
      var len = w.length - p
      while (len > 0 && !pieces.contains(w.substring(p, p + len))) len -= 1
      if (len == 0) return None
      out += (if (p == 0) w.substring(p, p + len)
              else "##" + w.substring(p, p + len))
      p += len
    }
    Some(out.toSeq)
  }

  /** The deterministic piece inventory: top `vocabWords` corpus words
    * by (count DESC, word ASC) plus the corpus alphabet — bounded
    * driver state (vocabWords + |alphabet| strings), recomputable in
    * SQL, shared by [[pieceCounts]] and [[fertility]].
    *
    * The alphabet is derived from the DISTINCT-WORD frame, not a second
    * corpus scan: words are the maximal `[a-z0-9]+` runs, so the set of
    * `[a-z0-9]` chars in the corpus equals the set of chars in the
    * words — identical inventory, vocabulary-scale cost (the oracle SQL
    * keeps the corpus-side formulation; same set by construction). */
  private def pieceInventory(spark: SparkSession,
      wf: DataFrame, vocabWords: Int): Set[String] = {
    import spark.implicits._
    val topWords = wf.orderBy($"cnt".desc, $"word".asc).limit(vocabWords)
      .select($"word").as[String].collect()
    val alphabet = wf.select(explode(
        regexp_extract_all($"word", lit("[a-z0-9]"), lit(0))).as("ch"))
      .distinct().as[String].collect()
    (topWords ++ alphabet).toSet
  }

  /** Corpus-wide piece frequency table: (piece, n_occ), `##`-marked
    * continuations counted separately from start pieces — the
    * distribution a tokenizer-training pipeline audits. */
  def pieceCounts(spark: SparkSession, sfDir: String,
      vocabWords: Int = VocabWords): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, sfDir)
      .select(explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
    // pinned ONCE (the sourceOverlap discipline): inventory collect,
    // encode map and the final re-weight join all consume wf, and
    // without the pin each consumer re-runs the corpus-sized explode.
    // The pinned frame is the distinct-word frequency table.
    val wf = words.groupBy($"word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val pieces = pieceInventory(spark, wf, vocabWords)
    val encoded = wf.select($"word", $"cnt").as[(String, Long)]
      .flatMap { case (w, cnt) =>
        encodeWord(w, pieces).getOrElse(Seq("[UNK]")).map(p => (p, cnt))
      }
      .toDF("piece", "n_occ_w")
    encoded.groupBy($"piece")
      .agg(sum($"n_occ_w").cast("long").as("n_occ"))
      .orderBy($"piece")
  }

  /** Per-source tokenizer FERTILITY — subword pieces per word under
    * the WordPiece inventory, the number a tokenizer owner reads to
    * see which sources are token-expensive (morphology, jargon, noise
    * inflate it; Ács's fertility metric from the multilingual-BERT
    * literature). fertility_e9 = Σ(occurrences·pieces) · 1e9 div
    * Σoccurrences — exact BIGINT floor-div in both engines, no float
    * ratio in the gate.
    *
    * Scale shape = [[pieceCounts]]: the matcher touches DISTINCT words
    * only; per-source totals are one (source, word)-count shuffle plus
    * a broadcast-sized join of the word→n_pieces table. The e9 sums
    * stay under 2^63 to ~10^9 corpus tokens; past that, pre-divide per
    * partition or widen to decimal — the ratio itself is size-free. */
  def fertility(spark: SparkSession, sfDir: String,
      vocabWords: Int = VocabWords): DataFrame = {
    import spark.implicits._
    // pinned ONCE (the sourceOverlap discipline): the inventory collect,
    // the encode-map input and the final join all sit on this lineage,
    // and without the pin each consumer re-runs the corpus-sized
    // explode+groupBy (measured 130 s → ~25 s at the ×64 soak). The
    // pinned frame is sources × distinct-words — vocabulary-scale.
    val srcWords = Tables.documents(spark, sfDir)
      .select($"source", explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy($"source", $"word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val wf = srcWords.groupBy($"word").agg(sum($"cnt").as("cnt"))
    val pieces = pieceInventory(spark, wf, vocabWords)
    val np = wf.select($"word").as[String]
      .map(w => (w, encodeWord(w, pieces).map(_.length).getOrElse(1).toLong))
      .toDF("word", "n_pieces")
    srcWords.join(np, "word")
      .groupBy($"source")
      .agg(sum($"cnt").cast("long").as("n_words"),
        sum($"cnt" * $"n_pieces").cast("long").as("n_pieces"))
      .select($"source", $"n_words", $"n_pieces",
        expr("n_pieces * 1000000000 div n_words").as("fertility_e9"))
      .orderBy($"source")
  }

  /** DuckDB replay: the [[pieceCountsSql]] walk, collapsed to pieces
    * per word and re-weighted by per-source occurrences. */
  def fertilitySql(vocabWords: Int = VocabWords): String =
    s"""WITH RECURSIVE sw AS (
       |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |  FROM documents),
       |swc AS MATERIALIZED (
       |  SELECT source, word, count(*) AS cnt FROM sw GROUP BY 1, 2),
       |wf AS MATERIALIZED (
       |  SELECT word, CAST(SUM(cnt) AS BIGINT) AS cnt FROM swc GROUP BY 1),
       |vocab AS MATERIALIZED (
       |  SELECT DISTINCT piece FROM (
       |    SELECT word AS piece FROM wf ORDER BY cnt DESC, word LIMIT $vocabWords)
       |  UNION
       |  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS piece
       |  FROM documents),
       |pos AS (
       |  SELECT word, unnest(range(1, length(word) + 1)) AS p
       |  FROM (SELECT DISTINCT word FROM wf)),
       |best AS MATERIALIZED (
       |  SELECT o.word, o.p, max(length(v.piece)) AS bl
       |  FROM pos o JOIN vocab v
       |    ON substr(o.word, CAST(o.p AS INTEGER), length(v.piece)) = v.piece
       |  GROUP BY o.word, o.p),
       |walk AS (
       |  SELECT word, CAST(1 AS BIGINT) AS p, CAST(0 AS BIGINT) AS np
       |  FROM (SELECT DISTINCT word FROM wf)
       |  UNION ALL
       |  SELECT k.word, k.p + b.bl, k.np + 1
       |  FROM walk k JOIN best b ON b.word = k.word AND b.p = k.p
       |  WHERE k.p <= length(k.word)),
       |wp AS MATERIALIZED (
       |  SELECT word, max(np) AS n_pieces
       |  FROM walk WHERE p > length(word) GROUP BY word)
       |SELECT s.source,
       |       CAST(SUM(s.cnt) AS BIGINT) AS n_words,
       |       CAST(SUM(s.cnt * w.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(SUM(s.cnt * w.n_pieces) AS BIGINT) * 1000000000
       |         // CAST(SUM(s.cnt) AS BIGINT) AS fertility_e9
       |FROM swc s JOIN wp w ON s.word = w.word
       |GROUP BY s.source ORDER BY s.source""".stripMargin

  /** DuckDB replay: same inventory, same greedy matcher — `best`
    * precomputes the longest piece match at every (word, position)
    * with plain joins, and the recursive `walk` is generation-only
    * linear recursion (each step advances the cursor by bl ≥ 1, the
    * portable recursive-CTE shape). */
  def pieceCountsSql(vocabWords: Int = VocabWords): String =
    s"""WITH RECURSIVE w AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |  FROM documents),
       |wf AS MATERIALIZED (SELECT word, count(*) AS cnt FROM w GROUP BY word),
       |vocab AS MATERIALIZED (
       |  SELECT DISTINCT piece FROM (
       |    SELECT word AS piece FROM wf ORDER BY cnt DESC, word LIMIT $vocabWords)
       |  UNION
       |  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS piece
       |  FROM documents),
       |pos AS (
       |  SELECT word, unnest(range(1, length(word) + 1)) AS p
       |  FROM (SELECT DISTINCT word FROM wf)),
       |best AS MATERIALIZED (
       |  SELECT o.word, o.p, max(length(v.piece)) AS bl
       |  FROM pos o JOIN vocab v
       |    ON substr(o.word, CAST(o.p AS INTEGER), length(v.piece)) = v.piece
       |  GROUP BY o.word, o.p),
       |walk AS (
       |  SELECT word, CAST(1 AS BIGINT) AS p, CAST(NULL AS VARCHAR) AS piece
       |  FROM (SELECT DISTINCT word FROM wf)
       |  UNION ALL
       |  SELECT k.word, k.p + b.bl,
       |         CASE WHEN k.p = 1 THEN substr(k.word, CAST(k.p AS INTEGER), CAST(b.bl AS INTEGER))
       |              ELSE '##' || substr(k.word, CAST(k.p AS INTEGER), CAST(b.bl AS INTEGER)) END
       |  FROM walk k JOIN best b ON b.word = k.word AND b.p = k.p
       |  WHERE k.p <= length(k.word)),
       |pieces AS (SELECT word, piece FROM walk WHERE piece IS NOT NULL)
       |SELECT p.piece, CAST(SUM(f.cnt) AS BIGINT) AS n_occ
       |FROM pieces p JOIN wf f ON f.word = p.word
       |GROUP BY p.piece ORDER BY p.piece""".stripMargin
}
