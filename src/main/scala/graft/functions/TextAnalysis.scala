package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + a BPE-ish regex), quality scoring (length / punctuation
  * / stopword ratios), n-gram-heuristic language ID, and document
  * fingerprinting.
  *
  * All computations are per-row `functions._` expressions — a single
  * narrow projection over the scan, no shuffle, fully codegen'd; at
  * 100 TB this stage is embarrassingly parallel and IO-bound, exactly
  * as a corpus-preprocessing pass should be.
  *
  * Regex dialect note: every pattern used here ('\\s+', explicit char
  * classes) behaves identically in Java regex (Spark) and RE2-ish
  * (DuckDB) — no lookarounds, no POSIX classes, no unicode props.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(trim(lower(c)), "\\s+")

  // ---- token counting ----------------------------------------------------

  /** Whitespace tokens + BPE-ish subword-boundary tokens (alnum runs and
    * single non-alnum-non-space marks — the standard pre-tokenizer shape). */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      $"doc_id",
      size(toks($"text")).as("ws_tokens"),
      size(regexp_extract_all($"text", lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .as("bpe_ish_tokens"),
      length($"text").as("n_chars_actual"))
      .orderBy($"doc_id")
  }

  val tokenCountsSql: String =
    """SELECT doc_id,
      |       CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INTEGER) AS ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_ish_tokens,
      |       CAST(length(text) AS INTEGER) AS n_chars_actual
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- quality scoring ---------------------------------------------------

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "this", "was", "for", "on", "with")

  /** Heuristic quality signals: mean token length, punctuation density,
    * stopword ratio, and a composite [0,1] score. The score formula is
    * plain arithmetic so the oracle reproduces it exactly. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = toks($"text")
    val nTok = size(t)
    val nChar = length($"text")
    val punct = nChar - length(regexp_replace($"text", "[.,!?;:]", ""))
    val stops = size(filter(t, tk => tk.isInCollection(stopwords)))
    val avgTokLen = when(nTok > 0, nChar.cast("double") / nTok).otherwise(0.0)
    val punctRatio = when(nChar > 0, punct.cast("double") / nChar).otherwise(0.0)
    val stopRatio = when(nTok > 0, stops.cast("double") / nTok).otherwise(0.0)
    // composite: long-enough docs with some stopwords and sane
    // punctuation score high; each clause clamped to [0,1]
    val score =
      least(nTok.cast("double") / 100.0, lit(1.0)) * 0.4 +
        least(stopRatio * 5.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2
    Tables.documents(spark, sfDir).select(
      $"doc_id",
      round(avgTokLen, 6).as("avg_token_len"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(score, 6).as("quality_score"),
      (score >= 0.5).as("is_high_quality"))
      .orderBy($"doc_id")
  }

  val qualityScoreSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS t,
       |         length(text) AS n_char,
       |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) > 0 THEN CAST(n_char AS DOUBLE) / len(t) ELSE 0.0 END AS avg_token_len,
       |         CASE WHEN n_char > 0 THEN CAST(punct AS DOUBLE) / n_char ELSE 0.0 END AS punct_ratio,
       |         CASE WHEN len(t) > 0
       |              THEN CAST(len(list_filter(t, tk -> list_contains($stopList, tk))) AS DOUBLE) / len(t)
       |              ELSE 0.0 END AS stopword_ratio,
       |         len(t) AS n_tok
       |  FROM base)
       |SELECT doc_id,
       |       round(avg_token_len, 6) AS avg_token_len,
       |       round(punct_ratio, 6) AS punct_ratio,
       |       round(stopword_ratio, 6) AS stopword_ratio,
       |       round(least(n_tok / 100.0, 1.0) * 0.4
       |             + least(stopword_ratio * 5.0, 1.0) * 0.4
       |             + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 6) AS quality_score,
       |       least(n_tok / 100.0, 1.0) * 0.4
       |         + least(stopword_ratio * 5.0, 1.0) * 0.4
       |         + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2 >= 0.5 AS is_high_quality
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  // ---- language ID -------------------------------------------------------

  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "不", "我", "在", "了", "有"))

  /** Function-word-hit language ID (the classic cheap heuristic): count
    * tokens hitting each language's top function words, argmax with a
    * deterministic tiebreak (declaration order), 'und' (undetermined)
    * when nothing hits. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = toks($"text")
    val hitCols = langWords.map { case (lang, words) =>
      size(filter(t, tk => tk.isInCollection(words))).as(s"hits_$lang")
    }
    // chained CASE in declaration order: first language whose hits are
    // positive and >= all others wins — ties resolve to the earlier
    // language, identically in both engines (CASE is order-defined).
    val best = langWords.map(_._1).foldRight(lit("und"): Column) {
      case (lang, acc) =>
        val cond = langWords.map(_._1).filter(_ != lang)
          .map(o => col(s"hits_$lang") >= col(s"hits_$o"))
          .reduce(_ && _) && col(s"hits_$lang") > 0
        when(cond, lit(lang)).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .select(($"doc_id" +: $"lang".as("lang_labeled") +: hitCols): _*)
      .withColumn("lang_pred", best)
      .orderBy($"doc_id")
  }

  val langIdSql: String = {
    val hits = langWords.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(t, tk -> list_contains($lst, tk))) AS INTEGER) AS hits_$lang"
    }.mkString(",\n         ")
    val langs = langWords.map(_._1)
    val cases = langs.map { lang =>
      val geAll = langs.filter(_ != lang).map(o => s"hits_$lang >= hits_$o")
      val conds = (geAll :+ s"hits_$lang > 0").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString("\n            ")
    s"""WITH base AS (
       |  SELECT doc_id, lang AS lang_labeled,
       |         string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, lang_labeled,
       |         $hits
       |  FROM base)
       |SELECT doc_id, lang_labeled, hits_en, hits_es, hits_de, hits_fr, hits_zh,
       |       CASE $cases
       |            ELSE 'und' END AS lang_pred
       |FROM h
       |ORDER BY doc_id""".stripMargin
  }

  /** Detector-quality confusion matrix: the n-gram language detector's
    * prediction against the corpus's labeled language, one row per
    * (labeled, predicted) cell with the cell count and the integer
    * per-mille share of its labeled row — the audit that decides
    * whether `lang_pred` can drive a mixing/filter decision where the
    * label is missing, and WHERE it fails when it does (which labeled
    * language bleeds into which prediction, and how much lands in
    * 'und'). Scale: one detector pass (narrow per-row projection) +
    * one combiner group-by to the |langs|² cell table; the row-total
    * join is cells-sized. */
  def langIdConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = langId(spark, sfDir)
      .groupBy($"lang_labeled", $"lang_pred").agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy($"lang_labeled").agg(sum($"n").as("n_labeled"))
    cells.join(broadcast(rowTot), "lang_labeled")
      .select($"lang_labeled", $"lang_pred", $"n", $"n_labeled",
        floor($"n" * 1000L / $"n_labeled").cast("long").as("share_x1000"))
      .orderBy($"lang_labeled", $"lang_pred")
  }

  val langIdConfusionSql: String =
    s"""WITH pred AS ($langIdSql),
       |cells AS (
       |  SELECT lang_labeled, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM pred GROUP BY 1, 2),
       |rt AS (SELECT lang_labeled, CAST(SUM(n) AS BIGINT) AS n_labeled
       |       FROM cells GROUP BY 1)
       |SELECT c.lang_labeled, c.lang_pred, c.n, rt.n_labeled,
       |       CAST(c.n * 1000 // rt.n_labeled AS BIGINT) AS share_x1000
       |FROM cells c JOIN rt USING (lang_labeled)
       |ORDER BY c.lang_labeled, c.lang_pred""".stripMargin

  /** Direct oracle gate for the fused `ngrams` CODEGEN EXPRESSION
    * ([[graft.plans.NGrams]]): positional 3-grams of every 20th
    * document, exploded with their positions, against DuckDB's
    * list-comprehension formulation. The expression is already
    * byte-parity-tested against the Spark HOF chain (PropertySpec);
    * this pins it against an independent engine as well — the custom
    * Expression gets the same evidence standard as the built-ins. */
  def ngramsExpr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter($"doc_id" % 20 === 0)
      .select($"doc_id",
        posexplode(graft.plans.ShingleExpression.ngrams(toks($"text"), 3, distinct = false))
          .as(Seq("pos", "gram")))
      .select($"doc_id", $"pos", $"gram")
      .orderBy($"doc_id", $"pos")
  }

  val ngramsExprSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents WHERE doc_id % 20 = 0),
      |g AS (
      |  SELECT doc_id,
      |         unnest([{'pos': i - 1,
      |                  'gram': t[i] || ' ' || t[i+1] || ' ' || t[i+2]}
      |                 FOR i IN range(1, greatest(len(t) - 1, 1))],
      |                recursive := true) AS _
      |  FROM toks)
      |SELECT doc_id, CAST(pos AS INT) AS pos, gram
      |FROM g
      |ORDER BY doc_id, pos""".stripMargin

  // ---- fingerprinting ----------------------------------------------------

  /** Content fingerprint of whitespace-normalized lower text (md5 +
    * 16-char prefix bucket), plus a 60-bit rolling-style numeric
    * fingerprint derived from the hash — the join key for fast
    * exact-dup detection across shards. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val norm = regexp_replace(trim(lower($"text")), "\\s+", " ")
    Tables.documents(spark, sfDir).select(
      $"doc_id",
      md5(norm).as("fp_md5"),
      substring(md5(norm), 1, 16).as("fp_bucket"),
      conv(substring(md5(norm), 1, 15), 16, 10).cast("long").as("fp_num"))
      .orderBy($"doc_id")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5,
      |       substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 16) AS fp_bucket,
      |       CAST(('0x' || substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS fp_num
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- document chunking (the pre-embedding window step) -----------------

  /** Fixed-size token windows with overlap — how a pipeline slices
    * documents before embedding / context-window packing. Chunk i
    * covers tokens [i·stride, i·stride + chunkSize); the final chunk is
    * short rather than padded; `ceil(max(n − chunkSize, 0) / stride) + 1`
    * chunks per non-empty document, so every token is covered and
    * consecutive chunks overlap by `chunkSize − stride` tokens.
    *
    * Scale: one narrow projection + generator per row — no shuffle; the
    * explode's fan-out is bounded by n/stride per document, and the
    * chunk rows feed the embedding stage with doc lineage
    * (doc_id, chunk_idx) intact. */
  def chunkDocuments(spark: SparkSession, sfDir: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    import spark.implicits._
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got $stride/$chunkSize")
    val nChunks = (ceil(greatest(size($"t") - chunkSize, lit(0)) /
      lit(stride.toDouble)) + 1).cast("int")
    Tables.documents(spark, sfDir)
      .select($"doc_id", Dedup.tokens($"text").as("t"))
      .filter(size($"t") > 0)
      // single-small-file input = one scan partition; spread the
      // CPU-heavy chunk construction across cores (the same measured
      // trap the shingle builder documents)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id", $"t", posexplode(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice($"t", i * stride + 1, lit(chunkSize))))))
      .select($"doc_id", $"pos".as("chunk_idx"), $"col".as("chunk"),
        (least($"pos" * stride + chunkSize, size($"t")) - $"pos" * stride)
          .cast("int").as("n_tokens"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Sequence packing — the step after chunking in a pretraining
    * pipeline: concatenate the token stream and cut it into fixed
    * `windowTokens` training sequences. A chunk belongs to the pack
    * where its FIRST token lands (concatenative pack-and-cut).
    *
    * Scale: a single global running sum would funnel the corpus
    * through one partition (the unpartitioned-window trap), so packing
    * is SHARDED — documents hash into `nShards` independent streams,
    * each packed in parallel with its own running sum, exactly how a
    * multi-worker packing job shards in practice. The shard hash is
    * the cross-engine [[Dedup.hash60]], so the DuckDB oracle reproduces
    * pack membership bit-for-bit.
    *
    * Output: one row per (shard, pack_id) with its chunk count and
    * token count — the pack manifest a trainer consumes. */
  def packChunks(spark: SparkSession, sfDir: String, windowTokens: Int = 512,
      chunkSize: Int = 64, stride: Int = 48, nShards: Int = 8): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val chunks = chunkDocuments(spark, sfDir, chunkSize, stride)
      .withColumn("shard",
        pmod(Dedup.hash60(concat_ws("|", $"doc_id".cast("string"), lit("pack_v1"))),
          lit(nShards.toLong)))
    val w = Window.partitionBy($"shard").orderBy($"doc_id", $"chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("pack_id",
        floor(($"cum" - $"n_tokens") / windowTokens).cast("long"))
      .groupBy($"shard", $"pack_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"n_tokens").cast("long").as("pack_tokens"))
      .orderBy($"shard", $"pack_id")
  }

  def packChunksSql(windowTokens: Int = 512, chunkSize: Int = 64,
      stride: Int = 48, nShards: Int = 8): String =
    s"""WITH chunks AS (${chunkDocumentsSql(chunkSize, stride)
          .replaceAll("(?s)\nORDER BY [^\n]*$", "")}),
       |sharded AS (
       |  SELECT *,
       |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || 'pack_v1'), 1, 15)) AS BIGINT) % $nShards AS shard
       |  FROM chunks),
       |cum AS (
       |  SELECT shard, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id, chunk_idx
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM sharded)
       |SELECT shard, CAST(floor((cum - n_tokens) * 1.0 / $windowTokens) AS BIGINT) AS pack_id,
       |       COUNT(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
       |FROM cum
       |GROUP BY 1, 2
       |ORDER BY shard, pack_id""".stripMargin

  // ---- repetition signals (Gopher-style quality filters) -----------------

  /** Repetition-based quality signals — the standard corpus filters for
    * boilerplate / degenerate text: most-frequent-token share,
    * most-frequent-bigram share, and the fraction of 3-gram occurrences
    * that are repeats of an earlier 3-gram in the same document.
    *
    * Two deliberately different distributed shapes, each the right one
    * for its statistic:
    *  - Top-gram shares need per-(doc, gram) COUNTS → explode +
    *    two-level groupBy (partial aggregation map-side; the shuffle key
    *    (doc_id, gram) is as fine-grained as it gets, so no hot keys at
    *    100 TB). Bigrams come from a lead() window over the exploded
    *    tokens — partitioned BY DOCUMENT, so state is bounded by the
    *    longest document, never the corpus. NOT an interpreted HOF
    *    per-row map (the measured 20-55× trap), and never a per-doc
    *    in-memory gram→count map (unbounded for adversarial docs).
    *  - The duplicate-3-gram fraction only needs the DISTINCT count →
    *    the fused codegen [[graft.plans.ShingleExpression.sortedShingles]]
    *    gives it per-row in one pass, no shuffle at all.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", Dedup.tokens($"text").as("t"))
      // single-small-file scan → spread the explode fan-out (same
      // measured trap the shingle builder documents)
      .repartition(spark.sparkContext.defaultParallelism)
    val base = docs.select($"doc_id", size($"t").as("n"),
      size(graft.plans.ShingleExpression.sortedShingles($"t")).as("d3"))
    val toks = docs.select($"doc_id", posexplode($"t").as(Seq("pos", "g")))
    val ua = toks.groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_uni"))
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    val ba = toks
      .withColumn("nxt", lead($"g", 1).over(w))
      .filter($"nxt".isNotNull)
      .select($"doc_id", concat_ws(" ", $"g", $"nxt").as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_bi"))
    val topTok = when($"n" > 0, $"top_uni".cast("double") / $"n").otherwise(0.0)
    val topBi = when($"n" >= 2, $"top_bi".cast("double") / ($"n" - 1)).otherwise(0.0)
    val dup3 = when($"n" >= 3,
      lit(1.0) - $"d3".cast("double") / ($"n" - 2)).otherwise(0.0)
    base
      .join(ua, Seq("doc_id"), "left")
      .join(ba, Seq("doc_id"), "left")
      .select($"doc_id", $"n".cast("int").as("n_tokens"),
        round(topTok, 6).as("top_token_ratio"),
        round(topBi, 6).as("top_bigram_ratio"),
        round(dup3, 6).as("dup_3gram_frac"))
      .withColumn("is_repetitive",
        $"top_bigram_ratio" >= 0.1 || $"dup_3gram_frac" >= 0.3)
      .orderBy($"doc_id")
  }

  val repetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      |  FROM documents),
      |base AS (SELECT doc_id, len(t) AS n FROM toks),
      |uni AS (SELECT doc_id, unnest(t) AS g FROM toks),
      |ua AS (
      |  SELECT doc_id, max(c) AS top_uni
      |  FROM (SELECT doc_id, g, COUNT(*) AS c FROM uni GROUP BY 1, 2)
      |  GROUP BY 1),
      |bi AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
      |ba AS (
      |  SELECT doc_id, max(c) AS top_bi
      |  FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY 1, 2)
      |  GROUP BY 1),
      |tri AS (
      |  SELECT doc_id, COUNT(DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS d3
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks)
      |  GROUP BY 1),
      |m AS (
      |  SELECT b.doc_id, CAST(b.n AS INTEGER) AS n_tokens,
      |         round(CASE WHEN b.n > 0 THEN CAST(ua.top_uni AS DOUBLE) / b.n ELSE 0.0 END, 6) AS top_token_ratio,
      |         round(CASE WHEN b.n >= 2 THEN CAST(ba.top_bi AS DOUBLE) / (b.n - 1) ELSE 0.0 END, 6) AS top_bigram_ratio,
      |         round(CASE WHEN b.n >= 3 THEN 1.0 - CAST(tri.d3 AS DOUBLE) / (b.n - 2) ELSE 0.0 END, 6) AS dup_3gram_frac
      |  FROM base b
      |  LEFT JOIN ua USING (doc_id)
      |  LEFT JOIN ba USING (doc_id)
      |  LEFT JOIN tri USING (doc_id))
      |SELECT *, (top_bigram_ratio >= 0.1 OR dup_3gram_frac >= 0.3) AS is_repetitive
      |FROM m
      |ORDER BY doc_id""".stripMargin

  def chunkDocumentsSql(chunkSize: Int = 64, stride: Int = 48): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
       |idx AS (
       |  SELECT doc_id, t, n,
       |         unnest(range(0, CAST(ceil(greatest(n - $chunkSize, 0)
       |                / CAST($stride AS DOUBLE)) AS BIGINT) + 1)) AS i
       |  FROM sized)
       |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       |       array_to_string(t[(i * $stride + 1):(i * $stride + $chunkSize)], ' ') AS chunk,
       |       CAST(least(i * $stride + $chunkSize, n) - i * $stride AS INTEGER) AS n_tokens
       |FROM idx
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- vocabulary heavy hitters ------------------------------------------

  /** Exact corpus-wide heavy hitters: the top-k tokens by total
    * occurrence count, with document frequency — the vocabulary /
    * stopword-discovery pass (and the exact counterpart to a
    * count-min-sketch at scale).
    *
    * Scale: explode is a narrow flatMap; the token aggregate is ONE
    * shuffle whose Zipf skew is exactly what partial (map-side)
    * aggregation neutralizes — each hot token collapses to one row per
    * input partition before the exchange. COUNT(DISTINCT doc_id) adds
    * Spark's standard two-phase distinct expansion, and the top-k is a
    * TakeOrderedAndProject (no global sort), tiebroken on token for a
    * total order. */
  def heavyHitters(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(toks($"text")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"doc_id").as("doc_freq"))
      .orderBy($"n_occurrences".desc, $"token")
      .limit(k)
  }

  /** Per-source TF-IDF signature terms — "what vocabulary makes this
    * source DIFFERENT": each source is one aggregate profile, tf is
    * its term count, idf = ln(#sources / #sources-containing-term), so
    * corpus-universal stopwords score exactly 0 and die while
    * source-specific vocabulary surfaces. Top `k` per source by
    * (score desc, term) — the characterization a corpus card prints
    * per ingestion source.
    *
    * Exactness: the ln alone is quantized per TERM (idf_e9 =
    * floor(ln(S/df) · 1e9) as BIGINT) and THEN multiplied by the
    * integer tf — score_e9 = tf · idf_e9 is exact integer arithmetic
    * in both engines ([[pmiCollocations]]' discipline). Flooring the
    * raw tf·ln·1e9 product instead would amplify a 1-ulp JVM-vs-libm
    * ln divergence by tf·1e9 and could flip the floor (ADVICE r7). Scale: one
    * corpus explode into (source, term) counts (combiner shuffle);
    * df/rank work is vocab × sources — bounded; the per-source window
    * partitions on source over that bounded frame. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String,
      k: Int = 5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cst = Tables.documents(spark, sfDir)
      .select($"source", explode(toks($"text")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
    val df = cst.groupBy($"term").agg(count(lit(1)).as("df"))
    val s = cst.select($"source").distinct()
      .agg(count(lit(1)).as("n_sources"))
    val w = Window.partitionBy($"source").orderBy($"score_e9".desc, $"term")
    cst.join(df, "term").crossJoin(broadcast(s))
      .withColumn("idf_e9",
        floor(log($"n_sources".cast("double") / $"df".cast("double")) *
          lit(1e9)).cast("long"))
      .withColumn("score_e9", $"tf" * $"idf_e9")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"source", $"rk", $"term", $"tf", $"df", $"score_e9")
      .orderBy($"source", $"rk")
  }

  def tfidfTopTermsSql(k: Int = 5): String =
    s"""WITH cst AS (
       |  SELECT source, term, COUNT(*) AS tf
       |  FROM (SELECT source,
       |               UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS term
       |        FROM documents)
       |  WHERE term <> ''
       |  GROUP BY 1, 2),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM cst GROUP BY 1),
       |s AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM cst),
       |scored AS (
       |  SELECT c.source, c.term, CAST(c.tf AS BIGINT) AS tf, df.df,
       |         CAST(c.tf AS BIGINT)
       |           * CAST(FLOOR(ln(CAST(s.n_sources AS DOUBLE)
       |                           / CAST(df.df AS DOUBLE))
       |                        * 1000000000.0) AS BIGINT) AS score_e9
       |  FROM cst c JOIN df USING (term) CROSS JOIN s)
       |SELECT source, rk, term, tf, df, score_e9
       |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY source
       |        ORDER BY score_e9 DESC, term) AS INT) AS rk
       |      FROM scored)
       |WHERE rk <= $k
       |ORDER BY source, rk""".stripMargin

  /** Data-dependent quality gate: keep documents at or above the exact
    * corpus-median quality score. The threshold is computed IN the plan
    * (1-row aggregate, broadcast cross join) — not collected to the
    * driver — so the gate composes into larger pipelines and recomputes
    * consistently on retry. Thresholding uses the 6-dp-rounded score
    * (the cross-engine-stable value q_quality_score already pins), and
    * the interpolated median of identical doubles is the same double in
    * both engines, so membership is exact.
    *
    * Scale: scoring is the narrow projection; the median is one
    * percentile_cont aggregate (a sort of scores only, not documents);
    * the gate itself is a broadcast of ONE row over a second scan —
    * no corpus shuffle anywhere. */
  def qualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = qualityScore(spark, sfDir).select($"doc_id", $"quality_score")
    val thr = scored.agg(
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY quality_score)")
        .as("median_raw"))
    scored.crossJoin(broadcast(thr))
      .filter($"quality_score" >= $"median_raw")
      .select($"doc_id", $"quality_score", round($"median_raw", 6).as("median_score"))
      .orderBy($"doc_id")
  }

  def qualityGateSql: String =
    s"""WITH scored AS ($qualityScoreSql),
       |thr AS (SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY quality_score) AS median_raw
       |        FROM scored)
       |SELECT s.doc_id, s.quality_score, round(t.median_raw, 6) AS median_score
       |FROM scored s CROSS JOIN thr t
       |WHERE s.quality_score >= t.median_raw
       |ORDER BY s.doc_id""".stripMargin

  def heavyHittersSql(k: Int = 25): String =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS token
       |  FROM documents)
       |SELECT token, COUNT(*) AS n_occurrences,
       |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
       |FROM toks
       |WHERE token <> ''
       |GROUP BY token
       |ORDER BY n_occurrences DESC, token
       |LIMIT $k""".stripMargin

  // ---- PMI collocations --------------------------------------------------

  /** Pointwise-mutual-information collocation mining (Church & Hanks,
    * CL 1990): bigrams whose co-occurrence beats the independence
    * prediction — the classic phrase-mining signal a tokenizer/
    * vocabulary pipeline runs to decide which multi-word units deserve
    * pieces. PMI(a,b) = ln p(ab) − ln p(a) − ln p(b), each ln floored
    * to integer e9 nats SEPARATELY (the [[Perplexity]] cross-engine
    * discipline: sums of pre-floored BIGINTs are exact, so the gate
    * hash-matches despite JVM-vs-libm ln ulp drift). `minCount` floors
    * the unstable low-frequency tail, as the paper prescribes.
    *
    * Scale: one token explode → unigram counts (vocab-sized), one
    * bigram explode → pair counts (vocab²-bounded, Zipf-truncated by
    * minCount); totals are 1-row aggregates broadcast by crossJoin.
    * Top-k is TakeOrderedAndProject. */
  def pmiCollocations(spark: SparkSession, sfDir: String,
      minCount: Int = 5, k: Int = 20): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", toks($"text").as("t"))
    val uni = d.select(explode($"t").as("w")).filter($"w" =!= "")
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val bi = d.filter(size($"t") >= 2)
      .select(explode(zip_with(
        slice($"t", lit(1), size($"t") - 1),
        slice($"t", lit(2), size($"t") - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy($"bg").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= minCount)
    val nUni = uni.agg(sum($"c").as("n_uni"))
    val nBi = d.filter(size($"t") >= 2)
      .agg(sum(size($"t") - 1).as("n_bi"))
    def lnE9(num: Column, den: Column): Column =
      floor(log(num.cast("double") / den.cast("double")) * 1e9).cast("long")
    bi
      .withColumn("wa", split($"bg", " ").getItem(0))
      .withColumn("wb", split($"bg", " ").getItem(1))
      .join(uni.select($"w".as("wa"), $"c".as("c_a")), "wa")
      .join(uni.select($"w".as("wb"), $"c".as("c_b")), "wb")
      .crossJoin(nUni).crossJoin(nBi)
      .select($"bg", $"c_ab", $"c_a", $"c_b",
        (lnE9($"c_ab", $"n_bi") - lnE9($"c_a", $"n_uni") -
          lnE9($"c_b", $"n_uni")).as("pmi_e9"))
      .orderBy($"pmi_e9".desc, $"bg")
      .limit(k)
  }

  def pmiCollocationsSql(minCount: Int = 5, k: Int = 20): String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |uni AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS c FROM (
       |    SELECT UNNEST(t) AS w FROM d) u WHERE w <> '' GROUP BY w),
       |bi AS (
       |  SELECT bg, COUNT(*) AS c_ab FROM (
       |    SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
       |                                 i -> t[i] || ' ' || t[i + 1])) AS bg
       |    FROM d WHERE len(t) >= 2) b
       |  GROUP BY bg HAVING COUNT(*) >= $minCount),
       |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
       |nb AS (SELECT CAST(SUM(len(t) - 1) AS BIGINT) AS n_bi FROM d WHERE len(t) >= 2)
       |SELECT bg, c_ab, ua.c AS c_a, ub.c AS c_b,
       |       CAST(FLOOR(ln(CAST(c_ab AS DOUBLE) / CAST(n_bi AS DOUBLE)) * 1e9) AS BIGINT)
       |     - CAST(FLOOR(ln(CAST(ua.c AS DOUBLE) / CAST(n_uni AS DOUBLE)) * 1e9) AS BIGINT)
       |     - CAST(FLOOR(ln(CAST(ub.c AS DOUBLE) / CAST(n_uni AS DOUBLE)) * 1e9) AS BIGINT)
       |       AS pmi_e9
       |FROM bi
       |JOIN uni ua ON ua.w = string_split(bg, ' ')[1]
       |JOIN uni ub ON ub.w = string_split(bg, ' ')[2]
       |CROSS JOIN nu CROSS JOIN nb
       |ORDER BY pmi_e9 DESC, bg
       |LIMIT $k""".stripMargin

  // ---- Zipf rank-frequency slope ------------------------------------------

  /** Per-source Zipf slope: the OLS fit of ln(frequency) on ln(rank)
    * over each source's top `topRanks` words (Zipf 1949; natural text
    * sits near −1 — a much flatter or steeper slope flags templated,
    * machine-generated or spam-heavy sources, and R² flags bimodal
    * boilerplate+text mixes). The vocabulary-statistics sibling of
    * [[graft.functions.WordPiece.fertility]].
    *
    * Cross-engine exactness: each ln is floored to an e9 BIGINT first
    * (the PMI discipline — one ulp of libm drift moves a floor with
    * probability ~1e-9 per distinct value, and nothing downstream
    * amplifies it), then the OLS moments Σx, Σy, Σxy, Σxx and the
    * slope's numerator/denominator n·Σxy − Σx·Σy are EXACT decimal
    * integer arithmetic. The final ratio is one correctly-rounded
    * decimal→double cast per side and one IEEE division — identical in
    * both engines. slope_e9 = floor(num/den · 1e9); r2_e9 = floor(num²/
    * (den·(n·Σyy − Σy²)) · 1e9).
    *
    * Scale: one corpus explode into the (source, word)-keyed count
    * (map-side combined); ranking is a window PARTITIONED BY SOURCE
    * over the vocabulary-sized frame (never corpus rows); the fit
    * itself is `topRanks` rows per source. Output: one row per source. */
  def zipfSlope(spark: SparkSession, sfDir: String,
      topRanks: Int = 256): DataFrame =
    zipfSlopeOf(Tables.documents(spark, sfDir), topRanks)

  /** Same, over any (source, text) frame — the testable core. */
  def zipfSlopeOf(docs: DataFrame, topRanks: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val sw = docs
      .select($"source", explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy($"source", $"word").agg(count(lit(1)).as("cnt"))
    val ranked = sw
      .withColumn("r", row_number().over(
        Window.partitionBy($"source").orderBy($"cnt".desc, $"word".asc)))
      .filter($"r" <= topRanks)
      .select($"source",
        floor(log($"r".cast("double")) * lit(1e9)).cast("long").as("x"),
        floor(log($"cnt".cast("double")) * lit(1e9)).cast("long").as("y"))
    // exact decimal moments: |x| < 6.4e9 (ln topRanks ≤ 1e4), |y| < 4e10
    // (ln of any BIGINT count) — products bounded by decimal(25,0)
    val stats = ranked.groupBy($"source").agg(
      count(lit(1)).as("n"),
      sum($"x".cast("decimal(20,0)")).as("sx"),
      sum($"y".cast("decimal(20,0)")).as("sy"),
      sum(($"x".cast("decimal(12,0)") * $"y".cast("decimal(12,0)"))).as("sxy"),
      sum(($"x".cast("decimal(12,0)") * $"x".cast("decimal(12,0)"))).as("sxx"),
      sum(($"y".cast("decimal(12,0)") * $"y".cast("decimal(12,0)"))).as("syy"))
    val n = $"n".cast("decimal(10,0)")
    val num = (n * $"sxy" - $"sx" * $"sy").cast("double")
    val den = (n * $"sxx" - $"sx" * $"sx").cast("double")
    val deny = (n * $"syy" - $"sy" * $"sy").cast("double")
    stats.select($"source", $"n".cast("long").as("n_terms"),
        when(den > 0.0, floor(num / den * lit(1e9)).cast("long"))
          .as("slope_e9"),
        when(den > 0.0 && deny > 0.0,
          floor(num * num / (den * deny) * lit(1e9)).cast("long"))
          .as("r2_e9"))
      .orderBy($"source")
  }

  /** DuckDB replay: identical quantized-ln OLS; exact moments through
    * HUGEINT (the decimal twin). */
  def zipfSlopeSql(topRanks: Int = 256): String =
    s"""WITH sw AS (
       |  SELECT source, word, COUNT(*) AS cnt
       |  FROM (SELECT source,
       |               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
       |        FROM documents)
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT source,
       |         CAST(floor(ln(CAST(r AS DOUBLE)) * 1e9) AS BIGINT) AS x,
       |         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT) AS y
       |  FROM (SELECT source, cnt,
       |               row_number() OVER (PARTITION BY source
       |                   ORDER BY cnt DESC, word ASC) AS r
       |        FROM sw)
       |  WHERE r <= $topRanks),
       |stats AS (
       |  SELECT source, COUNT(*) AS n,
       |         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |         SUM(CAST(x AS HUGEINT) * y) AS sxy,
       |         SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |         SUM(CAST(y AS HUGEINT) * y) AS syy
       |  FROM ranked GROUP BY 1)
       |SELECT source, CAST(n AS BIGINT) AS n_terms,
       |       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0 THEN
       |         CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
       |                    / CAST(n * sxx - sx * sx AS DOUBLE) * 1e9) AS BIGINT)
       |       END AS slope_e9,
       |       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0.0
       |             AND CAST(n * syy - sy * sy AS DOUBLE) > 0.0 THEN
       |         CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
       |                    * CAST(n * sxy - sx * sy AS DOUBLE)
       |                    / (CAST(n * sxx - sx * sx AS DOUBLE)
       |                       * CAST(n * syy - sy * sy AS DOUBLE)) * 1e9) AS BIGINT)
       |       END AS r2_e9
       |FROM stats ORDER BY source""".stripMargin
}
