package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus batch decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeCodec]]); everything around
  * it — schema (binary payload + metadata struct), partition-parallel
  * batch processing via `mapPartitions` over a typed Dataset (the Scala
  * analog of `mapInPandas`: one iterator per partition, amortized
  * per-batch setup), output schema, and the oracle-checked metadata
  * projection — is real Spark plumbing as it would ship.
  *
  * Scale: payloads stay opaque bytes end-to-end (no driver collect, no
  * row-by-row codec spin-up); decode parallelism = partition count, and
  * a `repartition(n)` before the map is the knob for codec-bound stages.
  */
object Multimodal {

  /** One media row: payload is the raw bytes of the asset. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features per asset (width/height/frames are fake-decoded). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB — deterministic fake codec. A real deployment replaces this
    * object (only this object) with e.g. a JNI image decoder; the
    * surrounding Dataset plumbing is unchanged. The fake derives
    * "decoded" properties from the bytes so tests are reproducible. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      // Long arithmetic: n * 104729 overflows Int at ~20.5 KB payloads,
      // which would diverge from the Long-typed SQL/expression path
      val n = payload.length.toLong
      val w = 64L + ((n * 7919L) % 960L)    // fake width  ∈ [64, 1024)
      val h = 64L + ((n * 104729L) % 704L)  // fake height ∈ [64, 768)
      val frames = 1L + (n % 16L)           // fake frame count
      (w.toInt, h.toInt, frames.toInt)
    }
    /** Fake resize: keeps aspect via integer scaling — pure function. */
    def resize(w: Int, h: Int, maxSide: Int): (Int, Int) = {
      val side = math.max(w, h)
      if (side <= maxSide) (w, h)
      else (w * maxSide / side, h * maxSide / side)
    }
  }

  /** Build the media table from documents: text bytes stand in for the
    * binary asset (the only corpus in the testdata); kind cycles through
    * the three modalities to exercise per-kind paths. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      $"doc_id".as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
      encode($"text", "UTF-8").as("payload"))
  }

  /** The mapInPandas-analog stage: partition-iterator batch decode.
    * Runs the codec once per row but amortizes any heavy setup (a real
    * codec context) once per PARTITION — the point of mapPartitions. */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      // per-partition setup would go here (codec context, model handle)
      rows.map { r =>
        val (w, h, f) = FakeCodec.decode(r.payload)
        val checksum = r.payload.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, f, checksum)
      }
    }
  }

  /** Oracle-checked projection: everything about the binary plumbing
    * that SQL can independently recompute (sizes, fake-decode geometry,
    * resize, frame sampling counts). The mapPartitions path computes the
    * same values through [[FakeCodec]]; ScalaTest asserts both agree. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nBytes = octet_length(encode($"text", "UTF-8"))
    val w = lit(64) + pmod(nBytes.cast("long") * 7919, lit(960))
    val h = lit(64) + pmod(nBytes.cast("long") * 104729, lit(704))
    val side = greatest(w, h)
    Tables.documents(spark, sfDir).select(
      $"doc_id".as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
      nBytes.as("n_bytes"),
      w.cast("int").as("width"),
      h.cast("int").as("height"),
      (lit(1) + pmod(nBytes, lit(16))).cast("int").as("n_frames"),
      when(side <= 256, w).otherwise(floor(w * 256 / side)).cast("int").as("resized_w"),
      when(side <= 256, h).otherwise(floor(h * 256 / side)).cast("int").as("resized_h"))
      .orderBy($"media_id")
  }

  val mediaFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |         ['image', 'audio', 'video'][CAST(media_id % 3 AS INTEGER) + 1] AS kind,
      |         CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes
      |  FROM documents),
      |g AS (
      |  -- BIGINT arithmetic: INT32 n_bytes * 104729 overflows DuckDB at
      |  -- ~20.5 KB payloads (the Scala FakeCodec fix has the same rationale)
      |  SELECT media_id, kind, n_bytes,
      |         64 + (CAST(n_bytes AS BIGINT) * 7919) % 960 AS width,
      |         64 + (CAST(n_bytes AS BIGINT) * 104729) % 704 AS height
      |  FROM m)
      |SELECT media_id, kind, n_bytes,
      |       CAST(width AS INTEGER) AS width,
      |       CAST(height AS INTEGER) AS height,
      |       CAST(1 + n_bytes % 16 AS INTEGER) AS n_frames,
      |       CAST(CASE WHEN greatest(width, height) <= 256 THEN width
      |                 ELSE width * 256 // greatest(width, height) END AS INTEGER) AS resized_w,
      |       CAST(CASE WHEN greatest(width, height) <= 256 THEN height
      |                 ELSE height * 256 // greatest(width, height) END AS INTEGER) AS resized_h
      |FROM g
      |ORDER BY media_id""".stripMargin

  /** Oracle-checked view of the frame-sampling INDEX math (everything
    * in [[frameSample]] except the byte slices, which SQL cannot
    * recompute from a BLOB it can't md5): one row per sampled frame. */
  def frameIndex(spark: SparkSession, sfDir: String, stride: Int = 4): DataFrame = {
    import spark.implicits._
    frameSample(spark, sfDir, stride)
      .select($"media_id", $"kind", $"n_frames", $"sample_idx", $"frame_offset")
      .orderBy($"media_id", $"sample_idx")
  }

  def frameIndexSql(stride: Int = 4): String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |         ['image', 'audio', 'video'][CAST(media_id % 3 AS INTEGER) + 1] AS kind,
       |         CAST(1 + octet_length(CAST(text AS BLOB)) % 16 AS INTEGER) AS n_frames
       |  FROM documents)
       |SELECT media_id, kind, n_frames,
       |       CAST(unnest(range(0, (n_frames - 1) // $stride + 1)) AS INTEGER) AS sample_idx,
       |       CAST(unnest(range(0, (n_frames - 1) // $stride + 1)) * $stride AS INTEGER) AS frame_offset
       |FROM m
       |ORDER BY media_id, sample_idx""".stripMargin

  /** Frame-sample stage: every asset yields ceil(n_frames / stride)
    * sampled "frames" as byte slices — the explode-shaped stage of a
    * video pipeline (one input row → n output rows), kept as pure
    * column expressions so it stays in codegen.
    *
    * The slice surfaces as HEX (`substring(hex(payload), off·16+1, 16)`
    * — 8 payload bytes): bit-for-bit content, engine-portable, and the
    * reason this query is hash-gateable at all — DuckDB has no BLOB
    * substring, but hex-string slicing is byte-slicing in both engines
    * (r4 left this rows-only; the hex detour closes it). */
  def frameSample(spark: SparkSession, sfDir: String, stride: Int = 4): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
      .withColumn("n_frames", (lit(1) + pmod(octet_length($"payload"), lit(16))).cast("int"))
    media
      .select($"media_id", $"kind", hex($"payload").as("payload_hex"), $"n_frames",
        explode(sequence(lit(0),
          floor(($"n_frames" - 1) / lit(stride)).cast("int"))).as("sample_idx"))
      .withColumn("frame_offset", $"sample_idx" * stride)
      .withColumn("frame_hex",
        substring($"payload_hex", ($"frame_offset" * 16 + 1).cast("int"), lit(16)))
      .drop("payload_hex")
      .orderBy($"media_id", $"sample_idx")
  }

  /** Full oracle for [[frameSample]] — index math AND slice content
    * (the hex detour above). */
  def frameSampleSql(stride: Int = 4): String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id,
       |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
       |         hex(encode(text)) AS payload_hex,
       |         CAST(1 + octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
       |  FROM documents),
       |s AS (
       |  SELECT media_id, kind, payload_hex, n_frames,
       |         CAST(unnest(range(0, (n_frames - 1) // $stride + 1)) AS INTEGER) AS sample_idx
       |  FROM m)
       |SELECT media_id, kind, n_frames, sample_idx,
       |       sample_idx * $stride AS frame_offset,
       |       substring(payload_hex, sample_idx * $stride * 16 + 1, 16) AS frame_hex
       |FROM s
       |ORDER BY media_id, sample_idx""".stripMargin

  /** Binary content dedup — the media twin of the text exact-dedup:
    * group on the payload's content hash, keep the lowest media_id per
    * group. Payloads never leave executors (the hash is computed
    * in-plan, the output is group metadata only) and the shuffle
    * carries one 32-char key + counters per row with full map-side
    * combining — at 100 TB of video that asymmetry (hash bytes moved,
    * not payload bytes) is the whole operator.
    *
    * [[mediaDedupQuery]] plants duplicates (every 10th asset
    * re-ingested under a shifted id — the re-uploaded-file shape)
    * because the corpus has no natural byte-identical pairs at the
    * gate SF; the oracle mirrors the construction, so both the planted
    * groups and any natural ones are pinned. The operator itself takes
    * any (media_id, payload) frame and plants nothing. */
  def mediaDedup(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.groupBy(md5($"payload").as("content_key"))
      .agg(count(lit(1)).as("n_copies"),
        min($"media_id").as("keeper_media_id"),
        max(length($"payload")).as("n_bytes"))
      .filter($"n_copies" > 1)
      .orderBy($"keeper_media_id")
  }

  /** Gated fixture: the corpus plus every 10th asset re-ingested under
    * an id offset past any natural media_id. The generic operator
    * above never plants anything — this wrapper is the test fixture. */
  def mediaDedupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir).select($"media_id", $"payload")
    mediaDedup(media.unionByName(
      media.filter($"media_id" % 10 === 0)
        .select(($"media_id" + 1000000).as("media_id"), $"payload")))
  }

  val mediaDedupSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT md5(text) AS content_key, count(*) AS n_copies,
      |       min(media_id) AS keeper_media_id,
      |       CAST(max(octet_length(CAST(text AS BLOB))) AS INTEGER) AS n_bytes
      |FROM m GROUP BY 1 HAVING count(*) > 1
      |ORDER BY keeper_media_id""".stripMargin

  // ---- perceptual near-dup (dHash) --------------------------------------

  /** dHash geometry: a 6×11 "luma" grid → 6×10 = 60 horizontal-gradient
    * bits, folded into one non-negative BIGINT (the same 60-bit budget
    * as [[Dedup.simhashBits]] — bit 63 stays clear of the sign). */
  val dhashRows = 6
  val dhashCols = 11
  val dhashBits: Int = dhashRows * (dhashCols - 1)

  /** Bands for the hamming LSH join: 4 × 15 bits. Pigeonhole: two
    * hashes within hamming distance 3 share at least one untouched
    * band, so recall at `thr ≤ 3` is exactly 1 — the banded join and a
    * brute-force all-pairs scan return the SAME pair set, which is
    * what lets the DuckDB oracle be an independent brute-force
    * formulation rather than a mirror of the LSH. */
  val dhashBands = 4
  val dhashBandBits = 15

  /** The fake-decode "luma" sample: byte k·n/66 of the payload, the
    * even-stride sampling a real pHash takes over a decoded bitmap.
    * Like [[FakeCodec]], only the decode is fake — byte extraction,
    * grid fold, and banding are the real pipeline. Pure integer math
    * end to end (integer division for the index, unsigned byte via
    * hex→int) so Spark and DuckDB agree bit-exactly. */
  private def lumaGrid(payload: Column): Column = {
    val nb = octet_length(payload)
    val cells = dhashRows * dhashCols
    val pix = (0 until cells).map { k =>
      // floor(k·n / 66.0) == (k·n) // 66 exactly: the quotient is a
      // rational with denominator 66, so it sits ≥ 1/66 away from any
      // integer it isn't — double rounding cannot cross the boundary
      val idx = floor(lit(k.toLong) * nb.cast("long") / lit(cells.toDouble))
        .cast("int")
      when(nb > 0,
        conv(hex(payload.substr(idx + 1, lit(1))), 16, 10).cast("int"))
        .otherwise(0)
    }
    array(pix: _*)
  }

  /** Fold a 66-cell luma array into the 60 gradient bits. */
  private def foldBits(pix: Column): Column =
    (0 until dhashBits).map { k =>
      val r = k / (dhashCols - 1)
      val c = k % (dhashCols - 1)
      val i = r * dhashCols + c
      when(element_at(pix, i + 1) < element_at(pix, i + 2), lit(1L << k))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** 60-bit perceptual hash of a binary payload: bit r·10+c set iff
    * luma(r,c) < luma(r,c+1). A localized payload edit moves only the
    * grid cells that sample the edited bytes, so near-identical
    * payloads land within small hamming distance — the property exact
    * content hashing ([[mediaDedup]]) cannot provide.
    *
    * As ONE column the fold's 120 array references each re-inline the
    * 66-cell extraction under CollapseProject (~8k substr/hex/conv
    * evals per row and megabyte-scale codegen — measured 40× slower on
    * the gate corpus) — fine for spec-sized frames; query paths go
    * through [[dhashFrame]], which materializes the array behind an
    * exchange barrier. */
  def dhash60(payload: Column): Column = foldBits(lumaGrid(payload))

  /** (media_id, dhash) with the luma array materialized ONCE: the
    * repartition is a load-bearing exchange (same trick as
    * [[Dedup.bandKeys]]) that stops CollapseProject from re-inlining
    * the extraction into each of the fold's 120 references; the
    * checkpoint stops the band self-join from recomputing the hash on
    * both sides. Tiny frame — one id + one long per asset. */
  private def dhashFrame(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select($"media_id", lumaGrid($"payload").as("pix"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"media_id", foldBits($"pix").as("dhash"))
      .localCheckpoint(eager = true)
  }

  /** Perceptual near-duplicate pairs over any (media_id, payload)
    * frame: dhash per asset, banded bucket join, exact hamming ≤ `thr`
    * verification. Payload bytes never shuffle — only the 8-byte hash
    * and 2-byte band keys move (the [[mediaDedup]] asymmetry, again);
    * the banded self-join is collision-sized, never |corpus|². `thr`
    * above 3 would need more bands ([[dhashBands]]) to keep recall 1. */
  def mediaNearDup(media: DataFrame, thr: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(thr <= dhashBands - 1, s"recall guarantee needs thr <= ${dhashBands - 1}")
    val h = dhashFrame(media)
    val bands = h.select($"media_id", $"dhash",
      posexplode(array((0 until dhashBands).map(b =>
        shiftright($"dhash", b * dhashBandBits)
          .bitwiseAND(lit((1 << dhashBandBits) - 1))): _*)))
      .toDF("media_id", "dhash", "band_idx", "band_hash")
    bands.as("x").join(bands.as("y"), Seq("band_idx", "band_hash"))
      .filter($"x.media_id" < $"y.media_id")
      .select($"x.media_id".as("media_a"), $"y.media_id".as("media_b"),
        $"x.dhash".as("ha"), $"y.dhash".as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter($"hamming" <= thr)
      .select($"media_a", $"media_b", $"hamming")
      .orderBy($"media_a", $"media_b")
  }

  /** Gated fixture: the corpus plus every 20th asset re-ingested with a
    * one-character edit (the re-encoded-thumbnail shape — same asset,
    * slightly different bytes). Exact dedup is blind to these; the
    * perceptual hash pairs them. The DuckDB oracle recomputes dhash
    * from the same construction and then BRUTE-FORCES all pairs — so
    * both planted-pair presence and decoy absence are pinned against
    * ground truth, not against a mirror of the LSH. */
  def mediaNearDupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir).select($"media_id", $"payload")
    val variants = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 2000000).as("media_id"),
        encode(concat(lit("#"), expr("substring(text, 2)")), "UTF-8").as("payload"))
    mediaNearDup(media.unionByName(variants))
  }

  val mediaNearDupSql: String = {
    val cells = dhashRows * dhashCols
    // this DuckDB build has no BLOB substring — index into the hex image
    // of the payload instead (2 chars per byte, same unsigned value)
    val pixList =
      s"""list_transform(generate_series(0, ${cells - 1}),
         |           k -> CASE WHEN nb > 0 THEN CAST(('0x' || substring(hx, CAST(((k * nb) // $cells) * 2 + 1 AS INTEGER), 2)) AS INTEGER)
         |                     ELSE 0 END)""".stripMargin
    val fold = (0 until dhashBits).map { k =>
      val r = k / (dhashCols - 1)
      val c = k % (dhashCols - 1)
      val i = r * dhashCols + c
      s"CASE WHEN pix[${i + 1}] < pix[${i + 2}] THEN CAST(${1L << k} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, CAST(text AS BLOB) AS pb FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000, CAST('#' || substring(text, 2) AS BLOB)
       |  FROM documents WHERE doc_id % 20 = 0),
       |sized AS (SELECT media_id, hex(pb) AS hx, octet_length(pb) AS nb FROM m),
       |grids AS (
       |  SELECT media_id,
       |         $pixList AS pix
       |  FROM sized),
       |d AS (SELECT media_id, CAST($fold AS BIGINT) AS dhash FROM grids)
       |SELECT a.media_id AS media_a, b.media_id AS media_b,
       |       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
       |FROM d a JOIN d b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
       |ORDER BY media_a, media_b""".stripMargin
  }
}
