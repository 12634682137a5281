package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared-source catalog for the driver testdata (TESTDATA.md).
  *
  * Mirrors the reference's inferred-then-declared schema split
  * (reference: scheduler_data/dbt_nyc_taxi/models/raw/sources.yml:4-109 —
  * dbt declares every raw column after pandas-inferred ingestion): each
  * table gets an explicit [[StructType]] applied at read time instead of
  * relying on inference, so schema drift fails fast at the scan.
  *
  * Scale note: reads stay pushdown-friendly — callers `.select(...)`
  * immediately so the parquet scan prunes columns; passing the schema
  * here does not defeat predicate pushdown or vectorized reads.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.parquet stores `ts` physically as INT64; the logical
    * TIMESTAMP TimeUnit has drifted across driver testdata regenerations
    * (NANOS through round 3, MICROS since round 4's regen), so the unit
    * is PROBED from the parquet footer at load time ([[prepareEvents]])
    * and the decode dispatches on it — never hard-coded. `ts` is always
    * read as raw LongType (valid for every unit; NANOS additionally
    * needs the legacy flag because Spark 4 refuses TIMESTAMP(NANOS) as
    * TimestampType, [PARQUET_TYPE_ILLEGAL]) and converted with the
    * unit's divisor — for NANOS that is the same floor-to-micros
    * truncation DuckDB applies, so both engines agree. Integer `div`
    * (not `/`) because epoch-nanos ≈ 1.7e18 exceeds double's 2^53. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> eventsRaw,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Per-path probe cache: the footer is immutable for a given mtime;
    * keyed on (path, mtime) so a driver-side regeneration invalidates.
    * For directory-shaped tables the DIRECTORY mtime only moves on
    * entry create/delete/rename — an in-place part-file rewrite leaves
    * it unchanged — so the key folds in the newest mtime of the files
    * underneath (round-6 review). */
  private val nanosCols =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Set[String]]()

  /** Newest lastModified reachable under `f` (the dir itself, its part
    * files, nested dirs) — the invalidation stamp for probe caches. */
  private def deepMtime(f: java.io.File): Long =
    if (f.isFile) f.lastModified
    else (f.lastModified +: Option(f.listFiles()).toSeq.flatten
      .filterNot(_.getName.startsWith("."))
      .map(deepMtime)).max

  /** Declared-TimestampType columns stored as TIMESTAMP(NANOS) in the
    * file footer — Spark 4 refuses those as TimestampType, so [[load]]
    * reads them as raw longs and floor-divides (the events recipe,
    * generalized: the driver has regenerated fixtures mid-round twice;
    * any table's unit may drift next). */
  private def nanosTimestampCols(spark: SparkSession, path: String,
      schema: StructType): Set[String] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val declared = schema.fields.filter(_.dataType == TimestampType).map(_.name)
    if (declared.isEmpty) return Set.empty
    val f = new java.io.File(path.stripPrefix("file://"))
    val key = (f.getCanonicalPath, deepMtime(f))
    nanosCols.computeIfAbsent(key, { _ =>
      findParquetFile(f) match {
        case None => Set.empty[String]
        case Some(file) =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(file.getPath),
              spark.sessionState.newHadoopConf()))
          try {
            val msg = reader.getFooter.getFileMetaData.getSchema
            declared.filter { c =>
              msg.containsField(c) &&
                (msg.getFields.get(msg.getFieldIndex(c)).asPrimitiveType()
                  .getLogicalTypeAnnotation match {
                  case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
                  case _ => false
                })
            }.toSet
          } finally reader.close()
      }
    })
  }

  /** Read one table from an sf directory with its declared schema.
    * Timestamp columns whose file unit drifted to NANOS are read as raw
    * longs and converted — MICROS/MILLIS read natively; the declared
    * schema is what callers see either way. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") return events(spark, sfDir)
    val path = s"$sfDir/$name.parquet"
    val declared = schemas(name)
    val nanos = nanosTimestampCols(spark, path, declared)
    if (nanos.isEmpty)
      return spark.read.schema(declared).parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val readSchema = StructType(declared.fields.map(f =>
      if (nanos.contains(f.name)) f.copy(dataType = LongType) else f))
    nanos.foldLeft(spark.read.schema(readSchema).parquet(path)) { (df, c) =>
      df.withColumn(c,
        org.apache.spark.sql.functions.expr(s"timestamp_micros(`$c` div 1000)"))
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** Session-conf key holding the probed events timestamp unit
    * (NANOS / MICROS / MILLIS). Repo-written feed copies store `ts` as
    * a plain INT64 with no logical annotation, so they inherit the
    * unit of the original file through this conf. */
  val TsUnitKey = "graft.events.tsUnit"

  /** Probe the `ts` column's TIMESTAMP TimeUnit and footer min
    * statistic from the parquet footer — O(footer), no data scanned.
    * Returns (unit-or-"NONE", footer min in that unit). "NONE" = plain
    * INT64 (a repo-written raw feed copy). */
  private def findParquetFile(f: java.io.File): Option[java.io.File] =
    if (f.isFile) Some(f).filter(_.getName.endsWith(".parquet"))
    else Option(f.listFiles()).toSeq.flatten
      .filterNot(_.getName.startsWith("_")).sortBy(_.getName)
      .iterator.flatMap(findParquetFile).nextOption()

  def probeEventsTsUnit(spark: SparkSession,
      path: String): (String, Option[(Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val fileOpt = findParquetFile(new java.io.File(path.stripPrefix("file://")))
    if (fileOpt.isEmpty) return ("NONE", None)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(fileOpt.get.getPath),
        spark.sessionState.newHadoopConf()))
    try {
      val footer = reader.getFooter
      if (!footer.getFileMetaData.getSchema.containsField("ts")) return ("NONE", None)
      val schema = footer.getFileMetaData.getSchema
      val col = schema.getFields.get(schema.getFieldIndex("ts")).asPrimitiveType()
      val unit = col.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => t.getUnit.toString
        case _ => "NONE"
      }
      // min AND max aggregated over ALL row groups: unit inference must
      // not hinge on a single stat a lone corrupt row can poison — an
      // outlier min of millis magnitude in a micros feed would flip the
      // whole decode 1000× if min alone were consulted; requiring the
      // max to fit the same unit defeats any single-row outlier
      val stats = footer.getBlocks.asScala.flatMap { b =>
        b.getColumns.asScala.find(_.getPath.toDotString == "ts").flatMap { c =>
          Option(c.getStatistics).filter(_.hasNonNullValue).map(s => (
            s.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue))
        }
      }
      val statRange =
        if (stats.isEmpty) None
        else Some((stats.map(_._1).min, stats.map(_._2).max))
      (unit, statRange)
    } finally reader.close()
  }

  /** THE single copy of the events-read preparation (batch + streaming
    * call through here): probe the file's timestamp unit, pin it in the
    * session conf for [[decodeEventTs]], arm the legacy NANOS long-read
    * flag only when the file actually is NANOS, and run the
    * fixture-drift tripwire — the footer min stat, decoded with the
    * probed unit, must land in [2000, 2100), else fail loudly with the
    * footer logical type in the message (VERDICT r4: pinned assumptions
    * about driver-owned data must be verified, not trusted). */
  def prepareEvents(spark: SparkSession, path: String): String = {
    val (unit, statRange) = probeEventsTsUnit(spark, path)
    val lo = 946684800000000L  // 2000-01-01T00:00:00Z in micros
    val hi = 4102444800000000L // 2100-01-01T00:00:00Z in micros
    val effective =
      if (unit != "NONE") unit
      else {
        // un-annotated INT64 feed: INFER from the footer [min, max]
        // under the [2000, 2100) plausibility window — the windows of
        // the three units are 1000× apart and never overlap, so at most
        // one fits, and requiring BOTH ends of the range to fit means no
        // single corrupt row (which can poison min OR max, not both)
        // can flip the unit. Inference runs even when a session unit is
        // pinned (round-6 review: pin-first silently decoded a
        // NANOS-era raw copy 1000× off whenever any earlier prepare had
        // pinned MICROS); the pin is only the fallback for a stats-free
        // or outlier-torn footer.
        def fits(toMicros: Long => Long): Boolean =
          statRange.exists { case (mn, mx) =>
            val a = toMicros(mn); val b = toMicros(mx)
            a >= lo && a < hi && b >= lo && b < hi
          }
        if (fits(_ / 1000L)) "NANOS"
        else if (fits(identity)) "MICROS"
        else if (fits(m => if (m > 0 && m <= Long.MaxValue / 1000L) m * 1000L
                           else 0L)) "MILLIS"
        else if (spark.conf.getOption(TsUnitKey).isDefined)
          // stats-free footer, or a range no unit explains (an outlier
          // row): fall back to the explicitly pinned unit rather than
          // guessing from a poisoned stat
          spark.conf.get(TsUnitKey)
        else throw new IllegalStateException(
          s"events ts: $path stores ts as un-annotated INT64 and the footer " +
          s"[min, max] ($statRange) decodes into [2000, 2100) under no known " +
          s"unit — cannot infer" +
          s"${if (statRange.isEmpty) " (no stats, no pinned unit)" else ""}. " +
          s"Call prepareEvents on the original events file first, or fix the feed.")
      }
    // tripwire BEFORE any conf mutation: a failed prepare must not
    // leave the session pinned to the bad unit
    if (unit != "NONE") statRange.foreach { case (mn, _) =>
      val micros = effective match {
        case "NANOS"  => mn / 1000L
        case "MICROS" => mn
        case "MILLIS" => mn * 1000L
        case other => throw new IllegalArgumentException(
          s"events ts: unsupported TIMESTAMP unit $other in $path")
      }
      require(micros >= lo && micros < hi,
        s"events ts fixture-drift tripwire: footer logical unit=$unit, min stat=$mn " +
        s"decodes to ${java.time.Instant.ofEpochSecond(micros / 1000000L)} — outside " +
        s"[2000-01-01, 2100-01-01). The testdata fixture changed shape; fix the " +
        s"unit dispatch in Tables.decodeEventTs ($path)")
    }
    spark.conf.set(TsUnitKey, effective)
    if (effective == "NANOS")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    effective
  }

  /** Convenience: prepare from an sf directory (probes
    * `$sfDir/events.parquet`). */
  def prepareEventsDir(spark: SparkSession, sfDir: String): String =
    prepareEvents(spark, s"$sfDir/events.parquet")

  /** Unit-aware long→timestamp decode; dispatches on the unit pinned by
    * [[prepareEvents]]. Call prepareEvents/prepareEventsDir first. */
  def decodeEventTs(df: DataFrame): DataFrame = {
    // NO default unit: a missing pin means prepareEvents was never
    // called, and guessing MICROS on a NANOS feed would decode 1000×
    // off silently — the same fail-loudly contract as the unknown-value
    // branch below (round-6 review)
    val unit = df.sparkSession.conf.getOption(TsUnitKey).getOrElse(
      throw new IllegalArgumentException(
        "events ts unit was never pinned — call Tables.prepareEvents/" +
          "prepareEventsDir before decodeEventTs"))
    val e = unit match {
      case "NANOS"  => "timestamp_micros(ts div 1000)"
      case "MICROS" => "timestamp_micros(ts)"
      case "MILLIS" => "timestamp_millis(ts)"
      case other => throw new IllegalArgumentException(
        s"unknown events ts unit '$other' — call Tables.prepareEvents first")
    }
    df.withColumn("ts", org.apache.spark.sql.functions.expr(e))
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    prepareEventsDir(spark, sfDir)
    decodeEventTs(spark.read.schema(eventsRaw).parquet(s"$sfDir/events.parquet"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view (SQL entry point, reference
    * sources.yml analog: the declared-source catalog, S8 in SURVEY §2.1). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    schemas.keys.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
