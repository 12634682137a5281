package graft.sources.v2

import java.io.{BufferedInputStream, File, FileInputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 connector ("graftcsv") — the engine-level
  * half of the reference's CSV ingestion path (ingest_taxi.py:11 reads
  * CSV via a hosted loader; here the *connector itself* is implemented
  * against Spark's `connector.read` SPI rather than delegating to the
  * built-in reader).
  *
  * Scale design, in order of importance at 100 TB:
  *
  *  1. **Byte-range splits, not files** ([[GraftCsvBatch.planInputPartitions]]):
  *     each file is cut into `splitBytes` ranges (default 128 MB) using
  *     the classic text-split ownership rule — a split owns every record
  *     that *starts* strictly after its first byte (the reader at
  *     offset > 0 discards the partial line it lands in; the previous
  *     split reads past its end boundary to finish that record). One
  *     10 GB file becomes 80 parallel partitions instead of one straggler.
  *  2. **Column pruning** ([[GraftCsvScanBuilder.pruneColumns]]): the
  *     reader materializes only the fields Catalyst asks for — unneeded
  *     fields are skipped at the byte level (no parse, no allocation).
  *  3. **Filter pushdown** ([[GraftCsvScanBuilder.pushFilters]]): simple
  *     comparison predicates are evaluated inside the partition reader so
  *     non-matching rows never surface into the query. Like the built-in
  *     parquet source, every filter is *also* returned as a residual for
  *     Spark to re-evaluate — but note the residual guarantee is
  *     ONE-SIDED: Spark's re-check can only REMOVE extra rows the reader
  *     over-delivers; it cannot restore a row a buggy reader-side
  *     predicate wrongly rejected. [[GraftCsvFilters.compile]] must
  *     therefore never return false where the SQL tri-state evaluation is
  *     TRUE (UNKNOWN may go either way — dropping at a leaf and keeping
  *     under Not are both safe). That invariant is load-bearing and
  *     pinned by the never-under-approximates property test in Dsv2Spec,
  *     alongside the seeded fuzz differential.
  *  4. **Statistics** ([[GraftCsvScan.estimateStatistics]]): total byte
  *     size from the file listing, so the planner can pick a broadcast
  *     join when the graftcsv side is small.
  *  5. **Runtime filtering** ([[GraftCsvScan.filter]]): the DPP analog
  *     for connectors — Spark derives an In-filter from a completed
  *     broadcast join side and the readers skip non-matching rows. The
  *     filters ride inside each [[GraftCsvPartition]] (partitions are
  *     re-planned after `filter()`, the reader factory may predate it —
  *     the partition is the only order-independent channel).
  *
  * Format contract (kept deliberately writer-controlled): comma-separated,
  * no quoting (writers must strip commas/newlines from string fields —
  * [[GraftCsvIO.write]] enforces this), empty field = NULL, timestamps as
  * `yyyy-MM-dd HH:mm:ss.SSSSSS` UTC, dates as `yyyy-MM-dd`. Schema is
  * supplied by the caller (`spark.read.schema(...)`); headerless files.
  */
class GraftCsv extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftcsv"
  override def supportsExternalMetadata(): Boolean = true

  /** Schemaless reads get one string column per field of the first line —
    * enough for exploration; production reads declare the schema. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = GraftCsvIO.listFiles(options.get("path"))
    require(files.nonEmpty, s"graftcsv: no files under ${options.get("path")}")
    val src = scala.io.Source.fromFile(files.head, "UTF-8")
    val n = try src.getLines().next().count(_ == ',') + 1 finally src.close()
    StructType((0 until n).map(i => StructField(s"c$i", StringType)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftCsvTable(schema, properties.get("path"),
      Option(properties.get("splitBytes")).map(_.toLong).getOrElse(128L * 1024 * 1024))
}

class GraftCsvTable(schema: StructType, path: String, splitBytes: Long)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graftcsv:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCsvScanBuilder(schema, path, splitBytes,
      options.getBoolean("vectorized", false))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftCsvWriteBuilder(info.schema(), path)
}

/** Write path: the full V2 commit protocol. Tasks stream rows to hidden
  * `.graft-tmp-*` files (invisible to [[GraftCsvIO.listFiles]], so a
  * concurrent reader never sees an uncommitted write); each task's
  * commit message names its temp file; the DRIVER publishes them all by
  * rename in [[GraftCsvBatchWrite.commit]] after every task succeeded.
  * Spark's commit coordinator guarantees at most one committed attempt
  * per partition, so speculative retries cannot double-publish. On a
  * distributed filesystem the same protocol holds with FileSystem
  * renames; the local-FS form here is the single-node instance of it. */
class GraftCsvWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftCsvBatchWrite(schema, path, doTruncate)
  }
}

case class GraftCsvCommit(tmpPath: String, finalName: String) extends WriterCommitMessage

class GraftCsvBatchWrite(schema: StructType, path: String, truncate: Boolean)
    extends BatchWrite {
  // per-JOB unique component for published names: Spark task ids restart
  // from 0 in every application, so (partitionId, taskId) alone collides
  // across append jobs and rename would silently replace committed files
  private val writeId = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCsvWriterFactory(schema, path, writeId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    // truncate = publish-new-THEN-delete-old (round-6 review): the old
    // visible set is snapshotted first, the new files rename in (their
    // writeId-unique names cannot collide with it), and only then is
    // the snapshot deleted. A crash mid-commit leaves old∪new visible —
    // duplicated rows, recoverable — where delete-first left a window
    // of TOTAL data loss (old gone, new still dot-hidden). The doc'd
    // isolation contract is per-FILE (no reader ever sees a partial or
    // uncommitted file); the truncate swap itself is publish-then-
    // retire, not atomic — the honest plain-FS bound, same as Spark's
    // own non-transactional overwrite.
    val oldVisible = if (truncate) GraftCsvIO.listFiles(path) else Seq.empty
    if (truncate) {
      // replace semantics = exclusive ownership of the DATA: reclaim
      // orphan temp files of previous CRASHED writers, but only past an
      // age threshold — a fresh temp may belong to a live concurrent
      // append (which the per-job sweep below deliberately spares; its
      // rows are truncated away semantically, but its commit must not
      // crash on a vanished temp file)
      val staleBefore = System.currentTimeMillis() - 10L * 60 * 1000
      dir.listFiles((_, n) => n.startsWith(".graft-tmp-") &&
        !n.startsWith(s".graft-tmp-$writeId-")) match {
        case null => ()
        case tmps => tmps.filter(_.lastModified < staleBefore).foreach(_.delete())
      }
    }
    messages.foreach { case GraftCsvCommit(tmp, finalName) =>
      val src = new File(tmp)
      if (src.length == 0) src.delete() // empty partition: no file
      else require(src.renameTo(new File(dir, finalName)),
        s"graftcsv: publish rename failed for $tmp")
    }
    oldVisible.foreach(_.delete())
    sweepTmp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftCsvCommit(tmp, _) => new File(tmp).delete()
      case _ => ()
    }
    sweepTmp()
  }

  /** Crashed/speculative attempts never reach commit/abort messages;
    * their orphans are swept here. Scoped to THIS job's writeId so a
    * concurrent append job's live temp files survive the sweep (an
    * unscoped sweep would delete them and fail the other job's commit
    * rename). Orphans of a writer that crashed before commit are
    * invisible to readers (dot-prefixed) and reclaimed by that path's
    * next truncate-mode write. */
  private def sweepTmp(): Unit = {
    val d = new File(path)
    if (d.isDirectory)
      d.listFiles((_, n) => n.startsWith(s".graft-tmp-$writeId-")).foreach(_.delete())
  }
}

class GraftCsvWriterFactory(schema: StructType, path: String, writeId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCsvDataWriter(schema, path, partitionId, taskId, writeId)
}

class GraftCsvDataWriter(schema: StructType, path: String, partitionId: Int,
    taskId: Long, writeId: String)
    extends DataWriter[InternalRow] {
  new File(path).mkdirs()
  private val tmp = new File(path, s".graft-tmp-$writeId-$partitionId-$taskId")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmp), StandardCharsets.UTF_8), 1 << 16)
  private val types = schema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < types.length) {
      if (i > 0) sb.append(',')
      if (!row.isNullAt(i)) sb.append(GraftCsvFilters.renderValue(types(i), row, i))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftCsvCommit(tmp.getAbsolutePath, f"part-$partitionId%05d-$writeId-$taskId.csv")
  }
  override def abort(): Unit = { out.close(); tmp.delete(); () }
  override def close(): Unit = ()
}

class GraftCsvScanBuilder(dataSchema: StructType, path: String, splitBytes: Long,
    vectorized: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept what the reader can evaluate; return EVERYTHING as residual
    * (Spark re-checks — see class doc: pushdown is efficiency-only). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftCsvFilters.evaluable(dataSchema, _))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new GraftCsvScan(dataSchema, required, pushed, path, splitBytes, vectorized)
}

class GraftCsvScan(dataSchema: StructType, required: StructType,
    val pushedFilters: Array[Filter], path: String, splitBytes: Long,
    vectorized: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime filters (the connector-side DPP analog): Spark derives
    * them from a completed broadcast join side AFTER planning — e.g.
    * an In(user_id, <the 12 ids the dim kept>) — and hands them here.
    * They join the pushed set so every partition reader skips
    * non-matching rows before they surface. Same efficiency-only
    * contract as static pushdown: Spark re-checks semantics via the
    * join itself, so the filter can only shrink IO, never change
    * results. */
  private var runtimeFilters: Array[Filter] = Array.empty

  // only columns in the scan OUTPUT: Spark resolves these against the
  // pruned schema, and a runtime filter can only be derived from a join
  // key, which is necessarily in the output anyway
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fieldNames
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters.filter(GraftCsvFilters.evaluable(dataSchema, _))

  /** Static + runtime filters, as the readers see them. */
  def effectiveFilters: Array[Filter] = pushedFilters ++ runtimeFilters

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCsvScan path=$path, ReadSchema=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters=[${pushedFilters.mkString(", ")}]"

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = GraftCsvIO.listFiles(path).map(_.length).sum
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** Partitions carry the filter set (static + runtime): Spark re-plans
    * partitions AFTER SupportsRuntimeFiltering.filter(), but the reader
    * FACTORY may have been created before it — filters embedded in the
    * partition are the only order-independent channel to the readers. */
  override def planInputPartitions(): Array[InputPartition] = {
    val parts = ArrayBuffer.empty[InputPartition]
    for (f <- GraftCsvIO.listFiles(path)) {
      val len = f.length
      var off = 0L
      while (off < len) {
        val end = math.min(off + splitBytes, len)
        parts += GraftCsvPartition(f.getAbsolutePath, off, end, effectiveFilters)
        off = end
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCsvReaderFactory(dataSchema, required, vectorized)
}

case class GraftCsvPartition(file: String, start: Long, end: Long,
    filters: Array[Filter]) extends InputPartition

class GraftCsvReaderFactory(dataSchema: StructType, required: StructType,
    vectorized: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftCsvPartitionReader(dataSchema, required,
      partition.asInstanceOf[GraftCsvPartition])
  override def supportColumnarReads(partition: InputPartition): Boolean = vectorized
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new GraftCsvColumnarReader(dataSchema, required,
      partition.asInstanceOf[GraftCsvPartition])
}

/** Streams one byte-range of one file and yields surviving records as
  * Catalyst values in REQUIRED-schema order. Ownership rule (Hadoop
  * text-split contract): if start > 0, discard up to and including the
  * first '\n' (that record belongs to the previous split); keep reading
  * records whose first byte is < end, finishing the last one past the
  * boundary. Shared by the row and columnar readers. */
private[v2] class GraftCsvLineCursor(dataSchema: StructType, required: StructType,
    part: GraftCsvPartition) {
  private val filters: Array[Filter] = part.filters

  private val in = new BufferedInputStream(new FileInputStream(part.file), 1 << 16)
  private var pos = 0L            // bytes consumed from the stream
  private var recordStart = 0L    // offset of the next record's first byte
  skipTo(part.start)
  if (part.start > 0) { readLine() ; recordStart = pos }

  // field index in the file -> slot in the output row (-1 = skip parse)
  private val fieldSlot: Array[Int] =
    dataSchema.fieldNames.map(n => required.fieldNames.indexOf(n))
  // every column any pushed filter touches must be parsed even if pruned
  private val filterCols = filters.flatMap(GraftCsvFilters.references).distinct
  private val parseMask: Array[Boolean] = dataSchema.fieldNames.map(n =>
    required.fieldNames.contains(n) || filterCols.contains(n))
  private val eval = GraftCsvFilters.compile(dataSchema, filters)

  /** Next surviving record, projected to required order; null at end.
    * Ownership is (start, end]: a record starting EXACTLY at `end`
    * belongs to THIS split (the next split's reader unconditionally
    * discards its first line, so stopping at `>=` would drop every
    * record whose start lands on a boundary — silent data loss). */
  def nextProjected(): Array[Any] = {
    while (true) {
      if (recordStart > part.end) return null
      val line = readLine()
      recordStart = pos
      if (line == null) return null
      val parsed = parseLine(line)
      if (eval(parsed)) {
        val out = new Array[Any](required.length)
        var i = 0
        while (i < dataSchema.length) {
          val slot = fieldSlot(i)
          if (slot >= 0) out(slot) = parsed(i)
          i += 1
        }
        return out
      }
    }
    null
  }

  def close(): Unit = in.close()

  private def skipTo(target: Long): Unit = {
    var remaining = target
    while (remaining > 0) {
      val n = in.skip(remaining)
      require(n > 0, s"graftcsv: cannot seek to $target in ${part.file}")
      remaining -= n
    }
    pos = target
    recordStart = target
  }

  /** One '\n'-terminated line as bytes→String, or null at EOF. */
  private def readLine(): String = {
    val buf = new java.io.ByteArrayOutputStream(256)
    var b = in.read()
    while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    if (b == -1 && buf.size == 0) null
    else buf.toString(StandardCharsets.UTF_8.name())
  }

  /** Parse the masked fields of one line into Catalyst values (null for
    * empty fields and skipped fields). No quoting by format contract. */
  private def parseLine(line: String): Array[Any] = {
    val out = new Array[Any](dataSchema.length)
    var field = 0
    var from = 0
    val n = line.length
    while (field < dataSchema.length && from <= n) {
      var to = line.indexOf(',', from)
      if (to < 0) to = n
      if (parseMask(field) && to > from)
        out(field) = GraftCsvFilters.parseValue(dataSchema(field).dataType,
          line.substring(from, to))
      from = to + 1
      field += 1
    }
    out
  }
}

/** Row-at-a-time read path. */
class GraftCsvPartitionReader(dataSchema: StructType, required: StructType,
    part: GraftCsvPartition)
    extends PartitionReader[InternalRow] {
  private val cursor = new GraftCsvLineCursor(dataSchema, required, part)
  private var current: InternalRow = _
  override def next(): Boolean = {
    val vals = cursor.nextProjected()
    if (vals == null) false
    else {
      current = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        vals.asInstanceOf[Array[Any]])
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = cursor.close()
}

/** Columnar read path (`vectorized=true` read option): the same cursor
  * feeding [[org.apache.spark.sql.vectorized.ColumnarBatch]]es of
  * on-heap vectors, so downstream operators consume whole batches and
  * Spark inserts its codegen'd ColumnarToRow only where needed — the
  * handoff the built-in parquet reader uses. Batch size 4096 rows
  * (Spark's own `spark.sql.parquet.columnarReaderBatchSize` default). */
class GraftCsvColumnarReader(dataSchema: StructType, required: StructType,
    part: GraftCsvPartition)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val capacity = 4096
  private val cursor = new GraftCsvLineCursor(dataSchema, required, part)
  private val vectors = OnHeapColumnVector.allocateColumns(capacity, required)
  private val batch = new ColumnarBatch(vectors.map(v =>
    v: org.apache.spark.sql.vectorized.ColumnVector))
  private var exhausted = false

  override def next(): Boolean = {
    if (exhausted) return false
    vectors.foreach(_.reset())
    var n = 0
    while (n < capacity && !exhausted) {
      val vals = cursor.nextProjected()
      if (vals == null) exhausted = true
      else {
        var i = 0
        while (i < vals.length) {
          appendValue(vectors(i), required(i).dataType, vals(i))
          i += 1
        }
        n += 1
      }
    }
    batch.setNumRows(n)
    n > 0
  }

  private def appendValue(v: OnHeapColumnVector, dt: DataType, value: Any): Unit =
    if (value == null) { v.appendNull(); () } else dt match {
      case StringType =>
        val b = value.asInstanceOf[UTF8String].getBytes
        v.appendByteArray(b, 0, b.length); ()
      case IntegerType | DateType => v.appendInt(value.asInstanceOf[Int]); ()
      case LongType | TimestampType => v.appendLong(value.asInstanceOf[Long]); ()
      case DoubleType => v.appendDouble(value.asInstanceOf[Double]); ()
      case FloatType => v.appendFloat(value.asInstanceOf[Float]); ()
      case BooleanType => v.appendBoolean(value.asInstanceOf[Boolean]); ()
      case other => throw new IllegalStateException(s"graftcsv: no vector for $other")
    }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = { cursor.close(); batch.close() }
}

/** Filter compilation + value parsing shared by reader and planner.
  * Evaluation happens on *Catalyst* values (UTF8String, micros, days) so
  * reader-side semantics match what Spark's re-check computes. */
object GraftCsvFilters {

  private val tsFormat = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  def parseValue(dt: DataType, s: String): Any = dt match {
    case StringType => UTF8String.fromString(s)
    case IntegerType => s.toInt
    case LongType => s.toLong
    case DoubleType => s.toDouble
    case FloatType => s.toFloat
    case BooleanType => s.toBoolean
    case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
    case TimestampType =>
      val ldt = java.time.LocalDateTime.parse(s, tsFormat)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case other => throw new IllegalArgumentException(s"graftcsv: unsupported type $other")
  }

  def references(f: Filter): Array[String] = f.references

  /** Inverse of [[parseValue]] for the write path — same fixed formats
    * so a graftcsv round-trip is exact. Strings are validated, not
    * mangled (the format is unquoted by contract). */
  def renderValue(dt: DataType, row: InternalRow, i: Int): String = dt match {
    case StringType =>
      val s = row.getUTF8String(i).toString
      // '' would read back as NULL (empty field = NULL by contract), so
      // it is rejected like the delimiter characters, not silently mangled
      require(s.nonEmpty && s.indexOf(',') < 0 && s.indexOf('\n') < 0 &&
        s.indexOf('"') < 0,
        "graftcsv: string values must not contain , \" newline or be empty")
      s
    case IntegerType => String.valueOf(row.getInt(i))
    case LongType => String.valueOf(row.getLong(i))
    case DoubleType => String.valueOf(row.getDouble(i))
    case FloatType => String.valueOf(row.getFloat(i))
    case BooleanType => String.valueOf(row.getBoolean(i))
    case DateType => java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
    case TimestampType =>
      val us = row.getLong(i)
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC).format(tsFormat)
    case other => throw new IllegalArgumentException(s"graftcsv: unsupported type $other")
  }

  /** Can the reader evaluate this filter? (leaf comparisons + AND/OR/NOT
    * over them, on columns of parseable types) */
  def evaluable(schema: StructType, f: Filter): Boolean = f match {
    case And(l, r) => evaluable(schema, l) && evaluable(schema, r)
    case Or(l, r) => evaluable(schema, l) && evaluable(schema, r)
    case Not(c) => evaluable(schema, c)
    case EqualTo(a, _) => comparable(schema, a)
    case GreaterThan(a, _) => comparable(schema, a)
    case GreaterThanOrEqual(a, _) => comparable(schema, a)
    case LessThan(a, _) => comparable(schema, a)
    case LessThanOrEqual(a, _) => comparable(schema, a)
    case In(a, _) => comparable(schema, a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case StringStartsWith(a, _) => typeOf(schema, a).contains(StringType)
    case _ => false
  }

  private def typeOf(schema: StructType, col: String): Option[DataType] =
    schema.fields.find(_.name == col).map(_.dataType)

  private def comparable(schema: StructType, col: String): Boolean =
    typeOf(schema, col).exists {
      case StringType | IntegerType | LongType | DoubleType | FloatType |
           BooleanType | DateType | TimestampType => true
      case _ => false
    }

  /** Compile filters to a predicate over the parsed (Catalyst-value) row.
    * Unknown/unevaluable filters were never pushed, so `compile` only
    * sees what [[evaluable]] accepted. */
  def compile(schema: StructType, filters: Array[Filter]): Array[Any] => Boolean = {
    val idx = schema.fieldNames.zipWithIndex.toMap
    def cmp(col: String, v: Any): Array[Any] => Option[Int] = {
      val i = idx(col)
      val lit = toCatalyst(schema(i).dataType, v)
      row => Option(row(i)).map(x => compareValues(x, lit))
    }
    def one(f: Filter): Array[Any] => Boolean = f match {
      case And(l, r) => val (a, b) = (one(l), one(r)); row => a(row) && b(row)
      case Or(l, r) => val (a, b) = (one(l), one(r)); row => a(row) || b(row)
      case Not(c) => val a = one(c); row => !a(row)
      case EqualTo(col, v) => val c = cmp(col, v); row => c(row).contains(0)
      case GreaterThan(col, v) => val c = cmp(col, v); row => c(row).exists(_ > 0)
      case GreaterThanOrEqual(col, v) => val c = cmp(col, v); row => c(row).exists(_ >= 0)
      case LessThan(col, v) => val c = cmp(col, v); row => c(row).exists(_ < 0)
      case LessThanOrEqual(col, v) => val c = cmp(col, v); row => c(row).exists(_ <= 0)
      case In(col, vs) =>
        val i = idx(col)
        val set = vs.map(v => toCatalyst(schema(i).dataType, v)).toSet
        row => row(i) != null && set.contains(row(i))
      case IsNull(col) => val i = idx(col); row => row(i) == null
      case IsNotNull(col) => val i = idx(col); row => row(i) != null
      case StringStartsWith(col, prefix) =>
        val i = idx(col)
        val p = UTF8String.fromString(prefix)
        row => row(i) != null && row(i).asInstanceOf[UTF8String].startsWith(p)
      case other => throw new IllegalStateException(s"graftcsv: unpushable $other")
    }
    val compiled = filters.map(one)
    row => compiled.forall(_(row))
  }

  /** Filter literals arrive as external Scala types; convert once. */
  private def toCatalyst(dt: DataType, v: Any): Any = (dt, v) match {
    case (StringType, s: String) => UTF8String.fromString(s)
    case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
    case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
    case (TimestampType, t: java.sql.Timestamp) =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case (TimestampType, t: java.time.Instant) =>
      t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (_, x) => x
  }

  @annotation.nowarn("cat=other-match-analysis")
  private def compareValues(a: Any, b: Any): Int = (a, b) match {
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x, y) => throw new IllegalStateException(s"graftcsv: incomparable $x vs $y")
  }
}

/** Writer + listing helpers for the graftcsv format. */
object GraftCsvIO {

  def listFiles(path: String): Seq[File] = {
    val f = new File(path)
    val files =
      if (f.isDirectory)
        f.listFiles((_, name) => !name.startsWith("_") && !name.startsWith(".")).toSeq
      else if (f.isFile) Seq(f)
      else Seq.empty
    files.filter(_.length > 0).sortBy(_.getName)
  }

  /** Write a DataFrame as graftcsv (headerless, unquoted, fixed formats).
    * String columns must not contain ',' '\n' '"' — checked, not mangled:
    * a format that silently rewrites payloads would corrupt round-trips. */
  def write(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    // ONE validation pass over all string columns (per-column scans would
    // multiply read I/O by the column count). Empty strings are rejected
    // too: the format reads an empty field as NULL, so '' cannot survive
    // a round-trip — better to refuse than to silently rewrite it.
    val stringCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (stringCols.nonEmpty) {
      val anyBad = stringCols.map(c => col(c).rlike("[,\n\"]") || col(c) === "")
        .reduce(_ || _)
      require(df.filter(anyBad).limit(1).count() == 0,
        s"graftcsv: string columns must not contain , \" newline or be empty")
    }
    df.write.mode("overwrite")
      .option("header", "false")
      .option("quote", "")
      .option("emptyValue", "")
      .option("nullValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
  }
}
