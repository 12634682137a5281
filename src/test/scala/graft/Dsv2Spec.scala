package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.sources.v2.{GraftCsvFilters, GraftCsvIO, GraftCsvQuery, GraftCsvScan}

/** The graftcsv DataSource V2 connector: differential vs the parquet
  * path, pushdown/pruning visible in the plan, byte-range split
  * invariance, null round-trip, reader-side row skipping. */
class Dsv2Spec extends SparkSuite {
  import spark.implicits._

  private def scanOf(df: DataFrame): GraftCsvScan =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan.asInstanceOf[GraftCsvScan]
    }.getOrElse(fail("no DataSourceV2ScanRelation in plan"))

  test("connector read == parquet read (projection + filter differential)") {
    val viaV2 = GraftCsvQuery.read(spark, sf)
      .filter($"event_type" === "purchase" && $"value" > 5.0)
      .select("event_id", "user_id", "value")
    val viaParquet = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"value" > 5.0)
      .select("event_id", "user_id", "value")
    assert(viaV2.collect().toSet == viaParquet.collect().toSet)
  }

  test("filters are pushed and columns pruned down to the scan") {
    val df = GraftCsvQuery.read(spark, sf)
      .filter($"event_type" === "purchase" && $"value" > 5.0)
      .select("event_id", "value")
    val scan = scanOf(df)
    // ReadSchema = projected ∪ filtered, nothing else (no ts, no user_id)
    assert(scan.readSchema().fieldNames.toSet == Set("event_id", "value", "event_type"))
    val pushed = scan.pushedFilters.map(_.toString).mkString(" ")
    assert(pushed.contains("event_type") && pushed.contains("value"))
    // and the explain output surfaces it for plan audits
    assert(scan.description().contains("PushedFilters=[") &&
      scan.description().contains("EqualTo(event_type,purchase)"))
  }

  test("byte-range splits: any splitBytes yields the same rows, >1 partition") {
    val whole = GraftCsvQuery.read(spark, sf, splitBytes = 1L << 30)
      .select("event_id").as[Long].collect().sorted.toSeq
    for (split <- Seq(997L, 4096L, 64L * 1024)) {
      val df = GraftCsvQuery.read(spark, sf, splitBytes = split).select("event_id")
      if (split <= 4096) // dump is ~55 KB at sf0.001; tiny splits must fan out
        assert(df.rdd.getNumPartitions > 1, s"splitBytes=$split should multi-split")
      assert(df.as[Long].collect().sorted.toSeq == whole, s"splitBytes=$split")
    }
  }

  test("split boundary exactly at a record start: no row lost, none duplicated") {
    // fixed-width 10-byte records make EVERY splitBytes=10k boundary land
    // exactly on a record start — the off-by-one class the random-width
    // invariance test can't reach (ownership is (start, end]; stopping at
    // >= end dropped one record per aligned boundary)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_b_").toString
    val f = new java.io.PrintWriter(s"$dir/fixed.csv")
    try (0 until 100).foreach(i => f.print(f"$i%09d\n")) finally f.close()
    val schema = StructType(Seq(StructField("id", IntegerType)))
    for (split <- Seq(10L, 30L, 50L, 1000L)) {
      val got = spark.read.format("graftcsv").schema(schema)
        .option("splitBytes", split.toString).load(dir)
        .as[Int].collect().sorted.toSeq
      assert(got == (0 until 100), s"splitBytes=$split lost/duplicated rows")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("null and type round-trip through the format") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_rt_").toString
    val src = Seq(
      (1L, Some("a"), Some(1.5), Some(java.sql.Date.valueOf("2024-02-29")), Some(true)),
      (2L, None, None, None, None))
      .toDF("id", "s", "d", "day", "flag")
    GraftCsvIO.write(src, s"$dir/t")
    for (vec <- Seq("false", "true")) {
      val back = spark.read.format("graftcsv").schema(src.schema)
        .option("vectorized", vec).load(s"$dir/t")
      assert(back.collect().toSet == src.collect().toSet, s"vectorized=$vec")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("writer rejects strings that would corrupt the unquoted format") {
    intercept[IllegalArgumentException] {
      GraftCsvIO.write(Seq((1L, "has,comma")).toDF("id", "s"), "/tmp/graft_dsv2_bad")
    }
  }

  test("reader-side filtering: impossible predicate emits zero rows from the scan") {
    val df = GraftCsvQuery.read(spark, sf).filter($"value" < -1e9)
    assert(df.count() == 0)
    df.collect()
    val scanExec = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b }.getOrElse(fail("no BatchScanExec"))
    assert(scanExec.metrics("numOutputRows").value == 0,
      "pushed filter should skip every row inside the reader")
  }

  test("schemaless read falls back to string columns c0..cn") {
    val df = spark.read.format("graftcsv").load(GraftCsvQuery.dumpDir(spark, sf))
    assert(df.schema.fields.map(_.dataType).forall(_ == StringType))
    assert(df.columns.toSeq == (0 until 5).map(i => s"c$i"))
    assert(df.count() == Tables.events(spark, sf).count())
  }

  test("write path: overwrite truncates, append accumulates, no tmp residue") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_w_").toString + "/t"
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b = Seq((3L, "c")).toDF("id", "s")
    a.write.format("graftcsv").mode("append").save(dir)
    b.write.format("graftcsv").mode("append").save(dir)
    def readBack = spark.read.format("graftcsv").schema(a.schema).load(dir)
    assert(readBack.count() == 3)
    b.write.format("graftcsv").mode("overwrite").save(dir)
    assert(readBack.collect().toSet == b.collect().toSet)
    val residue = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.startsWith(".graft-tmp"))
    assert(residue.isEmpty, residue.mkString(","))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("write path: V2 writer and Spark-CSV writer produce identical reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_x_").toString
    val src = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    src.write.format("graftcsv").mode("append").save(s"$dir/v2")
    GraftCsvIO.write(src, s"$dir/io")
    def rd(p: String) = spark.read.format("graftcsv").schema(src.schema).load(p)
    assert(rd(s"$dir/v2").collect().toSet == rd(s"$dir/io").collect().toSet)
    // and both round-trip the source exactly (timestamp micros included)
    assert(rd(s"$dir/v2").collect().toSet == src.collect().toSet)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("write path: a failing task aborts without publishing partial files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_f_").toString + "/t"
    val poisoned = spark.range(100).selectExpr("id",
      "CASE WHEN id = 99 THEN ',' ELSE 'ok' END AS s") // comma → writer throws
    intercept[Exception] {
      poisoned.write.format("graftcsv").mode("append").save(dir)
    }
    val visible = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
    assert(visible.isEmpty, s"aborted write must publish nothing: ${visible.mkString(",")}")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("vectorized read: columnar batches, same rows, ColumnarToRow in plan") {
    val schema = GraftCsvQuery.schema
    val dir = GraftCsvQuery.dumpDir(spark, sf)
    def rd(vec: Boolean) = spark.read.format("graftcsv").schema(schema)
      .option("vectorized", vec.toString).option("splitBytes", "4096").load(dir)
    val colPlan = rd(true).queryExecution.executedPlan.toString
    assert(colPlan.contains("ColumnarToRow"), colPlan.take(600))
    assert(!rd(false).queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(rd(true).collect().toSet == rd(false).collect().toSet)
    // pushdown still applies inside the columnar reader
    val filtered = rd(true).filter($"event_type" === "purchase" && $"value" > 5.0)
    assert(filtered.collect().toSet ==
      rd(false).filter($"event_type" === "purchase" && $"value" > 5.0).collect().toSet)
  }

  test("randomized differential: graftcsv reader == Spark CSV reader on fuzzed data") {
    // seeded, so failures reproduce; values cover negatives, extremes,
    // empty-ish strings (single char — '' is rejected by contract),
    // nulls in every column, and leap-day dates
    val rnd = new scala.util.Random(20260813L)
    val rows = (1 to 500).map { i =>
      def opt[T](v: T): Option[T] = if (rnd.nextInt(10) == 0) None else Some(v)
      (i.toLong,
        opt(rnd.nextLong()),
        opt(rnd.nextInt()),
        opt(rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10) *
          (if (rnd.nextBoolean()) 1 else -1)),
        opt(rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString),
        opt(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(rnd.nextInt(40000).toLong - 5000))),
        opt(rnd.nextBoolean()))
    }
    val src = rows.toDF("id", "l", "i", "d", "s", "day", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_fz_").toString
    GraftCsvIO.write(src, s"$dir/t")
    val viaSparkCsv = spark.read.schema(src.schema)
      .option("header", "false").option("quote", "")
      .option("emptyValue", "").option("nullValue", "")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(s"$dir/t").collect().toSet
    for (split <- Seq(257L, 1L << 20)) {
      val viaGraft = spark.read.format("graftcsv").schema(src.schema)
        .option("splitBytes", split.toString).load(s"$dir/t").collect().toSet
      assert(viaGraft == viaSparkCsv && viaGraft == src.collect().toSet,
        s"splitBytes=$split diverged")
    }
    // and the V2 writer leg: fuzzed extremes (scientific-notation
    // doubles, negative epochs, nulls) must round-trip through
    // renderValue/parseValue exactly as through Spark's CSV writer
    src.write.format("graftcsv").mode("append").save(s"$dir/v2")
    val viaV2Writer = spark.read.format("graftcsv").schema(src.schema)
      .option("splitBytes", "257").load(s"$dir/v2").collect().toSet
    assert(viaV2Writer == src.collect().toSet, "V2 writer round-trip diverged")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("pushdown never under-approximates TRUE (one-sided residual guarantee)") {
    // Spark's residual re-check can only drop rows the reader
    // over-delivers — it cannot resurrect a wrongly-rejected one. So the
    // compiled reader predicate must keep every row the SQL tri-state
    // evaluation calls TRUE; on UNKNOWN either way is safe. Randomized
    // filter trees (seeded) over rows with nulls in every column.
    import org.apache.spark.sql.sources._
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.{StructType, StructField, IntegerType, StringType}
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType)))
    val rnd = new scala.util.Random(424242L)
    def leaf(): Filter = rnd.nextInt(9) match {
      case 0 => EqualTo("i", rnd.nextInt(6))
      case 1 => GreaterThan("i", rnd.nextInt(6))
      case 2 => LessThan("i", rnd.nextInt(6))
      case 3 => GreaterThanOrEqual("i", rnd.nextInt(6))
      case 4 => LessThanOrEqual("s", ('a' + rnd.nextInt(4)).toChar.toString)
      case 5 => In("i", Array.tabulate(1 + rnd.nextInt(3))(_ => rnd.nextInt(6): Any))
      case 6 => IsNull(if (rnd.nextBoolean()) "i" else "s")
      case 7 => IsNotNull(if (rnd.nextBoolean()) "i" else "s")
      case 8 => StringStartsWith("s", ('a' + rnd.nextInt(4)).toChar.toString)
    }
    def tree(depth: Int): Filter =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => And(tree(depth - 1), tree(depth - 1))
        case 1 => Or(tree(depth - 1), tree(depth - 1))
        case 2 => Not(tree(depth - 1))
        case _ => leaf()
      }
    // reference: SQL three-valued logic, None = UNKNOWN
    def ref(f: Filter, i: Option[Int], s: Option[String]): Option[Boolean] = {
      def cmpI(v: Any)(p: Int => Boolean) = i.map(x => p(Integer.compare(x, v.asInstanceOf[Int])))
      def cmpS(v: Any)(p: Int => Boolean) = s.map(x => p(x.compareTo(v.asInstanceOf[String])))
      f match {
        case And(l, r) => (ref(l, i, s), ref(r, i, s)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
        case Or(l, r) => (ref(l, i, s), ref(r, i, s)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
        case Not(c) => ref(c, i, s).map(!_)
        case EqualTo("i", v) => cmpI(v)(_ == 0)
        case GreaterThan("i", v) => cmpI(v)(_ > 0)
        case LessThan("i", v) => cmpI(v)(_ < 0)
        case GreaterThanOrEqual("i", v) => cmpI(v)(_ >= 0)
        case LessThanOrEqual("s", v) => cmpS(v)(_ <= 0)
        case In("i", vs) => i.map(x => vs.contains(x))
        case IsNull(c) => Some(if (c == "i") i.isEmpty else s.isEmpty)
        case IsNotNull(c) => Some(if (c == "i") i.nonEmpty else s.nonEmpty)
        case StringStartsWith("s", p) => s.map(_.startsWith(p))
        case other => fail(s"unexpected $other")
      }
    }
    (1 to 3000).foreach { trial =>
      val f = tree(2)
      val i = if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(6))
      val str = if (rnd.nextInt(4) == 0) None
        else Some(('a' + rnd.nextInt(4)).toChar.toString)
      val row: Array[Any] = Array(
        i.map(Int.box).orNull,
        str.map(UTF8String.fromString).orNull)
      val kept = GraftCsvFilters.compile(schema, Array(f))(row)
      if (ref(f, i, str).contains(true))
        assert(kept, s"trial $trial: reader dropped a TRUE row: $f on i=$i s=$str")
    }
  }

  test("runtime filtering: a broadcast dim's keys reach the scan and skip rows") {
    // the connector-side DPP analog: the user filter lives on the DIM,
    // but SupportsRuntimeFiltering hands the joined keys to the scan at
    // runtime. Same traps as file-source DPP: dim must be file-backed,
    // predicate must survive as EqualTo(attr, lit)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dsv2_rf_").toString
    val users = Tables.events(spark, sf).select($"user_id").distinct()
    users.withColumn("tag",
        when($"user_id" % 50 === 0, "keep").otherwise("drop"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"tag" === "keep")
    val scanDf = GraftCsvQuery.read(spark, sf)
    val q = scanDf.join(broadcast(dim), Seq("user_id")).groupBy($"user_id")
      .agg(count(lit(1)).as("n"))
    val rows = q.collect()
    // correctness vs the parquet path
    val expect = Tables.events(spark, sf).join(broadcast(dim), Seq("user_id"))
      .groupBy($"user_id").agg(count(lit(1)).as("n")).collect()
    assert(rows.toSet == expect.toSet && rows.nonEmpty)
    // evidence: the scan's own output is already the filtered subset
    // (AQE/QueryStage-aware walk — collect() does not descend into
    // materialized query stages)
    def findScan(p: org.apache.spark.sql.execution.SparkPlan): Option[BatchScanExec] =
      p match {
        case b: BatchScanExec => Some(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(s.plan)
        case other => other.children.view.flatMap(findScan(_)).headOption
      }
    val scanExec = findScan(q.queryExecution.executedPlan)
      .getOrElse(fail("no BatchScanExec in plan"))
    val scanRows = scanExec.metrics("numOutputRows").value
    val total = Tables.events(spark, sf).count()
    assert(scanRows < total,
      s"runtime filter did not skip rows at the scan: $scanRows of $total\n" +
        scanExec.toString.take(600))
    // and the runtime In-filter actually reached the scan's state
    val eff = scanExec.scan.asInstanceOf[GraftCsvScan].effectiveFilters
    assert(eff.exists(_.isInstanceOf[org.apache.spark.sql.sources.In]), eff.mkString("; "))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dimDir))
  }

  test("statistics: connector reports file bytes so broadcast planning can fire") {
    val scan = scanOf(GraftCsvQuery.read(spark, sf))
    val stats = scan.estimateStatistics()
    val onDisk = GraftCsvIO.listFiles(GraftCsvQuery.dumpDir(spark, sf)).map(_.length).sum
    assert(stats.sizeInBytes().getAsLong == onDisk && onDisk > 0)
  }
}
