package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Compute-once-per-JVM materialized artifacts: the generic machinery
  * behind [[DedupStage]] and [[graft.operators.GoldStage]].
  *
  * A dbt-style pipeline materializes each model as a TABLE and every
  * downstream consumer (queries, tests) reads the artifact — it never
  * re-derives the model per consumer. This helper is that semantic for
  * an in-process engine: first request for a key computes + writes
  * parquet under a per-process temp dir, later requests read it. The
  * temp dir is per-JVM, so a fresh process always rebuilds from current
  * inputs (no cross-run staleness), and keys embed a hash of the
  * canonical data directory so distinct corpora can never collide.
  */
object Staged {

  /** key → build cell. Per-KEY locking (r12 optimization round): the
    * cell's lazy `path` synchronizes builders of the SAME key, while
    * builders of DIFFERENT keys proceed concurrently — the guide-§2.6
    * overlap that lets independent stage builds (the two quality-model
    * fits, the band index next to the cluster chain) back-fill an
    * otherwise idle box. The old single `staged.synchronized` held the
    * global lock for the whole build, serializing every artifact. */
  private final class Cell(build: () => String) {
    lazy val path: String = build() // lazy-val init = per-cell monitor
  }
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, Cell]()

  /** Ephemeral scratch allocation for gate work dirs (streaming
    * checkpoints, merge-target table copies, WAP staging, snapshot
    * trees): a RAM-backed filesystem when one exists (`/dev/shm`),
    * else `java.io.tmpdir`.
    *
    * WHY (VERDICT r6 #6): these dirs model executor-local scratch and
    * DFS checkpoint space — state a cluster places on its fastest
    * available tier and amortizes across long-lived queries. On this
    * box `/tmp` shares the one virtio disk with everything else
    * (including the EXTERNAL load the sentinel battery keeps
    * catching), so per-gate checkpoint/commit-log churn — dozens of
    * small fsync'd files per micro-batch — was measuring device
    * contention, not engine work. tmpfs removes that noise source;
    * the disk sentinels still probe the real device, so the
    * contention verdict stays meaningful for the data-path entries.
    * Callers keep their own delete-in-finally lifecycle; RAM is
    * reclaimed the same way disk was. */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val root =
      if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm)) {
        val r = shm.resolve("graft_scratch")
        java.nio.file.Files.createDirectories(r)
        r
      } else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(root, prefix)
  }

  /** Build seconds per stage key, in build order — Bench surfaces these
    * as `bench_stage_*` JSON entries so a blown-up stage build is
    * attributable per stage from the artifact alone (r4's 181 s
    * dedup-stage anomaly was only visible as an opaque lump sum). */
  private val buildSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
  def buildTimes: Map[String, Double] = buildSecs.synchronized { buildSecs.toMap }
  private lazy val stageRoot = {
    // same scratch tier as the gate work dirs (sf0.1 artifacts total
    // tens of MB — RAM-residency is free at gate scale)
    val dir = scratchDir("graft_stage_")
    // artifacts are per-process by design — remove them when the JVM
    // exits so repeated Verify/Bench/test runs don't accumulate in /tmp
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile): Unit))
    dir.toString
  }

  /** Compute-once-then-read-parquet. Per-key synchronized: concurrent
    * test suites must not race to build the SAME artifact, but
    * different artifacts may build at once. A build that THROWS leaves
    * its cell's lazy un-initialized, so a later request retries the
    * build (the old remove-on-failure semantic, preserved by lazy-val
    * initialization rules). */
  def materialize(key: String, spark: SparkSession)
      (build: => DataFrame): DataFrame = {
    val cell = staged.computeIfAbsent(key, _ => new Cell(() => {
      val p = s"$stageRoot/$key"
      val t0 = System.nanoTime()
      build.write.mode("overwrite").parquet(p)
      val secs = (System.nanoTime() - t0) / 1e9
      buildSecs.synchronized { buildSecs(key) = secs }
      // stdout breadcrumb for perf triage (Bench/Verify parse tagged
      // lines only, so this is inert to both contracts)
      println(f"[stage] built $key in $secs%.2f s")
      p
    }))
    spark.read.parquet(cell.path)
  }

  /** Compute-once-per-JVM DIRECTORY artifact — the [[materialize]]
    * discipline for things that are a tree of files rather than one
    * frame (streaming feed dirs with staggered mtimes, seeded table
    * dirs). `build` populates the returned path on first request; later
    * requests reuse it. Consumers must treat the artifact as READ-ONLY —
    * a consumer that mutates its copy takes [[copyInto]] first. Same
    * per-process temp root as the frame artifacts, so there is no
    * cross-run staleness and the shutdown hook reclaims everything. */
  def materializeDir(key: String)(build: String => Unit): String = {
    staged.computeIfAbsent(s"dir_$key", _ => new Cell(() => {
      val p = s"$stageRoot/dir_$key"
      // a build that threw midway (cancelled job, disk full) leaves a
      // partial tree at the fixed path with its cell's lazy
      // un-initialized — clear it first so the RETRY re-runs against a
      // clean slate instead of dying on 'path already exists'
      // (directory builders write with the default ErrorIfExists;
      // the frame twin above is overwrite-mode and needs no sweep)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      val t0 = System.nanoTime()
      build(p)
      val secs = (System.nanoTime() - t0) / 1e9
      buildSecs.synchronized { buildSecs(s"dir_$key") = secs }
      println(f"[stage] built dir $key in $secs%.2f s")
      p
    })).path
  }

  /** Copy a staged directory artifact into a consumer-owned path (for
    * consumers that mutate state in place — CDC tables, maintained
    * views): an OS file copy of an already-materialized tree, instead
    * of recomputing and rewriting it per invocation. */
  def copyInto(stagedPath: String, dest: String): Unit =
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(stagedPath), new java.io.File(dest))

  /** Corpus key piece: basename for readability PLUS a hash of the full
    * canonical path — two data dirs that merely share a basename
    * (…/a/sf0.01 vs …/b/sf0.01) must never collide. */
  def sfKey(sfDir: String): String = {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    f"${new java.io.File(sfDir).getName}_${canonical.hashCode & 0xffffffffL}%08x"
  }

  /** Test hook: drop all staged artifacts so a suite can measure or
    * re-exercise the build path deterministically. */
  private[graft] def reset(): Unit = staged.clear()
}
