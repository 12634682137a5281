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

  private val staged = scala.collection.mutable.HashMap[String, String]()

  /** Build seconds per stage key, in build order — Bench surfaces these
    * as `bench_stage_*` JSON entries so a blown-up stage build is
    * attributable per stage from the artifact alone (r4's 181 s
    * dedup-stage anomaly was only visible as an opaque lump sum). */
  private val buildSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
  def buildTimes: Map[String, Double] = staged.synchronized { buildSecs.toMap }
  private lazy val stageRoot = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stage_")
    // artifacts are per-process by design — remove them when the JVM
    // exits so repeated Verify/Bench/test runs don't accumulate in /tmp
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile): Unit))
    dir.toString
  }

  /** Compute-once-then-read-parquet. Synchronized: concurrent test
    * suites must not race to build the same artifact. */
  def materialize(key: String, spark: SparkSession)
      (build: => DataFrame): DataFrame = {
    val path = staged.synchronized {
      staged.getOrElseUpdate(key, {
        val p = s"$stageRoot/$key"
        val t0 = System.nanoTime()
        build.write.mode("overwrite").parquet(p)
        val secs = (System.nanoTime() - t0) / 1e9
        buildSecs(key) = secs
        // stdout breadcrumb for perf triage (Bench/Verify parse tagged
        // lines only, so this is inert to both contracts)
        println(f"[stage] built $key in $secs%.2f s")
        p
      })
    }
    spark.read.parquet(path)
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
    staged.synchronized {
      staged.getOrElseUpdate(s"dir_$key", {
        val p = s"$stageRoot/dir_$key"
        // a build that threw midway (cancelled job, disk full) leaves a
        // partial tree at the fixed path and is never recorded in
        // `staged` — clear it first so the RETRY re-runs against a
        // clean slate instead of dying on 'path already exists'
        // (directory builders write with the default ErrorIfExists;
        // the frame twin above is overwrite-mode and needs no sweep)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
        val t0 = System.nanoTime()
        build(p)
        val secs = (System.nanoTime() - t0) / 1e9
        buildSecs(s"dir_$key") = secs
        println(f"[stage] built dir $key in $secs%.2f s")
        p
      })
    }
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
  private[graft] def reset(): Unit = staged.synchronized { staged.clear() }
}
