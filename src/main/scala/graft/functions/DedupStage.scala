package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized shared intermediates for the dedup chain.
  *
  * The dedup surface exposes three user-facing queries that are strict
  * supersets of one another:
  *
  *   near-dup PAIRS  ⊂  transitive dup CLUSTERS  ⊂  DEDUPED CORPUS
  *
  * Built independently, each pays the full shingle → signature → band →
  * bucket-join → exact-verify chain again (measured: 17.7 s + 5.0 s +
  * 5.8 s at sf0.1 — 3× the real work). A production pipeline never does
  * that: it materializes the expensive stage once and the downstream
  * models read the artifact (exactly how the reference's dbt DAG feeds
  * `silver_trips` into every gold model rather than re-reading raw:
  * every sql model under reference models/gold/ selects FROM silver,
  * not FROM bronze). This object is that DAG edge for the dedup chain.
  *
  * Mechanics: first request for a stage computes it and writes parquet
  * under a per-JVM temp dir; subsequent requests (any query, same
  * session or another session in the JVM) read the artifact. Keyed by
  * (stage, sfDir, threshold) so different corpora / thresholds never
  * collide. The temp dir is per-process, so no cross-run staleness:
  * a fresh JVM always rebuilds from the current input data.
  *
  * At 100 TB the same design holds — the staged pairs table is tiny
  * relative to the corpus (only near-dup pairs survive), and the
  * write is one extra narrow pass; recomputing the LSH chain per
  * downstream consumer would be the scale bug.
  */
object DedupStage {

  private def materialize(key: String, spark: SparkSession)
      (build: => DataFrame): DataFrame =
    Staged.materialize(s"dedup_$key", spark)(build)

  private def sfKey(sfDir: String) = Staged.sfKey(sfDir)

  /** Stage 1: (doc_id, sh) with ascending-sorted distinct 3-gram
    * shingle arrays — the input to every candidate generator. Written
    * with the builder's parallel partitioning, so downstream CPU-heavy
    * verify joins read it across all cores. */
  def shingleDocs(spark: SparkSession, sfDir: String): DataFrame =
    materialize(s"shingles_${sfKey(sfDir)}", spark) {
      Dedup.buildSortedShingleDocs(spark, sfDir)
    }

  /** Corpus LSH band keys (doc_id, band_idx, band_hash) — the
    * persisted index half that per-batch incremental dedup joins
    * against, so a new batch never re-hashes the corpus. */
  def bandKeys(spark: SparkSession, sfDir: String): DataFrame =
    materialize(s"bands_${sfKey(sfDir)}", spark) {
      Dedup.bandKeys(shingleDocs(spark, sfDir), "doc_id")
    }

  /** Stage 2: exact-verified near-dup pairs (doc_a, doc_b, jaccard) at
    * `minJac`, from the MinHash-LSH candidate generator. */
  def pairs(spark: SparkSession, sfDir: String, minJac: Double = 0.9): DataFrame =
    materialize(s"pairs_${minJac}_${sfKey(sfDir)}", spark) {
      Dedup.minhashDupPairsOn(shingleDocs(spark, sfDir), minJac)
    }

  /** Stage 3: transitive duplicate clusters (doc_id, cluster_keeper)
    * over the staged pairs. */
  def clusters(spark: SparkSession, sfDir: String, minJac: Double = 0.9): DataFrame =
    materialize(s"clusters_${minJac}_${sfKey(sfDir)}", spark) {
      Dedup.dupClustersFromPairs(pairs(spark, sfDir, minJac))
    }

  /** Force-build every stage (used by Bench to time the shared build
    * once, explicitly, instead of burying it in whichever dedup query
    * happens to run first). */
  def prebuild(spark: SparkSession, sfDir: String, minJac: Double = 0.9): Unit = {
    clusters(spark, sfDir, minJac).count()
    // the incremental-dedup band index is a stage too: build it here so
    // its corpus-wide signature pass lands in bench_dedup_stage_build,
    // not buried (and half-discarded by min-of-N) in the first
    // q_incremental_dedup run
    bandKeys(spark, sfDir).count()
    ()
  }

}
