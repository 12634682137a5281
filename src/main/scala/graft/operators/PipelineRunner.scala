package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The `dbt run` analog — the reference's main entry point (SURVEY §3
  * E1): a model DAG materialized in dependency order as tables.
  *
  * Reference shape: dbt reads the manifest, topologically orders
  * `stg_trips_unified → {dim_date, dim_zone, dim_payment_type,
  * dim_rate_code} → fct_trips` and ships each as CREATE TABLE AS SELECT
  * to the warehouse (dbt_project.yml, profiles.yml `threads: 4/8`).
  *
  * Spark shape: each model is a `DataFrame`-producing function; deps are
  * an explicit edge list; materialization is an overwrite parquet write
  * + re-read (the "table"). Independent models launch concurrently on
  * the scheduler pool (the dbt `threads` analog — Spark's scheduler
  * interleaves their jobs; per-job parallelism is Spark tasks).
  *
  * Downstream models read the MATERIALIZED table, not the upstream
  * logical plan — same recompute-isolation dbt tables give (and at
  * scale the reason to materialize silver once instead of re-deriving
  * it inside every gold model).
  */
object PipelineRunner {

  case class Model(name: String, deps: Seq[String],
      build: (SparkSession, String, Map[String, DataFrame]) => DataFrame)

  /** The reference's six models. `tables` holds upstream
    * materializations, keyed by model name. */
  def models: Seq[Model] = Seq(
    Model("stg_trips_unified", Nil, (s, sf, _) => Silver.build(s, sf)),
    Model("dim_date", Nil, (s, _, _) => GoldDims.dimDate(s)),
    Model("dim_zone", Nil, (s, sf, _) => GoldDims.dimZone(s, sf)),
    Model("dim_payment_type", Nil, (s, _, _) => GoldDims.dimPaymentType(s)),
    Model("dim_rate_code", Nil, (s, _, _) => GoldDims.dimRateCode(s)),
    // fct depends on every upstream; built from the MATERIALIZED silver
    Model("fct_trips",
      Seq("stg_trips_unified", "dim_date", "dim_zone", "dim_payment_type", "dim_rate_code"),
      (s, sf, t) => GoldFact.buildFrom(s, sf, t("stg_trips_unified"))))

  /** Kahn topological order over the declared edges. */
  private[graft] def topoOrder(ms: Seq[Model]): Seq[Model] = {
    val byName = ms.map(m => m.name -> m).toMap
    val resolved = scala.collection.mutable.LinkedHashSet[String]()
    def visit(m: Model, path: Set[String]): Unit = {
      require(!path.contains(m.name), s"cycle at ${m.name}")
      if (!resolved.contains(m.name)) {
        m.deps.foreach(d => visit(byName(d), path + m.name))
        resolved += m.name
      }
    }
    ms.foreach(visit(_, Set.empty))
    resolved.toSeq.map(byName)
  }

  /** Run the DAG: independent roots concurrently, dependents after
    * their upstreams; returns (model → materialized row count). */
  def run(spark: SparkSession, sfDir: String, outRoot: String): Map[String, Long] =
    runModels(spark, sfDir, outRoot, models)

  /** dbt `--select`-style subset run: the named models plus their
    * transitive dependency closure (a model never builds against a
    * stale or missing upstream), in dependency order. Unknown names
    * fail loudly. */
  def runSubset(spark: SparkSession, sfDir: String, outRoot: String,
      names: Seq[String]): Map[String, Long] = {
    if (names.isEmpty) return Map.empty
    val byName = models.map(m => m.name -> m).toMap
    names.foreach(n => require(byName.contains(n), s"unknown model $n"))
    val selected = scala.collection.mutable.LinkedHashSet[String]()
    def close(n: String): Unit = if (!selected.contains(n)) {
      byName(n).deps.foreach(close)
      selected += n
    }
    names.foreach(close)
    runModels(spark, sfDir, outRoot, models.filter(m => selected.contains(m.name)))
  }

  private def runModels(spark: SparkSession, sfDir: String, outRoot: String,
      ms: Seq[Model]): Map[String, Long] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val ordered = topoOrder(ms)
    val done = scala.collection.concurrent.TrieMap[String, Future[DataFrame]]()
    ordered.foreach { m =>
      val depFutures = m.deps.map(d => done(d))
      done(m.name) = Future.sequence(depFutures).map { depDfs =>
        val upstream = m.deps.zip(depDfs).toMap
        val df = m.build(spark, sfDir, upstream)
        val dir = s"$outRoot/${m.name}"
        df.write.mode(SaveMode.Overwrite).parquet(dir)
        spark.read.parquet(dir)
      }
    }
    ordered.map { m =>
      m.name -> Await.result(done(m.name), Duration.Inf).count()
    }.toMap
  }
}
