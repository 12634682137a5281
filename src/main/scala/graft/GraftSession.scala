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
}
