package graft
// TEMPORARY dev probe — delete before final. Measures whether warming
// the stage-build plan shapes at sf0.001 removes the codegen/JIT cost
// from the sf0.1 builds (fresh JVM = the Bench situation).
import org.apache.spark.sql.SparkSession

object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val warmDir = "/root/testdata/sf0.001"
    val doWarm = args.headOption.contains("warm")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  [probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (doWarm) t("warm prebuilds at sf0.001") {
      graft.functions.DedupStage.prebuild(spark, warmDir)
      operators.GoldStage.fact(spark, warmDir).count()
      operators.BasketStage.prebuild(spark, warmDir)
      graft.functions.QualityModel.prebuild(spark, warmDir)
    }
    t("dedup stage build sf0.1") {
      graft.functions.DedupStage.prebuild(spark, sfDir)
    }
    t("fact stage build sf0.1") {
      operators.GoldStage.fact(spark, sfDir).count(); ()
    }
    t("basket stage build sf0.1") {
      operators.BasketStage.prebuild(spark, sfDir)
    }
    t("model stage build sf0.1") {
      graft.functions.QualityModel.prebuild(spark, sfDir)
    }
    spark.stop()
  }
}
