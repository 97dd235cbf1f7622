package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: write `.explain("formatted")` for named `SparkEntry`
  * queries to files — the committed plan evidence for optimization
  * rounds (plans/<round>/<query>_<tag>.txt).
  *
  * Usage: `runMain graft.PlanDump plans/r18 before q_dedup_jaccard ...`
  * (`SPARK_GRAFT_SF_DIR` honored as in [[Bench]]; same session config,
  * so the dumped plan is the one the bench runs).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, names @ _*) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        val plan = org.apache.spark.sql.GraftBridge.explainString(df)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        System.err.println(s"[plandump] wrote $outDir/${name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
