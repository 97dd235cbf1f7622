package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one `SparkEntry` query repeatedly in a warm JVM to
  * separate steady-state plan cost from one-time JIT/codegen compilation.
  * Usage: `sbt "runMain graft.ProfileQuery q_dedup_minhash"`.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val name = args.headOption.getOrElse("q_dedup_minhash")
    val fn = SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val t = time { fn(spark, sfDir).count() }
      println(f"[profile] $name run$i: $t%.3f s")
    }
    spark.stop()
  }
}
