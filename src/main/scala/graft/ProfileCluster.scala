package graft

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

/** Dev utility: phase-level breakdown of the q_dedup_cluster pipeline
  * (pair production vs label propagation) to localize regressions.
  */
object ProfileCluster {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[cluster-profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5)
      time(s"run$i pairs.count")(pairs.count())
      time(s"run$i clusters")(Dedup.clusters(pairs).count())
      System.err.println(s"[cluster-profile] run$i persistent RDDs tracked: " +
        spark.sparkContext.getPersistentRDDs.size)
    }
    spark.stop()
  }
}
