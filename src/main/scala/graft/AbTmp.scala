package graft

import org.apache.spark.sql.SparkSession

/** Scratch paired interleaved A/B harness (removed after measurement).
  * Alternates a sys-prop toggle between two plan-construction variants
  * of the SAME query inside ONE warm JVM and prints per-pair ratios —
  * the only protocol that survives this host's co-tenant bursts
  * (uniform slowdown cancels in the pair).
  *
  * Usage: runMain graft.AbTmp <prop> <query> [pairs]
  */
object AbTmp {
  def main(args: Array[String]): Unit = {
    val prop = args(0)
    val name = args(1)
    val pairs = if (args.length > 2) args(2).toInt else 6
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
    val fn = SparkEntry.queries(name)
    def run(v: String): Double = {
      sys.props(prop) = v
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    // warm both variants (AQE + codegen)
    run("1"); run("0")
    val ratios = (1 to pairs).map { i =>
      val a = run("1"); val b = run("0")
      println(f"pair $i: new=$a%.3f old=$b%.3f ratio=${a / b}%.3f")
      a / b
    }
    val s = ratios.sorted
    val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    println(f"[ab] $name median new/old = $med%.3f over $pairs pairs")
    spark.stop()
  }
}
