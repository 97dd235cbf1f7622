package graft

import org.apache.spark.sql.SparkSession

/** Time individual `SparkEntry.queries` entries in isolation — the
  * drill-down companion to [[Bench]] (same session config, same
  * min-across-rounds protocol) for pinning per-query regressions
  * without running the whole suite.
  *
  * Usage: `runMain graft.BenchOne q_pipeline q_langid` with
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_BENCH_ROUNDS` honored as in
  * [[Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
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

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pipeline")
    val thunks = names.map { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
      n -> (() => { fn(spark, sfDir).count(); spark.catalog.clearCache() })
    }
    thunks.foreach { case (_, f) => f() } // warm (AQE + codegen)
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (_ <- 1 to rounds; (name, f) <- thunks) {
      val t = time(f())
      samples(name) = samples.getOrElse(name, Vector.empty) :+ t
    }
    samples.foreach { case (n, v) =>
      println(f"$n%-24s min=${v.min}%.3f median=${v.sorted.apply(v.size / 2)}%.3f all=${v.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
