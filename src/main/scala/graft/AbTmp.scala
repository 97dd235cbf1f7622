package graft

import org.apache.spark.sql.SparkSession

/** AB-TMP (deleted after measurement). */
object AbTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val names = args.toSeq
    val rounds = sys.env.getOrElse("AB_ROUNDS", "5").toInt
    for (mode <- Seq("new", "old"); n <- names) {
      if (mode == "new") sys.props.remove("graft.abtmp")
      else sys.props("graft.abtmp") = mode
      SparkEntry.queries(n)(spark, sfDir).count(); spark.catalog.clearCache()
    }
    val res = scala.collection.mutable.LinkedHashMap[(String, String), Vector[Double]]()
    for (r <- 1 to rounds; n <- names; mode <- Seq("new", "old")) {
      if (mode == "new") sys.props.remove("graft.abtmp")
      else sys.props("graft.abtmp") = mode
      val t = time { SparkEntry.queries(n)(spark, sfDir).count(); spark.catalog.clearCache() }
      res((n, mode)) = res.getOrElse((n, mode), Vector.empty) :+ t
    }
    names.foreach { n =>
      val a = res((n, "new")); val b = res((n, "old"))
      def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
      val pr = a.zip(b).map { case (x, y) => x / y }
      println(f"$n%-20s new_min=${a.min}%.3f old_min=${b.min}%.3f " +
        f"med(new/old)=${med(pr)}%.2f pairs:${pr.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
