import graft.dict.{DictionaryEntry => DE}
import graft.spark.SparkHighlighter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B driver: times ONLY one annotate workload (graft.Bench's
  * thunk, reproduced verbatim) — warm + N rounds, prints min/median.
  * Dropped into each worktree for interleaved same-host comparison.
  * `SPARK_GRAFT_AB_WORKLOAD`: `mixed80` (default) or `dict80` (the
  * plain slop-0 80k dictionary — the Aho-Corasick fast path).
  */
object AnnotateBench {
  private def benchDict(size: Int): Seq[DE] = {
    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream",
      "spark", "dup", "group", "query", "row", "data", "slow", "filter",
      "customer", "line", "value", "agg", "column", "big", "vector")
    val matching = (for {
      (a, i) <- vocab.zipWithIndex
      (b, j) <- vocab.zipWithIndex
      if i != j
    } yield s"$a $b").take(size / 20)
    val synthetic = (0 until (size - matching.size)).map(i => s"city$i центр$i")
    (matching ++ synthetic).zipWithIndex.map { case (text, i) =>
      DE(text, id = Some(s"e$i"))
    }
  }

  private def benchDictMixed(size: Int): Seq[DE] = {
    benchDict(size).zipWithIndex.map { case (e, i) =>
      (i % 20) match {
        case 0 | 5 | 10 | 15     => e.copy(stem = Some(true))
        case 1 | 6 | 11 | 16     => e.copy(caseSensitive = Some(false))
        case 2 | 12              => e.copy(slop = Some(1))
        case 7 | 17              => e.copy(slop = Some(2), inOrder = Some(true))
        case 3 | 8 | 13 | 18     => e.copy(synonyms =
          Seq(e.text.split(" ").reverse.mkString(" ")))
        case 4                   => e.copy(fuzzy = Some(true), fuzziness = Some(1))
        case _                   => e
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docsDir = java.nio.file.Files
      .createTempDirectory("graft_ab_docs").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(8L).select(col("id").as("__copy")))
      .repartition(64)
      .write.mode("overwrite").parquet(docsDir)
    val docs = spark.read.parquet(docsDir)
    val nDocs = docs.count()
    val workload = sys.env.getOrElse("SPARK_GRAFT_AB_WORKLOAD", "mixed80")
    val hl = workload match {
      case "dict80" => SparkHighlighter(benchDict(80000))
      case _ => SparkHighlighter(benchDictMixed(80000))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def one(): Double = time { hl.annotateExploded(docs, "text").count() }
    one() // warm
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "5").toInt
    val ts = (1 to rounds).map(_ => one())
    val min = ts.min
    println(f"ANNOTATE_80K_${workload.toUpperCase} min=$min%.3f docs_per_sec=${nDocs / min}%.0f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rmTree(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(docsDir))
  }
}
