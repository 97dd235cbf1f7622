package graft

import graft.dict.{DictionaryEntry => DE}
import graft.spark.SparkHighlighter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Headline: documents/second annotating the `documents`
  * table against a 5k-entry dictionary (the reference's published
  * baseline workload shape: large dictionary, few-percent match rate —
  * `README.md:161-214`, BASELINE.md). Plus wall-times for the heavier
  * pipeline operators. Prints ONE JSON line.
  */
object Bench {

  /** Deterministic 5k-entry dictionary: 250 vocab bigrams that really
    * occur in the corpus (~5% of entries match, like city names in news)
    * + 4750 synthetic phrases that never match (prunes via presearcher).
    */
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: local[32]; SPARK_GRAFT_CPUS=4 reproduces the
    // BASELINE.md per-core parity configuration
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

    // headline: annotation throughput over the documents table at the
    // reference's dictionary scaling points (BASELINE.md: 5k and 80k).
    // The sf0.1 corpus is only 5k docs — replicate it so each of the 32
    // cores gets enough rows that fixed job overhead stops dominating and
    // the number reflects steady-state per-row cost (the 100 TB regime).
    val repl = sys.env.getOrElse("SPARK_GRAFT_DOC_REPL", "8").toInt
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(repl.toLong).select(col("id").as("__copy")))
      .repartition(cpus.toInt * 2)
      .cache()
    val nDocs = docs.count()
    // The host is time-shared: identical runs have shown 2-20x wall-time
    // swings from neighbor contention. Time everything twice and report
    // the MIN — the standard noise-robust statistic for benchmarks.
    def timeMin(f: => Unit): Double = math.min(time(f), time(f))

    val hl = SparkHighlighter(benchDict(5000))
    // JIT/codegen warmup on a slice
    hl.annotateExploded(docs.limit(200), "text").count()
    var annCount = 0L
    val annotateSec = timeMin {
      annCount = hl.annotateExploded(docs, "text").count()
    }
    val docsPerSec = nDocs / annotateSec
    val hl80 = SparkHighlighter(benchDict(80000))
    hl80.annotateExploded(docs.limit(200), "text").count()
    val annotate80Sec = timeMin { hl80.annotateExploded(docs, "text").count() }

    // heavier pipeline operators (sec each). Warm each query ONCE ON THE
    // REAL DATA first, then drop its caches and time a fresh run: AQE
    // picks size-dependent physical plans, so a small-slice warmup leaves
    // the full-size plan's codegen cold (measured: q_dedup_minhash 10.7s
    // cold vs 1.8s steady-state; a long-running cluster job amortizes the
    // one-time JIT to zero). clearCache between runs stops the internal
    // persist() calls from leaking cached inputs into the timed run.
    val opQueries = Seq("q_dedup_minhash", "q_dedup_exact", "q_knn_brute",
      "q_knn_ivf", "q1_agg", "q_events_window", "q_ann_counts",
      "q_dedup_simhash", "q_langid", "q_asof", "q_range_join",
      "q_tfidf", "q_dedup_cluster")
    val results = scala.collection.mutable.LinkedHashMap[String, Double](
      "annotate_5k_dict" -> annotateSec,
      "annotate_80k_dict" -> annotate80Sec)
    opQueries.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        docs.unpersist()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        results(name) = timeMin {
          fn(spark, sfDir).count()
          spark.catalog.clearCache()
        }
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","docs":$nDocs,"annotations":$annCount,"docs_per_sec":$docsPerSec%.0f,"docs_per_sec_80k_dict":${nDocs / annotate80Sec}%.0f,"cpus":$cpus}""")
    spark.stop()
  }
}
