package graft.engine
import graft.dict.{DictionaryEntry => DE, HighlighterOpts}

object Prof1M {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream",
      "spark", "dup", "group", "query", "row", "data", "slow", "filter",
      "customer", "line", "value", "agg", "column", "big", "vector")
    val size = 1000000
    val matching = (for {
      (a, i) <- vocab.zipWithIndex; (b, j) <- vocab.zipWithIndex if i != j
    } yield s"$a $b").take(size / 20)
    val synthetic = (0 until (size - matching.size)).map(i => s"city$i центр$i")
    val entries = (matching ++ synthetic).zipWithIndex.map { case (t, i) => DE(t, id = Some(s"e$i")) }
    var t0 = System.nanoTime()
    val dict = Compiler.compile(entries, HighlighterOpts())
    println(f"compile 1M entries: ${(System.nanoTime()-t0)/1e9}%.2f s")
    var w = 0
    while (w < 1000) { dict.matchDoc(texts(w % texts.length)); w += 1 }
    t0 = System.nanoTime()
    var n = 0L; var i = 0
    while (i < texts.length) { n += dict.matchDoc(texts(i)).size; i += 1 }
    val dt = (System.nanoTime()-t0)/1e9
    println(f"matchDoc 5000 docs @1M dict: $dt%.2f s = ${5000/dt}%.0f docs/s single-thread (matches=$n)")
  }
}
