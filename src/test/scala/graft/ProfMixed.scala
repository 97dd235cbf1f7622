import graft.dict.{DictionaryEntry => DE, HighlighterOpts}
import graft.engine.Phrases

object ProfMixed {
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
  private def mixed(size: Int, noStem: Boolean = false, noFuzzy: Boolean = false,
      noSlop: Boolean = false, noCase: Boolean = false, noSyn: Boolean = false): Seq[DE] =
    benchDict(size).zipWithIndex.map { case (e, i) =>
      (i % 20) match {
        case 0 | 5 | 10 | 15 => if (noStem) e else e.copy(stem = Some(true))
        case 1 | 6 | 11 | 16 => if (noCase) e else e.copy(caseSensitive = Some(false))
        case 2 | 12          => if (noSlop) e else e.copy(slop = Some(1))
        case 7 | 17          => if (noSlop) e else e.copy(slop = Some(2), inOrder = Some(true))
        case 3 | 8 | 13 | 18 => if (noSyn) e else e.copy(synonyms =
          Seq(e.text.split(" ").reverse.mkString(" ")))
        case 4               => if (noFuzzy) e else e.copy(fuzzy = Some(true), fuzziness = Some(1))
        case _               => e
      }
    }

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    println(s"docs=${texts.length}")

    def run(label: String, dict: Seq[DE]): Unit = {
      val h = Phrases.highlighter(dict, HighlighterOpts())
      var n = 0L
      // warmup
      var i = 0
      while (i < 500) { n += h(texts(i)).size; i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < texts.length) { n += h(texts(i)).size; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${texts.length / sec}%8.0f docs/s  ($sec%.2f s, anns=$n)")
    }
    run("plain_80k", benchDict(80000))
    run("mixed_80k", mixed(80000))
    run("mixed_no_stem", mixed(80000, noStem = true))
    run("mixed_no_fuzzy", mixed(80000, noFuzzy = true))
    run("mixed_no_slop", mixed(80000, noSlop = true))
    run("mixed_no_case", mixed(80000, noCase = true))
    run("mixed_no_syn", mixed(80000, noSyn = true))
    run("mixed_80k_again", mixed(80000))
  }
}
