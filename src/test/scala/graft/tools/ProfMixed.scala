package graft.engine

import graft.dict.{DictionaryEntry => DE, HighlighterOpts}
import graft.analysis.Analyzer
import scala.collection.mutable

object ProfMixed2 {
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
  private def mixed(size: Int): Seq[DE] =
    benchDict(size).zipWithIndex.map { case (e, i) =>
      (i % 20) match {
        case 0 | 5 | 10 | 15 => e.copy(stem = Some(true))
        case 1 | 6 | 11 | 16 => e.copy(caseSensitive = Some(false))
        case 2 | 12          => e.copy(slop = Some(1))
        case 7 | 17          => e.copy(slop = Some(2), inOrder = Some(true))
        case 3 | 8 | 13 | 18 => e.copy(synonyms =
          Seq(e.text.split(" ").reverse.mkString(" ")))
        case 4               => e.copy(fuzzy = Some(true), fuzziness = Some(1))
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

    val dict = Compiler.compile(mixed(80000), HighlighterOpts())
    println(s"docs=${texts.length} fieldConfs=${dict.fieldConfs.length}")
    dict.fieldConfs.zipWithIndex.foreach { case (c, i) =>
      println(s"  conf $i: $c anchors=${dict.anchor(i).size()} fuzzyDel=${dict.fuzzyDel(i).size()} ac=${dict.ac(i) != null}")
    }

    // warmup full path
    var w = 0
    while (w < 1000) { dict.matchDoc(texts(w % texts.length)); w += 1 }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val x = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s   (x=$x)")
    }

    // phase 1: per-conf analysis
    for (fi <- dict.fieldConfs.indices) {
      time(s"analyze conf $fi") {
        var n = 0L; var i = 0
        while (i < texts.length) { n += Analyzer.analyze(dict.fieldConfs(fi), texts(i)).length; i += 1 }
        n
      }
    }
    // phase 2: tokens -> FieldTokens (positions map)
    val fieldsPerDoc = texts.map { t =>
      dict.fieldConfs.map(c => FieldTokens(Analyzer.analyze(c, t)))
    }
    time("positions maps (all confs)") {
      var n = 0L; var i = 0
      while (i < texts.length) {
        var f = 0
        while (f < dict.fieldConfs.length) {
          n += FieldTokens(fieldsPerDoc(i)(f).tokens).positions.size(); f += 1 }
        i += 1
      }
      n
    }
    // phase 3: anchor probes
    time("anchor probes") {
      var n = 0L; var i = 0
      while (i < texts.length) {
        var f = 0
        while (f < dict.fieldConfs.length) {
          val idx = dict.anchor(f)
          if (!idx.isEmpty) {
            val it = fieldsPerDoc(i)(f).positions.keySet().iterator()
            while (it.hasNext) { val h = idx.get(it.next()); if (h != null) n += h.length }
          }
          f += 1
        }
        i += 1
      }
      n
    }
    // phase 4: fuzzy deletion-variant probes
    time("fuzzy del probes") {
      var n = 0L; var i = 0
      while (i < texts.length) {
        var f = 0
        while (f < dict.fieldConfs.length) {
          val fdel = dict.fuzzyDel(f)
          if (!fdel.isEmpty) {
            val maxDel = dict.fuzzyMaxDel(f)
            val it = fieldsPerDoc(i)(f).positions.keySet().iterator()
            while (it.hasNext) {
              val variants = Compiler.deletionVariants(it.next(), maxDel)
              var vi = 0
              while (vi < variants.length) {
                val h = fdel.get(variants(vi)); if (h != null) n += h.length; vi += 1 }
            }
          }
          f += 1
        }
        i += 1
      }
      n
    }
    // phase 5: AC runs
    time("aho-corasick runs") {
      var n = 0L; var i = 0
      while (i < texts.length) {
        var f = 0
        while (f < dict.fieldConfs.length) {
          val a = dict.ac(f)
          if (a != null && fieldsPerDoc(i)(f).tokens.nonEmpty) {
            val toks = fieldsPerDoc(i)(f).tokens
            val terms = new Array[String](toks.length)
            var k = 0
            while (k < terms.length) { terms(k) = toks(k).term; k += 1 }
            a.run(terms, (_, _, _) => { n += 1; () })
          }
          f += 1
        }
        i += 1
      }
      n
    }
    // phase 6: candidate matcher verification. count candidates per doc
    time("full matchDoc") {
      var n = 0L; var i = 0
      while (i < texts.length) { n += dict.matchDoc(texts(i)).size; i += 1 }
      n
    }

    // family decomposition: dictionaries with a single config family at
    // the same entry scale, to attribute verification cost
    val families = Seq[(String, Seq[DE])](
      "only exact (AC)" -> benchDict(80000),
      "only stemmed" -> benchDict(80000).map(_.copy(stem = Some(true))),
      "only slop1" -> benchDict(80000).map(_.copy(slop = Some(1))),
      "only slop2 inorder" -> benchDict(80000).map(e =>
        e.copy(slop = Some(2), inOrder = Some(true))),
      "only fuzzy (all 80k!)" -> benchDict(80000).map(e =>
        e.copy(fuzzy = Some(true), fuzziness = Some(1))),
      "fuzzy 5% (4k)" -> benchDict(80000).zipWithIndex.map { case (e, i) =>
        if (i % 20 == 4) e.copy(fuzzy = Some(true), fuzziness = Some(1)) else e })
    for ((label, d) <- families) {
      val cd = Compiler.compile(d, HighlighterOpts())
      var w2 = 0
      while (w2 < 500) { cd.matchDoc(texts(w2 % texts.length)); w2 += 1 }
      time(label) {
        var n = 0L; var i = 0
        while (i < texts.length) { n += cd.matchDoc(texts(i)).size; i += 1 }
        n
      }
    }
  }
}
