package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

import graft.analysis.Stemmers

/** Pins every stemmer against golden files generated from an independent
  * ground-truth Snowball implementation (PostgreSQL's bundled snowball
  * dictionaries, built from the published snowballstem.org sources).
  * Each golden holds 5,000 deterministically-sampled words per language:
  * real inflected forms, stem x suffix-inventory crosses over the
  * language's own suffix lists, and random strings over its alphabet —
  * the mix that exposed every divergence fixed while exact-matching.
  *
  * The 21 languages below match the ground truth on 100% of the corpus.
  * (estonian / german2 / kp / lovins have no independent oracle
  * available offline; porter is pinned by SnowballSpec's published
  * worked examples.)
  */
class SnowballOracleSpec extends AnyFunSuite {

  private val exact = Seq("english", "danish", "norwegian", "swedish",
    "russian", "german", "dutch", "french", "spanish", "portuguese",
    "italian", "finnish", "hungarian", "lithuanian", "romanian",
    "catalan", "basque", "irish", "armenian", "turkish", "arabic")

  private def check(lang: String): (Int, Int, List[String]) = {
    val in = getClass.getResourceAsStream(s"/snowball/$lang.tsv")
    assert(in != null, s"missing golden for $lang")
    val src = Source.fromInputStream(in, "UTF-8")
    try {
      val stemmer = Stemmers.forName(lang)
      var total = 0
      var bad = 0
      var examples = List.empty[String]
      for (line <- src.getLines() if line.nonEmpty) {
        val tab = line.indexOf('\t')
        val word = line.substring(0, tab)
        val want = line.substring(tab + 1)
        val got = stemmer.stem(word)
        total += 1
        if (got != want) {
          bad += 1
          if (examples.length < 5) examples ::= s"$word: got $got want $want"
        }
      }
      (total, bad, examples)
    } finally src.close()
  }

  for (lang <- exact) test(s"$lang matches ground truth exactly") {
    val (total, bad, examples) = check(lang)
    assert(total >= 4000, s"suspiciously small golden for $lang: $total")
    assert(bad == 0, s"$lang: $bad/$total divergences, e.g. ${examples.mkString("; ")}")
  }

}
