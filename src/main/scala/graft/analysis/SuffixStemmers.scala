package graft.analysis

/** Table-driven suffix stemmer backing the ONE language still without an
  * exact Snowball implementation: Estonian (`text_analysis.clj:15-49`
  * wires all 26 Snowball programs; every other name routes to an exact
  * implementation in [[SnowballStemmers]]/[[SnowballStemmers2]]/
  * [[SnowballStemmers3]] or Stemmers.scala — see Stemmers.forName).
  *
  * The table follows the published Snowball algorithms' shape — an R1
  * region constraint plus longest-suffix removal with a minimum stem
  * length — but is SIMPLIFIED: it covers the high-frequency Estonian
  * case endings, not the full exception logic. The practical contract
  * for matching is equivalence: inflected forms of a word stem to the
  * same string.
  */
object SuffixStemmers {

  final class TableStemmer(
      vowelChars: String,
      endings: Seq[String],
      minStem: Int = 2,
      finish: String => String = identity,
      useRv: Boolean = false) extends Stemmer {

    private val sorted = endings.distinct.sortBy(-_.length)

    @inline private def isVowel(c: Char): Boolean =
      vowelChars.indexOf(Character.toLowerCase(c).toInt) >= 0

    /** R1: after the first non-vowel following a vowel.
      * RV: after the first vowel (looser, used by Romance algorithms).
      */
    private def region(w: String): Int = {
      var i = 0
      val n = w.length
      if (useRv) {
        while (i < n && !isVowel(w.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else {
        while (i < n && !isVowel(w.charAt(i))) i += 1
        while (i < n && isVowel(w.charAt(i))) i += 1
        if (i < n) i + 1 else n
      }
    }

    def stem(word: String): String = {
      val r = region(word)
      val lower = word.toLowerCase
      var out = word
      var k = 0
      var matched = false
      while (!matched && k < sorted.length) {
        val e = sorted(k)
        val cut = word.length - e.length
        if (cut >= minStem && cut >= r && lower.endsWith(e)) {
          out = word.substring(0, cut)
          matched = true
        }
        k += 1
      }
      finish(out)
    }
  }

  // no single-letter endings: the reference's pinned behavior is that the
  // Estonian stemmer leaves English-like plurals alone ("dogs" != "dog",
  // phrases_test.clj:231-234)
  val estonian: Stemmer = new TableStemmer(
    "aeiouõäöü",
    Seq("dega", "tega", "dele", "tele", "des", "tes", "deks", "teks",
      "ga", "ks", "le", "lt", "sse", "ni", "na", "ta", "id", "de", "te"))
}
