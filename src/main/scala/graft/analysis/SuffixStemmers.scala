package graft.analysis

/** Table-driven suffix stemmers for the long-tail non-English Snowball
  * languages (`text_analysis.clj:15-49` lists the 26 the reference
  * supports). German, Dutch, French, Spanish, Portuguese, Italian,
  * Russian, Danish, Norwegian and Swedish have EXACT implementations in
  * [[SnowballStemmers]], and Finnish, Hungarian and Turkish in
  * [[SnowballStemmers2]]; the tables here back the remaining languages
  * (Romanian, Catalan, Basque, Irish, Estonian, Armenian, Arabic).
  *
  * These follow the published Snowball algorithms' shape — a region
  * constraint (R1 = after the first vowel/non-vowel pair, or RV for the
  * Romance languages) plus longest-suffix removal with a minimum stem
  * length — but are SIMPLIFIED: they cover the high-frequency
  * inflectional endings, not the full exception logic. English (Porter2)
  * and Lithuanian have dedicated implementations in Stemmers.scala. The
  * practical contract for matching is equivalence: inflected forms of a
  * word stem to the same string.
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

  val romanian: Stemmer = new TableStemmer(
    "aeiouăâî",
    Seq("abilitate", "ibilitate", "itate", "iune", "ătoare", "ător",
      "ează", "escu", "ească", "ești", "esc", "ând", "ind", "are", "ere",
      "ire", "uri", "ule", "ul", "le", "ii", "ei", "i", "e", "a", "ă"),
    useRv = true)

  val catalan: Stemmer = new TableStemmer(
    "aeiouàèéíòóú",
    Seq("aments", "ament", "acions", "ació", "itats", "itat", "ables",
      "able", "isme", "ista", "ors", "ora", "or", "ant", "ent", "es",
      "os", "a", "e", "o", "s"),
    useRv = true)

  val basque: Stemmer = new TableStemmer(
    "aeiou",
    Seq("tzailea", "tzaile", "tasuna", "tasun", "garri", "keria", "tegi",
      "aren", "etan", "etik", "era", "ak", "ek", "en", "an", "a", "k"))

  val irish: Stemmer = new TableStemmer(
    "aeiouáéíóú",
    Seq("achta", "acht", "anna", "aire", "eoir", "óir", "éir", "anna",
      "acha", "acht", "a", "e", "í", "aí"))

  // no single-letter endings: the reference's pinned behavior is that the
  // Estonian stemmer leaves English-like plurals alone ("dogs" != "dog",
  // phrases_test.clj:231-234)
  val estonian: Stemmer = new TableStemmer(
    "aeiouõäöü",
    Seq("dega", "tega", "dele", "tele", "des", "tes", "deks", "teks",
      "ga", "ks", "le", "lt", "sse", "ni", "na", "ta", "id", "de", "te"))

  val armenian: Stemmer = new TableStemmer(
    "աեէըիոօւ",
    Seq("ություն", "ներին", "ներից", "ների", "ներով", "ներ", "երի",
      "երով", "եր", "ին", "ից", "ով", "ում", "ի", "ը", "ն"))

  val arabic: Stemmer = new Stemmer {
    private val suffixes = Seq("كما", "هما", "تما", "ها", "ان", "ات",
      "ون", "ين", "يه", "ية", "كم", "هن", "نا", "يا", "ه", "ة", "ي", "ك")
    def stem(word: String): String = {
      var w = word
      if (w.startsWith("ال") && w.length > 4) w = w.substring(2)
      suffixes.find(s => w.endsWith(s) && w.length - s.length >= 2) match {
        case Some(s) => w.dropRight(s.length)
        case None    => w
      }
    }
  }
}
