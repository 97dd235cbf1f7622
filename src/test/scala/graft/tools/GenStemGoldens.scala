package graft.tools

import graft.analysis.SnowballStemmers4.{Estonian, Kp, Lovins}

/** One-shot generator for the lovins/kp/estonian ADVERSARIAL golden
  * corpora (`src/test/resources/snowball/{lovins,kp,estonian}_adv.tsv`):
  * `Test/runMain graft.tools.GenStemGoldens <resourcesDir>`.
  *
  * These three stemmers have no independent offline oracle (see
  * SnowballStemmers4's scaladoc), so the goldens pin CURRENT behavior
  * over inputs chosen to stress the published spec tables — every
  * suffix inventory crossed with stems that sit on the region/length
  * boundaries each spec's conditions test — making silent drift in a
  * refactor impossible. The word lists are deterministic constructions,
  * not natural text.
  */
object GenStemGoldens {

  /** Lovins 1968: ending inventory spanning all condition letters A-Z
    * plus the transformation-rule triggers (iev/olv/metr/rpt/ix/...).
    */
  private def lovinsWords: Seq[String] = {
    val stems = Seq(
      // length-boundary stems: conditions A (no restriction) vs B (min
      // stem 3) vs C (min 4) flip between these
      "ab", "abc", "abcd", "magnes", "believ", "dissolv", "administr",
      "parametr", "matric", "absorpt", "nation", "sit", "index")
    val endings = Seq(
      "alistically", "arizability", "izationally",
      "antialness", "arisations", "arizations", "entialness",
      "ableness", "arizable", "entation", "entially", "eousness",
      "ibleness", "icalness", "ionalism", "ionality", "ionalize",
      "iousness", "izations", "lessness",
      "ability", "aically", "alistic", "alities", "ariness",
      "aristic", "arizing", "ateness", "atingly", "ational",
      "atively", "ativism", "elihood", "encible", "entally",
      "entials", "entiate", "entness", "fulness", "ibility",
      "icalism", "icalist", "icality", "icalize", "ication",
      "icianry", "ination", "ingness", "ionally", "isation",
      "ishness", "istical", "iteness", "iveness", "ivistic",
      "ivities", "ization", "izement", "oidally", "ousness",
      "aceous", "acious", "action", "alness", "ancial", "ancies",
      "ancing", "ariser", "arized", "arizer", "atable", "ations",
      "atives", "eature", "efully", "encies", "encing", "ential",
      "enting", "entist", "eously", "ialist", "iality", "ialize",
      "ically", "icance", "icians", "icists", "ifully", "ionals",
      "ionate", "ioning", "ionist", "iously", "istics", "izable",
      "lessly", "nesses", "oidism",
      "acies", "acity", "aging", "aical", "alist", "alism", "ality",
      "alize", "allic", "anced", "ances", "antic", "arial", "aries",
      "arily", "arity", "arize", "aroid", "ately", "ating", "ation",
      "ative", "ators", "atory", "ature", "early", "ehood", "eless",
      "elity", "ement", "enced", "ences", "eness", "ening", "ental",
      "ented", "ently", "fully", "ially", "icant", "ician", "icide",
      "icism", "icist", "icity", "idine", "iedly", "ihood", "inate",
      "iness", "ingly", "inism", "inity", "ional", "ioned", "ished",
      "istic", "ities", "itous", "ively", "ivity", "izers", "izing",
      "oidal", "oides", "otide", "ously",
      "able", "ably", "ages", "ally", "ance", "ancy", "ants", "aric",
      "arly", "ated", "ates", "atic", "ator", "ealy", "edly", "eful",
      "eity", "ence", "ency", "ened", "enly", "eous", "hood", "ials",
      "ians", "ible", "ibly", "ical", "ides", "iers", "iful", "ines",
      "ings", "ions", "ious", "isms", "ists", "itic", "ized", "izer",
      "less", "lily", "ness", "ogen", "ward", "wise", "ying", "yish",
      "acy", "age", "aic", "als", "ant", "ars", "ary", "ata", "ate",
      "eal", "ear", "ely", "ene", "ent", "ery", "ese", "ful", "ial",
      "ian", "ics", "ide", "ied", "ier", "ies", "ily", "ine", "ing",
      "ion", "ish", "ism", "ist", "ite", "ity", "ium", "ive", "ize",
      "oid", "one", "ous",
      "ae", "al", "ar", "as", "ed", "en", "es", "ia", "ic", "is",
      "ly", "on", "or", "um", "us", "yl",
      "'s", "s'", "a", "e", "i", "o", "s", "y")
    (for (s <- stems; e <- endings) yield s + e) ++
      // transformation-rule triggers with no removable ending
      Seq("matrix", "helix", "index", "vertex", "bb", "dd", "gg", "ll",
        "mm", "nn", "pp", "rr", "ss", "tt", "uad", "vad", "cid", "lid",
        "erid", "pand", "end", "ond", "lud", "rud", "her", "metr",
        "istr", "urs", "uct", "umpt", "rpt", "urt", "istr", "olv",
        "ax", "ex", "ix", "ox", "ux", "yt", "yz", "iev")
  }

  /** Kraaij-Pohlmann: Dutch suffix inventory × stems with single/double
    * vowels (the lengthening/undoubling boundary) and schwa endings.
    */
  private def kpWords: Seq[String] = {
    val stems = Seq("lop", "loop", "kat", "katt", "boek", "spel", "speel",
      "wandel", "werk", "mak", "maak", "lev", "leef", "zit", "zitt",
      "fiets", "moge", "vrij", "kwalite")
    val suffixes = Seq("en", "ene", "s", "t", "te", "ten", "de", "den",
      "ste", "st", "er", "ers", "ster", "je", "tje", "pje", "etje",
      "kje", "eke", "heid", "heden", "ing", "ingen", "lijk", "lijke",
      "baar", "bare", "end", "ende", "ig", "ige", "isch", "ische",
      "achtig", "e", "")
    (for (s <- stems; x <- suffixes) yield s + x) ++
      Seq("mogelijkheden", "wandelingen", "kwaliteiten", "appeltje",
        "meisje", "huisje", "boompje", "koninkje", "gevaarlijk")
  }

  /** Estonian: case/verb suffix inventory × stems ending in different
    * vowels/consonants (the spec's conditions key on the stem-final
    * character class).
    */
  private def estonianWords: Seq[String] = {
    val stems = Seq("raamatu", "maja", "lugemi", "kirjutami", "tore",
      "ilus", "suur", "laul", "tuba", "pere", "linn", "auto", "koer")
    val suffixes = Seq("ga", "ta", "le", "lt", "st", "sse", "s", "ni",
      "na", "id", "sid", "d", "de", "te", "gi", "ki", "sin", "sime",
      "site", "vad", "takse", "nud", "tud", "mine", "mise", "mist",
      "misega", "", "t", "e")
    (for (s <- stems; x <- suffixes) yield s + x) ++
      Seq("raamatutega", "raamatuile", "majadegi", "lauludeski",
        "suuremad", "ilusaim", "dogs", "dog")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: GenStemGoldens <resourcesDir>")
    val dir = java.nio.file.Paths.get(args(0))
    def dump(name: String, words: Seq[String], stem: String => String): Unit = {
      val lines = words.distinct.sorted.map(w => s"$w\t${stem(w)}")
      java.nio.file.Files.write(dir.resolve(s"${name}_adv.tsv"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      println(s"$name: ${lines.size} words")
    }
    dump("lovins", lovinsWords, Lovins.stem)
    dump("kp", kpWords, Kp.stem)
    dump("estonian", estonianWords, Estonian.stem)
  }
}
