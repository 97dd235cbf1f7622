package graft

import graft.analysis._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests ported from `text_analysis_test.clj`. */
class AnalysisSpec extends AnyFunSuite {

  private def conf(
      tokenizer: Option[String] = None, cs: Option[Boolean] = None,
      fold: Option[Boolean] = None, stem: Option[Boolean] = None,
      stemmer: Option[String] = None,
      oTokenizer: Option[String] = None): AnalysisConf =
    AnalysisConf.resolve(tokenizer, cs, fold, stem, stemmer,
      oTokenizer, None, None, None, None)

  test("field name construction (text_analysis_test.clj:5-22)") {
    assert(conf().fieldName == "text.standard-tokenizer")
    assert(conf(cs = Some(true)).fieldName == "text.standard-tokenizer")
    assert(conf(cs = Some(false)).fieldName == "text.standard-tokenizer.lowercased")
    assert(conf(fold = Some(true)).fieldName == "text.standard-tokenizer.ascii-folded")
    assert(conf(stem = Some(true)).fieldName == "text.standard-tokenizer.stemmed-english")
    assert(conf(stem = Some(true), stemmer = Some("lithuanian")).fieldName ==
      "text.standard-tokenizer.stemmed-lithuanian")
    assert(conf(fold = Some(true), cs = Some(false), stem = Some(true),
      stemmer = Some("lithuanian")).fieldName ==
      "text.standard-tokenizer.ascii-folded-lowercased-stemmed-lithuanian")
  }

  test("token streams (text_analysis_test.clj:24-46)") {
    val txt = "These are tests."
    def terms(c: AnalysisConf) = Analyzer.terms(c, txt).toSeq
    assert(terms(conf(cs = Some(true))) == Seq("These", "are", "tests"))
    assert(terms(conf(cs = Some(false))) == Seq("these", "are", "tests"))
    assert(terms(conf(cs = Some(false), fold = Some(true))) == Seq("these", "are", "tests"))
    assert(terms(conf(cs = Some(false), fold = Some(true), stem = Some(true))) ==
      Seq("these", "are", "test"))
    // "surprising but correct": whitespace tokenizer keeps the dot; the
    // stemmer leaves "tests." alone
    assert(terms(conf(cs = Some(false), fold = Some(true), stem = Some(true),
      oTokenizer = Some("whitespace"))) == Seq("these", "are", "tests."))
  }

  test("standard tokenizer offsets and splitting") {
    val toks = Tokenizers.standardLike("before annotated test-test.", classic = false)
    assert(toks.map(_.term).toSeq == Seq("before", "annotated", "test", "test"))
    val t2 = toks(2)
    assert("before annotated test-test.".substring(t2.begin, t2.end) == "test")
    // apostrophes join letters
    assert(Tokenizers.standardLike("don't stop", classic = false).map(_.term).toSeq ==
      Seq("don't", "stop"))
    // interior dots join letters (hostnames), trailing dot dropped
    assert(Tokenizers.standardLike("visit example.com.", classic = false).map(_.term).toSeq ==
      Seq("visit", "example.com"))
    // digits keep . and ,
    assert(Tokenizers.standardLike("pi is 3.14", classic = false).map(_.term).toSeq ==
      Seq("pi", "is", "3.14"))
  }

  test("classic tokenizer: the published grammar's token alternatives") {
    def toks(s: String) = Tokenizers.classicTokens(s).map(_.term).toSeq
    // COMPANY: letters joined by a single & or @
    assert(toks("call AT&T today") == Seq("call", "AT&T", "today"))
    assert(toks("Excite@Home era") == Seq("Excite@Home", "era"))
    // EMAIL: local part with ._- and a dotted domain
    assert(toks("mail bob.smith_2@ex-a.com now") ==
      Seq("mail", "bob.smith_2@ex-a.com", "now"))
    // ACRONYM keeps its dots at the tokenizer level (ClassicFilter's job)
    assert(toks("the I.B.M. way") == Seq("the", "I.B.M.", "way"))
    // HOST
    assert(toks("visit example.com.") == Seq("visit", "example.com"))
    // NUM: alternating alphanum/separator chains with digits every
    // other segment; letters-only chains split
    assert(toks("pi is 3.14") == Seq("pi", "is", "3.14"))
    assert(toks("serial 1-2b-3 ok") == Seq("serial", "1-2b-3", "ok"))
    assert(toks("a 1/2 cup") == Seq("a", "1/2", "cup"))
    assert(toks("test-test.") == Seq("test", "test"))
    // APOSTROPHE: letters only
    assert(toks("don't stop O'Brien's") == Seq("don't", "stop", "O'Brien's"))
    // CJK chars come out one per token; Hangul is alphanum
    assert(toks("学习 spark 한국어") == Seq("学", "习", "spark", "한국어"))
    // offsets survive
    val off = Tokenizers.classicTokens("x AT&T y")
    assert("x AT&T y".substring(off(1).begin, off(1).end) == "AT&T")
    // the bare-chain ClassicFilter still strips acronym dots and 's
    assert(Filters.classicFilter("I.B.M.", "classic") == "IBM")
    assert(Filters.classicFilter("O'Brien's", "classic") == "O'Brien")
  }

  test("whitespace / letter / keyword / strict tokenizers") {
    assert(Tokenizers.whitespace("a  b\tc", unicode = false).map(_.term).toSeq == Seq("a", "b", "c"))
    assert(Tokenizers.letter("ab1cd").map(_.term).toSeq == Seq("ab", "cd"))
    assert(Tokenizers.keyword("a b").map(_.term).toSeq == Seq("a b"))
    assert(Tokenizers.keyword("a b").head.end == 3)
    assert(Tokenizers.strict("[URGENT!] (now)").map(_.term).toSeq == Seq("[URGENT", "]", "(now)"))
  }

  test("filters") {
    assert(Filters.lowercase("TeSt") == "test")
    assert(Filters.asciiFold("wörd") == "word")
    assert(Filters.asciiFold("schön") == "schon")
    assert(Filters.asciiFold("Straße") == "Strasse")
    assert(Filters.asciiFold("ascii") == "ascii")
  }

  test("english stemmer (Porter2)") {
    val cases = Map(
      "tests" -> "test", "dogs" -> "dog", "plays" -> "play",
      "phrases" -> "phrase", "phrase" -> "phrase",
      "running" -> "run", "easily" -> "easili", "national" -> "nation",
      "nationalization" -> "nation", "caresses" -> "caress",
      "ties" -> "tie", "cries" -> "cri", "hopping" -> "hop",
      "hoped" -> "hope", "sky" -> "sky", "news" -> "news",
      "tests." -> "tests.")
    cases.foreach { case (in, want) =>
      assert(EnglishStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("lithuanian stemmer subset") {
    assert(LithuanianStemmer.stem("Kaunas") == LithuanianStemmer.stem("Kauno"))
    assert(LithuanianStemmer.stem("kauno") == "kaun")
    assert(LithuanianStemmer.stem("Sabonis") == LithuanianStemmer.stem("Saboniai"))
  }

  test("tokenizer offset properties on the phrases.html fixture") {
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/phrases.html")),
      java.nio.charset.StandardCharsets.UTF_8)
    val names = Seq("standard", "classic", "whitespace", "unicode-whitespace",
      "letter", "strict", "keyword")
    for (name <- names) {
      val toks = Tokenizers.tokenize(name, html)
      assert(toks.nonEmpty, s"$name produced no tokens")
      var prevPos = -1
      toks.foreach { t =>
        // offsets in-bounds, non-empty, and term == the document substring
        assert(t.begin >= 0 && t.end <= html.length && t.begin < t.end,
          s"$name: bad offsets $t")
        assert(t.term == html.substring(t.begin, t.end),
          s"$name: term '${t.term}' != substring '${html.substring(t.begin, t.end)}'")
        assert(t.pos > prevPos, s"$name: positions not increasing at $t")
        prevPos = t.pos
      }
      // tokens do not overlap and appear left-to-right
      toks.sliding(2).foreach {
        case Array(a, b) => assert(a.end <= b.begin, s"$name: overlap $a $b")
        case _           =>
      }
    }
    // keyword = entire text as one token
    val kw = Tokenizers.tokenize("keyword", html)
    assert(kw.length == 1 && kw(0).begin == 0 && kw(0).end == html.length)
    // golden spot-checks on a corner-case line with markup, entities, digits
    val line = """<td class="colLast"><code>protected&nbsp;abstract T&nbsp;</code></td>"""
    assert(Tokenizers.tokenize("standard", line).map(_.term).toSeq ==
      Seq("td", "class", "colLast", "code", "protected", "nbsp", "abstract",
        "T", "nbsp", "code", "td"))
    assert(Tokenizers.tokenize("letter", line).map(_.term).toSeq ==
      Seq("td", "class", "colLast", "code", "protected", "nbsp", "abstract",
        "T", "nbsp", "code", "td"))
    assert(Tokenizers.tokenize("whitespace", line).map(_.term).toSeq ==
      Seq("<td", "class=\"colLast\"><code>protected&nbsp;abstract",
        "T&nbsp;</code></td>"))
  }

  test("multi-language suffix stemmers: inflection equivalence classes") {
    def eqv(lang: String, a: String, b: String): Unit = {
      val st = Stemmers.forName(lang)
      assert(st.stem(a) == st.stem(b), s"$lang: $a vs $b -> ${st.stem(a)} vs ${st.stem(b)}")
    }
    eqv("french", "maisons", "maison")
    eqv("german", "häuser", "haus")
    eqv("german", "straße", "strasse")
    eqv("spanish", "gatos", "gato")
    eqv("portuguese", "gatos", "gato")
    eqv("italian", "gatti", "gatto")
    eqv("dutch", "katten", "kat")
    eqv("danish", "hunden", "hund")
    eqv("norwegian", "hunden", "hund")
    eqv("swedish", "flickorna", "flicka")
    eqv("russian", "книги", "книга")
    eqv("turkish", "evlerin", "evler")
    // estonian must NOT conflate English plurals (reference-pinned)
    val et = Stemmers.forName("estonian")
    assert(et.stem("dogs") != et.stem("dog"))
    // every snowball name resolves without error and is idempotent-safe
    Stemmers.snowballNames.foreach { n =>
      val st = Stemmers.forName(n)
      assert(st.stem("test") != null && st.stem("") == "")
    }
  }
}
