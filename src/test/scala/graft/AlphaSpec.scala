package graft

import graft.dict.{DictionaryEntry => DE, HighlighterOpts => HO}
import graft.engine.LuceneAlpha.AlphaAnnotator
import org.scalatest.funsuite.AnyFunSuite

/** Port of `lucene_alpha_test.clj` + grammar-subset checks. */
class AlphaSpec extends AnyFunSuite {

  test("AND query (lucene_alpha_test.clj:6-16)") {
    val ann = new AlphaAnnotator(Seq(DE("this AND that", id = Some("1"))))
    val a1 = ann.annotate("this that")
    assert(a1.size == 1)
    assert(a1.head.dictEntryId == "1")
    assert(a1.head.annType == "QUERY")
    assert(a1.head.text == "this AND that")
    assert(ann.annotate("this only").isEmpty)
  }

  test("regex query (lucene_alpha_test.clj:18-28)") {
    val ann = new AlphaAnnotator(Seq(DE("/.*\\d*.*/", id = Some("1"))))
    assert(ann.annotate("this that 42").nonEmpty)
  }

  test("OR default, NOT, parens, quoted phrase") {
    val ann = new AlphaAnnotator(Seq(DE("alpha beta", id = Some("or"))))
    assert(ann.annotate("has alpha only").size == 1)
    assert(ann.annotate("nothing here").isEmpty)

    val ann2 = new AlphaAnnotator(Seq(DE("alpha AND NOT beta", id = Some("n"))))
    assert(ann2.annotate("alpha gamma").size == 1)
    assert(ann2.annotate("alpha beta").isEmpty)

    val ann3 = new AlphaAnnotator(Seq(DE("(alpha OR beta) AND gamma", id = Some("p"))))
    assert(ann3.annotate("beta gamma").size == 1)
    assert(ann3.annotate("beta delta").isEmpty)

    val ann4 = new AlphaAnnotator(Seq(DE("\"big data\"", id = Some("q"))))
    assert(ann4.annotate("the big data world").size == 1)
    assert(ann4.annotate("big blue data").isEmpty)
  }

  test("negated clause in OR position is MUST_NOT (Lucene semantics)") {
    // 'apple -banana' == apple AND NOT banana, NOT 'apple OR NOT banana'
    val ann = new AlphaAnnotator(Seq(DE("apple -banana", id = Some("n1"))))
    assert(ann.annotate("apple pie").size == 1)
    assert(ann.annotate("apple banana").isEmpty)
    assert(ann.annotate("cherry pie").isEmpty) // neither term: no match
    val ann2 = new AlphaAnnotator(Seq(DE("apple NOT banana", id = Some("n2"))))
    assert(ann2.annotate("apple pie").size == 1)
    assert(ann2.annotate("cherry pie").isEmpty)
    // pure negative matches nothing
    val ann3 = new AlphaAnnotator(Seq(DE("-banana", id = Some("n3"))))
    assert(ann3.annotate("apple pie").isEmpty)
  }

  test("wildcard terms") {
    val ann = new AlphaAnnotator(Seq(DE("te?t AND wor*", id = Some("w"))))
    assert(ann.annotate("test word").size == 1)
    assert(ann.annotate("text works").size == 1)
    assert(ann.annotate("toast word").isEmpty)
    val ci = new AlphaAnnotator(Seq(DE("TE*", id = Some("c"), caseSensitive = Some(false))))
    assert(ci.annotate("test").size == 1)
  }

  test("type from entry, blank guard") {
    val ann = new AlphaAnnotator(Seq(DE("x", id = Some("1"), entryType = Some("T"))),
      HO(typeName = Some("QQ")))
    assert(ann.annotate("x y").head.annType == "T")
    assert(ann.annotate("  ").isEmpty)
  }

  test("fuzzy term: word~N, bare ~, cap at 2, ~0 exact") {
    val ann = new AlphaAnnotator(Seq(DE("spark~1", id = Some("f"))))
    assert(ann.annotate("uses spark here").size == 1)
    assert(ann.annotate("uses spork here").size == 1)  // substitution
    assert(ann.annotate("uses sprak here").size == 1)  // transposition = 1 (OSA)
    assert(ann.annotate("uses spoork here").isEmpty)   // 2 edits > 1
    val bare = new AlphaAnnotator(Seq(DE("spark~", id = Some("b"))))
    assert(bare.annotate("uses spoork here").size == 1) // bare ~ = 2
    val capped = new AlphaAnnotator(Seq(DE("spark~9", id = Some("c"))))
    assert(capped.annotate("uses spoork here").size == 1)  // capped to 2
    assert(capped.annotate("uses zzzzz here").isEmpty)
    val exact = new AlphaAnnotator(Seq(DE("spark~0", id = Some("e"))))
    assert(exact.annotate("uses spork here").isEmpty)
    assert(exact.annotate("uses spark here").size == 1)
  }

  test("sloppy phrase: \"a b\"~N") {
    val ann = new AlphaAnnotator(Seq(DE("\"hash join\"~2", id = Some("s"))))
    assert(ann.annotate("a hash join b").size == 1)       // exact
    assert(ann.annotate("a hash fast join b").size == 1)  // one gap = 1
    assert(ann.annotate("a join hash b").size == 1)       // transposition = 2
    assert(ann.annotate("a hash x y z join b").isEmpty)   // 3 gaps > 2
    assert(ann.annotate("a hash b").isEmpty)              // missing term
    val tight = new AlphaAnnotator(Seq(DE("\"hash join\"~1", id = Some("t"))))
    assert(tight.annotate("a join hash b").isEmpty)       // transposition needs 2
    assert(tight.annotate("a hash fast join b").size == 1)
  }

  test("field-prefixed queries resolve against dictionary field names") {
    // default conf field name: text.standard-tokenizer (case-sensitive)
    val ok = new AlphaAnnotator(Seq(DE("text.standard-tokenizer:spark", id = Some("k"))))
    assert(ok.annotate("runs spark here").size == 1)
    assert(ok.annotate("runs flink here").isEmpty)
    val unknown = new AlphaAnnotator(Seq(DE("title:spark", id = Some("u"))))
    assert(unknown.annotate("runs spark here").isEmpty) // no such field in the doc
    val phrase = new AlphaAnnotator(Seq(
      DE("text.standard-tokenizer:\"hash join\"", id = Some("p"))))
    assert(phrase.annotate("a hash join b").size == 1)
    assert(phrase.annotate("a join hash b").isEmpty)
    // field of ANOTHER entry's conf is addressable (doc carries all fields)
    val cross = new AlphaAnnotator(Seq(
      DE("Spark", id = Some("cs")), // case-sensitive conf: term must match exactly
      DE("text.standard-tokenizer.lowercased:spark AND flink",
        id = Some("x"), caseSensitive = Some(false))))
    assert(cross.annotate("SPARK and Flink").map(_.dictEntryId) == Seq("x"))
  }

  test("term ranges: [a TO b], {a TO b}, open ends, field prefix") {
    val incl = new AlphaAnnotator(Seq(DE("[apple TO cherry]", id = Some("i"))))
    assert(incl.annotate("a banana here").size == 1)
    assert(incl.annotate("the cherry too").size == 1)    // inclusive bound
    assert(incl.annotate("only dates left").isEmpty)     // above range
    val excl = new AlphaAnnotator(Seq(DE("{apple TO cherry}", id = Some("e"))))
    assert(excl.annotate("a banana here").size == 1)
    assert(excl.annotate("the cherry too").isEmpty)      // exclusive bound
    assert(excl.annotate("an apple too").isEmpty)
    val mixed = new AlphaAnnotator(Seq(DE("[apple TO cherry}", id = Some("m"))))
    assert(mixed.annotate("an apple too").size == 1)
    assert(mixed.annotate("the cherry too").isEmpty)
    val open = new AlphaAnnotator(Seq(DE("[m TO *]", id = Some("o"))))
    assert(open.annotate("zebra crossing").size == 1)
    assert(open.annotate("a b c").isEmpty)
    // ranges compose with booleans and fields
    val combo = new AlphaAnnotator(Seq(
      DE("spark AND [h TO j]", id = Some("c")),
      DE("text.standard-tokenizer:[h TO j]", id = Some("f"))))
    assert(combo.annotate("spark impala").map(_.dictEntryId).sorted == Seq("c", "f"))
    assert(combo.annotate("impala only").map(_.dictEntryId) == Seq("f"))
    assert(combo.annotate("spark zoo").isEmpty)
    // case normalization of endpoints follows the conf
    val ci = new AlphaAnnotator(Seq(
      DE("[Apple TO Cherry]", id = Some("ci"), caseSensitive = Some(false))))
    assert(ci.annotate("A BANANA here").size == 1)
  }

  test("boosts parse and are ignored (match/no-match annotator)") {
    val ann = new AlphaAnnotator(Seq(
      DE("spark^2", id = Some("t")),
      DE("\"hash join\"^3", id = Some("p")),
      DE("(spark OR flink)^0.5", id = Some("g")),
      DE("\"fast join\"~2^3", id = Some("sp")),
      DE("sprak~1^4", id = Some("fz"))))
    assert(ann.annotate("spark hash join fast x join sprak")
      .map(_.dictEntryId).sorted == Seq("fz", "g", "p", "sp", "t"))
    assert(ann.annotate("nothing relevant").isEmpty)
  }

  test("backslash escapes neutralize special characters") {
    // escaped wildcard is a literal: term "2*3" only matches itself
    val lit = new AlphaAnnotator(Seq(DE("2\\*3", id = Some("w"))))
    assert(lit.annotate("calc 2*3 now").size == 1)
    assert(lit.annotate("calc 243 now").isEmpty) // not a wildcard
    // escaped colon is part of the term, not a field separator
    val col = new AlphaAnnotator(Seq(DE("re\\:do", id = Some("c"))))
    assert(col.annotate("we re:do it").size == 1)
    // escaped quote chars inside a word
    val par = new AlphaAnnotator(Seq(DE("a\\(b", id = Some("p"))))
    assert(par.annotate("see a(b here").size == 1)
  }
}
