package graft.analysis

/** Offset-preserving token.
  *
  * Mirrors the information Lucene attaches to a token that the reference
  * engine relies on (term text + char offsets + position):
  * reference `phrases.clj:103-108` (offsets + term vectors stored).
  *
  * @param term  analyzed term text (filters rewrite this, never offsets)
  * @param begin char offset into the original text, inclusive
  * @param end   char offset, exclusive (text.substring(begin, end) is the
  *              ORIGINAL surface form, not `term`)
  * @param pos   token position (0-based, consecutive)
  */
final case class Token(term: String, begin: Int, end: Int, pos: Int)

/** Analysis configuration after three-way defaulting.
  * Reference: `text_analysis.clj:101-108` (`default-conf` + `Conf`).
  */
final case class AnalysisConf(
    tokenizer: String,
    caseSensitive: Boolean,
    asciiFold: Boolean,
    stem: Boolean,
    stemmer: String) {

  /** Canonical field name for this config — the key under which a document
    * is tokenized once and shared by all dictionary entries with the same
    * config. Reference: `text_analysis.clj:84-96` + golden values in
    * `text_analysis_test.clj:5-22`.
    */
  lazy val fieldName: String = {
    val tk = s"$tokenizer-tokenizer"
    val filters = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!caseSensitive) filters += "lowercased"
    if (asciiFold) filters += "ascii-folded"
    if (stem) filters += s"stemmed-$stemmer"
    if (filters.nonEmpty) s"text.$tk.${filters.sorted.mkString("-")}"
    else s"text.$tk"
  }
}

object AnalysisConf {
  val DefaultTokenizer = "standard"
  val DefaultStemmer = "english"

  /** `default-conf` of the reference (`text_analysis.clj:101-106`). */
  val default: AnalysisConf =
    AnalysisConf(DefaultTokenizer, caseSensitive = true, asciiFold = false,
      stem = false, stemmer = DefaultStemmer)

  /** Three-way merge: entry-level > highlighter-level > defaults, per key;
    * None means "inherit". Reference: `text_analysis.clj:110-126`.
    */
  def resolve(
      tokenizer: Option[String], caseSensitive: Option[Boolean],
      asciiFold: Option[Boolean], stem: Option[Boolean],
      stemmer: Option[String],
      optsTokenizer: Option[String], optsCaseSensitive: Option[Boolean],
      optsAsciiFold: Option[Boolean], optsStem: Option[Boolean],
      optsStemmer: Option[String]): AnalysisConf =
    AnalysisConf(
      tokenizer.orElse(optsTokenizer).getOrElse(DefaultTokenizer),
      caseSensitive.orElse(optsCaseSensitive).getOrElse(true),
      asciiFold.orElse(optsAsciiFold).getOrElse(false),
      stem.orElse(optsStem).getOrElse(false),
      stemmer.orElse(optsStemmer).getOrElse(DefaultStemmer))
}

/** Native tokenizers replacing the Lucene ones used by the reference
  * (`text_analysis.clj:51-63`). All preserve character offsets.
  */
object Tokenizers {

  /** Dispatch like the reference `tokenizer` fn: unknown names fall back
    * to standard (`text_analysis.clj:60-63`).
    */
  def tokenize(name: String, text: String): Array[Token] = name match {
    case "keyword"            => keyword(text)
    case "letter"             => letter(text)
    case "classic"            => classicTokens(text)
    case "strict"             => strict(text)
    case "unicode-whitespace" => whitespace(text, unicode = true)
    case "whitespace"         => whitespace(text, unicode = false)
    case _                    => standardLike(text, classic = false)
  }

  /** Whole input = one token (Lucene KeywordTokenizer). */
  def keyword(text: String): Array[Token] =
    if (text.isEmpty) Array.empty
    else Array(Token(text, 0, text.length, 0))

  /** Runs of Character.isLetter (Lucene LetterTokenizer). */
  def letter(text: String): Array[Token] =
    runs(text, c => Character.isLetter(c))

  /** Split on whitespace (Lucene WhitespaceTokenizer uses
    * Character.isWhitespace; the Unicode variant also treats the
    * White_Space-property-only chars NBSP etc. as separators).
    */
  def whitespace(text: String, unicode: Boolean): Array[Token] = {
    def isWs(c: Char): Boolean =
      Character.isWhitespace(c) ||
        (unicode && (c == ' ' || c == ' ' || c == ' ' || c == ''))
    runs(text, c => !isWs(c))
  }

  /** PatternTokenizer with the reference's "strict" separator pattern
    * `[^a-zA-Z0-9{}\[\]()<>#+=@&']+` (`text_analysis.clj:57`): tokens are
    * maximal runs of the allowed characters.
    */
  def strict(text: String): Array[Token] = {
    def allowed(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') ||
        "{}[]()<>#+=@&'".indexOf(c.toInt) >= 0
    runs(text, allowed)
  }

  /** Approximation of Lucene's UAX#29 StandardTokenizer: maximal runs of
    * letters/digits/marks/underscore, with mid-token joiners kept when
    * surrounded by alphanumerics — apostrophes and '.'/':' between
    * letters, '.'/',' between digits. Close enough for the reference's
    * pinned behaviors: "test-test" → [test, test], "don't" → [don't],
    * trailing punctuation dropped. (The `classic` tokenizer has its own
    * exact grammar implementation in [[classicTokens]]; the `classic`
    * flag here only survives for the legacy approximation tests.)
    */
  def standardLike(text: String, classic: Boolean): Array[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    val n = text.length
    var i = 0
    var pos = 0
    def isTokChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || Character.getType(c) == Character.NON_SPACING_MARK || c == '_'
    def isLetterish(c: Char): Boolean = Character.isLetter(c)
    while (i < n) {
      if (isTokChar(text.charAt(i))) {
        val start = i
        var j = i
        var continue = true
        while (continue) {
          while (j < n && isTokChar(text.charAt(j))) j += 1
          continue = false
          if (j < n && j + 1 < n && isTokChar(text.charAt(j + 1))) {
            val sep = text.charAt(j)
            val prev = text.charAt(j - 1)
            val next = text.charAt(j + 1)
            val joins =
              ((sep == '\'' || sep == '’') && isLetterish(prev) && isLetterish(next)) ||
                ((sep == '.' || sep == ':') && isLetterish(prev) && isLetterish(next)) ||
                ((sep == '.' || sep == ',') && Character.isDigit(prev) && Character.isDigit(next)) ||
                (classic && sep == '-' &&
                  (Character.isDigit(prev) || Character.isDigit(next)))
            if (joins) { j += 1; continue = true }
          }
        }
        out += Token(text.substring(start, j), start, j, pos)
        pos += 1
        i = j
      } else i += 1
    }
    out.toArray
  }

  /** Lucene ClassicTokenizer, implemented from its published grammar
    * (the pre-UAX#29 StandardTokenizer rules): maximal-munch over
    * ALPHANUM | APOSTROPHE | ACRONYM | COMPANY | EMAIL | HOST | NUM | CJ,
    * ties broken in that order. NUM is an alternating chain of alphanum
    * segments over [_\-/.,] separators where every other segment
    * contains a digit; CJK chars tokenize one per token; Hangul counts
    * as alphanum. Acronym-dot and possessive-'s stripping live in
    * ClassicFilter (the bare-chain quirk), not here.
    */
  def classicTokens(text: String): Array[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    val n = text.length
    @inline def isCJ(c: Char): Boolean =
      (c >= '㄀' && c <= 'ㄯ') || (c >= '぀' && c <= 'ゟ') ||
        (c >= '゠' && c <= 'ヿ') || (c >= 'ㇰ' && c <= 'ㇿ') ||
        (c >= '㋐' && c <= '㍗') || (c >= '㐀' && c <= '䶿') ||
        (c >= '一' && c <= '鿿') || (c >= '豈' && c <= '﫿') ||
        (c >= '･' && c <= 'ﾟ')
    @inline def isL(c: Char): Boolean = Character.isLetter(c) && !isCJ(c)
    @inline def isAN(c: Char): Boolean =
      (Character.isLetter(c) || Character.isDigit(c)) && !isCJ(c)
    @inline def isP(c: Char): Boolean =
      c == '_' || c == '-' || c == '/' || c == '.' || c == ','

    def anRun(from: Int): Int = {
      var j = from; while (j < n && isAN(text.charAt(j))) j += 1; j - from
    }
    def lRun(from: Int): Int = {
      var j = from; while (j < n && isL(text.charAt(j))) j += 1; j - from
    }
    def hasDigit(from: Int, len: Int): Boolean = {
      var j = from; val e = from + len
      while (j < e) { if (Character.isDigit(text.charAt(j))) return true; j += 1 }
      false
    }

    // each matcher returns the match length at `i` (0 = no match)
    def apostrophe(i: Int): Int = {
      val l0 = lRun(i); if (l0 == 0) return 0
      var j = i + l0; var groups = 0
      while (j < n && text.charAt(j) == '\'' && j + 1 < n && isL(text.charAt(j + 1))) {
        j += 1 + lRun(j + 1); groups += 1
      }
      if (groups >= 1) j - i else 0
    }
    def acronym(i: Int): Int = {
      // (single letter, dot) pairs; singleness is enforced by the dot
      // having to follow immediately
      var j = i; var dots = 0
      while (j + 1 < n && isL(text.charAt(j)) && text.charAt(j + 1) == '.') {
        j += 2; dots += 1
      }
      if (dots >= 2) j - i else 0
    }
    def company(i: Int): Int = {
      val l0 = lRun(i); if (l0 == 0) return 0
      val j = i + l0
      if (j < n && (text.charAt(j) == '&' || text.charAt(j) == '@')) {
        val l1 = lRun(j + 1)
        if (l1 > 0) l0 + 1 + l1 else 0
      } else 0
    }
    def email(i: Int): Int = {
      var j = i + anRun(i); if (j == i) return 0
      var ok = true
      while (ok && j + 1 < n && (text.charAt(j) == '.' || text.charAt(j) == '-' ||
        text.charAt(j) == '_') && isAN(text.charAt(j + 1))) {
        val r = anRun(j + 1); if (r == 0) ok = false else j += 1 + r
      }
      if (j >= n || text.charAt(j) != '@') return 0
      j += 1
      val d0 = anRun(j); if (d0 == 0) return 0
      j += d0
      var domDots = 0
      while (j + 1 < n && (text.charAt(j) == '.' || text.charAt(j) == '-') &&
        isAN(text.charAt(j + 1))) {
        j += 1 + anRun(j + 1); domDots += 1
      }
      if (domDots >= 1) j - i else 0
    }
    def host(i: Int): Int = {
      val a0 = anRun(i); if (a0 == 0) return 0
      var j = i + a0; var segs = 0
      while (j + 1 < n && text.charAt(j) == '.' && isAN(text.charAt(j + 1))) {
        j += 1 + anRun(j + 1); segs += 1
      }
      if (segs >= 1) j - i else 0
    }
    def num(i: Int): Int = {
      // maximal alternating chain seg0 P seg1 P ... of alphanum runs
      val segStart = scala.collection.mutable.ArrayBuffer.empty[Int]
      val segLen = scala.collection.mutable.ArrayBuffer.empty[Int]
      var j = i
      var r = anRun(j)
      while (r > 0) {
        segStart += j; segLen += r; j += r
        r = if (j + 1 < n && isP(text.charAt(j)) && isAN(text.charAt(j + 1))) {
          j += 1; anRun(j)
        } else 0
      }
      if (segLen.length < 2) return 0
      // longest prefix (>= 2 segments) where every other segment has a
      // digit — either all odd-indexed or all even-indexed
      var best = 0
      var k = segLen.length
      while (k >= 2 && best == 0) {
        var oddOk = true; var evenOk = true
        var s = 0
        while (s < k) {
          val hd = hasDigit(segStart(s), segLen(s))
          if (!hd) { if (s % 2 == 1) oddOk = false else evenOk = false }
          s += 1
        }
        if (oddOk || evenOk) best = segStart(k - 1) + segLen(k - 1) - i
        k -= 1
      }
      best
    }

    var i = 0
    var pos = 0
    while (i < n) {
      val c = text.charAt(i)
      if (isCJ(c)) {
        out += Token(text.substring(i, i + 1), i, i + 1, pos); pos += 1; i += 1
      } else if (isAN(c)) {
        // longest match wins; ties go to the earlier-listed rule
        val cands = Array(anRun(i), apostrophe(i), acronym(i), company(i),
          email(i), host(i), num(i))
        var len = 0
        var b = 0
        while (b < cands.length) { if (cands(b) > len) len = cands(b); b += 1 }
        out += Token(text.substring(i, i + len), i, i + len, pos)
        pos += 1
        i += len
      } else i += 1
    }
    out.toArray
  }

  private def runs(text: String, keep: Char => Boolean): Array[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    var i = 0
    var pos = 0
    val n = text.length
    while (i < n) {
      if (keep(text.charAt(i))) {
        val start = i
        while (i < n && keep(text.charAt(i))) i += 1
        out += Token(text.substring(start, i), start, i, pos)
        pos += 1
      } else i += 1
    }
    out.toArray
  }
}

/** Token filters replacing the Lucene filter chain
  * (`text_analysis.clj:65-82`). Filters rewrite `term` only; offsets are
  * untouched so annotations always report original document substrings.
  */
object Filters {

  /** Codepoint-wise lowercase (Lucene LowerCaseFilter semantics). */
  def lowercase(s: String): String = {
    var i = 0
    val n = s.length
    var changed = false
    while (i < n && !changed) { if (Character.isUpperCase(s.charAt(i)) || Character.isTitleCase(s.charAt(i))) changed = true else i += 1 }
    if (!changed) s
    else {
      val sb = new java.lang.StringBuilder(n)
      var j = 0
      while (j < n) {
        val cp = s.codePointAt(j)
        sb.appendCodePoint(Character.toLowerCase(cp))
        j += Character.charCount(cp)
      }
      sb.toString
    }
  }

  /** ASCII folding (Lucene ASCIIFoldingFilter): NFD-decompose, strip
    * combining marks, plus the special Latin mappings NFD can't reach.
    */
  def asciiFold(s: String): String = {
    var ascii = true
    var i = 0
    while (i < s.length && ascii) { if (s.charAt(i) >= 0x80) ascii = false else i += 1 }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val c = nfd.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        if (c < 0x80) sb.append(c)
        else c match {
          case 'Æ' => sb.append("AE"); case 'æ' => sb.append("ae")
          case 'Ø' => sb.append('O');  case 'ø' => sb.append('o')
          case 'Þ' => sb.append("TH"); case 'þ' => sb.append("th")
          case 'Ð' => sb.append('D');  case 'ð' => sb.append('d')
          case 'ß' => sb.append("ss")
          case 'Œ' => sb.append("OE"); case 'œ' => sb.append("oe")
          case 'Ł' => sb.append('L');  case 'ł' => sb.append('l')
          case 'Đ' => sb.append('D');  case 'đ' => sb.append('d')
          case 'ı' => sb.append('i');  case 'İ' => sb.append('I')
          case other => sb.append(other)
        }
      }
      j += 1
    }
    sb.toString
  }

  /** ClassicFilter quirk: the reference applies a ClassicFilter when the
    * chain is "bare" (case-sensitive, no fold, no stem) —
    * `text_analysis.clj:78-80`. For non-classic tokenizers its only
    * observable effect is stripping trailing possessive "'s"; acronym
    * dot-stripping applies only to ClassicTokenizer acronym tokens.
    * Observed: bare whitespace chain keeps "tests." intact
    * (`text_analysis_test.clj:41-46`).
    */
  def classicFilter(term: String, tokenizerName: String): String = {
    var t = term
    if (t.length >= 2 && (t.endsWith("'s") || t.endsWith("’s")))
      t = t.substring(0, t.length - 2)
    if (tokenizerName == "classic" && isAcronym(t)) t = t.replace(".", "")
    t
  }

  private def isAcronym(t: String): Boolean =
    t.length >= 3 && t.indexOf('.') >= 0 &&
      t.forall(c => Character.isLetter(c) || c == '.') &&
      !t.contains("..") && t.count(_ == '.') >= 1 &&
      t.split('.').forall(p => p.length == 1)
}

/** The full analyzer: tokenizer → lowercase? → asciifold? → stem? with the
  * reference's bare-chain ClassicFilter quirk. Reference:
  * `text_analysis.clj:65-82`.
  */
object Analyzer {

  /** JVM-wide stem memo keyed (stemmer, input term): stemming is the
    * dominant per-token cost (measured ~4.6k docs/s stem-only vs ~57k
    * slop-0-only on 120-token docs) and corpora are zipfian, so most
    * lookups hit. Bounded: stops inserting at the cap rather than
    * evicting; stemming is pure, so races are benign.
    */
  private val stemMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val StemMemoCap = 1 << 20

  private def memoStem(stemmerName: String, term: String): String = {
    // length-prefixed: keyword-tokenized terms may contain any separator
    // char, so a plain concat could alias two different (stemmer, term)
    // pairs and poison the cache
    val key = new java.lang.StringBuilder(stemmerName.length + term.length + 8)
      .append(stemmerName.length).append(':')
      .append(stemmerName).append(term).toString
    var out = stemMemo.get(key)
    if (out == null) {
      out = Stemmers.forName(stemmerName).stem(term)
      if (stemMemo.size < StemMemoCap) stemMemo.put(key, out)
    }
    out
  }

  def analyze(conf: AnalysisConf, text: String): Array[Token] = {
    val raw = Tokenizers.tokenize(conf.tokenizer, text)
    val bareChain = conf.caseSensitive && !conf.asciiFold && !conf.stem
    if (raw.isEmpty) return raw
    val stemmer: String => String =
      if (conf.stem) memoStem(conf.stemmer, _) else identity
    var i = 0
    val out = new Array[Token](raw.length)
    while (i < raw.length) {
      val t = raw(i)
      var term = t.term
      if (!conf.caseSensitive) term = Filters.lowercase(term)
      if (conf.asciiFold) term = Filters.asciiFold(term)
      if (conf.stem) term = stemmer(term)
      else if (bareChain) term = Filters.classicFilter(term, conf.tokenizer)
      out(i) = if (term eq t.term) t else t.copy(term = term)
      i += 1
    }
    out
  }

  /** Analyze into term strings only — used on dictionary phrases at
    * compile time (`text_analysis.clj:136-148`, `phrases.clj:142-144`).
    */
  def terms(conf: AnalysisConf, text: String): Array[String] =
    analyze(conf, text).map(_.term)
}
