package graft.engine

import graft.analysis.{AnalysisConf, Analyzer}
import graft.dict.{DictionaryEntry, HighlighterOpts}

import scala.collection.mutable

/** Match/no-match annotator over raw query strings — the reference's
  * `lucene_alpha.clj`: entry `text` is parsed as a Lucene query string and
  * evaluated with `QueryMatch.SIMPLE_MATCHER` (no offsets;
  * `lucene_alpha.clj:18-28`). The subset implemented covers the grammar
  * the reference's tests exercise plus the common core: terms (implicit
  * OR), AND/OR/NOT (and &&/||/!), parentheses, "quoted phrases" with
  * `~slop`, `term~N` fuzzy (OSA, capped at 2), `field:term` /
  * `field:"phrase"` (resolved against the per-conf analyzed field names
  * the reference indexes under), /regex/ terms, wildcards, +/- prefixes,
  * `[a TO b]`/`{a TO b}` term ranges (lexicographic, `*` = open end),
  * `\`-escapes, and `^boost` suffixes. Boosts are parsed and IGNORED:
  * this is a match/no-match annotator (SIMPLE_MATCHER yields no scores),
  * so a boost cannot change any outcome.
  * Unparseable entries are dropped with a log, like the reference's
  * ParseException handler (`lucene_alpha.clj:41-43`).
  */
object LuceneAlpha {

  /** No-offset annotation (`lucene_alpha.clj:22-28`): text is the QUERY
    * string, not a document substring.
    */
  final case class AlphaAnnotation(
      text: String, annType: String, dictEntryId: String, meta: Map[String, String])

  sealed trait Expr extends Serializable
  final case class TermExpr(term: String) extends Expr
  final case class PhraseExpr(terms: Array[String]) extends Expr
  /** `"a b"~N`: sloppy phrase, same acceptance as the MultiPhrase matcher
    * (injective position assignment with max(q)-min(q) <= slop).
    */
  final case class SloppyPhraseExpr(terms: Array[String], slop: Int) extends Expr
  /** `term~N`: fuzzy term, OSA edit distance <= maxEdits (capped at 2
    * like Lucene's FuzzyQuery; bare `~` means 2).
    */
  final case class FuzzyExpr(term: String, maxEdits: Int) extends Expr
  /** `field:...`: evaluated against the named analyzed field — the
    * reference indexes the text under every dictionary conf's field name
    * (`lucene_alpha.clj:18-22`), so a known field name resolves to that
    * conf's token stream and an unknown one never matches.
    */
  final case class FieldExpr(field: String, child: Expr) extends Expr
  /** `[a TO b]` / `{a TO b}` term range: matches when any analyzed term
    * is lexicographically within the bounds (Lucene TermRangeQuery over
    * text fields; endpoints lower-cased per conf, `*`/None = open end).
    */
  final case class RangeExpr(
      low: Option[String], high: Option[String],
      inclLow: Boolean, inclHigh: Boolean) extends Expr
  final case class RegexExpr(pattern: String) extends Expr {
    @transient lazy val compiled: java.util.regex.Pattern = java.util.regex.Pattern.compile(pattern)
  }
  final case class AndExpr(children: Seq[Expr]) extends Expr
  final case class OrExpr(children: Seq[Expr]) extends Expr
  final case class NotExpr(child: Expr) extends Expr

  final case class AlphaQuery(
      queryId: String, queryString: String, conf: AnalysisConf, expr: Expr,
      metadata: Map[String, String]) extends Serializable

  final class AlphaAnnotator(
      dictionary: Seq[DictionaryEntry],
      opts: HighlighterOpts = HighlighterOpts.default) extends Serializable {

    val typeName: String = opts.typeName.filter(_.trim.nonEmpty).getOrElse("QUERY")
    val queries: Array[AlphaQuery] = dictionary.zipWithIndex.flatMap { case (e, i) =>
      try {
        val conf = Compiler.resolveConf(e, opts)
        val metadata = e.entryType.fold(e.meta)(t => e.meta + ("_type" -> t))
        val expr = Parser.parse(e.text, conf)
        Some(AlphaQuery(e.id.getOrElse(i.toString), e.text, conf, expr, metadata))
      } catch {
        case ex: Exception =>
          System.err.println(s"[graft] Failed to parse query: '${e.text}': ${ex.getMessage}")
          None
      }
    }.toArray
    private val confs: Array[AnalysisConf] = queries.map(_.conf).distinct
    locally { // surface field: queries that can never match any doc field
      val known = confs.map(_.fieldName).toSet
      def fields(e: Expr): Seq[String] = e match {
        case FieldExpr(f, c) => f +: fields(c)
        case AndExpr(cs)     => cs.flatMap(fields)
        case OrExpr(cs)      => cs.flatMap(fields)
        case NotExpr(c)      => fields(c)
        case _               => Nil
      }
      for (q <- queries; f <- fields(q.expr) if !known(f))
        System.err.println(
          s"[graft] query '${q.queryString}': field '$f' matches no dictionary field name; clause can never match")
    }

    def annotate(text: String): Seq[AlphaAnnotation] = {
      if (text == null || text.trim.isEmpty) return Nil
      val fields: Map[AnalysisConf, FieldTokens] =
        confs.map(c => c -> FieldTokens(Analyzer.analyze(c, text))).toMap
      // the reference adds the text under EVERY conf's field name, so a
      // field: query can address any dictionary conf's token stream
      val byName: Map[String, FieldTokens] =
        fields.map { case (c, ft) => c.fieldName -> ft }
      queries.toSeq.collect {
        case q if eval(q.expr, fields(q.conf), byName) =>
          AlphaAnnotation(q.queryString,
            q.metadata.getOrElse("_type", typeName), q.queryId, q.metadata)
      }
    }
  }

  private def eval(e: Expr, ft: FieldTokens, byName: Map[String, FieldTokens]): Boolean = e match {
    case TermExpr(t)    => ft.positions.containsKey(t)
    case PhraseExpr(ts) =>
      val first = ft.positions.get(ts.head)
      first != null && first.exists { p =>
        ts.indices.forall { i =>
          val arr = ft.positions.get(ts(i))
          arr != null && java.util.Arrays.binarySearch(arr, p + i) >= 0
        }
      }
    case SloppyPhraseExpr(ts, slop) => sloppyMatch(ts, slop, ft)
    case FuzzyExpr(t, maxE) =>
      val it = ft.positions.keySet().iterator()
      var found = false
      while (!found && it.hasNext) found = Matcher.withinEdits(it.next(), t, maxE)
      found
    case FieldExpr(f, c) =>
      byName.get(f) match {
        case Some(ft2) => eval(c, ft2, byName)
        case None      => false // unknown field: the doc has no such field
      }
    case RangeExpr(lo, hi, il, ih) =>
      val it = ft.positions.keySet().iterator()
      var found = false
      while (!found && it.hasNext) {
        val t = it.next()
        val okLo = lo.forall(l => { val c = t.compareTo(l); if (il) c >= 0 else c > 0 })
        val okHi = hi.forall(h => { val c = t.compareTo(h); if (ih) c <= 0 else c < 0 })
        found = okLo && okHi
      }
      found
    case r: RegexExpr =>
      val it = ft.positions.keySet().iterator()
      var found = false
      while (!found && it.hasNext) found = r.compiled.matcher(it.next()).matches()
      found
    case AndExpr(cs) => cs.forall(eval(_, ft, byName))
    case OrExpr(cs)  => cs.exists(eval(_, ft, byName))
    case NotExpr(c)  => !eval(c, ft, byName)
  }

  /** Sloppy-phrase acceptance, mirroring [[Matcher.matchPhrase]]: an
    * injective assignment of phrase index i -> distinct doc position p_i
    * with max(p_i - i) - min(p_i - i) <= slop (one gap costs 1, an
    * adjacent transposition costs 2).
    */
  private def sloppyMatch(ts: Array[String], slop: Int, ft: FieldTokens): Boolean = {
    val poss = new Array[Array[Int]](ts.length)
    var i = 0
    while (i < ts.length) {
      val a = ft.positions.get(ts(i))
      if (a == null) return false
      poss(i) = a
      i += 1
    }
    def rec(i: Int, used: Set[Int], minQ: Int, maxQ: Int): Boolean = {
      if (i == ts.length) return true
      val arr = poss(i)
      var k = 0
      while (k < arr.length) {
        val p = arr(k)
        if (!used(p)) {
          val q = p - i
          val nMin = math.min(minQ, q)
          val nMax = math.max(maxQ, q)
          if (nMax - nMin <= slop && rec(i + 1, used + p, nMin, nMax)) return true
        }
        k += 1
      }
      false
    }
    rec(0, Set.empty, Int.MaxValue, Int.MinValue)
  }

  /** Recursive-descent parser for the supported query-string subset.
    * AND binds tighter than (implicit/explicit) OR, like Lucene's classic
    * QueryParser.
    */
  object Parser {
    private sealed trait Tok
    private case object LP extends Tok
    private case object RP extends Tok
    private case object AND extends Tok
    private case object OR extends Tok
    private case object NOT extends Tok
    private final case class Word(w: String, negate: Boolean) extends Tok
    private final case class Quoted(s: String, negate: Boolean) extends Tok
    private final case class Regex(p: String, negate: Boolean) extends Tok
    private final case class RangeT(low: String, high: String,
        inclLow: Boolean, inclHigh: Boolean, negate: Boolean) extends Tok

    // `\x` escapes resolve to private-use placeholders for the chars
    // whose meaning inside a word is positional (field colon, wildcards,
    // fuzzy tilde, boost caret); [[unescape]] maps them back after the
    // structure has been decided. Other escaped chars become themselves.
    private val escMap: Map[Char, Char] = Map(
      ':' -> '\uE000', '*' -> '\uE001', '?' -> '\uE002',
      '~' -> '\uE003', '^' -> '\uE004')
    private[engine] def unescape(w: String): String = w.map {
      case '\uE000' => ':'
      case '\uE001' => '*'
      case '\uE002' => '?'
      case '\uE003' => '~'
      case '\uE004' => '^'
      case c => c
    }

    /** Trailing `^N` / `^N.M` boost: parsed and DISCARDED (match/no-match
      * annotator; see class doc).
      */
    private def stripBoost(w: String): String = {
      val ci = w.lastIndexOf('^')
      if (ci > 0 && ci < w.length - 1 &&
        w.substring(ci + 1).toDoubleOption.isDefined) w.substring(0, ci)
      else w
    }

    def parse(q: String, conf: AnalysisConf): Expr = {
      val toks = lex(q)
      require(toks.nonEmpty, "empty query")
      val (expr, rest) = parseOr(toks, conf)
      require(rest.isEmpty, s"dangling tokens: $rest")
      expr
    }

    private def lex(q: String): List[Tok] = {
      val out = mutable.ListBuffer.empty[Tok]
      var i = 0
      val n = q.length
      var negate = false
      while (i < n) {
        val c = q.charAt(i)
        if (Character.isWhitespace(c)) { i += 1 }
        else if (c == '(') { out += LP; negate = false; i += 1 }
        else if (c == ')') { out += RP; negate = false; i += 1 }
        else if (c == '!') { out += NOT; i += 1 }
        else if (c == '-') { negate = true; i += 1 }
        else if (c == '+') { i += 1 }
        else if (c == '"') {
          val j = q.indexOf('"', i + 1)
          require(j > 0, "unterminated quote")
          out += Quoted(q.substring(i + 1, j), negate); negate = false
          i = j + 1
        } else if (c == '[' || c == '{') {
          val jb = q.indexOf(']', i + 1)
          val jc = q.indexOf('}', i + 1)
          val j = Seq(jb, jc).filter(_ > 0).minOption
            .getOrElse(throw new IllegalArgumentException("unterminated range"))
          val parts = q.substring(i + 1, j).trim.split("\\s+")
          require(parts.length == 3 && parts(1) == "TO",
            s"malformed range: ${q.substring(i, j + 1)}")
          out += RangeT(parts(0), parts(2), c == '[', q.charAt(j) == ']', negate)
          negate = false
          i = j + 1
        } else if (c == '/') {
          val j = q.indexOf('/', i + 1)
          require(j > 0, "unterminated regex")
          out += Regex(q.substring(i + 1, j), negate); negate = false
          i = j + 1
        } else {
          val sb = new java.lang.StringBuilder
          var j = i
          var stop = false
          while (j < n && !stop) {
            val cj = q.charAt(j)
            if (cj == '\\' && j + 1 < n) {
              val nx = q.charAt(j + 1)
              sb.append(escMap.getOrElse(nx, nx)); j += 2
            } else if (Character.isWhitespace(cj) || "()\"[{".indexOf(cj.toInt) >= 0) {
              stop = true
            } else { sb.append(cj); j += 1 }
          }
          val w = sb.toString
          w match {
            case "AND" | "&&" => out += AND
            case "OR" | "||"  => out += OR
            case "NOT"        => out += NOT
            case _            => out += Word(w, negate); negate = false
          }
          i = j
        }
      }
      out.toList
    }

    private def parseOr(toks: List[Tok], conf: AnalysisConf): (Expr, List[Tok]) = {
      var (left, rest) = parseAnd(toks, conf)
      val children = mutable.ListBuffer[Expr](left)
      var continue = true
      while (continue) rest match {
        case OR :: t =>
          val (e, r) = parseAnd(t, conf); children += e; rest = r
        case t @ (Word(_, _) :: _ | Quoted(_, _) :: _ | Regex(_, _) :: _ | RangeT(_, _, _, _, _) :: _ | LP :: _ | NOT :: _) =>
          val (e, r) = parseAnd(t, conf); children += e; rest = r
        case _ => continue = false
      }
      (combineBooleanList(children.toList), rest)
    }

    /** Lucene boolean-clause semantics for a SHOULD list: negated clauses
      * are MUST_NOT at the enclosing level, i.e. `a -b` / `a NOT b` means
      * (a) AND NOT (b), not `a OR NOT b`; a pure-negative query matches
      * nothing (like Lucene's classic QueryParser).
      */
    private def combineBooleanList(children: List[Expr]): Expr = {
      if (children.size == 1 && !children.head.isInstanceOf[NotExpr])
        return children.head
      val (negs, poss) = children.partition(_.isInstanceOf[NotExpr])
      if (negs.isEmpty) OrExpr(poss)
      else if (poss.isEmpty) OrExpr(Nil) // pure negative: never matches
      else AndExpr(Seq(
        if (poss.size == 1) poss.head else OrExpr(poss),
        NotExpr(OrExpr(negs.map(_.asInstanceOf[NotExpr].child)))))
    }

    private def parseAnd(toks: List[Tok], conf: AnalysisConf): (Expr, List[Tok]) = {
      var (left, rest) = parseUnary(toks, conf)
      val children = mutable.ListBuffer[Expr](left)
      var continue = true
      while (continue) rest match {
        case AND :: t =>
          val (e, r) = parseUnary(t, conf); children += e; rest = r
        case _ => continue = false
      }
      (if (children.size == 1) children.head else AndExpr(children.toList), rest)
    }

    private def parseUnary(toks: List[Tok], conf: AnalysisConf): (Expr, List[Tok]) = toks match {
      case NOT :: t =>
        val (e, r) = parseUnary(t, conf); (NotExpr(e), r)
      case LP :: t =>
        val (e, r) = parseOr(t, conf)
        r match {
          case RP :: rr => (e, dropBoost(rr))
          case _        => throw new IllegalArgumentException("missing )")
        }
      // field:[a TO b] — the lexer stops the word at the bracket
      case Word(w, neg) :: (r: RangeT) :: t if w.nonEmpty && w.last == ':' =>
        val e = FieldExpr(unescape(w.dropRight(1)), rangeExpr(r, conf))
        (if (neg) NotExpr(e) else e, dropBoost(t))
      case (r: RangeT) :: t =>
        val e = rangeExpr(r, conf)
        (if (r.negate) NotExpr(e) else e, dropBoost(t))
      // field:"quoted phrase" — the lexer stops the word at the quote
      case Word(w, neg) :: Quoted(s, _) :: t if w.nonEmpty && w.last == ':' =>
        val (base, rest) = quotedExpr(s, t, conf)
        val e = FieldExpr(unescape(w.dropRight(1)), base)
        (if (neg) NotExpr(e) else e, rest)
      case Word(w, neg) :: t =>
        // field:term — a colon splits off an explicit field prefix
        val ci = w.indexOf(':')
        val (fieldOpt0, core0) =
          if (ci > 0 && ci < w.length - 1) (Some(unescape(w.substring(0, ci))), w.substring(ci + 1))
          else (None, w)
        val fieldOpt = fieldOpt0
        val core = stripBoost(core0)
        val base0: Expr =
          if (core.indexOf('*') >= 0 || core.indexOf('?') >= 0) {
            // wildcard term (Lucene ? = one char, * = any run), matched
            // against the ANALYZED terms like WildcardQuery
            val analyzed =
              if (conf.caseSensitive) core else graft.analysis.Filters.lowercase(core)
            RegexExpr(analyzed.flatMap {
              case '*'                      => ".*"
              case '?'                      => "."
              case '\uE000'                 => ":"
              case '\uE001'                 => "\\*"
              case '\uE002'                 => "\\?"
              case '\uE003'                 => "~"
              case '\uE004'                 => "\\^"
              case c if "\\.[]{}()^$|+".indexOf(c.toInt) >= 0 => "\\" + c
              case c                        => c.toString
            })
          } else fuzzyOrTerm(core, conf)
        val base = fieldOpt.fold(base0)(FieldExpr(_, base0))
        (if (neg) NotExpr(base) else base, t)
      case Quoted(s, neg) :: t =>
        val (base, rest) = quotedExpr(s, t, conf)
        (if (neg) NotExpr(base) else base, rest)
      case Regex(p, neg) :: t =>
        val base = RegexExpr(p)
        (if (neg) NotExpr(base) else base, t)
      case other => throw new IllegalArgumentException(s"unexpected token: $other")
    }

    /** `word~` / `word~N` fuzzy suffix (N capped at 2, Lucene's maximum;
      * bare `~` = 2), else a plain analyzed term/phrase.
      */
    private def fuzzyOrTerm(w: String, conf: AnalysisConf): Expr = {
      val ti = w.lastIndexOf('~')
      val fuzz: Option[Int] =
        if (ti <= 0) None
        else {
          val suffix = w.substring(ti + 1)
          if (suffix.isEmpty) Some(2)
          else suffix.toIntOption.map(n => math.min(math.max(n, 0), 2))
        }
      fuzz match {
        case Some(maxE) =>
          val base = unescape(w.substring(0, ti))
          val terms = Analyzer.terms(conf, base)
          if (terms.isEmpty) OrExpr(Nil)
          else if (terms.length == 1) {
            if (maxE == 0) TermExpr(terms(0)) else FuzzyExpr(terms(0), maxE)
          } else PhraseExpr(terms) // multi-token fuzzy degrades to a phrase
        case None =>
          val terms = Analyzer.terms(conf, unescape(w))
          if (terms.isEmpty) OrExpr(Nil) // analyzes to nothing -> never matches
          else if (terms.length == 1) TermExpr(terms(0))
          else PhraseExpr(terms)
      }
    }

    /** A quoted phrase, consuming a following `~N` slop suffix token
      * (`"a b"~2` lexes as Quoted("a b") then Word("~2")).
      */
    private def quotedExpr(s: String, t: List[Tok], conf: AnalysisConf): (Expr, List[Tok]) = {
      val terms = Analyzer.terms(conf, s)
      t match {
        // `~N` slop suffix, possibly fused with a boost (`"a b"~2^3`)
        case Word(w0, _) :: tt if {
          val w = stripBoost(w0)
          w.startsWith("~") && (w.length == 1 || w.drop(1).toIntOption.isDefined)
        } =>
          val w = stripBoost(w0)
          val slop = if (w.length == 1) 2 else w.drop(1).toInt
          val e: Expr =
            if (terms.isEmpty) OrExpr(Nil)
            else if (slop == 0) PhraseExpr(terms)
            else SloppyPhraseExpr(terms, slop)
          (e, tt)
        case _ =>
          ((if (terms.isEmpty) OrExpr(Nil) else PhraseExpr(terms)): Expr,
            dropBoost(t))
      }
    }

    /** Range endpoints are lower-cased per conf but NOT analyzed, like
      * the classic QueryParser's default range handling; `*` = open end.
      */
    private def rangeExpr(r: RangeT, conf: AnalysisConf): RangeExpr = {
      def ep(x: String): Option[String] =
        if (x == "*") None
        else Some(if (conf.caseSensitive) unescape(x)
          else graft.analysis.Filters.lowercase(unescape(x)))
      RangeExpr(ep(r.low), ep(r.high), r.inclLow, r.inclHigh)
    }

    /** Consume a standalone trailing boost token (`"a b"^2`, `(x y)^0.5`
      * lex the boost as its own word). Parsed and discarded.
      */
    private def dropBoost(t: List[Tok]): List[Tok] = t match {
      case Word(w, _) :: tt if w.length > 1 && w.charAt(0) == '^' &&
        w.substring(1).toDoubleOption.isDefined => tt
      case _ => t
    }
  }
}
