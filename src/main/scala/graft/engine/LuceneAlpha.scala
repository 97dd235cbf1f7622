package graft.engine

import graft.analysis.{AnalysisConf, Analyzer}
import graft.dict.{DictionaryEntry, HighlighterOpts}

import scala.collection.mutable

/** Match/no-match annotator over raw query strings — the reference's
  * `lucene_alpha.clj`: entry `text` is parsed as a Lucene query string and
  * evaluated with `QueryMatch.SIMPLE_MATCHER` (no offsets;
  * `lucene_alpha.clj:18-28`). The subset implemented covers the grammar
  * the reference's tests exercise plus the common core: terms (implicit
  * OR), AND/OR/NOT (and &&/||/!), parentheses, "quoted phrases",
  * /regex/ terms, +/- prefixes. Unparseable entries are dropped with a
  * log, like the reference's ParseException handler
  * (`lucene_alpha.clj:41-43`).
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

    def annotate(text: String): Seq[AlphaAnnotation] = {
      if (text == null || text.trim.isEmpty) return Nil
      val fields: Map[AnalysisConf, FieldTokens] =
        confs.map(c => c -> FieldTokens(Analyzer.analyze(c, text))).toMap
      queries.toSeq.collect {
        case q if eval(q.expr, fields(q.conf)) =>
          AlphaAnnotation(q.queryString,
            q.metadata.getOrElse("_type", typeName), q.queryId, q.metadata)
      }
    }
  }

  private def eval(e: Expr, ft: FieldTokens): Boolean = e match {
    case TermExpr(t)    => ft.positions.containsKey(t)
    case PhraseExpr(ts) =>
      val first = ft.positions.get(ts.head)
      first != null && first.exists { p =>
        ts.indices.forall { i =>
          val arr = ft.positions.get(ts(i))
          arr != null && java.util.Arrays.binarySearch(arr, p + i) >= 0
        }
      }
    case r: RegexExpr =>
      val it = ft.positions.keySet().iterator()
      var found = false
      while (!found && it.hasNext) found = r.compiled.matcher(it.next()).matches()
      found
    case AndExpr(cs) => cs.forall(eval(_, ft))
    case OrExpr(cs)  => cs.exists(eval(_, ft))
    case NotExpr(c)  => !eval(c, ft)
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
        } else if (c == '/') {
          val j = q.indexOf('/', i + 1)
          require(j > 0, "unterminated regex")
          out += Regex(q.substring(i + 1, j), negate); negate = false
          i = j + 1
        } else {
          var j = i
          while (j < n && !Character.isWhitespace(q.charAt(j)) && "()\"".indexOf(q.charAt(j).toInt) < 0) j += 1
          val w = q.substring(i, j)
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
        case t @ (Word(_, _) :: _ | Quoted(_, _) :: _ | Regex(_, _) :: _ | LP :: _ | NOT :: _) =>
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
          case RP :: rr => (e, rr)
          case _        => throw new IllegalArgumentException("missing )")
        }
      case Word(w, neg) :: t =>
        val base: Expr =
          if (w.indexOf('*') >= 0 || w.indexOf('?') >= 0) {
            // wildcard term (Lucene ? = one char, * = any run), matched
            // against the ANALYZED terms like WildcardQuery
            val analyzed =
              if (conf.caseSensitive) w else graft.analysis.Filters.lowercase(w)
            RegexExpr(analyzed.flatMap {
              case '*'                      => ".*"
              case '?'                      => "."
              case c if "\\.[]{}()^$|+".indexOf(c.toInt) >= 0 => "\\" + c
              case c                        => c.toString
            })
          } else {
            val terms = Analyzer.terms(conf, w)
            if (terms.isEmpty) OrExpr(Nil) // analyzes to nothing -> never matches
            else if (terms.length == 1) TermExpr(terms(0))
            else PhraseExpr(terms)
          }
        (if (neg) NotExpr(base) else base, t)
      case Quoted(s, neg) :: t =>
        val terms = Analyzer.terms(conf, s)
        val base: Expr = if (terms.isEmpty) OrExpr(Nil) else PhraseExpr(terms)
        (if (neg) NotExpr(base) else base, t)
      case Regex(p, neg) :: t =>
        val base = RegexExpr(p)
        (if (neg) NotExpr(base) else base, t)
      case other => throw new IllegalArgumentException(s"unexpected token: $other")
    }
  }
}
