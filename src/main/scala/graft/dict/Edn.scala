package graft.dict

/** Minimal EDN reader for dictionary files — the reference's `read-edn`
  * (`readers.clj:11-16`) accepts a vector of entry maps. This parser
  * covers the EDN subset such dictionaries use: vectors, maps, sets,
  * keywords, strings (with escapes), booleans, nil, longs/doubles,
  * and comments. Not a general EDN implementation.
  */
object Edn {

  sealed trait Value
  final case class EStr(s: String) extends Value
  final case class EKw(name: String) extends Value
  final case class ENum(d: Double, isInt: Boolean) extends Value
  final case class EBool(b: Boolean) extends Value
  case object ENil extends Value
  final case class EVec(items: Vector[Value]) extends Value
  final case class EMap(entries: Vector[(Value, Value)]) extends Value

  def parse(input: String): Value = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    require(p.atEnd, s"trailing content after EDN value at offset ${p.offset}")
    v
  }

  /** Read a dictionary: EDN vector of entry maps → entries. Keyword keys
    * are `name`-normalized like the reference (`:case-sensitive?` →
    * "case-sensitive?").
    */
  def readDictionary(content: String): Seq[DictionaryEntry] = parse(content) match {
    case EVec(items) => items.flatMap {
      case m: EMap => entryFromMap(m)
      case other   => throw new IllegalArgumentException(s"expected map entry, got $other")
    }
    case other => throw new IllegalArgumentException(s"expected top-level vector, got $other")
  }

  private def entryFromMap(m: EMap): Option[DictionaryEntry] = {
    def key(v: Value): String = v match {
      case EKw(n)  => n
      case EStr(s) => s
      case other   => other.toString
    }
    val kv = m.entries.map { case (k, v) => key(k) -> v }.toMap
    def str(k: String): Option[String] = kv.get(k).collect {
      case EStr(s) => s
      case EKw(n)  => n
    }.filter(_.trim.nonEmpty)
    def bool(k: String): Option[Boolean] = kv.get(k).collect { case EBool(b) => b }
    def num(k: String): Option[Double] = kv.get(k).collect { case ENum(d, _) => d }
    str("text").map { text =>
      DictionaryEntry(
        text = text,
        entryType = str("type"),
        id = str("id"),
        synonyms = kv.get("synonyms").collect {
          case EVec(items) => items.collect { case EStr(s) => s }.toSeq
        }.getOrElse(Nil),
        caseSensitive = bool("case-sensitive?"),
        asciiFold = bool("ascii-fold?"),
        stem = bool("stem?"),
        stemmer = str("stemmer"),
        slop = num("slop").map(_.toLong),
        tokenizer = str("tokenizer"),
        inOrder = bool("in-order?"),
        fuzzy = bool("fuzzy?"),
        fuzziness = num("fuzziness").map(_.toInt),
        meta = kv.get("meta").collect {
          case EMap(es) => es.map { case (k, v) =>
            key(k) -> (v match {
              case EStr(s) => s
              case EKw(n)  => n
              case ENum(d, true) => d.toLong.toString
              case ENum(d, _) => d.toString
              case EBool(b) => b.toString
              case other => other.toString
            })
          }.toMap
        }.getOrElse(Map.empty))
    }
  }

  private final class Parser(input: String) {
    private var pos = 0

    def atEnd: Boolean = pos >= input.length
    def offset: Int = pos

    @inline private def cur: Char = {
      require(pos < input.length, s"unexpected end of EDN input at offset $pos")
      input.charAt(pos)
    }

    def skipWs(): Unit = {
      var go = true
      while (go && pos < input.length) {
        val c = input.charAt(pos)
        if (Character.isWhitespace(c) || c == ',') pos += 1
        else if (c == ';') { while (pos < input.length && input.charAt(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    def parseValue(): Value = {
      skipWs()
      require(pos < input.length, "unexpected end of input")
      input.charAt(pos) match {
        case '[' => pos += 1; parseSeq(']')
        case '(' => pos += 1; parseSeq(')')
        case '{' => pos += 1; parseMap()
        case '#' if pos + 1 < input.length && input.charAt(pos + 1) == '{' =>
          pos += 2; parseSeq('}')
        case '"' => parseString()
        case ':' => pos += 1; EKw(readToken())
        case _   => parseScalar()
      }
    }

    private def parseSeq(close: Char): Value = {
      val items = Vector.newBuilder[Value]
      skipWs()
      while (cur != close) {
        items += parseValue()
        skipWs()
      }
      pos += 1
      EVec(items.result())
    }

    private def parseMap(): Value = {
      val entries = Vector.newBuilder[(Value, Value)]
      skipWs()
      while (cur != '}') {
        val k = parseValue()
        val v = parseValue()
        entries += (k -> v)
        skipWs()
      }
      pos += 1
      EMap(entries.result())
    }

    private def parseString(): Value = {
      pos += 1
      val sb = new StringBuilder
      while (cur != '"') {
        val c = cur
        if (c == '\\') {
          pos += 1
          input.charAt(pos) match {
            case 'n'   => sb += '\n'
            case 't'   => sb += '\t'
            case 'r'   => sb += '\r'
            case '\\'  => sb += '\\'
            case '"'   => sb += '"'
            case other => sb += other
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      EStr(sb.toString)
    }

    private def readToken(): String = {
      val start = pos
      while (pos < input.length && !Character.isWhitespace(input.charAt(pos)) &&
        "[](){},;\"".indexOf(input.charAt(pos).toInt) < 0) pos += 1
      input.substring(start, pos)
    }

    private def parseScalar(): Value = readToken() match {
      case "true"  => EBool(true)
      case "false" => EBool(false)
      case "nil"   => ENil
      case tok if tok.nonEmpty && (tok.charAt(0).isDigit ||
        ((tok.charAt(0) == '-' || tok.charAt(0) == '+') && tok.length > 1 && tok.charAt(1).isDigit)) =>
        if (tok.contains('.') || tok.contains('e') || tok.contains('E'))
          ENum(tok.toDouble, isInt = false)
        else ENum(tok.toLong.toDouble, isInt = true)
      case tok => EStr(tok) // bare symbol: treat as string
    }
  }
}
