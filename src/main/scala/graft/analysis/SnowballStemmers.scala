package graft.analysis

/** Exact implementations of the published Snowball stemming algorithms
  * (the specifications at snowballstem.org) for the most-used
  * non-English languages the reference wires through Lucene's
  * SnowballFilter (`/root/reference/src/beagle/text_analysis.clj:15-49`):
  * German, Dutch, French, Spanish, Portuguese, Italian, Russian. Further
  * languages live in [[SnowballStemmers2]], [[SnowballStemmers3]] and
  * [[SnowballStemmers4]].
  *
  * Each object follows the published algorithm description step by step —
  * R1/R2/RV region computation, longest-suffix among-matching (the
  * longest matching suffix is selected first and ONLY then its side
  * conditions apply, with no backtracking to shorter suffixes), and the
  * per-step finishing rules. Written from the public specifications, not
  * ported from any implementation. Like the originals, these expect
  * lower-case input (the analyzer chain lower-cases before stemming
  * unless the dictionary entry is case-sensitive).
  */
object SnowballStemmers {

  /** Longest suffix of `w` among `sufs` (null if none). */
  private def longest(w: String, sufs: Array[String]): String = {
    var best: String = null
    var i = 0
    while (i < sufs.length) {
      val s = sufs(i)
      if ((best == null || s.length > best.length) && w.endsWith(s)) best = s
      i += 1
    }
    best
  }

  /** Longest suffix of `w` among `sufs` that lies entirely within the
    * region starting at `lim` (null if none). This is Snowball's
    * `setlimit tomark p1 for ([substring]) among(...)` semantics: a longer
    * suffix that crosses the region boundary cannot match at all, so a
    * shorter in-region suffix still gets its turn — unlike [[longest]],
    * which models the `[substring] among(... R1 delete ...)` shape where
    * the longest whole-word match is chosen first and the region test can
    * only fail the step.
    */
  private def longestIn(w: String, sufs: Array[String], lim: Int): String = {
    var best: String = null
    var i = 0
    while (i < sufs.length) {
      val s = sufs(i)
      if ((best == null || s.length > best.length) && w.length - s.length >= lim &&
        w.endsWith(s)) best = s
      i += 1
    }
    best
  }

  /** Standard region start: position after the first non-vowel that
    * follows a vowel, searching from `from`; word length if absent.
    */
  private def regionAfter(w: String, from: Int, isV: Char => Boolean): Int = {
    var i = from
    val n = w.length
    while (i < n && !isV(w.charAt(i))) i += 1
    while (i < n && isV(w.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }

  @inline private def before(w: String, cut: Int): Char =
    if (cut > 0) w.charAt(cut - 1) else '\u0000'

  // ------------------------------------------------------------------
  // German
  // ------------------------------------------------------------------
  object German extends Stemmer {
    private val vowels = "aeiouyäöü"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0
    private val sEnding = "bdfghklmnrt"
    private val stEnding = "bdfghklmnt" // sEnding minus r

    private val step1 = Array("ern", "em", "er", "en", "es", "e", "s")
    private val step2 = Array("est", "en", "er", "st")
    private val step3 = Array("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")

    def stem(word: String): String = afterPrelude(word.replace("ß", "ss"))

    /** Everything after the character-rewriting prelude: the u/y marking,
      * regions, suffix steps, and postlude. Shared with
      * [[SnowballStemmers4.German2]], which differs from german ONLY in
      * the prelude (ae/oe/ue folded to umlauts, except ue after q).
      */
    private[analysis] def afterPrelude(word: String): String = {
      var w = word
      // mark u/y between vowels as consonants
      if (w.length > 2) {
        val cs = w.toCharArray
        var i = 1
        while (i < cs.length - 1) {
          if ((cs(i) == 'u' || cs(i) == 'y') && isV(cs(i - 1)) && isV(cs(i + 1)))
            cs(i) = (cs(i) - 32).toChar // 'U' / 'Y'
          i += 1
        }
        w = new String(cs)
      }
      val r1std = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1std, isV)
      val r1 = math.min(math.max(r1std, 3), w.length)

      // step 1
      longest(w, step1) match {
        case null =>
        case s @ ("em" | "ern" | "er") =>
          if (w.length - s.length >= r1) w = w.dropRight(s.length)
        case s @ ("e" | "en" | "es") =>
          if (w.length - s.length >= r1) {
            w = w.dropRight(s.length)
            if (w.endsWith("niss")) w = w.dropRight(1)
          }
        case "s" =>
          if (w.length - 1 >= r1 && sEnding.indexOf(before(w, w.length - 1).toInt) >= 0)
            w = w.dropRight(1)
      }
      // step 2
      longest(w, step2) match {
        case null =>
        case s @ ("en" | "er" | "est") =>
          if (w.length - s.length >= r1) w = w.dropRight(s.length)
        case "st" =>
          val cut = w.length - 2
          if (cut >= r1 && cut >= 4 && stEnding.indexOf(before(w, cut).toInt) >= 0)
            w = w.dropRight(2)
      }
      // step 3 (d-suffixes)
      longest(w, step3) match {
        case null =>
        case s @ ("end" | "ung") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length)
            if (w.endsWith("ig") && before(w, w.length - 2) != 'e' &&
              w.length - 2 >= r2) w = w.dropRight(2)
          }
        case s @ ("ig" | "ik" | "isch") =>
          if (w.length - s.length >= r2 && before(w, w.length - s.length) != 'e')
            w = w.dropRight(s.length)
        case s @ ("lich" | "heit") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length)
            if ((w.endsWith("er") || w.endsWith("en")) && w.length - 2 >= r1)
              w = w.dropRight(2)
          }
        case "keit" =>
          if (w.length - 4 >= r2) {
            w = w.dropRight(4)
            if (w.endsWith("lich") && w.length - 4 >= r2) w = w.dropRight(4)
            else if (w.endsWith("ig") && w.length - 2 >= r2) w = w.dropRight(2)
          }
      }
      // postlude: unmark and fold umlauts
      val sb = new StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        w.charAt(i) match {
          case 'U' => sb += 'u'
          case 'Y' => sb += 'y'
          case 'ä' => sb += 'a'
          case 'ö' => sb += 'o'
          case 'ü' => sb += 'u'
          case c   => sb += c
        }
        i += 1
      }
      sb.toString
    }
  }

  // ------------------------------------------------------------------
  // Dutch
  // ------------------------------------------------------------------
  object Dutch extends Stemmer {
    private val vowels = "aeiouyè"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private def undouble(w: String): String =
      if (w.endsWith("kk") || w.endsWith("dd") || w.endsWith("tt")) w.dropRight(1)
      else w

    /** valid en-ending: preceded by a non-vowel, and the stem must not
      * end in "gem" after removal.
      */
    private def validEn(w: String, cut: Int): Boolean =
      cut > 0 && !isV(w.charAt(cut - 1)) &&
        !(cut >= 3 && w.substring(cut - 3, cut) == "gem")

    def stem(word: String): String = {
      // prelude: strip umlauts/acutes, then mark y/i
      var w = word.map {
        case 'ä' | 'á' => 'a'
        case 'ë' | 'é' => 'e'
        case 'ï' | 'í' => 'i'
        case 'ö' | 'ó' => 'o'
        case 'ü' | 'ú' => 'u'
        case c         => c
      }
      val cs = w.toCharArray
      var i = 0
      while (i < cs.length) {
        if (cs(i) == 'y' && (i == 0 || isV(cs(i - 1)))) cs(i) = 'Y'
        else if (cs(i) == 'i' && i > 0 && i < cs.length - 1 &&
          isV(cs(i - 1)) && isV(cs(i + 1))) cs(i) = 'I'
        i += 1
      }
      w = new String(cs)
      val r1std = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1std, isV)
      val r1 = math.min(math.max(r1std, 3), w.length)
      var eFound = false

      def step2(x: String): String = {
        val cut = x.length - 1
        if (x.endsWith("e") && cut >= r1 && cut > 0 && !isV(x.charAt(cut - 1))) {
          eFound = true
          undouble(x.dropRight(1))
        } else x
      }

      // step 1
      longest(w, Array("heden", "ene", "en", "se", "s")) match {
        case null =>
        case "heden" =>
          if (w.length - 5 >= r1) w = w.dropRight(5) + "heid"
        case s @ ("ene" | "en") =>
          val cut = w.length - s.length
          if (cut >= r1 && validEn(w, cut)) w = undouble(w.substring(0, cut))
        case s @ ("se" | "s") =>
          val cut = w.length - s.length
          val p = before(w, cut)
          if (cut >= r1 && p != '\u0000' && !isV(p) && p != 'j')
            w = w.substring(0, cut)
      }
      // step 2
      w = step2(w)
      // step 3a
      if (w.endsWith("heid") && w.length - 4 >= r2 && before(w, w.length - 4) != 'c') {
        w = w.dropRight(4)
        val cut = w.length - 2
        if (w.endsWith("en") && cut >= r1 && validEn(w, cut))
          w = undouble(w.substring(0, cut))
      }
      // step 3b (d-suffixes)
      longest(w, Array("lijk", "baar", "end", "ing", "bar", "ig")) match {
        case null =>
        case s @ ("end" | "ing") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length)
            if (w.endsWith("ig") && w.length - 2 >= r2 && before(w, w.length - 2) != 'e')
              w = w.dropRight(2)
            else w = undouble(w)
          }
        case "ig" =>
          if (w.length - 2 >= r2 && before(w, w.length - 2) != 'e') w = w.dropRight(2)
        case "lijk" =>
          if (w.length - 4 >= r2) { w = w.dropRight(4); w = step2(w) }
        case "baar" =>
          if (w.length - 4 >= r2) w = w.dropRight(4)
        case "bar" =>
          if (w.length - 3 >= r2 && eFound) w = w.dropRight(3)
      }
      // step 4: undouble vowel — C V V D with D a non-vowel other than I
      if (w.length >= 4) {
        val d = w.charAt(w.length - 1)
        val v1 = w.charAt(w.length - 2)
        val v2 = w.charAt(w.length - 3)
        val c = w.charAt(w.length - 4)
        if (!isV(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1.toInt) >= 0 && !isV(c))
          w = w.substring(0, w.length - 2) + d
      }
      // postlude
      w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
    }
  }

  // ------------------------------------------------------------------
  // French
  // ------------------------------------------------------------------
  object French extends Stemmer {
    private val vowels = "aeiouyâàëéêèïîôûù"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val step1Sufs = Array(
      "issements", "issement", "atrices", "amment", "emment",
      "atrice", "ateurs", "ations", "logies", "usions", "utions", "ements",
      "ances", "iqUes", "ismes", "ables", "istes", "ateur", "ation", "logie",
      "usion", "ution", "ences", "ement", "euses", "ments", "ance", "iqUe",
      "isme", "able", "iste", "ence", "ités", "ives", "eaux", "euse", "ment",
      "eux", "ité", "ive", "ifs", "aux", "if")
    private val step2aSufs = Array(
      "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
      "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
      "irais", "irait", "irent", "iriez", "irons", "iront", "isses", "issez",
      "îmes", "îtes", "irai", "iras", "irez", "isse", "ies", "ira", "ît",
      "ie", "ir", "is", "it", "i")
    private val step2bSufs = Array(
      "eraIent", "erions", "assent", "assiez", "èrent", "erais", "erait",
      "eriez", "erons", "eront", "aIent", "antes", "asses", "ions", "erai",
      "eras", "erez", "âmes", "âtes", "ante", "ants", "asse", "ées", "era",
      "iez", "ais", "ait", "ant", "ée", "és", "er", "ez", "ât", "ai", "as",
      "é", "a")
    private val step4Sufs = Array("Ière", "ière", "Ier", "ier", "ion", "e")

    def stem(word: String): String = {
      // prelude: sequential marking on the working array, then the 2.x
      // ë -> He / ï -> Hi rewriting (H is a marker consonant the postlude
      // either folds back into ë/ï or deletes).
      val cs = word.toCharArray
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        if ((c == 'i' || c == 'u') && i > 0 && i < cs.length - 1 &&
          isV(cs(i - 1)) && isV(cs(i + 1))) cs(i) = (c - 32).toChar
        else if (c == 'u' && i > 0 && cs(i - 1) == 'q') cs(i) = 'U'
        else if (c == 'y' && ((i > 0 && isV(cs(i - 1))) ||
          (i < cs.length - 1 && isV(cs(i + 1))))) cs(i) = 'Y'
        i += 1
      }
      var w = new String(cs)
      if (w.indexOf('ë') >= 0) w = w.replace("ë", "He")
      if (w.indexOf('ï') >= 0) w = w.replace("ï", "Hi")
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv: Int =
        if (w.length >= 3 && (w.startsWith("par") || w.startsWith("col") ||
          w.startsWith("tap"))) 3
        else if (w.length >= 2 && isV(w.charAt(0)) && isV(w.charAt(1)))
          math.min(3, w.length)
        else {
          var j = 1
          while (j < w.length && !isV(w.charAt(j))) j += 1
          if (j < w.length) j + 1 else w.length
        }

      var step1Altered = false
      var mentFound = false

      // ---- step 1
      longest(w, step1Sufs) match {
        case null =>
        case s @ ("ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
            "ances" | "iqUes" | "ismes" | "ables" | "istes") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length); step1Altered = true }
        case s @ ("atrice" | "ateur" | "ation" | "atrices" | "ateurs" | "ations") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); step1Altered = true
            if (w.endsWith("ic")) {
              if (w.length - 2 >= r2) w = w.dropRight(2)
              else w = w.dropRight(2) + "iqU"
            }
          }
        case s @ ("logie" | "logies") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "log"; step1Altered = true }
        case s @ ("usion" | "ution" | "usions" | "utions") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "u"; step1Altered = true }
        case s @ ("ence" | "ences") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "ent"; step1Altered = true }
        case s @ ("ement" | "ements") =>
          if (w.length - s.length >= rv) {
            w = w.dropRight(s.length); step1Altered = true
            if (w.endsWith("iv") && w.length - 2 >= r2) {
              w = w.dropRight(2)
              if (w.endsWith("at") && w.length - 2 >= r2) w = w.dropRight(2)
            } else if (w.endsWith("eus")) {
              if (w.length - 3 >= r2) w = w.dropRight(3)
              else if (w.length - 3 >= r1) w = w.dropRight(3) + "eux"
            } else if (w.endsWith("abl") && w.length - 3 >= r2) w = w.dropRight(3)
            else if (w.endsWith("iqU") && w.length - 3 >= r2) w = w.dropRight(3)
            else if (w.endsWith("ièr") && w.length - 3 >= rv) w = w.dropRight(3) + "i"
            else if (w.endsWith("Ièr") && w.length - 3 >= rv) w = w.dropRight(3) + "i"
          }
        case s @ ("ité" | "ités") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); step1Altered = true
            if (w.endsWith("abil")) {
              if (w.length - 4 >= r2) w = w.dropRight(4)
              else w = w.dropRight(4) + "abl"
            } else if (w.endsWith("ic")) {
              if (w.length - 2 >= r2) w = w.dropRight(2)
              else w = w.dropRight(2) + "iqU"
            } else if (w.endsWith("iv") && w.length - 2 >= r2) w = w.dropRight(2)
          }
        case s @ ("if" | "ive" | "ifs" | "ives") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); step1Altered = true
            if (w.endsWith("at") && w.length - 2 >= r2) {
              w = w.dropRight(2)
              if (w.endsWith("ic")) {
                if (w.length - 2 >= r2) w = w.dropRight(2)
                else w = w.dropRight(2) + "iqU"
              }
            }
          }
        case "eaux" =>
          w = w.dropRight(4) + "eau"; step1Altered = true
        case "aux" =>
          if (w.length - 3 >= r1) { w = w.dropRight(3) + "al"; step1Altered = true }
        case s @ ("euse" | "euses") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length); step1Altered = true }
          else if (w.length - s.length >= r1) { w = w.dropRight(s.length) + "eux"; step1Altered = true }
        case s @ ("issement" | "issements") =>
          val cut = w.length - s.length
          if (cut >= r1 && cut > 0 && !isV(w.charAt(cut - 1))) {
            w = w.substring(0, cut); step1Altered = true
          }
        case "amment" =>
          if (w.length - 6 >= rv) { w = w.dropRight(6) + "ant"; mentFound = true }
        case "emment" =>
          if (w.length - 6 >= rv) { w = w.dropRight(6) + "ent"; mentFound = true }
        case s @ ("ment" | "ments") =>
          val cut = w.length - s.length
          if (cut > 0 && isV(w.charAt(cut - 1)) && cut - 1 >= rv) {
            w = w.substring(0, cut); mentFound = true
          }
      }

      val do2a = (!step1Altered && !mentFound) || mentFound
      var lastAltered = step1Altered || mentFound
      if (do2a) {
        // ---- step 2a: i-verb suffixes inside RV (setlimit tomark pV),
        // preceded by a non-vowel other than the H marker
        var removed2a = false
        longestIn(w, step2aSufs, rv) match {
          case null =>
          case s =>
            val cut = w.length - s.length
            if (cut > 0 && !isV(w.charAt(cut - 1)) && w.charAt(cut - 1) != 'H' &&
              cut - 1 >= rv) {
              w = w.substring(0, cut)
              removed2a = true
            }
        }
        if (removed2a) lastAltered = true
        else {
          // ---- step 2b (also inside RV)
          var altered2b = false
          longestIn(w, step2bSufs, rv) match {
            case null =>
            case "ions" =>
              if (w.length - 4 >= r2) {
                w = w.dropRight(4); altered2b = true
              }
            case s @ ("é" | "ée" | "ées" | "és" | "èrent" | "er" | "era" |
                "erai" | "eraIent" | "erais" | "erait" | "eras" | "erez" |
                "eriez" | "erions" | "erons" | "eront" | "ez" | "iez") =>
              w = w.dropRight(s.length); altered2b = true
            case s =>
              w = w.dropRight(s.length); altered2b = true
              if (w.endsWith("e") && w.length - 1 >= rv) w = w.dropRight(1)
          }
          lastAltered = altered2b
        }
      }

      if (lastAltered) {
        // ---- step 3
        if (w.endsWith("Y")) w = w.dropRight(1) + "i"
        else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
      } else {
        // ---- step 4: s dropped unless preceded by a/i/o/u/è/s, where a
        // preceding i that is itself preceded by the H marker (original ï)
        // does not protect the s; then the RV-limited residual among.
        if (w.endsWith("s") && w.length >= 2) {
          val p = w.charAt(w.length - 2)
          val protects = "aiouès".indexOf(p.toInt) >= 0 &&
            !(p == 'i' && w.length >= 3 && w.charAt(w.length - 3) == 'H')
          if (!protects) w = w.dropRight(1)
        }
        longestIn(w, step4Sufs, rv) match {
          case null =>
          case "ion" =>
            val cut = w.length - 3
            if (cut >= r2 && cut > 0 &&
              (w.charAt(cut - 1) == 's' || w.charAt(cut - 1) == 't') &&
              cut - 1 >= rv)
              w = w.substring(0, cut)
          case s @ ("ier" | "ière" | "Ier" | "Ière") =>
            w = w.dropRight(s.length) + "i"
          case "e" =>
            w = w.dropRight(1)
        }
      }
      // ---- step 5: undouble
      if (w.endsWith("enn") || w.endsWith("onn") || w.endsWith("ett") ||
        w.endsWith("ell") || w.endsWith("eill")) w = w.dropRight(1)
      // ---- step 6: un-accent e before trailing non-vowels
      var k = w.length - 1
      var trailing = 0
      while (k >= 0 && !isV(w.charAt(k))) { k -= 1; trailing += 1 }
      if (trailing >= 1 && k >= 0 && (w.charAt(k) == 'é' || w.charAt(k) == 'è'))
        w = w.substring(0, k) + "e" + w.substring(k + 1)
      // postlude: unmark I/U/Y, fold He/Hi back to ë/ï, drop stray H
      if (w.indexOf('H') >= 0) {
        val sb = new StringBuilder(w.length)
        var m = 0
        while (m < w.length) {
          val c = w.charAt(m)
          if (c == 'H') {
            if (m + 1 < w.length && w.charAt(m + 1) == 'e') { sb.append('ë'); m += 2 }
            else if (m + 1 < w.length && w.charAt(m + 1) == 'i') { sb.append('ï'); m += 2 }
            else m += 1
          } else { sb.append(c); m += 1 }
        }
        w = sb.toString
      }
      w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
    }
  }

  // ------------------------------------------------------------------
  // Spanish
  // ------------------------------------------------------------------
  object Spanish extends Stemmer {
    private val vowels = "aeiouáéíóúü"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    /** RV per the Spanish/Portuguese/Italian rule. */
    private[SnowballStemmers] def rvSpanish(w: String, isV: Char => Boolean): Int = {
      val n = w.length
      if (n < 3) return n
      if (!isV(w.charAt(1))) { // second letter consonant: after next vowel
        var i = 2
        while (i < n && !isV(w.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else if (isV(w.charAt(0)) && isV(w.charAt(1))) { // two vowels: after next consonant
        var i = 2
        while (i < n && isV(w.charAt(i))) i += 1
        if (i < n) i + 1 else n
      } else 3 // consonant-vowel
    }

    private val pronouns = Array("selas", "selos", "sela", "selo", "las",
      "les", "los", "nos", "me", "se", "la", "le", "lo")
    private val step1Sufs = Array(
      "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
      "adoras", "adores", "ancias", "logías", "encias", "amente", "idades",
      "anzas", "icos", "icas", "ismos", "ables", "ibles", "istas", "adora",
      "ación", "antes", "ancia", "logía", "ución", "encia", "mente", "idad",
      "anza", "ico", "ica", "ismo", "able", "ible", "ista", "osos", "osas",
      "ador", "ante", "oso", "osa", "ivas", "ivos", "iva", "ivo")
    private val step2aSufs = Array("yeron", "yendo", "yamos", "yais", "yan",
      "yen", "yas", "yes", "ya", "ye", "yo", "yó")
    private val step2bSufs = Array(
      "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
      "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
      "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
      "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
      "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
      "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
      "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
      "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
      "aras", "ases", "íais", "ados", "idos", "amos", "imos", "emos",
      "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida",
      "ara", "ase", "ían", "ado", "ido", "ías", "áis", "éis", "ía",
      "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís", "en",
      "es")
    private val step3Sufs = Array("os", "a", "o", "á", "í", "ó", "e", "é")

    def stem(word: String): String = {
      var w = word
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = rvSpanish(w, isV)

      // ---- step 0: attached pronoun
      longest(w, pronouns) match {
        case null =>
        case p =>
          val base = w.length - p.length
          val stem0 = w.substring(0, base)
          val accented = longest(stem0, Array("iéndo", "ándo", "ár", "ér", "ír"))
          val plain = longest(stem0, Array("iendo", "ando", "ar", "er", "ir"))
          if (accented != null && base - accented.length >= rv) {
            val fold = accented.map {
              case 'é' => 'e'; case 'á' => 'a'; case 'í' => 'i'; case c => c
            }
            w = stem0.substring(0, base - accented.length) + fold
          } else if (plain != null && base - plain.length >= rv) {
            w = stem0
          } else if (stem0.endsWith("yendo") && base - 5 >= rv &&
            base >= 6 && stem0.charAt(base - 6) == 'u') {
            w = stem0
          }
      }

      // ---- step 1
      var altered1 = false
      longest(w, step1Sufs) match {
        case null =>
        case s @ ("anza" | "anzas" | "ico" | "ica" | "icos" | "icas" |
            "ismo" | "ismos" | "able" | "ables" | "ible" | "ibles" | "ista" |
            "istas" | "oso" | "osa" | "osos" | "osas" | "amiento" |
            "amientos" | "imiento" | "imientos") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length); altered1 = true }
        case s @ ("adora" | "ador" | "ación" | "adoras" | "adores" |
            "aciones" | "ante" | "antes" | "ancia" | "ancias") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered1 = true
            if (w.endsWith("ic") && w.length - 2 >= r2) w = w.dropRight(2)
          }
        case s @ ("logía" | "logías") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "log"; altered1 = true }
        case s @ ("ución" | "uciones") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "u"; altered1 = true }
        case s @ ("encia" | "encias") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "ente"; altered1 = true }
        case "amente" =>
          if (w.length - 6 >= r1) {
            w = w.dropRight(6); altered1 = true
            if (w.endsWith("iv") && w.length - 2 >= r2) {
              w = w.dropRight(2)
              if (w.endsWith("at") && w.length - 2 >= r2) w = w.dropRight(2)
            } else {
              val t = longest(w, Array("os", "ic", "ad"))
              if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
            }
          }
        case "mente" =>
          if (w.length - 5 >= r2) {
            w = w.dropRight(5); altered1 = true
            val t = longest(w, Array("ante", "able", "ible"))
            if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
          }
        case s @ ("idad" | "idades") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered1 = true
            val t = longest(w, Array("abil", "ic", "iv"))
            if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
          }
        case s @ ("iva" | "ivo" | "ivas" | "ivos") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered1 = true
            if (w.endsWith("at") && w.length - 2 >= r2) w = w.dropRight(2)
          }
      }

      if (!altered1) {
        // ---- step 2a: verbs in -y-, preceded by u
        var removed2a = false
        longest(w, step2aSufs) match {
          case null =>
          case s =>
            val cut = w.length - s.length
            if (cut >= rv && cut > 0 && w.charAt(cut - 1) == 'u') {
              w = w.substring(0, cut); removed2a = true
            }
        }
        if (!removed2a) {
          // ---- step 2b
          longest(w, step2bSufs) match {
            case null =>
            case s @ ("en" | "es" | "éis" | "emos") =>
              if (w.length - s.length >= rv) {
                w = w.dropRight(s.length)
                if (w.endsWith("gu")) w = w.dropRight(1)
              }
            case s =>
              if (w.length - s.length >= rv) w = w.dropRight(s.length)
          }
        }
      }

      // ---- step 3: residual suffix
      longest(w, step3Sufs) match {
        case null =>
        case s @ ("os" | "a" | "o" | "á" | "í" | "ó") =>
          if (w.length - s.length >= rv) w = w.dropRight(s.length)
        case s @ ("e" | "é") =>
          if (w.length - 1 >= rv) {
            w = w.dropRight(1)
            if (w.endsWith("gu") && w.length - 1 >= rv) w = w.dropRight(1)
          }
      }
      // un-accent
      w.map {
        case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
        case 'ó' => 'o'; case 'ú' => 'u'; case c => c
      }
    }
  }

  // ------------------------------------------------------------------
  // Portuguese
  // ------------------------------------------------------------------
  object Portuguese extends Stemmer {
    // working form: ã → a~, õ → o~ (nasal vowel = vowel + consonant); the
    // tilde is a consonant for region purposes
    private val vowels = "aeiouáéíóúâêô"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val group1 = Set(
      "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
      "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento",
      "amentos", "imento", "imentos", "adora", "ador", "aça~o", "adoras",
      "adores", "aço~es", "ante", "antes", "ância")
    private val step1Sufs: Array[String] = (group1 ++ Set(
      "logia", "logias", "uça~o", "uço~es", "ência", "ências", "amente",
      "mente", "idade", "idades", "iva", "ivo", "ivas", "ivos", "ira",
      "iras")).toArray
    private val step2Sufs = Array(
      "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
      "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
      "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
      "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
      "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
      "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
      "ias", "arias", "erias", "irias", "arás", "aras", "erás", "eras",
      "irás", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
      "ires", "asses", "esses", "isses", "astes", "estes", "istes", "is",
      "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis", "áreis", "areis",
      "éreis", "ereis", "íreis", "ireis", "ásseis", "ésseis", "ísseis",
      "áveis", "ados", "idos", "ámos", "amos", "íamos", "aríamos",
      "eríamos", "iríamos", "áramos", "éramos", "íramos", "ávamos", "emos",
      "aremos", "eremos", "iremos", "ássemos", "êssemos", "íssemos",
      "imos", "armos", "ermos", "irmos", "eu", "iu", "ou", "ira", "iras")

    def stem(word: String): String = {
      var w = word.replace("ã", "a~").replace("õ", "o~")
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = Spanish.rvSpanish(w, isV)
      var altered = false

      // ---- step 1
      longest(w, step1Sufs) match {
        case null =>
        case s if group1(s) =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length); altered = true }
        case s @ ("logia" | "logias") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "log"; altered = true }
        case s @ ("uça~o" | "uço~es") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "u"; altered = true }
        case s @ ("ência" | "ências") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "ente"; altered = true }
        case "amente" =>
          if (w.length - 6 >= r1) {
            w = w.dropRight(6); altered = true
            if (w.endsWith("iv") && w.length - 2 >= r2) {
              w = w.dropRight(2)
              if (w.endsWith("at") && w.length - 2 >= r2) w = w.dropRight(2)
            } else {
              val t = longest(w, Array("os", "ic", "ad"))
              if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
            }
          }
        case "mente" =>
          if (w.length - 5 >= r2) {
            w = w.dropRight(5); altered = true
            val t = longest(w, Array("ante", "avel", "ível"))
            if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
          }
        case s @ ("idade" | "idades") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered = true
            val t = longest(w, Array("abil", "ic", "iv"))
            if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
          }
        case s @ ("iva" | "ivo" | "ivas" | "ivos") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered = true
            if (w.endsWith("at") && w.length - 2 >= r2) w = w.dropRight(2)
          }
        case s @ ("ira" | "iras") =>
          if (w.length - s.length >= rv && before(w, w.length - s.length) == 'e') {
            w = w.dropRight(s.length) + "ir"; altered = true
          }
      }

      // ---- step 2: verb suffixes (only if step 1 changed nothing)
      if (!altered) {
        longest(w, step2Sufs) match {
          case null =>
          case s =>
            if (w.length - s.length >= rv) { w = w.dropRight(s.length); altered = true }
        }
      }
      // ---- step 3
      if (altered) {
        if (w.endsWith("i") && w.length - 1 >= rv && before(w, w.length - 1) == 'c')
          w = w.dropRight(1)
      } else {
        // ---- step 4: residual suffix
        val t = longest(w, Array("os", "a", "i", "o", "á", "í", "ó"))
        if (t != null && w.length - t.length >= rv) w = w.dropRight(t.length)
      }
      // ---- step 5
      if ((w.endsWith("e") || w.endsWith("é") || w.endsWith("ê")) &&
        w.length - 1 >= rv) {
        w = w.dropRight(1)
        if (w.endsWith("gu") && w.length - 1 >= rv) w = w.dropRight(1)
        else if (w.endsWith("ci") && w.length - 1 >= rv) w = w.dropRight(1)
      } else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
      // postlude
      w.replace("a~", "ã").replace("o~", "õ")
    }
  }

  // ------------------------------------------------------------------
  // Italian
  // ------------------------------------------------------------------
  object Italian extends Stemmer {
    private val vowels = "aeiouàèìòù"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val pronouns = Array("gliela", "gliele", "glieli", "glielo",
      "gliene", "sene", "mela", "mele", "meli", "melo", "mene", "tela",
      "tele", "teli", "telo", "tene", "cela", "cele", "celi", "celo",
      "cene", "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la",
      "le", "li", "lo", "mi", "ne", "si", "ti", "vi")
    private val group1 = Set(
      "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
      "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
      "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
      "atrice", "atrici", "ante", "anti")
    private val step1Sufs: Array[String] = (group1 ++ Set(
      "azione", "azioni", "atore", "atori", "logia", "logie", "uzione",
      "uzioni", "usione", "usioni", "enza", "enze", "amento", "amenti",
      "imento", "imenti", "amente", "ità", "ivo", "ivi", "iva", "ive")).toArray
    private val step2Sufs = Array(
      "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
      "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
      "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
      "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
      "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
      "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
      "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
      "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
      "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
      "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
      "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")

    def stem(word: String): String = {
      // prelude: acute → grave, then mark u/i
      var cs = word.map {
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
        case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
      }.toCharArray
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        if ((c == 'i' || c == 'u') && i > 0 && i < cs.length - 1 &&
          isV(cs(i - 1)) && isV(cs(i + 1))) cs(i) = (c - 32).toChar
        else if (c == 'u' && i > 0 && cs(i - 1) == 'q') cs(i) = 'U'
        i += 1
      }
      var w = new String(cs)
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      val rv = Spanish.rvSpanish(w, isV)

      // ---- step 0: attached pronoun
      longest(w, pronouns) match {
        case null =>
        case p =>
          val base = w.length - p.length
          val stem0 = w.substring(0, base)
          if ((stem0.endsWith("ando") || stem0.endsWith("endo")) && base - 4 >= rv)
            w = stem0
          else {
            val t = longest(stem0, Array("ar", "er", "ir"))
            if (t != null && base - t.length >= rv) w = stem0 + "e"
          }
      }

      // ---- step 1
      var altered1 = false
      longest(w, step1Sufs) match {
        case null =>
        case s if group1(s) =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length); altered1 = true }
        case s @ ("azione" | "azioni" | "atore" | "atori") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered1 = true
            if (w.endsWith("ic") && w.length - 2 >= r2) w = w.dropRight(2)
          }
        case s @ ("logia" | "logie") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "log"; altered1 = true }
        case s @ ("uzione" | "uzioni" | "usione" | "usioni") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "u"; altered1 = true }
        case s @ ("enza" | "enze") =>
          if (w.length - s.length >= r2) { w = w.dropRight(s.length) + "ente"; altered1 = true }
        case s @ ("amento" | "amenti" | "imento" | "imenti") =>
          if (w.length - s.length >= rv) { w = w.dropRight(s.length); altered1 = true }
        case "amente" =>
          if (w.length - 6 >= r1) {
            w = w.dropRight(6); altered1 = true
            if (w.endsWith("iv") && w.length - 2 >= r2) {
              w = w.dropRight(2)
              if (w.endsWith("at") && w.length - 2 >= r2) w = w.dropRight(2)
            } else {
              val t = longest(w, Array("os", "ic", "abil"))
              if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
            }
          }
        case "ità" =>
          if (w.length - 3 >= r2) {
            w = w.dropRight(3); altered1 = true
            val t = longest(w, Array("abil", "ic", "iv"))
            if (t != null && w.length - t.length >= r2) w = w.dropRight(t.length)
          }
        case s @ ("ivo" | "ivi" | "iva" | "ive") =>
          if (w.length - s.length >= r2) {
            w = w.dropRight(s.length); altered1 = true
            if (w.endsWith("at") && w.length - 2 >= r2) {
              w = w.dropRight(2)
              if (w.endsWith("ic") && w.length - 2 >= r2) w = w.dropRight(2)
            }
          }
      }

      // ---- step 2: verb suffixes (only if step 1 changed nothing)
      if (!altered1) {
        longest(w, step2Sufs) match {
          case null =>
          case s => if (w.length - s.length >= rv) w = w.dropRight(s.length)
        }
      }
      // ---- step 3a: final vowel, then a preceding i
      val t3 = longest(w, Array("a", "e", "i", "o", "à", "è", "ì", "ò"))
      if (t3 != null && w.length - 1 >= rv) {
        w = w.dropRight(1)
        if (w.endsWith("i") && w.length - 1 >= rv) w = w.dropRight(1)
      }
      // ---- step 3b
      if (w.endsWith("ch") && w.length - 2 >= rv) w = w.dropRight(1)
      else if (w.endsWith("gh") && w.length - 2 >= rv) w = w.dropRight(1)
      // postlude
      w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
    }
  }

  // ------------------------------------------------------------------
  // Danish
  // ------------------------------------------------------------------
  object Danish extends Stemmer {
    private val vowels = "aeiouyæåø"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0
    private val sEnding = "abcdfghjklmnoprtvyzå"
    private val step1Sufs = Array("erendes", "erende", "hedens", "ethed",
      "erede", "heden", "heder", "endes", "ernes", "erens", "erets",
      "ered", "ende", "erne", "eren", "erer", "heds", "enes", "eres",
      "ens", "ere", "ene", "ers", "ets", "eret", "hed", "es", "et", "er",
      "en", "e", "s")
    private val step3Sufs = Array("elig", "lig", "els", "ig")

    def stem(word: String): String = {
      var w = word
      val r1 = math.min(math.max(regionAfter(w, 0, isV), 3), w.length)
      def step2(x: String): String =
        if ((x.endsWith("gd") || x.endsWith("dt") || x.endsWith("gt") ||
          x.endsWith("kt")) && x.length - 2 >= r1) x.dropRight(1)
        else x
      // step 1 (the among runs inside R1: setlimit tomark p1)
      longestIn(w, step1Sufs, r1) match {
        case null =>
        case "s" =>
          if (sEnding.indexOf(before(w, w.length - 1).toInt) >= 0)
            w = w.dropRight(1)
        case s =>
          w = w.dropRight(s.length)
      }
      // step 2
      w = step2(w)
      // step 3 (igst has no region constraint in the published algorithm)
      if (w.endsWith("igst")) w = w.dropRight(2)
      if (w.endsWith("løst") && w.length - 4 >= r1) w = w.dropRight(1)
      else longestIn(w, step3Sufs, r1) match {
        case null =>
        case s => w = w.dropRight(s.length); w = step2(w)
      }
      // step 4: undouble a final double consonant in R1
      if (w.length >= 2 && w.length - 1 >= r1 &&
        w.charAt(w.length - 1) == w.charAt(w.length - 2) && !isV(w.charAt(w.length - 1)))
        w = w.dropRight(1)
      w
    }
  }

  // ------------------------------------------------------------------
  // Norwegian
  // ------------------------------------------------------------------
  object Norwegian extends Stemmer {
    private val vowels = "aeiouyæåø"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0
    private val sEnding = "bcdfghjlmnoprtvyz" // plus k not after a vowel
    private val step1Sufs = Array("hetenes", "hetene", "hetens", "heten",
      "heter", "endes", "ande", "ende", "edes", "enes", "erte", "ede",
      "ane", "ene", "ens", "ers", "ets", "het", "ast", "ert", "en", "ar",
      "er", "as", "es", "et", "a", "e", "s")
    private val step3Sufs = Array("hetslov", "eleg", "elig", "elov",
      "slov", "leg", "eig", "lig", "els", "lov", "ig")

    def stem(word: String): String = {
      var w = word
      val r1 = math.min(math.max(regionAfter(w, 0, isV), 3), w.length)
      // step 1 (the among runs inside R1: setlimit tomark p1)
      longestIn(w, step1Sufs, r1) match {
        case null =>
        case "s" =>
          val p = before(w, w.length - 1)
          val ok = sEnding.indexOf(p.toInt) >= 0 ||
            (p == 'k' && !isV(before(w, w.length - 2)))
          if (ok) w = w.dropRight(1)
        case s @ ("erte" | "ert") =>
          w = w.dropRight(s.length) + "er"
        case s =>
          w = w.dropRight(s.length)
      }
      // step 2
      if ((w.endsWith("dt") || w.endsWith("vt")) && w.length - 2 >= r1)
        w = w.dropRight(1)
      // step 3
      longestIn(w, step3Sufs, r1) match {
        case null =>
        case s => w = w.dropRight(s.length)
      }
      w
    }
  }

  // ------------------------------------------------------------------
  // Swedish
  // ------------------------------------------------------------------
  object Swedish extends Stemmer {
    private val vowels = "aeiouyäåö"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0
    private val sEnding = "bcdfghjklmnoprtvy"
    private val step1Sufs = Array("heterna", "hetens", "arnas", "ernas",
      "ornas", "heten", "heter", "anden", "arna", "erna", "orna", "ades",
      "andes", "arens", "andet", "arne", "aste", "aren", "erns", "ade",
      "are", "ern", "ens", "het", "ast", "ad", "en", "ar", "er", "or",
      "as", "es", "at", "a", "e", "s")
    private val step3Sufs = Array("lig", "els", "ig")

    def stem(word: String): String = {
      var w = word
      val r1 = math.min(math.max(regionAfter(w, 0, isV), 3), w.length)
      // step 1 (the among runs inside R1: setlimit tomark p1)
      longestIn(w, step1Sufs, r1) match {
        case null =>
        case "s" =>
          if (sEnding.indexOf(before(w, w.length - 1).toInt) >= 0)
            w = w.dropRight(1)
        case s =>
          w = w.dropRight(s.length)
      }
      // step 2
      if ((w.endsWith("dd") || w.endsWith("gd") || w.endsWith("nn") ||
        w.endsWith("dt") || w.endsWith("gt") || w.endsWith("kt") ||
        w.endsWith("tt")) && w.length - 2 >= r1)
        w = w.dropRight(1)
      // step 3
      if (w.endsWith("fullt") && w.length - 5 >= r1) w = w.dropRight(1)
      else if (w.endsWith("löst") && w.length - 4 >= r1) w = w.dropRight(1)
      else longestIn(w, step3Sufs, r1) match {
        case null =>
        case s => w = w.dropRight(s.length)
      }
      w
    }
  }

  // ------------------------------------------------------------------
  // Russian
  // ------------------------------------------------------------------
  object Russian extends Stemmer {
    private val vowels = "аеиоуыэюя"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val gerund1 = Array("вшись", "вши", "в")
    private val gerund2 = Array("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
    private val gerundAll = gerund2 ++ gerund1
    private val adjective = Array("ими", "ыми", "его", "ого", "ему", "ому",
      "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
      "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
    private val participle1 = Array("ем", "нн", "вш", "ющ", "щ")
    private val participle2 = Array("ивш", "ывш", "ующ")
    private val participleAll = participle2 ++ participle1
    private val verb1 = Array("ешь", "нно", "ете", "йте", "ла", "на", "ли",
      "ем", "ло", "но", "ет", "ют", "ны", "ть", "й", "л", "н")
    private val verb2 = Array("ейте", "уйте", "ила", "ыла", "ена", "ите",
      "или", "ыли", "ило", "ыло", "ено", "ует", "уют", "ены", "ить",
      "ыть", "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит",
      "ыт", "ую", "ю")
    private val verbAll = verb2 ++ verb1
    private val noun = Array("иями", "ями", "ами", "ией", "иям", "ием",
      "иях", "ах", "ях", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой",
      "ий", "ям", "ем", "ам", "ом", "ию", "ью", "ия", "ья", "а", "е",
      "и", "й", "о", "у", "ы", "ь", "ю", "я")

    def stem(word: String): String = {
      var w = word.replace("ё", "е")
      val rv = {
        var i = 0
        while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      }
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      // the а/я test character must itself lie inside RV
      def precAYa(cut: Int): Boolean = cut - 1 >= rv && {
        val c = w.charAt(cut - 1); c == 'а' || c == 'я'
      }

      // The published program wraps the whole backward section in
      // `setlimit tomark pV`, so every among below matches within RV only.
      // ---- step 1
      var done = false
      val g = longestIn(w, gerundAll, rv)
      if (g != null) {
        if (gerund2.contains(g)) { w = w.dropRight(g.length); done = true }
        else if (precAYa(w.length - g.length)) { w = w.dropRight(g.length); done = true }
      }
      if (!done) {
        val rf = longestIn(w, Array("ся", "сь"), rv)
        if (rf != null) w = w.dropRight(rf.length)
        var removed = false
        val a = longestIn(w, adjective, rv)
        if (a != null) {
          w = w.dropRight(a.length)
          removed = true
          val p = longestIn(w, participleAll, rv)
          if (p != null) {
            if (participle2.contains(p)) w = w.dropRight(p.length)
            else if (precAYa(w.length - p.length)) w = w.dropRight(p.length)
          }
        }
        if (!removed) {
          val v = longestIn(w, verbAll, rv)
          if (v != null) {
            if (verb2.contains(v)) { w = w.dropRight(v.length); removed = true }
            else if (precAYa(w.length - v.length)) { w = w.dropRight(v.length); removed = true }
          }
        }
        if (!removed) {
          val nn = longestIn(w, noun, rv)
          if (nn != null) w = w.dropRight(nn.length)
        }
      }
      // ---- step 2: final и
      if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)
      // ---- step 3: derivational (R2, nested inside the RV limit)
      val d = longestIn(w, Array("ость", "ост"), rv)
      if (d != null && w.length - d.length >= r2) w = w.dropRight(d.length)
      // ---- step 4: tidy up (нн needs both chars inside RV)
      if (w.endsWith("нн") && w.length - 2 >= rv) w = w.dropRight(1)
      else {
        val sup = longestIn(w, Array("ейше", "ейш"), rv)
        if (sup != null) {
          w = w.dropRight(sup.length)
          if (w.endsWith("нн") && w.length - 2 >= rv) w = w.dropRight(1)
        } else if (w.endsWith("ь") && w.length - 1 >= rv) w = w.dropRight(1)
      }
      w
    }
  }
}
