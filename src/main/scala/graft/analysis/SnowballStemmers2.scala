package graft.analysis

/** Exact implementations of the published Snowball stemming algorithms
  * for the three remaining approximated languages with published
  * snowballstem.org specifications and real user bases — Finnish,
  * Hungarian, Turkish — wired by the reference through Lucene's
  * SnowballFilter (`/root/reference/src/beagle/text_analysis.clj:15-49`).
  *
  * Same contract as [[SnowballStemmers]]: each object follows the
  * published algorithm description step by step (region computation,
  * longest-suffix among-matching where the longest matching suffix is
  * selected first and ONLY then its side conditions apply, no
  * backtracking to shorter suffixes). Written from the public
  * specifications, not ported from any implementation. Lower-case input
  * expected (the analyzer chain lower-cases before stemming unless the
  * dictionary entry is case-sensitive).
  */
object SnowballStemmers2 {

  /** Longest suffix of `w` among `sufs` lying entirely inside the region
    * starting at `limit` (null if none). This is Snowball's
    * `setlimit tomark pN for ([substring])` semantics: a suffix
    * extending before the region boundary is not a match candidate at
    * all, so a shorter in-region suffix can win instead — unlike a
    * post-hoc region check on the longest match.
    */
  private def longestIn(w: String, sufs: Array[String], limit: Int): String = {
    var best: String = null
    var i = 0
    while (i < sufs.length) {
      val s = sufs(i)
      if ((best == null || s.length > best.length) &&
        w.length - s.length >= limit && w.endsWith(s)) best = s
      i += 1
    }
    best
  }

  /** Longest suffix of `w` among `sufs`, unrestricted (null if none).
    * Models the `[substring] R1 among(...)` shape: the longest whole-word
    * match is selected first, and a failed region test then fails the
    * whole step — an out-of-region longer suffix shadows shorter ones.
    */
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

  // ------------------------------------------------------------------
  // Finnish — snowballstem.org/algorithms/finnish/stemmer.html
  // ------------------------------------------------------------------
  object Finnish extends Stemmer {
    private val vowels = "aeiouyäö"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0
    // restricted vowel (V minus y), used by the siin/den/tten condition
    @inline private def isVi(c: Char) = c != 'y' && isV(c)
    private val longVowels =
      Array("aa", "ee", "ii", "oo", "uu", "ää", "öö")
    @inline private def endsLV(w: String): Boolean = {
      val n = w.length
      n >= 2 && {
        val c = w.charAt(n - 1)
        c == w.charAt(n - 2) && "aeiouäö".indexOf(c.toInt) >= 0
      }
    }

    private val step1a = Array("kin", "kaan", "kään", "ko", "kö", "han",
      "hän", "pa", "pä")
    private val step2 = Array("si", "ni", "nsa", "nsä", "mme", "nne",
      "an", "än", "en")
    private val hXn = Array("han", "hen", "hin", "hon", "hun", "hyn",
      "hän", "hön")
    private val case3 = Array(
      "han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön",
      "siin", "den", "tten", "seen", "a", "ä", "tta", "ttä",
      "ta", "tä", "ssa", "ssä", "sta", "stä", "lla", "llä", "lta", "ltä",
      "lle", "na", "nä", "ksi", "ine", "n")
    private val step4 = Array("mpi", "mpa", "mpä", "mmi", "mma", "mmä",
      "impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä")

    def stem(word: String): String = {
      var w = word
      val r1 = regionAfter(w, 0, isV)
      val r2 = regionAfter(w, r1, isV)
      @inline def inR2(s: String): Boolean = w.length - s.length >= r2

      // Step 1: particles etc. Longest R1-limited match among (a) the
      // particle list, deleted when preceded by n, t or a vowel; (b)
      // sti, deleted in R2.
      locally {
        val s = longestIn(w, step1a :+ "sti", r1)
        if (s != null) {
          if (s == "sti") { if (inR2(s)) w = w.dropRight(3) }
          else {
            val cut = w.length - s.length
            if (cut > 0) {
              val p = w.charAt(cut - 1)
              if (p == 'n' || p == 't' || isV(p)) w = w.dropRight(s.length)
            }
          }
        }
      }

      // Step 2: possessives. Longest R1-limited match.
      longestIn(w, step2, r1) match {
        case null =>
        case "si" =>
          if (!(w.length >= 3 && w.charAt(w.length - 3) == 'k'))
            w = w.dropRight(2)
        case "ni" =>
          w = w.dropRight(2)
          if (w.endsWith("kse")) w = w.dropRight(1) + "i"
        case s @ ("nsa" | "nsä" | "mme" | "nne") =>
          w = w.dropRight(s.length)
        case "an" =>
          if (Seq("ta", "ssa", "sta", "lla", "lta", "na")
            .exists(p => w.regionMatches(w.length - 2 - p.length, p, 0, p.length)))
            w = w.dropRight(2)
        case "än" =>
          if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä")
            .exists(p => w.regionMatches(w.length - 2 - p.length, p, 0, p.length)))
            w = w.dropRight(2)
        case "en" =>
          if (Seq("lle", "ine")
            .exists(p => w.regionMatches(w.length - 2 - p.length, p, 0, p.length)))
            w = w.dropRight(2)
        case _ =>
      }

      // Step 3: cases. Longest R1-limited match; sets endingRemoved.
      // Fallback semantics established against the reference
      // implementation: hXn and a/ä fail hard when their condition does
      // not hold; seen/siin/den/tten fall back to the bare-n branch
      // (they all end in n); tta/ttä fall back to deleting ta/tä.
      var endingRemoved = false
      def nBranch(): Unit = {
        w = w.dropRight(1)
        endingRemoved = true
        // if now ending in a long vowel or ie, also delete the last vowel
        if (endsLV(w) || w.endsWith("ie")) w = w.dropRight(1)
      }
      longestIn(w, case3, r1) match {
        case null =>
        case s if hXn.contains(s) =>
          // hXn deleted only when preceded by its own vowel X
          if (w.length > s.length &&
            w.charAt(w.length - s.length - 1) == s.charAt(1)) {
            w = w.dropRight(s.length); endingRemoved = true
          }
        case s @ ("siin" | "den" | "tten") =>
          // preceded by Vi: an i that itself follows a vowel other than y
          val cut = w.length - s.length
          if (cut >= 2 && w.charAt(cut - 1) == 'i' &&
            isVi(w.charAt(cut - 2))) {
            w = w.dropRight(s.length); endingRemoved = true
          } else nBranch()
        case "seen" =>
          val cut = w.length - 4
          if (cut >= 2 &&
            longVowels.exists(lv => w.regionMatches(cut - 2, lv, 0, 2))) {
            w = w.dropRight(4); endingRemoved = true
          } else nBranch()
        case s @ ("a" | "ä") =>
          // preceded by cv (consonant then vowel)
          val cut = w.length - 1
          if (cut >= 2 && isV(w.charAt(cut - 1)) &&
            !isV(w.charAt(cut - 2))) {
            w = w.dropRight(1); endingRemoved = true
          }
        case s @ ("tta" | "ttä") =>
          if (w.length > 3 && w.charAt(w.length - 4) == 'e') {
            w = w.dropRight(3); endingRemoved = true
          } else {
            w = w.dropRight(2); endingRemoved = true
          }
        case s @ ("ta" | "tä" | "ssa" | "ssä" | "sta" | "stä" | "lla" |
            "llä" | "lta" | "ltä" | "lle" | "na" | "nä" | "ksi" | "ine") =>
          w = w.dropRight(s.length); endingRemoved = true
        case "n" =>
          nBranch()
        case _ =>
      }

      // Step 4: other endings. Longest R2-limited match.
      longestIn(w, step4, r2) match {
        case null =>
        case s @ ("mpi" | "mpa" | "mpä" | "mmi" | "mma" | "mmä") =>
          if (!(w.length >= s.length + 2 &&
              w.regionMatches(w.length - s.length - 2, "po", 0, 2)))
            w = w.dropRight(s.length)
        case s =>
          w = w.dropRight(s.length)
      }

      // Step 5: plurals.
      if (endingRemoved) {
        val c = if (w.nonEmpty) w.charAt(w.length - 1) else '\u0000'
        if ((c == 'i' || c == 'j') && w.length - 1 >= r1) w = w.dropRight(1)
      } else if (w.endsWith("t") && w.length - 1 >= r1 &&
        w.length >= 2 && isV(w.charAt(w.length - 2))) {
        w = w.dropRight(1)
        // after a t removal, delete a final mma (not after po) or imma in R2
        if (w.endsWith("imma") && w.length - 4 >= r2) w = w.dropRight(4)
        else if (w.endsWith("mma") && w.length - 3 >= r2 &&
          !(w.length >= 5 && w.regionMatches(w.length - 5, "po", 0, 2)))
          w = w.dropRight(3)
      }

      // Step 6: tidying. The sub-steps apply in turn; each two-letter
      // pattern must lie entirely within R1 (setlimit semantics).
      // 6a) R1 ends with LV -> delete the last letter
      if (endsLV(w) && w.length - 2 >= r1) w = w.dropRight(1)
      // 6b) R1 ends cX (X one of a ä e i) -> delete the last letter
      if (w.length >= 2 && w.length - 2 >= r1) {
        val x = w.charAt(w.length - 1)
        if ((x == 'a' || x == 'ä' || x == 'e' || x == 'i') &&
          !isV(w.charAt(w.length - 2))) w = w.dropRight(1)
      }
      // 6c) R1 ends oj or uj -> delete the last letter
      if (w.length - 2 >= r1 && (w.endsWith("oj") || w.endsWith("uj")))
        w = w.dropRight(1)
      // 6d) R1 ends jo -> delete the last letter
      if (w.length - 2 >= r1 && w.endsWith("jo")) w = w.dropRight(1)
      // 6e) word ends with a double consonant followed by zero or more
      // vowels -> remove the final consonant of the pair
      locally {
        var i = w.length - 1
        while (i >= 0 && isV(w.charAt(i))) i -= 1
        if (i >= 1 && w.charAt(i) == w.charAt(i - 1) && !isV(w.charAt(i)))
          w = w.substring(0, i) + w.substring(i + 1)
      }
      w
    }
  }

  // ------------------------------------------------------------------
  // Hungarian — snowballstem.org/algorithms/hungarian/stemmer.html
  // ------------------------------------------------------------------
  object Hungarian extends Stemmer {
    private val vowels = "aáeéiíoóöőuúüű"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0
    private val digraphs = Array("cs", "dz", "dzs", "gy", "ly", "ny", "sz",
      "ty", "zs")
    // doubled consonant forms recognized by the instrumental/factive
    // conditions; the trigraphs are doubled digraphs (ccs = cs+cs etc.)
    private val doubles3 = Array("ccs", "ddz", "ggy", "lly", "nny", "ssz",
      "tty", "zzs")
    private val doubles2 = Array("bb", "cc", "dd", "ff", "gg", "jj", "kk",
      "ll", "mm", "nn", "pp", "rr", "ss", "tt", "vv", "zz")

    /** Length of the doubled-consonant cluster ending `w` (0 if none). */
    private def doubleLen(w: String): Int = {
      if (doubles3.exists(w.endsWith)) 3
      else if (doubles2.exists(w.endsWith)) 2
      else 0
    }

    /** Remove one member of a trailing doubled consonant (the first char
      * of the cluster, so ccs -> cs, bb -> b).
      */
    private def undouble(w: String): String = {
      val d = doubleLen(w)
      if (d == 0) w else w.substring(0, w.length - d) + w.takeRight(d - 1)
    }

    /** R1: after the first consonant-or-digraph for vowel-initial words,
      * after the first vowel otherwise.
      */
    private def r1of(w: String): Int = {
      if (w.isEmpty) return 0
      if (isV(w.charAt(0))) {
        var i = 1
        while (i < w.length && isV(w.charAt(i))) i += 1
        if (i >= w.length) return w.length
        // skip a whole digraph (dzs before dz before single letter)
        val rest = w.substring(i)
        val d = digraphs.filter(rest.startsWith).map(_.length).maxOption.getOrElse(1)
        math.min(i + d, w.length)
      } else {
        var i = 0
        while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i >= w.length) w.length else i + 1
      }
    }

    private val caseSufs = Array("ban", "ben", "ba", "be", "ra", "re",
      "nak", "nek", "val", "vel", "tól", "től", "ról", "ről", "ból", "ből",
      "hoz", "hez", "höz", "nál", "nél", "ig", "at", "et", "ot", "öt",
      "ért", "képp", "képpen", "kor", "ul", "ül", "vá", "vé",
      "onként", "enként", "anként", "ként", "en", "on", "an", "ön",
      "n", "t")
    private val caseSpecial = Array("ánként", "án", "én")
    private val caseOther = Array("astul", "estül", "ástul", "éstül",
      "stul", "stül")
    private val ownedDel = Array("oké", "öké", "aké", "eké", "ké", "éi", "é")
    private val ownedA = Array("áké", "áéi")
    private val ownedE = Array("éké", "ééi", "éé")
    private val singDel = Array("ünk", "unk", "nk", "juk", "jük", "uk",
      "ük", "em", "om", "am", "m", "od", "ed", "ad", "öd", "d", "ja",
      "je", "a", "e", "o")
    private val singA = Array("ánk", "ájuk", "ám", "ád", "á")
    private val singE = Array("énk", "éjük", "ém", "éd", "é")
    private val plurDel = Array("jaim", "jeim", "aim", "eim", "im", "jaid",
      "jeid", "aid", "eid", "id", "jai", "jei", "ai", "ei", "i", "jaink",
      "jeink", "aink", "eink", "ink", "jaitok", "jeitek", "aitok",
      "eitek", "jaik", "jeik", "aik", "eik", "ik")
    private val plurA = Array("áim", "áid", "ái", "áink", "áitok", "áik")
    private val plurE = Array("éim", "éid", "éi", "éink", "éitek", "éik")

    /** Every Hungarian step is `[substring] R1 among(...)`: the longest
      * whole-word match is chosen first and a failed R1 test fails the
      * step (an out-of-region longer suffix shadows in-region shorter
      * ones — `dák` keeps its k because `ák` matched and failed R1).
      * Established against the reference implementation; the final á/é
      * normalization (v_ending) runs only inside the case and vá/vé
      * branches, and is itself R1-checked (`fát` -> `fá`, not `fa`).
      */
    def stem(word: String): String = {
      var w = word
      val r1 = r1of(w)
      @inline def inR1(s: String): Boolean = w.length - s.length >= r1
      // á/é at the new end normalize to a/e when inside R1
      @inline def vEnding(x: String): String =
        if (x.endsWith("á") && x.length - 1 >= r1) x.dropRight(1) + "a"
        else if (x.endsWith("é") && x.length - 1 >= r1) x.dropRight(1) + "e"
        else x

      // Step 1: instrumental case — al/el in R1 after a double consonant
      locally {
        val s = longest(w, Array("al", "el"))
        if (s != null && inR1(s) && doubleLen(w.dropRight(2)) > 0)
          w = undouble(w.dropRight(2))
      }

      // Step 2: frequent cases — delete, then v_ending
      locally {
        val s = longest(w, caseSufs)
        if (s != null && inR1(s)) w = vEnding(w.dropRight(s.length))
      }

      // Step 3: special cases án/én/ánként left by step 2
      locally {
        val s = longest(w, caseSpecial)
        if (s != null && inR1(s)) {
          w = w.dropRight(s.length) + (if (s == "én") "e" else "a")
        }
      }

      // Step 4: other cases (stul/stül family; in practice the case
      // step's ul/ül eats these first, kept for fidelity to the spec)
      locally {
        val s = longest(w, caseOther)
        if (s != null && inR1(s)) s match {
          case "ástul" => w = w.dropRight(5) + "a"
          case "éstül" => w = w.dropRight(5) + "e"
          case _       => w = w.dropRight(s.length)
        }
      }

      // Step 4b: factive — á/é in R1 after a double consonant, deleted
      // with the pair undoubled (toll+á -> tol)
      locally {
        val s = longest(w, Array("á", "é"))
        if (s != null && inR1(s) && doubleLen(w.dropRight(1)) > 0)
          w = undouble(w.dropRight(1))
      }

      // Step 5: owned (-é "that of")
      locally {
        val s = longest(w, ownedDel ++ ownedA ++ ownedE)
        if (s != null && inR1(s)) {
          if (ownedA.contains(s)) w = w.dropRight(s.length) + "a"
          else if (ownedE.contains(s)) w = w.dropRight(s.length) + "e"
          else w = w.dropRight(s.length)
        }
      }

      // Step 6: singular owner suffixes
      locally {
        val s = longest(w, singDel ++ singA ++ singE)
        if (s != null && inR1(s)) {
          if (singA.contains(s)) w = w.dropRight(s.length) + "a"
          else if (singE.contains(s)) w = w.dropRight(s.length) + "e"
          else w = w.dropRight(s.length)
        }
      }

      // Step 7: plural owner suffixes
      locally {
        val s = longest(w, plurDel ++ plurA ++ plurE)
        if (s != null && inR1(s)) {
          if (plurA.contains(s)) w = w.dropRight(s.length) + "a"
          else if (plurE.contains(s)) w = w.dropRight(s.length) + "e"
          else w = w.dropRight(s.length)
        }
      }

      // Step 8: plural
      locally {
        val s = longest(w, Array("ák", "ék", "ök", "ok", "ek", "ak", "k"))
        if (s != null && inR1(s)) s match {
          case "ák" => w = w.dropRight(2) + "a"
          case "ék" => w = w.dropRight(2) + "e"
          case _    => w = w.dropRight(s.length)
        }
      }
      w
    }
  }

  // ------------------------------------------------------------------
  // Turkish — snowballstem.org/algorithms/turkish/stemmer.html
  // (Çilden). Implements the published algorithm's two suffix phases
  // (nominal-verb suffixes, then iterated noun suffixes), the vowel
  // harmony check, the buffer-letter rules for -(y)X/-(n)X/-(s)X
  // suffixes, the more-than-one-syllable precondition, and the final
  // consonant devoicing. The inter-suffix chaining of the published
  // state machine is expressed as ordered longest-match passes, which
  // covers the same suffix sequences (each pass consumes exactly one
  // suffix, so a chain like -lAr+-DUr+-ymUş unwinds over iterations).
  // ------------------------------------------------------------------
  object Turkish extends Stemmer {
    private val vowels = "aeıioöuü"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    /** Last vowel of `w` before position `end` ('\u0000' if none). */
    private def lastVowelBefore(w: String, end: Int): Char = {
      var i = end - 1
      while (i >= 0 && !isV(w.charAt(i))) i -= 1
      if (i >= 0) w.charAt(i) else '\u0000'
    }

    /** Turkish vowel harmony: may suffix vowel `sv` follow stem vowel
      * `pv`? Two-fold for a/e, four-fold for the high vowels.
      */
    private def harmonic(pv: Char, sv: Char): Boolean = sv match {
      case 'a' => pv == 'a' || pv == 'ı' || pv == 'o' || pv == 'u'
      case 'e' => pv == 'e' || pv == 'i' || pv == 'ö' || pv == 'ü'
      case 'ı' => pv == 'a' || pv == 'ı'
      case 'i' => pv == 'e' || pv == 'i'
      case 'u' => pv == 'o' || pv == 'u'
      case 'ü' => pv == 'ö' || pv == 'ü'
      case _   => true // suffixes with no vowel (e.g. -n buffer alone)
    }

    /** A suffix family: every harmony variant, optionally preceded by a
      * buffer letter per the published -(y)X / -(n)X / -(s)X / -(U)X
      * notation. Consonant buffers (y/n/s) appear only after vowel-final
      * stems; the vowel buffer ('U') is the harmonizing high vowel and
      * appears only after consonant-final stems (its bare form only
      * after vowels).
      */
    private final case class Fam(variants: Array[String], buffer: Char,
        guardBare: Boolean = false)

    private def fam(buffer: Char, variants: String*): Fam =
      Fam(variants.toArray, buffer)

    /** Match `f` at the end of `w` with harmony + buffer rules; returns
      * the matched length (0 if no valid match). Longest variant wins.
      */
    private def matchFam(w: String, f: Fam): Int = {
      var best = 0
      for (v <- f.variants) {
        if (f.buffer == 'U') {
          // -(U)X: variants are given with the buffer vowel (e.g. "ım");
          // full form after a consonant, bare form (minus the vowel)
          // after a vowel, both harmony-checked
          if (v.length > best && w.length > v.length && w.endsWith(v) &&
            !isV(w.charAt(w.length - v.length - 1)) && harmonyOk(w, v))
            best = v.length
          val bare = v.substring(1)
          if (bare.nonEmpty && bare.length > best &&
            w.length > bare.length && w.endsWith(bare) &&
            isV(w.charAt(w.length - bare.length - 1)) && harmonyOk(w, bare))
            best = bare.length
        } else {
          // consonant buffer: the buffered form requires a vowel before
          // the buffer letter (the published optional-letter test)
          if (f.buffer != ' ') {
            val b = f.buffer.toString + v
            if (b.length > best && w.length > b.length && w.endsWith(b) &&
              isV(w.charAt(w.length - b.length - 1)) && harmonyOk(w, v))
              best = b.length
          }
          // bare form. For -(y)X and -(s)X the published optional-letter
          // test requires consonant-preceded-by-vowel at the attachment
          // point (kitab-ı strips, lfutvv-u does not); buffer-n suffixes
          // attach bare after anything.
          if (v.length > best && w.length > v.length && w.endsWith(v)) {
            val pre = w.charAt(w.length - v.length - 1)
            val attachOk =
              if (f.buffer == ' ' || f.buffer == 'n') true
              else !isV(pre) && w.length > v.length + 1 &&
                isV(w.charAt(w.length - v.length - 2))
            if (attachOk && harmonyOk(w, v)) best = v.length
          }
        }
      }
      best
    }

    /** Harmony of variant `v`'s first vowel with the stem's last vowel. */
    private def harmonyOk(w: String, v: String): Boolean = {
      val sv = v.find(isV).getOrElse('\u0000')
      if (sv == '\u0000') true
      else {
        val cut = w.length - v.length
        val pv = lastVowelBefore(w, cut)
        pv == '\u0000' || harmonic(pv, sv)
      }
    }

    // Phase 1: nominal verb suffixes (copula endings on nouns), in the
    // published order. U = ı/i/u/ü, A = a/e, D = d/t.
    private val ymUs = fam('y', "mış", "miş", "muş", "müş")
    private val yDU = fam('y', "dı", "di", "du", "dü", "tı", "ti", "tu", "tü")
    private val ysA = fam('y', "sa", "se")
    private val yken = fam('y', "ken")
    private val cAsInA = fam(' ', "casına", "cesine")
    private val lAr = fam(' ', "lar", "ler")
    private val nUz = fam(' ', "nız", "niz", "nuz", "nüz")
    private val sUnUz = fam(' ', "sınız", "siniz", "sunuz", "sünüz")
    private val yUz = fam('y', "ız", "iz", "uz", "üz")
    private val sUn = fam(' ', "sın", "sin", "sun", "sün")
    private val yUm = fam('y', "ım", "im", "um", "üm")
    private val DUr = fam(' ', "dır", "dir", "dur", "dür",
      "tır", "tir", "tur", "tür")

    // Phase 2: noun suffixes, connected by the published suffix-chain
    // structure (a case ending may be followed underneath by a
    // possessive, a possessive by the plural, -ki loops back to a case:
    // the stem_suffix_chain_after_* routines of the published program).
    private val lArI = fam(' ', "ları", "leri")
    private val nDAn = fam('n', "dan", "den", "tan", "ten")
    private val nDA = fam('n', "da", "de", "ta", "te")
    private val ylA = fam('y', "la", "le")
    private val nUn = fam('n', "ın", "in", "un", "ün")
    private val sU = Fam(Array("ı", "i", "u", "ü"), 's', guardBare = true)
    private val yU = Fam(Array("ı", "i", "u", "ü"), 'y', guardBare = true)
    private val nU = Fam(Array("ı", "i", "u", "ü"), 'n', guardBare = true)
    private val ki = fam(' ', "ki")
    private val UnUz2 = fam('U', "ınız", "iniz", "unuz", "ünüz")
    private val UmUz2 = fam('U', "ımız", "imiz", "umuz", "ümüz")
    private val Um2 = fam('U', "ım", "im", "um", "üm")
    private val ncA = fam('n', "ca", "ce", "ça", "çe")

    def stem(word: String): String = {
      // precondition: more than one syllable, else untouched
      if (word.count(isV) <= 1) return word
      var w = word

      // Phase 1: strip at most one nominal-verb-suffix chain. The
      // published machine tries the -(y)mUş/-(y)DU/-(y)sA/-(y)ken group
      // first, then the person/copula groups with an optional trailing
      // -(y)mUş; expressed here as ordered single strips repeated while
      // a phase-1 suffix remains.
      var changed = true
      var phase1Strips = 0
      var lastWasLAr = false
      while (changed && phase1Strips < 4) {
        changed = false
        val fams = Seq(cAsInA, sUnUz, ymUs, yDU, ysA, yken, DUr, nUz,
          yUz, sUn, yUm, lAr)
        // longest valid match across the families wins (among semantics)
        var bestF: Fam = null
        var bestM = 0
        for (f <- fams) {
          val m = matchFam(w, f)
          // keep at least one syllable in the stem
          if (m > bestM && w.dropRight(m).exists(isV)) { bestM = m; bestF = f }
        }
        if (bestF != null) {
          w = w.dropRight(bestM); changed = true; phase1Strips += 1
          lastWasLAr = bestF eq lAr
        }
      }

      // Phase 2: noun suffixes walked outer-to-inner along the chain
      // automaton: case endings may cover a possessive, a possessive
      // covers the plural, the plural or a case may cover -ki which
      // loops back to a case (evdekilerin -> in, ler, ki, de -> ev).
      // A bare lAr stripped in phase 1 enters at the plural state.
      val caseFams = Seq(cAsInA, nDAn, nDA, ylA, ncA, nUn, Um2, yU, nU, sU)
      val START = 0; val CASE = 1; val POSS = 2; val PLUR = 3; val KI = 4
      val LARI = 5
      var state = if (lastWasLAr) PLUR else START
      changed = true
      while (changed) {
        changed = false
        val fams = state match {
          case START => Seq(lArI, UnUz2, UmUz2) ++ caseFams ++ Seq(ki, lAr)
          case CASE  => Seq(lArI, UnUz2, UmUz2, Um2, sU, lAr)
          case POSS  => Seq(lAr)
          case PLUR  => Seq(ki)
          case KI    => Seq(lArI, cAsInA, nDAn, nDA, ylA, ncA, nUn, yU,
            nU, sU)
          case LARI  => Seq(ki)
        }
        // longest valid match across the families wins (among semantics)
        var bestF: Fam = null
        var bestM = 0
        for (f <- fams) {
          val m = matchFam(w, f)
          if (m > bestM && w.dropRight(m).exists(isV)) { bestM = m; bestF = f }
        }
        if (bestF != null) {
          val f = bestF
          w = w.dropRight(bestM); changed = true
          state =
            if (f eq lArI) LARI
            else if (f eq lAr) PLUR
            else if (f eq ki) KI
            else if ((f eq sU) || (f eq Um2) || (f eq UmUz2) || (f eq UnUz2)) POSS
            else CASE
        }
      }

      // Postlude, in the published order: a stem ending in d or g gets
      // the harmonizing high vowel APPENDED (ükhasbd -> ükhasbdı), and
      // only then are final voiced stops devoiced (b -> p, c -> ç; the
      // d/t and ğ/k cases are unreachable after the append).
      if (w.nonEmpty) {
        val last = w.charAt(w.length - 1)
        if (last == 'd' || last == 'g') {
          val u = lastVowelBefore(w, w.length) match {
            case 'a' | 'ı' => "ı"
            case 'e' | 'i' => "i"
            case 'o' | 'u' => "u"
            case 'ö' | 'ü' => "ü"
            case _         => "ı"
          }
          w = w + u
        } else {
          val repl = last match {
            case 'b' => 'p'; case 'c' => 'ç'; case 'd' => 't'; case 'ğ' => 'k'
            case other => other
          }
          if (repl != last) w = w.substring(0, w.length - 1) + repl
        }
      }
      w
    }
  }
}
