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
  // (Çilden). A routine-for-routine transcription of the published
  // Snowball program: the mark_* suffix recognisers (longest-match
  // amongs, per-routine vowel-harmony checks, the -(y)/-(n)/-(s)
  // optional-consonant and -(U) optional-vowel tests), the
  // nominal-verb suffix machine, the noun-suffix machine with the
  // recursive -ki chain (whose bra/ket slices can excise a middle
  // segment, e.g. "eminkinde" -> "emnde"), the continue_stemming flag
  // whose unset (-lAr branch) skips the rest of the program, the
  // "ad"/"soyad" reserved words, the harmonizing-vowel append after a
  // final d/g, and last-consonant devoicing. Verified exact against an
  // independent ground-truth Snowball implementation (SnowballOracleSpec).
  // ------------------------------------------------------------------
  object Turkish extends Stemmer {
    private val vowels = "aeıioöuü"
    private val uVowels = "ıiuü"
    @inline private def isV(ch: Char): Boolean = vowels.indexOf(ch.toInt) >= 0

    /** The earlier-vowel set the last vowel must harmonize with. */
    private def harmonySet(v: Char): String = v match {
      case 'a' => "aıou"
      case 'e' => "eiöü"
      case 'ı' => "aı"
      case 'i' => "ei"
      case 'o' | 'u' => "ou"
      case 'ö' | 'ü' => "öü"
      case _ => ""
    }

    // Suffix tables (longest match wins).
    private val aYmUs = Array("miş", "muş", "mış", "müş")
    private val aYDU = Array(
      "dı", "di", "du", "dü", "tı", "ti", "tu", "tü",
      "dık", "dik", "duk", "dük", "tık", "tik", "tuk", "tük",
      "dım", "dim", "dum", "düm", "tım", "tim", "tum", "tüm",
      "dın", "din", "dun", "dün", "tın", "tin", "tun", "tün")
    private val aYsA = Array("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
    private val aCAsInA = Array("casına", "cesine")
    private val aSUnUz = Array("siniz", "sunuz", "sınız", "sünüz")
    private val aLAr = Array("lar", "ler")
    private val aYUm = Array("im", "um", "ım", "üm")
    private val aSUn = Array("sin", "sun", "sın", "sün")
    private val aYUz = Array("iz", "uz", "ız", "üz")
    private val aDUr = Array("dir", "tir", "dur", "tur", "dır", "tır", "dür", "tür")
    private val aNUz = Array("niz", "nuz", "nız", "nüz")
    private val aDA = Array("da", "ta", "de", "te")
    private val aNdA = Array("nda", "nde")
    private val aNA = Array("na", "ne")
    private val aNcA = Array("ca", "ce")
    private val aNU = Array("ni", "nu", "nı", "nü")
    private val aNUn = Array("in", "un", "ın", "ün")
    private val aNdAn = Array("ndan", "nden")
    private val aDAn = Array("dan", "tan", "den", "ten")
    private val aYlA = Array("la", "le")
    private val aYA = Array("a", "e")
    private val aLArI = Array("leri", "ları")
    private val aPoss = Array("m", "n", "miz", "niz", "muz", "nuz", "mız", "nız", "müz", "nüz")

    /** Minimal backwards-mode Snowball environment: `c` scans right to
      * left, `ket` marks the right end of the pending slice, `del`
      * removes [c, ket) — which is usually a suffix but, inside the -ki
      * chain, can be a middle segment.
      */
    private final class Env(var w: String) {
      var c: Int = w.length
      var ket: Int = w.length
      def del(): Unit = { w = w.substring(0, c) + w.substring(ket); ket = c }
    }

    private def eqS(e: Env, s: String): Boolean =
      e.c >= s.length && e.w.startsWith(s, e.c - s.length) && { e.c -= s.length; true }

    private def among(e: Env, tab: Array[String]): Boolean = {
      var best = 0
      var i = 0
      while (i < tab.length) {
        val s = tab(i)
        if (s.length > best && e.c >= s.length && e.w.startsWith(s, e.c - s.length))
          best = s.length
        i += 1
      }
      best > 0 && { e.c -= best; true }
    }

    /** check_vowel_harmony: the word's last vowel (left of `c`) must be
      * preceded, anywhere earlier, by a vowel from its harmony set.
      * Pure test — no cursor movement.
      */
    private def harmonyOk(e: Env): Boolean = {
      var i = e.c - 1
      while (i >= 0 && !isV(e.w.charAt(i))) i -= 1
      i >= 0 && {
        val set = harmonySet(e.w.charAt(i))
        var j = i - 1
        while (j >= 0 && set.indexOf(e.w.charAt(j).toInt) < 0) j -= 1
        j >= 0
      }
    }

    /** mark_suffix_with_optional_y/n/s_consonant:
      * (letter test vowel) or ((not letter) test(next vowel)).
      * The buffered form consumes the letter; the bare form consumes
      * nothing but requires the char before the stem-final char to be
      * a vowel.
      */
    private def optCons(e: Env, letter: Char): Boolean =
      if (e.c > 0 && e.w.charAt(e.c - 1) == letter)
        e.c >= 2 && isV(e.w.charAt(e.c - 2)) && { e.c -= 1; true }
      else e.c >= 2 && isV(e.w.charAt(e.c - 2))

    /** mark_suffix_with_optional_U_vowel:
      * (U test non-vowel) or ((not U) test(next non-vowel)). */
    private def optU(e: Env): Boolean =
      if (e.c > 0 && uVowels.indexOf(e.w.charAt(e.c - 1).toInt) >= 0)
        e.c >= 2 && !isV(e.w.charAt(e.c - 2)) && { e.c -= 1; true }
      else e.c >= 2 && !isV(e.w.charAt(e.c - 2))

    // The mark_* recognisers. Consume on success; callers restore `c`
    // on failure. Routines without harmonyOk match the published
    // program (ysA, yken, cAsInA, lArI, possessives skip the check).
    private def markYmUs(e: Env) = harmonyOk(e) && among(e, aYmUs) && optCons(e, 'y')
    private def markYDU(e: Env) = harmonyOk(e) && among(e, aYDU) && optCons(e, 'y')
    private def markYsA(e: Env) = among(e, aYsA) && optCons(e, 'y')
    private def markYken(e: Env) = eqS(e, "ken") && optCons(e, 'y')
    private def markSUnUz(e: Env) = harmonyOk(e) && among(e, aSUnUz)
    private def markLAr(e: Env) = harmonyOk(e) && among(e, aLAr)
    private def markYUm(e: Env) = harmonyOk(e) && among(e, aYUm) && optCons(e, 'y')
    private def markSUn(e: Env) = harmonyOk(e) && among(e, aSUn)
    private def markYUz(e: Env) = harmonyOk(e) && among(e, aYUz) && optCons(e, 'y')
    private def markDUr(e: Env) = harmonyOk(e) && among(e, aDUr)
    private def markNUz(e: Env) = harmonyOk(e) && among(e, aNUz)
    private def markDA(e: Env) = harmonyOk(e) && among(e, aDA)
    private def markNdA(e: Env) = harmonyOk(e) && among(e, aNdA)
    private def markNA(e: Env) = harmonyOk(e) && among(e, aNA)
    private def markNcA(e: Env) = harmonyOk(e) && among(e, aNcA) && optCons(e, 'n')
    private def markNU(e: Env) = harmonyOk(e) && among(e, aNU)
    private def markNUn(e: Env) = harmonyOk(e) && among(e, aNUn) && optCons(e, 'n')
    private def markNdAn(e: Env) = harmonyOk(e) && among(e, aNdAn)
    private def markDAn(e: Env) = harmonyOk(e) && among(e, aDAn)
    private def markYlA(e: Env) = harmonyOk(e) && among(e, aYlA) && optCons(e, 'y')
    private def markYA(e: Env) = harmonyOk(e) && among(e, aYA) && optCons(e, 'y')
    private def markLArI(e: Env) = among(e, aLArI)
    private def markPoss(e: Env) = among(e, aPoss) && optU(e)
    private def markSU(e: Env) =
      harmonyOk(e) && e.c > 0 && uVowels.indexOf(e.w.charAt(e.c - 1).toInt) >= 0 &&
        { e.c -= 1; optCons(e, 's') }
    private def markYU(e: Env) =
      harmonyOk(e) && e.c > 0 && uVowels.indexOf(e.w.charAt(e.c - 1).toInt) >= 0 &&
        { e.c -= 1; optCons(e, 'y') }

    /** Shared continuation after a possessive/sU match:
      * delete; [mark_lAr] delete try(chain). */
    private def possOrSUtail(e: Env): Unit = {
      e.del(); e.ket = e.c
      val s = e.c
      if (markLAr(e)) { e.del(); val s2 = e.c; if (!chainKi(e)) e.c = s2 }
      else e.c = s
    }

    /** stem_suffix_chain_before_ki: ['ki' (daki/nunki/ndaki chain)]. */
    private def chainKi(e: Env): Boolean = {
      val save = e.c
      e.ket = e.c
      if (eqS(e, "ki") && chainKiBody(e)) true else { e.c = save; false }
    }

    // Entered with 'ki' consumed and `ket` spanning through it.
    private def chainKiBody(e: Env): Boolean = {
      val start = e.c
      if (markDA(e)) {
        e.del() // drops DA..ki
        val s1 = e.c
        e.ket = e.c
        if (markLAr(e)) {
          e.del()
          val s2 = e.c
          if (!chainKi(e)) e.c = s2
        } else {
          e.c = s1
          if (markPoss(e)) {
            e.del(); e.ket = e.c
            val s2 = e.c
            if (markLAr(e)) { e.del(); val s3 = e.c; if (!chainKi(e)) e.c = s3 }
            else e.c = s2
          } else e.c = s1
        }
        true
      } else {
        e.c = start
        if (markNUn(e)) {
          e.del() // drops nUn..ki
          val s1 = e.c
          e.ket = e.c
          if (markLArI(e)) { e.del(); true }
          else {
            e.c = s1
            if (markPoss(e)) { possOrSUtail(e); true }
            else {
              e.c = s1
              if (markSU(e)) { possOrSUtail(e); true }
              else {
                e.c = s1
                if (!chainKi(e)) e.c = s1
                true
              }
            }
          }
        } else {
          e.c = start
          if (markNdA(e)) {
            // no standalone delete: one of the inner matches decides
            val s1 = e.c
            if (markLArI(e)) { e.del(); true } // drops lArI..ki
            else {
              e.c = s1
              if (markSU(e)) { possOrSUtail(e); true }
              else {
                e.c = s1
                chainKi(e) // required — the nDA branch fails without it
              }
            }
          } else { e.c = start; false }
        }
      }
    }

    /** stem_nominal_verb_suffixes. Returns the continue_stemming flag:
      * false when the -lAr branch fired (its `unset` skips noun
      * suffixes AND the postlude, per the published main routine). */
    private def nominal(e: Env): Boolean = {
      e.c = e.w.length; e.ket = e.c
      if (markYmUs(e)) { e.del(); return true }
      e.c = e.ket
      if (markYDU(e)) { e.del(); return true }
      e.c = e.ket
      if (markYsA(e)) { e.del(); return true }
      e.c = e.ket
      if (markYken(e)) { e.del(); return true }
      // cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs -> delete
      e.c = e.ket
      if (among(e, aCAsInA)) {
        val s = e.c
        if (!markSUnUz(e)) { e.c = s
          if (!markLAr(e)) { e.c = s
            if (!markYUm(e)) { e.c = s
              if (!markSUn(e)) { e.c = s
                if (!markYUz(e)) e.c = s } } } }
        if (markYmUs(e)) { e.del(); return true }
      }
      // lAr delete try((DUr|yDU|ysA|ymUs) delete); unset flag
      e.c = e.ket
      if (markLAr(e)) {
        e.del(); e.ket = e.c
        val s = e.c
        if (markDUr(e)) e.del()
        else { e.c = s
          if (markYDU(e)) e.del()
          else { e.c = s
            if (markYsA(e)) e.del()
            else { e.c = s
              if (markYmUs(e)) e.del() else e.c = s } } }
        return false
      }
      // nUz (yDU|ysA) -> delete
      e.c = e.ket
      if (markNUz(e)) {
        val s = e.c
        if (markYDU(e)) { e.del(); return true }
        e.c = s
        if (markYsA(e)) { e.del(); return true }
      }
      // sUnUz delete try(ymUs delete)
      e.c = e.ket
      if (markSUnUz(e)) {
        e.del(); e.ket = e.c
        val s = e.c
        if (markYmUs(e)) e.del() else e.c = s
        return true
      }
      // (yUz|sUn|yUm) delete try(ymUs delete)
      e.c = e.ket
      var hit = markYUz(e)
      if (!hit) { e.c = e.ket; hit = markSUn(e) }
      if (!hit) { e.c = e.ket; hit = markYUm(e) }
      if (hit) {
        e.del(); e.ket = e.c
        val s = e.c
        if (markYmUs(e)) e.del() else e.c = s
        return true
      }
      // DUr delete try((sUnUz|lAr|yUm|sUn|yUz|ε) ymUs delete)
      e.c = e.ket
      if (markDUr(e)) {
        e.del(); e.ket = e.c
        val s = e.c
        if (!markSUnUz(e)) { e.c = s
          if (!markLAr(e)) { e.c = s
            if (!markYUm(e)) { e.c = s
              if (!markSUn(e)) { e.c = s
                if (!markYUz(e)) e.c = s } } } }
        if (markYmUs(e)) e.del() else e.c = s
      }
      true
    }

    /** Continuation after a deleted nUn/ylA match:
      * ([lAr] delete chain-REQUIRED) or (poss tail) or (sU tail) or
      * chain. When the lAr alternative's required chain fails, its
      * delete persists (Snowball never undoes slices) and the next
      * alternatives run against the lAr-stripped stem. */
    private def afterNUnDel(e: Env): Unit = {
      e.ket = e.c
      if (markLAr(e)) {
        e.del()
        if (chainKi(e)) return
      }
      e.c = e.w.length; e.ket = e.c
      if (markPoss(e)) { possOrSUtail(e); return }
      e.c = e.w.length
      if (markSU(e)) { possOrSUtail(e); return }
      e.c = e.w.length
      chainKi(e)
      ()
    }

    /** Continuation after a deleted DA/yU/yA match:
      * (poss del try(lAr del) try chain) or (lAr del try chain). */
    private def afterDADel(e: Env): Unit = {
      e.ket = e.c
      val s1 = e.c
      if (markPoss(e)) {
        e.del(); e.ket = e.c
        val s2 = e.c
        if (markLAr(e)) e.del() else e.c = s2
        e.ket = e.c
        val s3 = e.c
        if (!chainKi(e)) e.c = s3
        return
      }
      e.c = s1
      if (markLAr(e)) {
        e.del(); e.ket = e.c
        val s3 = e.c
        if (!chainKi(e)) e.c = s3
      }
    }

    /** stem_noun_suffixes. */
    private def noun(e: Env): Unit = {
      e.c = e.w.length; e.ket = e.c
      if (markLAr(e)) {
        e.del(); e.ket = e.c
        val s = e.c
        if (!chainKi(e)) e.c = s
        return
      }
      e.c = e.w.length; e.ket = e.c
      if (markNcA(e)) {
        e.del()
        val s1 = e.c
        e.ket = e.c
        if (markLArI(e)) { e.del(); return }
        e.c = s1
        if (markPoss(e)) { possOrSUtail(e); return }
        e.c = s1
        if (markSU(e)) { possOrSUtail(e); return }
        e.c = s1; e.ket = s1
        if (markLAr(e)) { e.del(); val s = e.c; if (!chainKi(e)) e.c = s }
        return
      }
      // (ndA|nA) ((lArI del) or (sU tail) or chain-required)
      e.c = e.w.length; e.ket = e.c
      var m3 = markNdA(e)
      if (!m3) { e.c = e.ket; m3 = markNA(e) }
      if (m3) {
        val s1 = e.c
        if (markLArI(e)) { e.del(); return }
        e.c = s1
        if (markSU(e)) { possOrSUtail(e); return }
        e.c = s1
        if (chainKi(e)) return
      }
      // (ndAn|nU) ((sU tail) or (lArI, no delete))
      e.c = e.w.length; e.ket = e.c
      var m4 = markNdAn(e)
      if (!m4) { e.c = e.ket; m4 = markNU(e) }
      if (m4) {
        val s1 = e.c
        if (markSU(e)) { possOrSUtail(e); return }
        e.c = s1
        if (markLArI(e)) return // published quirk: marks but deletes nothing
      }
      // DAn delete ((poss tail) or (lAr del try chain) or chain)
      e.c = e.w.length; e.ket = e.c
      if (markDAn(e)) {
        e.del(); e.ket = e.c
        val s1 = e.c
        if (markPoss(e)) { possOrSUtail(e); return }
        e.c = s1
        if (markLAr(e)) { e.del(); val s = e.c; if (!chainKi(e)) e.c = s; return }
        e.c = s1
        chainKi(e)
        return
      }
      e.c = e.w.length; e.ket = e.c
      if (markNUn(e)) { e.del(); afterNUnDel(e); return }
      e.c = e.w.length; e.ket = e.c
      if (markYlA(e)) { e.del(); afterNUnDel(e); return }
      e.c = e.w.length; e.ket = e.c
      if (markLArI(e)) { e.del(); return }
      e.c = e.w.length; e.ket = e.c
      if (chainKi(e)) return
      e.c = e.w.length; e.ket = e.c
      if (markDA(e)) { e.del(); afterDADel(e); return }
      e.c = e.w.length; e.ket = e.c
      if (markYU(e)) { e.del(); afterDADel(e); return }
      e.c = e.w.length; e.ket = e.c
      if (markYA(e)) { e.del(); afterDADel(e); return }
      e.c = e.w.length; e.ket = e.c
      if (markPoss(e)) { possOrSUtail(e); return }
      e.c = e.w.length
      if (markSU(e)) { possOrSUtail(e) }
    }

    /** postlude: reserved words, harmonizing-vowel append after final
      * d/g, last-consonant devoicing. */
    private def postlude(e: Env): Unit = {
      if (e.w == "ad" || e.w == "soyad") return
      val w0 = e.w
      if (w0.nonEmpty && (w0.charAt(w0.length - 1) == 'd' || w0.charAt(w0.length - 1) == 'g')) {
        var i = w0.length - 1
        while (i >= 0 && !isV(w0.charAt(i))) i -= 1
        if (i >= 0) w0.charAt(i) match {
          case 'a' | 'ı' => e.w = w0 + "ı"
          case 'e' | 'i' => e.w = w0 + "i"
          case 'o' | 'u' => e.w = w0 + "u"
          case 'ö' | 'ü' => e.w = w0 + "ü"
          case _ =>
        }
      }
      val w1 = e.w
      if (w1.nonEmpty) w1.charAt(w1.length - 1) match {
        case 'b' => e.w = w1.substring(0, w1.length - 1) + "p"
        case 'c' => e.w = w1.substring(0, w1.length - 1) + "ç"
        case 'd' => e.w = w1.substring(0, w1.length - 1) + "t"
        case 'ğ' => e.w = w1.substring(0, w1.length - 1) + "k"
        case _ =>
      }
    }

    def stem(word: String): String = {
      // more_than_one_syllable_word
      var vcount = 0
      var i = 0
      while (i < word.length && vcount < 2) {
        if (isV(word.charAt(i))) vcount += 1
        i += 1
      }
      if (vcount < 2) return word
      val e = new Env(word)
      if (!nominal(e)) return e.w // -lAr branch: flag unset ends the program
      noun(e)
      postlude(e)
      e.w
    }
  }
}
