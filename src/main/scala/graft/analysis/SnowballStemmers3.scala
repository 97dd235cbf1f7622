package graft.analysis

/** Exact implementations of the published Snowball stemming algorithms for
  * further languages the reference wires through Lucene's SnowballFilter
  * (`/root/reference/src/beagle/text_analysis.clj:15-49`), continuing
  * [[SnowballStemmers]] / [[SnowballStemmers2]]. Each implementation was
  * exact-matched against an independent ground-truth Snowball
  * implementation on ~10k-word generated corpora (real inflected words,
  * stem x suffix-inventory crosses, and random strings per alphabet).
  */
object SnowballStemmers3 {

  /** Longest suffix of `w` among `sufs` lying entirely inside the region
    * starting at `limit` (Snowball `setlimit tomark pN for [substring]`).
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

  /** Longest suffix of `w` among the keys of `sufs`, unrestricted
    * (`[substring] R1 among(...)`: region test applies after selection).
    */
  private def longestPair(w: String, sufs: Array[(String, Int)]): (String, Int) = {
    var best: (String, Int) = null
    var i = 0
    while (i < sufs.length) {
      val s = sufs(i)
      if ((best == null || s._1.length > best._1.length) && w.endsWith(s._1)) best = s
      i += 1
    }
    best
  }

  // ------------------------------------------------------------------
  // Romanian — snowballstem.org/algorithms/romanian/stemmer.html
  // Uses the cedilla forms ş (U+015F) / ţ (U+0163), as the published
  // algorithm and the reference's Lucene stemmer do.
  // ------------------------------------------------------------------
  object Romanian extends Stemmer {
    private val vowels = "aeiouăâî"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    // step 0: plurals. res: 1 delete, 2 ->a, 3 ->e, 4 ->i, 5 ile->i
    // unless preceded by ab, 6 ->at, 7 ->aţi
    private val step0: Array[(String, Int)] = Array(
      ("iilor", 4), ("atei", 6), ("aţia", 7), ("aţie", 7), ("elor", 3),
      ("iile", 4), ("ilor", 4), ("ului", 1), ("aua", 2), ("ele", 3),
      ("iei", 4), ("ile", 5), ("iua", 4), ("ea", 3), ("ii", 4), ("ul", 1))

    // step 1 (repeat): combining suffixes. res: 1 ->abil, 2 ->ibil,
    // 3 ->iv, 4 ->ic, 5 ->at, 6 ->it
    private val combo: Array[(String, Int)] = Array(
      ("abilitate", 1), ("abilitati", 1), ("abilităţi", 1), ("ibilitate", 2),
      ("abilităi", 1), ("icatori", 4), ("icitate", 4), ("icitati", 4),
      ("icităţi", 4), ("ivitate", 3), ("ivitati", 3), ("ivităţi", 3),
      ("atoare", 5), ("aţiune", 5), ("icator", 4), ("icităi", 4),
      ("itoare", 6), ("ivităi", 3), ("iţiune", 6), ("ătoare", 5),
      ("ativa", 5), ("ative", 5), ("ativi", 5), ("ativă", 5), ("atori", 5),
      ("icala", 4), ("icale", 4), ("icali", 4), ("icală", 4), ("iciva", 4),
      ("icive", 4), ("icivi", 4), ("icivă", 4), ("itiva", 6), ("itive", 6),
      ("itivi", 6), ("itivă", 6), ("itori", 6), ("ători", 5), ("ativ", 5),
      ("ator", 5), ("ical", 4), ("iciv", 4), ("itiv", 6), ("itor", 6),
      ("ător", 5))
    private val comboRepl = Array("", "abil", "ibil", "iv", "ic", "at", "it")

    // step 2: standard suffixes in R2. res: 1 delete, 2 iune/iuni after ţ
    // (ţ -> t), 3 ->ist
    private val standard: Array[(String, Int)] = Array(
      ("abila", 1), ("abile", 1), ("abili", 1), ("abilă", 1), ("atori", 1),
      ("ibila", 1), ("ibile", 1), ("ibili", 1), ("ibilă", 1), ("itate", 1),
      ("itati", 1), ("ităţi", 1), ("abil", 1), ("anta", 1), ("ante", 1),
      ("anti", 1), ("antă", 1), ("ator", 1), ("ibil", 1), ("isme", 3),
      ("ista", 3), ("iste", 3), ("isti", 3), ("istă", 3), ("ităi", 1),
      ("iune", 2), ("iuni", 2), ("işti", 3), ("oasa", 1), ("oase", 1),
      ("oasă", 1), ("ant", 1), ("ata", 1), ("ate", 1), ("ati", 1),
      ("ată", 1), ("ica", 1), ("ice", 1), ("ici", 1), ("ică", 1),
      ("ism", 3), ("ist", 3), ("ita", 1), ("ite", 1), ("iti", 1),
      ("ită", 1), ("iva", 1), ("ive", 1), ("ivi", 1), ("ivă", 1),
      ("osi", 1), ("oşi", 1), ("uta", 1), ("ute", 1), ("uti", 1),
      ("ută", 1), ("at", 1), ("ic", 1), ("it", 1), ("iv", 1), ("os", 1),
      ("ut", 1))

    // step 3: verb suffixes in RV. Group 1 requires a preceding
    // consonant or u (itself inside RV); group 2 deletes unconditionally.
    private val verb1: Array[String] = Array(
      "aserăţi", "iserăţi", "userăţi", "âserăţi", "aserăm", "iserăm",
      "userăm", "âserăm", "arăţi", "aseră", "aseşi", "ească", "irăţi",
      "iseră", "iseşi", "urăţi", "useră", "useşi", "ârăţi", "âseră",
      "âseşi", "arăm", "asem", "ează", "eaţi", "eşte", "eşti", "iaţi",
      "indu", "irăm", "isem", "urăm", "usem", "ându", "ârăm", "âsem",
      "ăşte", "ăşti", "are", "ară", "ase", "aşi", "eai", "eam", "eau",
      "ere", "esc", "eze", "ezi", "iai", "iam", "iau", "ind", "ire",
      "iră", "ise", "işi", "ură", "use", "uşi", "ând", "âre", "âră",
      "âse", "âşi", "ăsc", "ai", "am", "au", "ea", "ez", "ia", "ui", "âi")
    private val verb2: Array[String] = Array(
      "seserăţi", "seserăm", "serăţi", "seseră", "seseşi", "serăm",
      "sesem", "seră", "sese", "seşi", "aţi", "eţi", "iţi", "sei", "âţi",
      "em", "im", "se", "âm", "ăm")
    private val verbAll: Array[String] = verb1 ++ verb2
    private val verb1Set = verb1.toSet

    // step 4: final vowel in RV
    private val vowelSufs: Array[(String, Int)] = Array(
      ("ie", 1), ("a", 1), ("e", 1), ("i", 1), ("ă", 1))

    private def regionAfter(w: String, from: Int): Int = {
      var i = from
      val n = w.length
      while (i < n && !isV(w.charAt(i))) i += 1
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }

    def stem(word: String): String = {
      // prelude: u and i between vowels are marked U and I
      val cs = word.toCharArray
      var i = 1
      while (i < cs.length - 1) {
        val c = cs(i)
        if ((c == 'u' || c == 'i') && isV(cs(i - 1)) && isV(cs(i + 1)))
          cs(i) = (c - 32).toChar
        i += 1
      }
      var w = new String(cs)

      val r1 = regionAfter(w, 0)
      val r2 = regionAfter(w, r1)
      val rv: Int = { // Spanish-style RV
        val n = w.length
        if (n < 3) n
        else if (!isV(w.charAt(1))) {
          var j = 2
          while (j < n && !isV(w.charAt(j))) j += 1
          if (j < n) j + 1 else n
        } else if (isV(w.charAt(0)) && isV(w.charAt(1))) {
          var j = 2
          while (j < n && isV(w.charAt(j))) j += 1
          if (j < n) j + 1 else n
        } else math.min(3, n)
      }

      // ---- step 0: plurals (longest match, R1 test)
      val s0 = longestPair(w, step0)
      if (s0 != null && w.length - s0._1.length >= r1) {
        val cut = w.length - s0._1.length
        s0._2 match {
          case 1 => w = w.substring(0, cut)
          case 2 => w = w.substring(0, cut) + "a"
          case 3 => w = w.substring(0, cut) + "e"
          case 4 => w = w.substring(0, cut) + "i"
          case 5 =>
            if (!(cut >= 2 && w.regionMatches(cut - 2, "ab", 0, 2)))
              w = w.substring(0, cut) + "i"
          case 6 => w = w.substring(0, cut) + "at"
          case 7 => w = w.substring(0, cut) + "aţi"
        }
      }

      // ---- step 1: combining suffixes, repeated (R1)
      var removed = false
      var loop = true
      while (loop) {
        val sc = longestPair(w, combo)
        if (sc != null && w.length - sc._1.length >= r1) {
          w = w.substring(0, w.length - sc._1.length) + comboRepl(sc._2)
          removed = true
        } else loop = false
      }

      // ---- step 2: standard suffixes (R2)
      val ss = longestPair(w, standard)
      if (ss != null && w.length - ss._1.length >= r2) {
        val cut = w.length - ss._1.length
        ss._2 match {
          case 1 => w = w.substring(0, cut); removed = true
          case 2 =>
            if (cut >= 1 && w.charAt(cut - 1) == 'ţ') {
              w = w.substring(0, cut - 1) + "t"; removed = true
            }
          case 3 => w = w.substring(0, cut) + "ist"; removed = true
        }
      }

      // ---- step 3: verb suffixes (RV), only if steps 1-2 removed nothing
      if (!removed) {
        val sv = longestIn(w, verbAll, rv)
        if (sv != null) {
          val cut = w.length - sv.length
          if (verb1Set.contains(sv)) {
            if (cut - 1 >= rv && cut >= 1 && {
              val p = w.charAt(cut - 1); !isV(p) || p == 'u' || p == 'U'
            }) w = w.substring(0, cut)
          } else w = w.substring(0, cut)
        }
      }

      // ---- step 4: final vowel (RV)
      val sf = longestPair(w, vowelSufs)
      if (sf != null && w.length - sf._1.length >= rv)
        w = w.substring(0, w.length - sf._1.length)

      // postlude
      w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
    }
  }

  // ------------------------------------------------------------------
  // Catalan — the contributed Snowball algorithm (snowballstem.org).
  // ------------------------------------------------------------------
  object Catalan extends Stemmer {
    private val vowels = "aeiou\u00e1\u00e0\u00e9\u00e8\u00ed\u00ec\u00ef\u00f3\u00f2\u00fa\u00fc"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val pronouns: Array[String] = Array(
      "selas", "selos", "-les", "-nos", "sela", "selo", "'hi", "'ho",
      "'ls", "'ns", "-la", "-li", "-ls", "-me", "-ns", "-te", "-us", "ens",
      "las", "les", "los", "nos", "vos", "'l", "'m", "'n", "'s", "'t",
      "-m", "-n", "hi", "ho", "la", "le", "li", "lo", "me", "se", "us")

    private val standard: Array[(String, Int)] = Array(
      ("allengües", 1), ("ativitats", 1), ("quíssimes", 5), ("ativitat",
      1), ("bilitats", 1), ("ialismes", 1), ("ialistes", 1), ("ionistes",
      1), ("lógiques", 3), ("quíssima", 5), ("quíssims", 5), ("atòries",
      1), ("bilitat", 1), ("ialisme", 1), ("ialista", 1), ("ionisme", 1),
      ("ionista", 1), ("isament", 1), ("ivitats", 1), ("quíssim", 5),
      ("íssimes", 1), ("acions", 2), ("aments", 1), ("ancies", 1),
      ("atives", 1), ("atòria", 1), ("encies", 1), ("formes", 1),
      ("idores", 1), ("ificar", 1), ("ivisme", 1), ("ivitat", 1),
      ("logies", 3), ("logíes", 3), ("lógica", 3), ("lógics", 3),
      ("ències", 1), ("íssima", 1), ("íssims", 1), ("ables", 1), ("adora",
      1), ("adors", 1), ("adura", 1), ("ament", 1), ("ancia", 1), ("asses",
      1), ("assos", 1), ("atius", 1), ("ativa", 1), ("cions", 1), ("doras",
      1), ("dores", 1), ("dures", 1), ("encia", 1), ("eries", 1), ("ibles",
      1), ("ictes", 1), ("idors", 1), ("inies", 1), ("iques", 4), ("ismes",
      1), ("issem", 1), ("isseu", 1), ("issos", 1), ("istes", 1), ("itats",
      1), ("itzar", 1), ("logia", 3), ("logis", 3), ("logía", 3), ("ments",
      1), ("sfera", 1), ("toris", 1), ("trius", 1), ("àries", 1), ("ència",
      1), ("ìssem", 1), ("ìsseu", 1), ("ìssin", 1), ("ícies", 1), ("íinia",
      1), ("ínies", 1), ("íssem", 1), ("ísseu", 1), ("íssim", 1), ("íssiu",
      1), ("ístic", 1), ("ívola", 1), ("ïtats", 1), ("able", 1), ("ació",
      1), ("ades", 2), ("aire", 1), ("alla", 1), ("amen", 1), ("ants", 1),
      ("aris", 1), ("assa", 1), ("atge", 1), ("atiu", 1), ("bles", 1),
      ("dora", 1), ("dors", 1), ("egar", 1), ("ejar", 1), ("ella", 1),
      ("ells", 1), ("enca", 1), ("ents", 1), ("eres", 1), ("eria", 1),
      ("eses", 1), ("esos", 1), ("essa", 1), ("ible", 1), ("icis", 1),
      ("icte", 1), ("ient", 1), ("imes", 1), ("ines", 1), ("inia", 1),
      ("ions", 1), ("isam", 1), ("isme", 1), ("issa", 1), ("ista", 1),
      ("iste", 1), ("itar", 1), ("itat", 1), ("ites", 1), ("ives", 1),
      ("logi", 3), ("ment", 1), ("nces", 1), ("ores", 1), ("oses", 1),
      ("osos", 1), ("otes", 1), ("tori", 1), ("triu", 1), ("ària", 1),
      ("ícia", 1), ("ícis", 1), ("ívol", 1), ("ïtat", 1), ("ada", 2),
      ("all", 1), ("als", 1), ("ana", 1), ("ant", 1), ("ari", 1), ("ats",
      1), ("ble", 1), ("ció", 1), ("dor", 1), ("dur", 1), ("dís", 1),
      ("ell", 1), ("enc", 1), ("ent", 1), ("era", 1), ("ers", 1), ("esa",
      1), ("esc", 1), ("eta", 1), ("ets", 1), ("fer", 1), ("ica", 4),
      ("ici", 1), ("ics", 4), ("ima", 1), ("ims", 1), ("ina", 1), ("ita",
      1), ("ius", 1), ("iva", 1), ("nça", 1), ("ora", 1), ("ors", 1),
      ("osa", 1), ("ota", 1), ("ots", 1), ("uds", 1), ("uts", 1), ("íci",
      1), ("al", 1), ("ar", 1), ("et", 1), ("ic", 4), ("il", 1), ("ió", 1),
      ("ls", 1), ("or", 1), ("ot", 1), ("ud", 1), ("ès", 1), ("és", 1),
      ("ís", 1), ("ós", 1), ("ó", 1))

    private val verb1: Array[String] = Array(
      "aríamos", "eresseu", "eríamos", "iríamos", "iéramos", "iésemos",
      "adores", "aremos", "aríais", "asteis", "eremos", "eríais", "esquen",
      "esques", "esquin", "esquis", "ierais", "ieseis", "iremos", "iríais",
      "isquen", "isteis", "ábamos", "áramos", "ásemos", "ïsquen", "ïsques",
      "abais", "adora", "adors", "arais", "arian", "arien", "aries",
      "aréis", "arían", "arías", "aríem", "aríeu", "aseis", "assen",
      "asses", "asseu", "assim", "assin", "assis", "assiu", "atges",
      "eixen", "eixer", "eixes", "eixin", "eixis", "erass", "eréis",
      "erían", "erías", "esqui", "essen", "esses", "esseu", "essim",
      "essin", "essis", "iendo", "ieran", "ieras", "ieron", "iesen",
      "ieses", "iguem", "igueu", "irien", "iries", "iréis", "irìem",
      "irìeu", "irían", "irías", "iríem", "iríeu", "issen", "isses",
      "issim", "issin", "issis", "issiu", "itzeu", "itzis", "àssem",
      "àsseu", "àssim", "àssiu", "èssim", "èssiu", "éssem", "éssen",
      "ésseu", "éssim", "éssiu", "íamos", "íssim", "íssiu", "ïguem",
      "ïgueu", "ïssen", "ïsses", "ïssin", "ïssis", "aban", "abas", "adas",
      "ades", "ador", "ados", "amos", "aran", "aras", "arem", "aren",
      "ares", "areu", "aria", "aron", "aràs", "arán", "arás", "arés",
      "aría", "asen", "ases", "aste", "avem", "aven", "aves", "eixi",
      "eixo", "ents", "erau", "eren", "erán", "erás", "ería", "esca",
      "idas", "ides", "idos", "iera", "iese", "imos", "ineu", "inin",
      "inis", "iran", "irem", "iren", "ires", "ireu", "iria", "iràs",
      "irán", "irás", "iría", "isca", "isin", "isis", "iste", "itza",
      "itzi", "itzo", "itzà", "ixen", "ixes", "ques", "tzar", "udes",
      "àrem", "àren", "àreu", "àvem", "àveu", "ávem", "áveu", "íais",
      "írem", "íreu", "ïdes", "ïren", "ïres", "ïsca", "ïxen", "ïxes",
      "aba", "ada", "ado", "ams", "ant", "ara", "arà", "ará", "aré", "ase",
      "ass", "ats", "ava", "dre", "eix", "ent", "erá", "eré", "ess", "ida",
      "ido", "ids", "ien", "ies", "ieu", "ini", "int", "ira", "irà", "irá",
      "irè", "iré", "isc", "its", "itz", "ixa", "ixo", "iïn", "iïs", "sin",
      "sis", "uda", "áis", "ìeu", "ían", "ías", "íem", "íeu", "ïda", "ïen",
      "ïes", "ïra", "ïsc", "ïxo", "ad", "am", "an", "ar", "as", "at", "au",
      "ed", "em", "en", "er", "es", "ia", "id", "ie", "ii", "in", "io",
      "ir", "it", "ix", "ià", "iï", "ió", "re", "ut", "às", "és", "ía",
      "ís", "ïa", "ïm", "ït", "ïu", "ïx", "í")

    private val residual: Array[(String, Int)] = Array(
      ("iqu", 2), ("itz", 1), ("eu", 1), ("ir", 1), ("is", 1), ("it", 1),
      ("iu", 1), ("os", 1), ("ïn", 1), ("ïs", 1), ("a", 1), ("e", 1), ("i",
      1), ("o", 1), ("s", 1), ("à", 1), ("á", 1), ("é", 1), ("ì", 1), ("í",
      1), ("ï", 1), ("ó", 1))

    private def regionAfter(w: String, from: Int): Int = {
      var i = from
      val n = w.length
      while (i < n && !isV(w.charAt(i))) i += 1
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }

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

    private def longestPair(w: String, sufs: Array[(String, Int)]): (String, Int) = {
      var best: (String, Int) = null
      var i = 0
      while (i < sufs.length) {
        val s = sufs(i)
        if ((best == null || s._1.length > best._1.length) && w.endsWith(s._1)) best = s
        i += 1
      }
      best
    }

    def stem(word: String): String = {
      var w = word
      val r1 = regionAfter(w, 0)
      val r2 = regionAfter(w, r1)
      @inline def inR1(cut: Int) = cut >= r1
      @inline def inR2(cut: Int) = cut >= r2

      // attached pronouns (R1)
      locally {
        val s = longest(w, pronouns)
        if (s != null && inR1(w.length - s.length)) w = w.dropRight(s.length)
      }
      // standard suffixes, else verb suffixes
      var removed = false
      locally {
        val m = longestPair(w, standard)
        if (m != null) {
          val cut = w.length - m._1.length
          m._2 match {
            case 1 => if (inR1(cut)) { w = w.substring(0, cut); removed = true }
            case 2 => if (inR2(cut)) { w = w.substring(0, cut); removed = true }
            case 3 => if (inR2(cut)) { w = w.substring(0, cut) + "log"; removed = true }
            case 4 => if (inR2(cut)) { w = w.substring(0, cut) + "ic"; removed = true }
            case 5 => if (inR1(cut)) { w = w.substring(0, cut) + "c"; removed = true }
          }
        }
      }
      if (!removed) {
        val m = longest(w, verb1)
        val ando = w.endsWith("ando") && (m == null || m.length <= 4)
        if (ando && inR2(w.length - 4)) w = w.dropRight(4)
        else if (m != null && inR1(w.length - m.length)) w = w.dropRight(m.length)
      }
      // residual
      locally {
        val m = longestPair(w, residual)
        if (m != null) {
          val cut = w.length - m._1.length
          m._2 match {
            case 1 => if (inR1(cut)) w = w.substring(0, cut)
            case 2 => if (inR1(cut)) w = w.substring(0, cut) + "ic"
          }
        }
      }
      // cleaning
      val sb = new StringBuilder(w.length)
      var i2 = 0
      while (i2 < w.length) {
        val c = w.charAt(i2)
        c match {
          case '\u00e0' | '\u00e1' => sb.append('a')
          case '\u00e8' | '\u00e9' => sb.append('e')
          case '\u00ec' | '\u00ed' | '\u00ef' => sb.append('i')
          case '\u00f2' | '\u00f3' => sb.append('o')
          case '\u00fa' | '\u00fc' => sb.append('u')
          case '\u00b7' => sb.append('.')
          case _ => sb.append(c)
        }
        i2 += 1
      }
      sb.toString
    }
  }


  // ------------------------------------------------------------------
  // Basque — the contributed Snowball algorithm (snowballstem.org).
  // Three among passes (verb, noun, adjective suffixes); exception
  // entries act as shadows that stop a pass without altering the word.
  // ------------------------------------------------------------------
  object Basque extends Stemmer {
    private val vowels = "aeiou"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val aditzak: Array[(String, Int)] = Array(
      ("minutuko", 6), ("garrena", 1), ("gerrena", 1), ("aurrea", 1),
      ("garren", 1), ("garria", 2), ("gerren", 1), ("gibela", 1),
      ("gintza", 1), ("gintzo", 1), ("gintzu", 1), ("handia", 1),
      ("kaldea", 1), ("kintza", 1), ("kirria", 1), ("koitza", 1),
      ("kondoa", 1), ("kuntza", 1), ("larria", 1), ("mendia", 1),
      ("mendua", 1), ("mentua", 1), ("ontzia", 1), ("taldea", 1),
      ("taldia", 1), ("tariko", 1), ("tasuna", 1), ("tzaina", 1),
      ("tzalea", 1), ("tzarra", 1), ("urrena", 1), ("zionea", 1), ("aizun",
      1), ("aldea", 1), ("aldia", 1), ("antza", 1), ("artea", 1), ("asuna",
      1), ("aurka", 10), ("aurre", 1), ("behar", 1), ("bizia", 1),
      ("burua", 1), ("degia", 1), ("denda", 1), ("duria", 1), ("durua", 1),
      ("eroza", 1), ("estua", 1), ("etako", 1), ("etara", 1), ("etxea", 1),
      ("gabea", 1), ("garna", 1), ("garri", 2), ("geldi", 8), ("gibel", 1),
      ("gilea", 1), ("gunea", 1), ("handi", 1), ("igaro", 9), ("kabea", 1),
      ("kaila", 1), ("kalde", 1), ("karia", 1), ("keria", 1), ("kirri", 1),
      ("koitz", 1), ("kondo", 1), ("korra", 1), ("kotea", 1), ("kumea", 1),
      ("laria", 1), ("larri", 1), ("lekua", 1), ("liara", 1), ("mendi", 1),
      ("mendu", 1), ("mentu", 1), ("nahia", 1), ("ondoa", 1), ("ontzi", 1),
      ("ordea", 1), ("ordua", 1), ("ostea", 1), ("skila", 1), ("takoa", 1),
      ("talde", 1), ("taldi", 1), ("taria", 1), ("tarik", 1), ("taroa", 1),
      ("tasun", 1), ("tegia", 1), ("teria", 1), ("tiara", 1), ("tokia", 1),
      ("trako", 5), ("tzain", 1), ("tzale", 1), ("tzara", 1), ("urren", 1),
      ("zaina", 1), ("zalea", 1), ("zaroa", 1), ("zehar", 7), ("zinoa", 1),
      ("zione", 1), ("alde", 1), ("aldi", 1), ("anda", 1), ("anga", 1),
      ("aria", 1), ("aroa", 1), ("arte", 1), ("asia", 1), ("asun", 1),
      ("bera", 1), ("buru", 2), ("dara", 1), ("degi", 1), ("duna", 1),
      ("duri", 1), ("duru", 1), ("egia", 1), ("emea", 1), ("enea", 1),
      ("eria", 1), ("eroa", 1), ("eroz", 1), ("estu", 1), ("etan", 1),
      ("etxe", 1), ("ezia", 1), ("gabe", 1), ("gaia", 1), ("geia", 1),
      ("gela", 1), ("gile", 1), ("giro", 1), ("gune", 1), ("joka", 3),
      ("kabe", 1), ("kada", 1), ("kail", 1), ("kana", 1), ("kari", 1),
      ("kera", 1), ("keta", 1), ("kide", 1), ("kina", 1), ("koia", 1),
      ("kote", 1), ("kume", 1), ("lari", 1), ("leku", 1), ("liar", 1),
      ("mina", 1), ("nahi", 1), ("ngoa", 1), ("ohia", 1), ("ondo", 1),
      ("orde", 1), ("ordu", 1), ("oroa", 1), ("osoa", 1), ("oste", 1),
      ("pera", 1), ("tako", 1), ("tara", 1), ("tari", 1), ("taro", 1),
      ("tatu", 4), ("tegi", 1), ("tiar", 1), ("tila", 1), ("toki", 1),
      ("tsua", 1), ("ttoa", 1), ("tuko", 1), ("txoa", 1), ("txua", 1),
      ("tzar", 1), ("tzen", 4), ("tzoa", 1), ("tzua", 1), ("unea", 1),
      ("zain", 1), ("zale", 1), ("zaro", 1), ("zino", 1), ("zioa", 1),
      ("zkoa", 1), ("ztoa", 1), ("ada", 1), ("ail", 1), ("ara", 1), ("ari",
      1), ("aro", 1), ("asi", 1), ("dar", 1), ("dua", 1), ("dun", 1),
      ("egi", 1), ("eko", 1), ("eme", 1), ("ena", 1), ("ero", 1), ("eta",
      1), ("eza", 1), ("gai", 1), ("gei", 1), ("goi", 1), ("kan", 1),
      ("ket", 1), ("kia", 1), ("kin", 1), ("koa", 1), ("koi", 1), ("kor",
      1), ("min", 1), ("nea", 1), ("ngo", 1), ("noa", 1), ("ohi", 1),
      ("oia", 1), ("ola", 1), ("ora", 2), ("oro", 1), ("osa", 1), ("oso",
      1), ("pea", 1), ("ren", 2), ("ska", 1), ("sko", 1), ("sta", 1),
      ("tan", 1), ("tar", 1), ("tea", 1), ("ten", 4), ("tia", 1), ("toa",
      1), ("tra", 1), ("tsu", 1), ("tto", 1), ("tua", 1), ("txo", 1),
      ("txu", 1), ("tza", 2), ("tzo", 1), ("tzu", 1), ("una", 1), ("une",
      1), ("xka", 1), ("zio", 1), ("zka", 1), ("zko", 1), ("zto", 1),
      ("zua", 1), ("ñoa", 1), ("ak", 1), ("ar", 1), ("di", 1), ("du", 1),
      ("ek", 1), ("en", 4), ("ez", 1), ("ga", 1), ("ge", 1), ("go", 1),
      ("ka", 1), ("ki", 1), ("ko", 1), ("na", 1), ("ne", 1), ("no", 1),
      ("oi", 1), ("or", 2), ("os", 1), ("pe", 1), ("ra", 1), ("ro", 1),
      ("sa", 1), ("ta", 1), ("te", 1), ("ti", 1), ("to", 1), ("tu", 1),
      ("tz", 1), ("za", 1), ("zp", 1), ("zu", 1), ("ñi", 1), ("ño", 1),
      ("z", 1))

    private val izenak: Array[(String, Int)] = Array(
      ("arabera", 4), ("atseden", 3), ("tzailea", 1), ("aldatu", 1),
      ("baditu", 5), ("erreza", 1), ("gailua", 1), ("gaitza", 1),
      ("garria", 2), ("kaitza", 1), ("karria", 1), ("kizuna", 1),
      ("kundea", 1), ("kuntza", 1), ("tailea", 1), ("taldia", 1),
      ("tarazi", 1), ("tezina", 1), ("tzaile", 1), ("aldia", 1), ("arazi",
      1), ("bidea", 1), ("errez", 1), ("etari", 1), ("ezina", 1), ("gailu",
      1), ("gaitz", 1), ("galea", 1), ("garri", 2), ("gunea", 1), ("kaitz",
      1), ("karia", 1), ("karri", 1), ("kidea", 1), ("kizun", 1), ("korra",
      1), ("kunde", 1), ("kunea", 1), ("pidea", 1), ("rekin", 1), ("taile",
      1), ("taldi", 1), ("tezin", 1), ("tzaga", 1), ("tzaka", 1), ("tzake",
      1), ("tzeke", 1), ("aldi", 1), ("atze", 1), ("bera", 1), ("bide", 1),
      ("dako", 1), ("dura", 1), ("etan", 1), ("ezin", 1), ("gaia", 1),
      ("gale", 1), ("gune", 1), ("gura", 1), ("idea", 1), ("kari", 1),
      ("kera", 1), ("keta", 1), ("kide", 1), ("kina", 1), ("kuna", 1),
      ("kune", 1), ("kura", 1), ("lari", 1), ("mena", 1), ("orra", 1),
      ("pena", 1), ("pera", 1), ("pide", 1), ("rean", 1), ("tari", 1),
      ("tatu", 1), ("tuna", 1), ("tura", 1), ("tzat", 1), ("tzez", 1),
      ("ago", 1), ("ari", 1), ("atu", 1), ("ean", 1), ("era", 1), ("eta",
      1), ("eza", 1), ("gai", 1), ("ide", 1), ("kan", 1), ("kin", 1),
      ("kor", 1), ("men", 1), ("pen", 1), ("tio", 1), ("tun", 1), ("tza",
      2), ("tze", 1), ("an", 1), ("du", 1), ("ez", 1), ("go", 1), ("ka",
      1), ("ki", 1), ("la", 1), ("le", 1), ("or", 1), ("tu", 1))

    private val adjetiboak: Array[(String, Int)] = Array(
      ("keria", 1), ("lanik", 1), ("larik", 1), ("dade", 1), ("date", 1),
      ("tade", 1), ("tate", 1), ("zlea", 2), ("ztik", 1), ("era", 1),
      ("ero", 1), ("rik", 1), ("gi", 1), ("go", 1), ("ik", 1), ("ki", 1),
      ("la", 1), ("ro", 1), ("to", 1))

    private def regionAfter(w: String, from: Int): Int = {
      var i = from
      val n = w.length
      while (i < n && !isV(w.charAt(i))) i += 1
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }

    private def longestPair(w: String, sufs: Array[(String, Int)]): (String, Int) = {
      var best: (String, Int) = null
      var i = 0
      while (i < sufs.length) {
        val s = sufs(i)
        if ((best == null || s._1.length > best._1.length) && w.endsWith(s._1)) best = s
        i += 1
      }
      best
    }

    def stem(word: String): String = {
      var w = word
      val r1 = regionAfter(w, 0)
      val r2 = regionAfter(w, r1)
      val rv: Int = { // Spanish-style RV
        val n = w.length
        if (n < 3) n
        else if (!isV(w.charAt(1))) {
          var j = 2
          while (j < n && !isV(w.charAt(j))) j += 1
          if (j < n) j + 1 else n
        } else if (isV(w.charAt(0)) && isV(w.charAt(1))) {
          var j = 2
          while (j < n && isV(w.charAt(j))) j += 1
          if (j < n) j + 1 else n
        } else math.min(3, n)
      }

      // One among application. Returns the new word, or null when the
      // pass must stop (no match, failed region test, or a shadow entry
      // that matches without changing the word).
      // res codes: 1 = delete in RV, 2 = delete in R2, 4 = delete in R1,
      // 3/5/6/10 = replacements, 7/8/9 = self-replacement shadows.
      def pass(table: Array[(String, Int)], x: String): String = {
        val m = longestPair(x, table)
        if (m == null) return null
        val cut = x.length - m._1.length
        m._2 match {
          case 1 => if (cut >= rv) x.substring(0, cut) else null
          case 2 =>
            if (m._1 == "zlea") x.substring(0, cut) + "z"
            else if (cut >= r2) x.substring(0, cut) else null
          case 4 => if (cut >= r1) x.substring(0, cut) else null
          case 3 =>
            if (m._1 == "joka") x.substring(0, cut) + "jok"
            else null // atseden: shadow
          case 5 =>
            if (m._1 == "trako") x.substring(0, cut) + "tra"
            else null // baditu: shadow
          case 6 => x.substring(0, cut) + "minutu"
          case _ => null // zehar/geldi/igaro/aurka/arabera: shadows
        }
      }
      var cont = true
      while (cont) { val n2 = pass(izenak, w); if (n2 != null && n2 != w) w = n2 else cont = false }
      cont = true
      while (cont) { val n2 = pass(aditzak, w); if (n2 != null && n2 != w) w = n2 else cont = false }
      locally { val n2 = pass(adjetiboak, w); if (n2 != null) w = n2 }
      w
    }
  }


  // ------------------------------------------------------------------
  // Irish — the contributed Snowball algorithm (snowballstem.org).
  // Initial-mutation undoing at the word start, then noun, derivational
  // and verb suffix removal (R1/R2/RV conditions probed exactly).
  // ------------------------------------------------------------------
  object Irish extends Stemmer {
    private val vowels = "aeiou\u00e1\u00e9\u00ed\u00f3\u00fa"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    // initial mutations: (prefix, replacement)
    private val mutations: Array[(String, String)] = Array(
      ("d'fh", "f"), ("bhf", "f"), ("b'", ""), ("d'", ""), ("m'", ""),
      ("h-", ""), ("n-", ""), ("t-", ""), ("bh", "b"), ("mb", "b"),
      ("ch", "c"), ("gc", "c"), ("dh", "d"), ("nd", "d"), ("fh", "f"),
      ("gh", "g"), ("ng", "g"), ("bp", "p"), ("ph", "p"), ("sh", "s"),
      ("ts", "s"), ("dt", "t"), ("th", "t"), ("mh", "m"))

    // noun suffixes: res1 delete in R1, res2 delete in R2
    private val noun: Array[(String, Int)] = Array(
      ("a\u00edochta", 1), ("\u00edochta", 1), ("a\u00edocht", 1),
      ("\u00edocht", 1), ("aire", 2), ("eabh", 1), ("aibh", 1),
      ("eamh", 1), ("aimh", 1), ("air\u00ed", 2), ("ire", 2),
      ("abh", 1), ("ibh", 1), ("amh", 1), ("imh", 1), ("ir\u00ed", 2))

    // derivational: res1 delete in R2; 2..6 unconditioned replacements
    private val deriv: Array[(String, Int)] = Array(
      ("grafa\u00edochta\u00ed", 4), ("grafa\u00edochta", 4),
      ("grafa\u00edocht", 4), ("grafa\u00edoch", 4),
      ("arcachta\u00ed", 2), ("\u00f3ideacha", 6), ("arcachta", 2),
      ("eachta\u00fail", 1), ("achta\u00fail", 1), ("\u00f3ideach", 6),
      ("gineach", 3), ("arcacht", 2), ("patacha", 5), ("eachta", 1),
      ("gineas", 3), ("\u00f3idigh", 6), ("pataigh", 5), ("patach", 5),
      ("achta", 1), ("eacht", 1), ("paite", 5), ("ginis", 3), ("each", 1),
      ("acht", 1), ("ach", 1))
    private val derivRepl = Array("", "", "arc", "gin", "graf", "paite", "\u00f3id")

    // verb suffixes: res1 delete in RV, res2 delete in R1
    private val verb: Array[(String, Int)] = Array(
      ("aimid", 1), ("a\u00edmid", 1), ("faidh", 1), ("imid", 1),
      ("\u00edmid", 1), ("eadh", 2), ("fidh", 1), ("tear", 2),
      ("adh", 2), ("\u00e1il", 2), ("ain", 2), ("tar", 2))

    private def regionAfter(w: String, from: Int): Int = {
      var i = from
      val n = w.length
      while (i < n && !isV(w.charAt(i))) i += 1
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }

    private def longestPair(w: String, sufs: Array[(String, Int)]): (String, Int) = {
      var best: (String, Int) = null
      var i = 0
      while (i < sufs.length) {
        val s = sufs(i)
        if ((best == null || s._1.length > best._1.length) && w.endsWith(s._1)) best = s
        i += 1
      }
      best
    }

    def stem(word: String): String = {
      var w = word
      // initial mutations (longest prefix match)
      var best: (String, String) = null
      var k = 0
      while (k < mutations.length) {
        val m = mutations(k)
        if ((best == null || m._1.length > best._1.length) && w.startsWith(m._1))
          best = m
        k += 1
      }
      if (best != null) w = best._2 + w.substring(best._1.length)

      val r1 = regionAfter(w, 0)
      val r2 = regionAfter(w, r1)
      val rv = { // after the first vowel
        var i = 0
        while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      }

      locally {
        val m = longestPair(w, noun)
        if (m != null) {
          val cut = w.length - m._1.length
          if (m._2 == 1 && cut >= r1) w = w.substring(0, cut)
          else if (m._2 == 2 && cut >= r2) w = w.substring(0, cut)
        }
      }
      locally {
        val m = longestPair(w, deriv)
        if (m != null) {
          val cut = w.length - m._1.length
          if (m._2 == 1) { if (cut >= r2) w = w.substring(0, cut) }
          else w = w.substring(0, cut) + derivRepl(m._2)
        }
      }
      locally {
        val m = longestPair(w, verb)
        if (m != null) {
          val cut = w.length - m._1.length
          if (m._2 == 1 && cut >= rv) w = w.substring(0, cut)
          else if (m._2 == 2 && cut >= r1) w = w.substring(0, cut)
        }
      }
      w
    }
  }


  // ------------------------------------------------------------------
  // Armenian — the contributed Snowball algorithm (snowballstem.org).
  // Four deletion passes (case endings, verb, adjective, noun), all
  // limited to RV (after the first vowel, region probed exactly).
  // ------------------------------------------------------------------
  object Armenian extends Stemmer {
    private val vowels = "\u0561\u0565\u0567\u0568\u056b\u0578\u0585\u0582"
    @inline private def isV(c: Char) = vowels.indexOf(c.toInt) >= 0

    private val endings: Array[String] = Array(
      "ությանդ", "ությանը", "ությանն", "ությանս", "ներում", "ության",
      "անում", "երում", "ներին", "ներից", "ներով", "վանից", "անով", "երին",
      "երից", "երով", "ներդ", "ները", "ների", "ներն", "ոջից", "վանդ",
      "վանը", "վանս", "ամբ", "անդ", "անը", "երդ", "երը", "երի", "երն",
      "ներ", "ոջդ", "ոջը", "ոջս", "ուդ", "ուն", "ուց", "վան", "վից", "վով",
      "ցից", "ան", "եր", "ին", "ից", "ոջ", "ով", "ոց", "սա", "վա", "վի",
      "դ", "ը", "ի", "ն", "ց")

    private val verbs: Array[String] = Array(
      "ացրինք", "վեցինք", "ալուց", "ացանք", "ացինք", "ացնալ", "ացվել",
      "ացրեց", "ացրին", "ացրիր", "ացրիք", "ելուց", "եցինք", "եցնել",
      "եցվել", "կոտել", "վեցին", "վեցիր", "վեցիք", "ալիս", "ալով", "ալու",
      "անալ", "ատել", "ացան", "ացավ", "ացար", "ացաք", "ացին", "ացիր",
      "ացիք", "ացրի", "ելիս", "ելով", "ելու", "ենալ", "եցավ", "եցար",
      "եցին", "եցիր", "եցիք", "ոտել", "վեցի", "վում", "ցանք", "ցնել",
      "անք", "ացա", "ացի", "եցա", "եցի", "ըալ", "ըել", "նել", "ում", "չել",
      "ված", "վել", "տել", "ցան", "ցաք", "ալ", "ան", "ավ", "ար", "աց",
      "աք", "ել", "եց", "վե", "ա")

    private val adjectives: Array[String] = Array(
      "երորդ", "ական", "ավետ", "արան", "եկեն", "երեն", "լայն", "ովին",
      "որակ", "որէն", "վուն", "րորդ", "ալի", "ակի", "բար", "գին", "կոտ",
      "պես", "ատ", "եղ", "են", "ին", "իվ")

    private val nouns: Array[String] = Array(
      "ություն", "մունք", "ալիք", "անակ", "անիք", "անօց", "ավոր", "արան",
      "եղէն", "յուն", "ուհի", "ույթ", "ույք", "ունք", "ուստ", "ստան",
      "վածք", "ածո", "արք", "գար", "ենք", "իչք", "յակ", "ոնք", "որդ",
      "ուկ", "ուս", "չեք", "պան", "վոր", "ակ", "ան", "իլ", "իկ", "իչ",
      "իք", "ոց", "ու", "ցի", "ք")

    private def longestIn(w: String, sufs: Array[String], lim: Int): String = {
      var best: String = null
      var i = 0
      while (i < sufs.length) {
        val s = sufs(i)
        if ((best == null || s.length > best.length) &&
          w.length - s.length >= lim && w.endsWith(s)) best = s
        i += 1
      }
      best
    }

    private def regionAfter(w: String, from: Int): Int = {
      var i = from
      val n = w.length
      while (i < n && !isV(w.charAt(i))) i += 1
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }

    def stem(word: String): String = {
      var w = word
      // the whole backward section runs inside RV (setlimit tomark pV);
      // the case-ending pass additionally requires R2 and fails hard
      val rv = {
        var i = 0
        while (i < word.length && !isV(word.charAt(i))) i += 1
        if (i < word.length) i + 1 else word.length
      }
      val r2 = regionAfter(word, regionAfter(word, 0))
      locally {
        val s = longestIn(w, endings, rv)
        if (s != null && w.length - s.length >= r2) w = w.dropRight(s.length)
      }
      for (table <- Array(verbs, adjectives, nouns)) {
        val s = longestIn(w, table, rv)
        if (s != null) w = w.dropRight(s.length)
      }
      w
    }
  }


  // ------------------------------------------------------------------
  // Arabic — snowballstem.org/algorithms/arabic/stemmer.html (Chelli).
  // A routine-for-routine transcription of the published Snowball
  // program: Checks1 (definite-article flags is_noun/is_verb/
  // is_defined), Normalize_pre (tashkeel/tatweel removal, Arabic-Indic
  // digit conversion, presentation-form ligature folding), the verb
  // and noun suffix machines (object/possessive pronouns, tense and
  // plural endings, each with its published whole-word length guard;
  // deletions persist across failed alternatives, per Snowball slice
  // semantics), the four prefix steps (hamza folding, conjunction
  // waw/feh, definite articles, imperfective-prefix rewrites), and
  // Normalize_post (final-hamza to bare hamza, medial hamza folding).
  // Verified exact against an independent ground-truth Snowball
  // implementation (SnowballOracleSpec).
  // ------------------------------------------------------------------
  object Arabic extends Stemmer {

    private val normPre: Map[Char, String] = Map(
      "ـ" -> "",
      "ً" -> "",
      "ٌ" -> "",
      "ٍ" -> "",
      "َ" -> "",
      "ُ" -> "",
      "ِ" -> "",
      "ّ" -> "",
      "ْ" -> "",
      "٠" -> "0",
      "١" -> "1",
      "٢" -> "2",
      "٣" -> "3",
      "٤" -> "4",
      "٥" -> "5",
      "٦" -> "6",
      "٧" -> "7",
      "٨" -> "8",
      "٩" -> "9",
      "ﺀ" -> "ء",
      "ﺁ" -> "آ",
      "ﺂ" -> "آ",
      "ﺃ" -> "أ",
      "ﺄ" -> "أ",
      "ﺅ" -> "ؤ",
      "ﺆ" -> "ؤ",
      "ﺇ" -> "إ",
      "ﺈ" -> "إ",
      "ﺉ" -> "ئ",
      "ﺊ" -> "ئ",
      "ﺋ" -> "ئ",
      "ﺌ" -> "ئ",
      "ﺍ" -> "ا",
      "ﺎ" -> "ا",
      "ﺏ" -> "ب",
      "ﺐ" -> "ب",
      "ﺑ" -> "ب",
      "ﺒ" -> "ب",
      "ﺓ" -> "ة",
      "ﺔ" -> "ة",
      "ﺕ" -> "ت",
      "ﺖ" -> "ت",
      "ﺗ" -> "ت",
      "ﺘ" -> "ت",
      "ﺙ" -> "ث",
      "ﺚ" -> "ث",
      "ﺛ" -> "ث",
      "ﺜ" -> "ث",
      "ﺝ" -> "ج",
      "ﺞ" -> "ج",
      "ﺟ" -> "ج",
      "ﺠ" -> "ج",
      "ﺡ" -> "ح",
      "ﺢ" -> "ح",
      "ﺣ" -> "ح",
      "ﺤ" -> "ح",
      "ﺥ" -> "خ",
      "ﺦ" -> "خ",
      "ﺧ" -> "خ",
      "ﺨ" -> "خ",
      "ﺩ" -> "د",
      "ﺪ" -> "د",
      "ﺫ" -> "ذ",
      "ﺬ" -> "ذ",
      "ﺭ" -> "ر",
      "ﺮ" -> "ر",
      "ﺯ" -> "ز",
      "ﺰ" -> "ز",
      "ﺱ" -> "س",
      "ﺲ" -> "س",
      "ﺳ" -> "س",
      "ﺴ" -> "س",
      "ﺵ" -> "ش",
      "ﺶ" -> "ش",
      "ﺷ" -> "ش",
      "ﺸ" -> "ش",
      "ﺹ" -> "ص",
      "ﺺ" -> "ص",
      "ﺻ" -> "ص",
      "ﺼ" -> "ص",
      "ﺽ" -> "ض",
      "ﺾ" -> "ض",
      "ﺿ" -> "ض",
      "ﻀ" -> "ض",
      "ﻁ" -> "ط",
      "ﻂ" -> "ط",
      "ﻃ" -> "ط",
      "ﻄ" -> "ط",
      "ﻅ" -> "ظ",
      "ﻆ" -> "ظ",
      "ﻇ" -> "ظ",
      "ﻈ" -> "ظ",
      "ﻉ" -> "ع",
      "ﻊ" -> "ع",
      "ﻋ" -> "ع",
      "ﻌ" -> "ع",
      "ﻍ" -> "غ",
      "ﻎ" -> "غ",
      "ﻏ" -> "غ",
      "ﻐ" -> "غ",
      "ﻑ" -> "ف",
      "ﻒ" -> "ف",
      "ﻓ" -> "ف",
      "ﻔ" -> "ف",
      "ﻕ" -> "ق",
      "ﻖ" -> "ق",
      "ﻗ" -> "ق",
      "ﻘ" -> "ق",
      "ﻙ" -> "ك",
      "ﻚ" -> "ك",
      "ﻛ" -> "ك",
      "ﻜ" -> "ك",
      "ﻝ" -> "ل",
      "ﻞ" -> "ل",
      "ﻟ" -> "ل",
      "ﻠ" -> "ل",
      "ﻡ" -> "م",
      "ﻢ" -> "م",
      "ﻣ" -> "م",
      "ﻤ" -> "م",
      "ﻥ" -> "ن",
      "ﻦ" -> "ن",
      "ﻧ" -> "ن",
      "ﻨ" -> "ن",
      "ﻩ" -> "ه",
      "ﻪ" -> "ه",
      "ﻫ" -> "ه",
      "ﻬ" -> "ه",
      "ﻭ" -> "و",
      "ﻮ" -> "و",
      "ﻯ" -> "ى",
      "ﻰ" -> "ى",
      "ﻱ" -> "ي",
      "ﻲ" -> "ي",
      "ﻳ" -> "ي",
      "ﻴ" -> "ي",
      "ﻵ" -> "لآ",
      "ﻶ" -> "لآ",
      "ﻷ" -> "لأ",
      "ﻸ" -> "لأ",
      "ﻹ" -> "لإ",
      "ﻺ" -> "لإ",
      "ﻻ" -> "لا",
      "ﻼ" -> "لا"
    ).map { case (k, v) => (k.charAt(0), v) }

    // suffix tables, longest match first within each step
    private val verb1 = Seq("كمو", "هما", "كما", "ني", "نا", "ها", "هم", "هن", "كم", "كن", "ه", "ك")
    private val verb2aTriple = Seq("تما")
    private val verb2aDouble5 = Seq("ون", "ين", "ان") // guard len > 5
    private val verb2aDouble4 = Seq("تن", "نا", "تا") // guard len > 4
    private val verb2aSingle = Seq("ت", "ا", "ن", "ي") // guard len > 3
    private val noun1aTriple = Seq("كما", "هما")
    private val noun1aDouble = Seq("كم", "هم", "هن", "نا", "ها")
    private val noun1aSingle = Seq("ك", "ه", "ي")

    private def len(w: String): Int = w.length

    // Suffix_Noun_Step2a: [او ي ا] delete when len > 4
    private def step2a(w: String): Option[String] =
      if (len(w) > 4 && (w.endsWith("و") || w.endsWith("ي") || w.endsWith("ا")))
        Some(w.dropRight(1))
      else None

    // Suffix_Noun_Step2b: [ات] delete when len > 4
    private def step2b(w: String): Option[String] =
      if (len(w) > 4 && w.endsWith("ات")) Some(w.dropRight(2)) else None

    // Suffix_Noun_Step2c1: [ت] delete when len > 3
    private def step2c1(w: String): Option[String] =
      if (len(w) > 3 && w.endsWith("ت")) Some(w.dropRight(1)) else None

    // Suffix_Verb_Step2a with its per-size guards
    private def verbStep2a(w: String): Option[String] = {
      val n = len(w)
      if (n > 5 && verb2aTriple.exists(w.endsWith)) Some(w.dropRight(3))
      else if (verb2aDouble5.exists(w.endsWith) || verb2aDouble4.exists(w.endsWith)) {
        // longest-match among: any 2-char entry wins over singles
        val d5 = verb2aDouble5.exists(w.endsWith)
        val ok = if (d5) n > 5 else n > 4
        if (ok) Some(w.dropRight(2)) else None
      } else if (n > 3 && verb2aSingle.exists(w.endsWith)) Some(w.dropRight(1))
      else None
    }

    // Suffix_Verb_Step2c: [تمو] len>5 / [و] len>3
    private def verbStep2c(w: String): Option[String] =
      if (w.endsWith("تمو")) { if (len(w) > 5) Some(w.dropRight(3)) else None }
      else if (w.endsWith("و")) { if (len(w) > 3) Some(w.dropRight(1)) else None }
      else None

    private def suffixes(w0: String, isNoun: Boolean, isVerb: Boolean, isDefined: Boolean): String = {
      var w = w0
      if (isVerb) {
        // Suffix_Verb_Step1, repeated while it matches
        var matched = 0
        var go = true
        while (go) {
          go = false
          val s = verb1.find(w.endsWith)
          s match {
            case Some(x) =>
              val ok = x.length match {
                case 1 => len(w) > 3
                case 2 => len(w) > 4
                case _ => len(w) > 5
              }
              if (ok) { w = w.dropRight(x.length); matched += 1; go = true }
            case None =>
          }
        }
        if (matched == 0) {
          // or Suffix_Verb_Step2b or Suffix_Verb_Step2a
          if (len(w) > 4 && (w.endsWith("تم") || w.endsWith("وا"))) return w.dropRight(2)
          verbStep2a(w) match {
            case Some(r) => return r
            case None => // verb branch failed: fall through to the noun branch
          }
        } else {
          // (Suffix_Verb_Step2a or Suffix_Verb_Step2c or next)
          verbStep2a(w) match {
            case Some(r) => return r
            case None =>
              verbStep2c(w) match {
                case Some(r) => return r
                case None => if (w.nonEmpty) return w // next
              }
          }
        }
      }
      if (isNoun) {
        // try-block of alternatives (deletions persist across failures)
        var handled = false
        if (len(w) > 3 && w.endsWith("ة")) { w = w.dropRight(1); handled = true } // Step2c2
        if (!handled) {
          var fellThrough = true
          if (!isDefined) {
            val s = (noun1aTriple ++ noun1aDouble ++ noun1aSingle).find(w.endsWith)
            s match {
              case Some(x) =>
                val ok = x.length match {
                  case 1 => len(w) > 3
                  case 2 => len(w) > 4
                  case _ => len(w) > 5
                }
                if (ok) {
                  w = w.dropRight(x.length)
                  // (Step2a or Step2b or Step2c1 or next)
                  step2a(w).orElse(step2b(w)).orElse(step2c1(w)) match {
                    case Some(r) => w = r
                    case None => // next always succeeds on a nonempty stem
                  }
                  fellThrough = false
                }
              case None =>
            }
          }
          if (fellThrough) {
            // (Suffix_Noun_Step1b (Step2a or Step2b or Step2c1)) — the ن
            // deletion persists even when the required inner step fails
            var innerOk = false
            if (len(w) > 5 && w.endsWith("ن")) {
              w = w.dropRight(1)
              step2a(w).orElse(step2b(w)).orElse(step2c1(w)) match {
                case Some(r) => w = r; innerOk = true
                case None =>
              }
            }
            if (!innerOk) {
              // or (not is_defined Step2a) or Step2b
              val n2a = if (!isDefined) step2a(w) else None
              n2a.orElse(step2b(w)).foreach(r => w = r)
            }
          }
        }
        // Suffix_Noun_Step3: [ي] delete when len > 2; its failure fails
        // the noun branch and Suffix_All_alef_maqsura runs instead
        if (len(w) > 2 && w.endsWith("ي")) return w.dropRight(1)
        if (w.endsWith("ى")) return w.dropRight(1) + "ي"
        return w
      }
      // neither branch: Suffix_All_alef_maqsura
      if (w.endsWith("ى")) w.dropRight(1) + "ي" else w
    }

    private def prefixes(w0: String, isNoun: Boolean, isVerb: Boolean): String = {
      var w = w0
      var p = 0 // forward cursor: each step continues after the previous
                // step's replacement (the published program never resets it)
      // try Prefix_Step1 (hamza-pair folding; replacement advances the cursor)
      if (len(w) > 3) {
        if (w.startsWith("أأ", p) || w.startsWith("أؤ", p)) { w = w.substring(0, p) + "أ" + w.substring(p + 2); p += 1 }
        else if (w.startsWith("أآ", p)) { w = w.substring(0, p) + "آ" + w.substring(p + 2); p += 1 }
        else if (w.startsWith("أا", p)) { w = w.substring(0, p) + "ا" + w.substring(p + 2); p += 1 }
        else if (w.startsWith("أإ", p)) { w = w.substring(0, p) + "إ" + w.substring(p + 2); p += 1 }
      }
      // try Prefix_Step2 (conjunction ف/و not followed by ا; deletion keeps the cursor)
      if (len(w) > 3 && p < w.length &&
        (w.charAt(p) == 'ف' || w.charAt(p) == 'و') &&
        !(p + 1 < w.length && w.charAt(p + 1) == 'ا'))
        w = w.substring(0, p) + w.substring(p + 1)
      // Prefix_Step3a_Noun or (is_noun Step3b) or (is_verb try Step3V; Step4V)
      if ((w.startsWith("بال", p) || w.startsWith("كال", p)) && len(w) > 5) w = w.substring(0, p) + w.substring(p + 3)
      else if ((w.startsWith("ال", p) || w.startsWith("لل", p)) && len(w) > 4) w = w.substring(0, p) + w.substring(p + 2)
      else {
        var done = false
        if (isNoun) {
          if (w.startsWith("با", p)) done = true // published no-op entry
          else if (w.startsWith("بب", p) && len(w) > 3) { w = w.substring(0, p) + "ب" + w.substring(p + 2); done = true }
          else if (w.startsWith("كك", p) && len(w) > 3) { w = w.substring(0, p) + "ك" + w.substring(p + 2); done = true }
          else if (w.startsWith("ب", p) && len(w) > 3) { w = w.substring(0, p) + w.substring(p + 1); done = true }
        }
        if (!done && isVerb) {
          if (len(w) > 4) {
            if (w.startsWith("سي", p)) { w = w.substring(0, p) + "ي" + w.substring(p + 2); p += 1 }
            else if (w.startsWith("ست", p)) { w = w.substring(0, p) + "ت" + w.substring(p + 2); p += 1 }
            else if (w.startsWith("سن", p)) { w = w.substring(0, p) + "ن" + w.substring(p + 2); p += 1 }
            else if (w.startsWith("سأ", p)) { w = w.substring(0, p) + "أ" + w.substring(p + 2); p += 1 }
          }
          if (len(w) > 4 && (w.startsWith("تست", p) || w.startsWith("نست", p) || w.startsWith("يست", p)))
            w = w.substring(0, p) + "است" + w.substring(p + 3)
        }
      }
      w
    }

    private def normalizePost(w0: String): String = {
      var w = w0
      if (w.nonEmpty) {
        val last = w.charAt(w.length - 1)
        if (last == 'آ' || last == 'أ' || last == 'ؤ' || last == 'إ' || last == 'ئ')
          w = w.substring(0, w.length - 1) + "ء"
      }
      val sb = new java.lang.StringBuilder(w.length)
      var i = 0
      while (i < w.length) {
        w.charAt(i) match {
          case 'آ' | 'أ' | 'إ' => sb.append('ا')
          case 'ؤ' => sb.append('و')
          case 'ئ' => sb.append('ي')
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }

    def stem(word: String): String = {
      var isNoun = true
      var isVerb = true
      var isDefined = false
      // Checks1 (runs on the unnormalized word)
      if ((word.startsWith("بال") || word.startsWith("كال")) && word.length > 4) {
        isNoun = true; isVerb = false; isDefined = true
      } else if ((word.startsWith("ال") || word.startsWith("لل")) && word.length > 3) {
        isNoun = true; isVerb = false; isDefined = true
      }
      // Normalize_pre
      val sb = new java.lang.StringBuilder(word.length)
      var i = 0
      while (i < word.length) {
        val c = word.charAt(i)
        normPre.get(c) match {
          case Some(r) => sb.append(r)
          case None => sb.append(c)
        }
        i += 1
      }
      var w = sb.toString
      w = suffixes(w, isNoun, isVerb, isDefined)
      w = prefixes(w, isNoun, isVerb)
      normalizePost(w)
    }
  }

}
