package graft.tools

import java.io.PrintWriter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.util.Random

import graft.analysis.Stemmers

/** Offline harness: generates a deterministic stress corpus per language and
  * dumps `word<TAB>ourStem` lines, for diffing against a ground-truth
  * Snowball implementation (we use PostgreSQL's bundled snowball
  * dictionaries, built from the published snowballstem.org sources, as the
  * oracle when authoring golden files). Not part of `sbt test`; run with
  * `Test/runMain graft.tools.StemDump <outDir>`.
  *
  * The corpus per language: hand-picked real inflected words, the cross
  * product of plausible stems with the language's own suffix inventory
  * (stressing suffix-match paths), and random strings over the language's
  * alphabet (stressing region/vowel edge cases). Deterministic (seed 42).
  */
object StemDump {

  // Alphabets: lowercase letters incl. language-specific diacritics.
  val alphabets: Map[String, String] = Map(
    "english" -> "abcdefghijklmnopqrstuvwxyz",
    "french" -> "abcdefghijklmnopqrstuvwxyzâàçéèêëîïôûùüæœ",
    "german" -> "abcdefghijklmnopqrstuvwxyzäöüß",
    "spanish" -> "abcdefghijklmnopqrstuvwxyzáéíóúüñ",
    "portuguese" -> "abcdefghijklmnopqrstuvwxyzáéíóúâêôçãõàü",
    "italian" -> "abcdefghijklmnopqrstuvwxyzàèéìíîòóùú",
    "dutch" -> "abcdefghijklmnopqrstuvwxyzäëïöüáéíóú",
    "danish" -> "abcdefghijklmnopqrstuvwxyzæøå",
    "norwegian" -> "abcdefghijklmnopqrstuvwxyzæøå",
    "swedish" -> "abcdefghijklmnopqrstuvwxyzäåö",
    "finnish" -> "abcdefghijklmnopqrstuvwxyzäö",
    "russian" -> "абвгдежзийклмнопрстуфхцчшщъыьэюя",
    "hungarian" -> "abcdefghijklmnopqrstuvwxyzáéíóöőúüű",
    "turkish" -> "abcçdefgğhıijklmnoöprsştuüvyz",
    "lithuanian" -> "aąbcčdeęėfghiįyjklmnoprsštuųūvzž",
    "romanian" -> "abcdefghijklmnopqrstuvwxyzăâîşţșț",
    "catalan" -> "abcdefghijklmnopqrstuvwxyzàéèíïóòúüç·",
    "basque" -> "abcdefghijklmnopqrstuvwxyz",
    "irish" -> "abcdefghilmnoprstuáéíóú",
    "armenian" -> "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ",
    "arabic" -> "ءآأؤإئابةتثجحخدذرزسشصضطظعغفقكلمنهوىيًٌٍَُِّْٱ"
  )

  // Suffix inventories to cross with stems (drawn from the published
  // algorithms' suffix lists; stressing exactly the paths that matter).
  val suffixes: Map[String, Seq[String]] = Map(
    "romanian" -> Seq("ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua",
      "iei", "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia", "ație",
      "abilitate", "abilitati", "abilităţi", "ibilitate", "ivitate",
      "icitate", "icator", "iciv", "ical", "ativ", "atoare", "ator", "ătoare",
      "ător", "itiv", "itoare", "itor", "iţiune", "ațiune", "at", "ata",
      "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute", "it", "ita",
      "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică", "abil", "ibil",
      "oasa", "oasă", "oase", "os", "osi", "oşi", "oși", "ant", "anta",
      "ante", "anti", "antă", "itate", "itati", "ităţi", "iv", "iva", "ive",
      "ivi", "ivă", "iune", "iuni", "ţiune", "țiuni", "ism", "isme", "ist",
      "ista", "iste", "isti", "istă", "işti", "iști", "are", "ere", "ire",
      "âre", "ind", "ându", "eze", "ească", "ez", "ezi", "ează", "esc",
      "eşti", "ești", "eşte", "ește", "ăsc", "ăşti", "ăşte", "am", "ai",
      "au", "eam", "eai", "eau", "iam", "iai", "iau", "ui", "aşi", "ași",
      "arăm", "arăţi", "ară", "ase", "aseşi", "aserăm", "aserăţi", "aseră",
      "ime", "imi", "use", "useşi", "userăm", "useră", "ise", "iseşi",
      "iserăm", "iseră", "âse", "âseşi", "âserăm", "âseră", "a", "ie", "i",
      "ă", "e", "ând", "ându", "ăm", "aţi", "ați", "em", "eţi", "eți", "im",
      "iţi", "iți", "âm", "âţi", "âți", "seşi", "serăm", "serăţi", "seră",
      "sei", "se", "sesem", "seseşi", "sese", "seserăm", "seserăţi",
      "seseră"),
    "catalan" -> Seq("s", "es", "os", "ns", "ons", "ions", "cions", "acions",
      "a", "es", "es", "e", "i", "ista", "istes", "isme", "ismes", "ament",
      "aments", "ment", "itat", "itats", "atge", "atges", "eria", "eries",
      "ària", "àries", "able", "ables", "ible", "ibles", "iva", "ives",
      "iu", "ius", "ador", "adors", "adora", "adores", "ança", "ances",
      "ència", "ències", "ícia", "ícies", "atiu", "atius", "ativa",
      "atives", "ció", "cio", "ar", "er", "ir", "re", "ant", "ants", "at",
      "ats", "ada", "ades", "ava", "aves", "àvem", "àveu", "aven", "aria",
      "aries", "aríem", "aríeu", "arien", "aré", "aràs", "arà", "arem",
      "areu", "aran", "és", "essis", "éssim", "éssiu", "essin", "eix",
      "eixes", "eixi", "eixen", "eixo", "ÿ", "ejar", "eja", "eges", "egi",
      "egen", "ego", "int", "ut", "uts", "uda", "udes", "ia", "ies", "íem",
      "íeu", "ien", "iré", "iràs", "irà", "irem", "ireu", "iran", "iria",
      "iries", "iríem", "iríeu", "irien", "o", "ó", "és", "esses", "éssem",
      "ésseu", "essen", "àssim", "àssiu", "assin", "í", "ires", "írem",
      "íreu", "iren"),
    "basque" -> Seq("ak", "ek", "en", "en", "era", "etik", "eko", "ko", "an",
      "ean", "etan", "tik", "ri", "ari", "ei", "kin", "ekin", "rekin", "z",
      "az", "ez", "rik", "ik", "a", "tzea", "tzeko", "tzen", "tze", "pen",
      "men", "tasun", "keria", "garri", "tsu", "dun", "kor", "ezin", "ile",
      "le", "zale", "ari", "ti", "ka", "tu", "du", "i", "n", "go", "ra",
      "raino", "rantz", "gatik", "rengatik", "entzat", "arentzat", "tzat"),
    "irish" -> Seq("e", "í", "a", "ai", "eadh", "adh", "ann", "faidh",
      "fidh", "idh", "aidh", "óidh", "eoidh", "each", "aí", "acht", "eacht",
      "aíocht", "íocht", "óir", "eoir", "óireacht", "eoireacht", "úil",
      "iúil", "úlacht", "iúlacht", "amh", "eamh", "aimid", "imid", "aimíd",
      "imíd", "faimid", "fimid", "ín", "ithe", "te", "tha", "anna", "áil",
      "eáil", "álaí"),
    "armenian" -> Seq("երը", "ները", "ում", "ով", "ից", "ի", "ն", "ը",
      "ներ", "եր", "ական", "ություն", "ութիւն", "ույթ", "ական", "ային",
      "ային", "որեն", "պես", "գին", "ովին", "եցի", "ացի", "եցին", "ացին",
      "ել", "ալ", "ում", "ումը", "ներում", "ներին", "ների", "ներն",
      "ելու", "ալու", "ած", "ացած", "եցած", "վել", "վում", "եմ", "ես",
      "ենք", "եք", "են", "ամ", "աս", "անք", "աք", "ան"),
    "arabic" -> Seq("ال", "وال", "بال", "كال", "فال", "لل", "و", "ف", "ب",
      "ك", "ل", "س", "ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة",
      "ي", "ا", "كما", "هما", "تما", "نا", "كم", "هم", "هن", "كن", "تم",
      "تن", "ني", "وا", "ما", "ت", "ن", "تموه")
  )

  // Hand-picked real inflected words per language (common forms).
  val realWords: Map[String, Seq[String]] = Map(
    "romanian" -> Seq("copiilor", "copil", "copiii", "frumoasa", "frumoasă",
      "frumoşi", "frumusețe", "lucrurile", "lucrează", "lucram", "lucrat",
      "românească", "româneşti", "băiatului", "fetele", "fetelor", "cartea",
      "cărțile", "citesc", "citeşte", "citeam", "citisem", "mergem",
      "mergeați", "mersese", "naționale", "națiunea", "libertatea",
      "importantă", "dezvoltarea", "posibilitatea", "activitatea",
      "activități", "politică", "politicieni", "guvernului", "oamenilor",
      "timpului", "zilele", "anilor", "țările", "țărilor", "orașului",
      "orașele", "străzile", "vorbesc", "vorbeau", "vorbiseră", "spunea",
      "spuneau", "făcut", "făcea", "veniseră", "plecaseră", "ajunseseră"),
    "catalan" -> Seq("cantaven", "cantava", "cantàvem", "cantarien",
      "cantaria", "treballadors", "treballadores", "treballava",
      "nacions", "nacional", "nacionals", "informació", "informacions",
      "generalitat", "universitat", "universitats", "possibilitat",
      "activitats", "desenvolupament", "desenvolupaments", "coneixement",
      "coneixements", "moviments", "catalanes", "catalans", "barcelonina",
      "històriques", "polítiques", "econòmiques", "importants",
      "diferents", "següents", "anteriors", "primeres", "darreres",
      "paraules", "llengües", "persones", "ciutats", "carrers", "cases",
      "arribaven", "arribarien", "vivien", "vivíem", "escrivia",
      "escrivien", "llegeixen", "llegeixo", "serveixen", "parlem",
      "parleu", "parlessin", "mengessin", "dormien", "sortien"),
    "basque" -> Seq("etxea", "etxeak", "etxean", "etxetik", "etxera",
      "gizonak", "gizonaren", "gizonari", "emakumeak", "emakumearekin",
      "euskaldunak", "euskararen", "lagunekin", "lagunari", "haurrak",
      "haurrentzat", "egiten", "egitea", "egiteko", "ikusten", "ikustea",
      "jotzen", "hartzen", "ematen", "esaten", "joaten", "etortzen",
      "bizitzen", "lanean", "lanetik", "kalean", "kaleetan", "mendian",
      "mendietara", "itsasoan", "askatasuna", "edertasuna", "zailtasuna",
      "alaitasuna", "maitagarria", "ikusgarria", "barregarria",
      "langilea", "idazlea", "irakaslea", "ikaslea", "saltzailea"),
    "irish" -> Seq("bhfeidhmeannas", "feidhmeannas", "scoileanna", "scoile",
      "múinteoirí", "múinteoir", "leabhair", "leabharlann", "cairde",
      "carad", "oibreacha", "oibrí", "oibríonn", "déanann", "déanfaidh",
      "rinneadh", "deirtear", "imríonn", "imreoidh", "ceolchoirmeacha",
      "amhránaíocht", "scríbhneoireacht", "foghlaimeoidh", "foghlaim",
      "éisteacht", "caint", "cainteoirí", "gaeilgeoirí", "polaitíocht",
      "eacnamaíocht", "náisiúnta", "idirnáisiúnta", "áitiúil", "cathrach",
      "cathracha", "tíortha", "rialtais", "pobail", "daoine", "páistí",
      "blianta", "seachtaine", "míonna", "uaireanta", "áiteanna"),
    "armenian" -> Seq("գրքերը", "գիրքը", "գրքերում", "տներում", "տունը",
      "տները", "մարդիկ", "մարդկանց", "երեխաները", "երեխաների",
      "հայերեն", "հայկական", "ազգային", "ազատություն", "ազատության",
      "կառավարություն", "կառավարության", "համալսարան", "համալսարանում",
      "ուսանողները", "ուսանողների", "աշխատում", "աշխատել", "աշխատանք",
      "գնացին", "եկան", "տեսան", "ասացին", "խոսում", "խոսել", "գրում",
      "գրել", "կարդում", "կարդալ", "սիրում", "սիրել", "ապրում", "ապրել",
      "քաղաքներում", "քաղաքի", "գյուղերում", "երկրներում", "տարիների",
      "օրերին", "ժամանակներում"),
    "arabic" -> Seq("المدرسة", "المدارس", "الكتاب", "الكتب", "المكتبة",
      "والمكتبات", "للطلاب", "الطالبات", "المعلمون", "المعلمين",
      "بالجامعة", "الجامعات", "يدرسون", "يكتبون", "تكتبين", "كتبوا",
      "درسنا", "علمتهم", "مدرستهم", "كتابهما", "سيذهبون", "فالمدينة",
      "المدينتان", "مدينتين", "البيوت", "بيوتهم", "السيارات", "سيارتها",
      "الحكومة", "الحكومات", "الرئيسية", "العربية", "العالمية",
      "الاقتصادية", "السياسية", "الاجتماعية", "التعليمية", "منظمات",
      "مؤسسات", "مشاريع", "برامج", "تطوير", "تنمية", "مستقبل"),
    "english" -> Seq("running", "flies", "dies", "mules", "denied",
      "generously", "agreed", "disabled", "matting", "mating", "meeting",
      "milling", "messing", "meetings", "conflated", "troubled", "sized",
      "hopping", "tanned", "falling", "hissing", "fizzed", "failing",
      "filing", "happy", "relational", "conditional", "rational",
      "valenci", "hesitancy", "digitizer", "conformably", "radically",
      "differently", "vileness", "analogously", "vietnamization",
      "predication", "operator", "feudalism", "decisiveness",
      "hopefulness", "callousness", "formality", "sensitivity",
      "sensibility", "triplicate", "formative", "formalize",
      "electricity", "electrical", "hopeful", "goodness", "revival",
      "allowance", "inference", "airliner", "gyroscopic", "adjustable",
      "defensible", "irritant", "replacement", "adjustment", "dependent",
      "adoption", "homologous", "communism", "activate", "angularity",
      "homologies", "effective", "bowdlerize", "probate", "rate",
      "cease", "controlling", "rolling"),
    "french" -> Seq("continuités", "continuité", "majestueusement",
      "majestueux", "nationale", "nationaux", "chevaux", "châteaux",
      "mangeaient", "mangeait", "mangeons", "mangez", "finissent",
      "finissait", "finiraient", "donneraient", "donnerions",
      "possibilités", "réalisation", "réalisations", "importantes",
      "différentes", "françaises", "heureusement", "malheureusement",
      "gouvernement", "gouvernements", "développement", "mouvements",
      "établissements", "connaissances", "applications", "informations"),
    "german" -> Seq("aufeinander", "häuser", "häusern", "kindern", "kinder",
      "schönsten", "schönste", "arbeiteten", "arbeitete", "gearbeitet",
      "verstanden", "verständnis", "möglichkeiten", "möglichkeit",
      "wissenschaftlichen", "wissenschaftlich", "entwicklungen",
      "entwicklung", "regierungen", "beziehungen", "bedingungen",
      "erfahrungen", "universitäten", "studenten", "lehrerinnen",
      "freundliches", "freundlichen", "größeren", "größtes", "weißes"),
    "russian" -> Seq("книгами", "книга", "книгах", "детей", "дети",
      "работают", "работала", "работавший", "государственных",
      "государство", "правительства", "правительством", "университете",
      "университетов", "студентами", "студентка", "преподавателей",
      "развития", "развитием", "возможностей", "возможность",
      "деятельности", "деятельностью", "образования", "информации",
      "положении", "отношения", "отношениях", "движении", "движением",
      "читающий", "читавшая", "написанный", "говорившие", "сделанные"),
    "turkish" -> Seq("kitaplarımız", "kitapları", "kitaplar", "evlerinde",
      "evlerimizde", "evinden", "geliyorum", "geliyorlar", "gelmişler",
      "gelecekler", "gidiyoruz", "gittiler", "yapacağız", "yapmışlardı",
      "çalışıyorlar", "çalışmalarında", "öğrencilerin", "öğretmenler",
      "üniversiteye", "üniversitelerde", "arkadaşlarımla", "arkadaşları",
      "güzelliği", "güzellikler", "mutluluğu", "sorumluluğunu",
      "olanakları", "başarılarını", "gelişmelerle", "değişiklikleri"),
    "finnish" -> Seq("taloissa", "talossa", "taloja", "talon", "kirjoissa",
      "kirjojen", "lapsille", "lapsien", "opiskelijoiden", "opiskelijat",
      "suomalaisten", "suomalaisia", "mahdollisuuksia", "mahdollisuus",
      "kehityksen", "kehittämisen", "toiminnan", "toimintaa",
      "yliopistossa", "yliopistojen", "tutkimuksessa", "tutkimusten",
      "tekevät", "tekivät", "menevät", "tulevat", "sanoivat", "puhuvat",
      "kirjoittavat", "lukemista", "oppimista", "ajattelemista"),
    "hungarian" -> Seq("házakban", "házak", "házban", "gyerekeknek",
      "gyerekek", "könyvekkel", "könyvek", "emberek", "embereknek",
      "egyetemen", "egyetemek", "fejlesztések", "fejlesztésekkel",
      "lehetőségek", "lehetőségekkel", "kormányok", "kormányoknak",
      "dolgoznak", "dolgozott", "dolgozni", "mennek", "mentek", "jönnek",
      "beszélnek", "beszéltek", "írnak", "írtak", "olvasnak", "olvastak",
      "tanulnak", "tanultak", "szeretnek", "szerettek", "legnagyobb",
      "legszebb", "leggyorsabban")
  )

  /** Same plain-ASCII random words for every language: exposes paths that a
    * language's own alphabet draw happens to miss (all alphabets include or
    * intersect a-z except the non-Latin scripts, where these still exercise
    * the no-vowel/region-absent paths).
    */
  lazy val sharedAscii: Vector[String] = {
    val rnd = new Random(7)
    val ab = "abcdefghijklmnopqrstuvwxyz"
    Vector.fill(4000) {
      val n = 1 + rnd.nextInt(12)
      val sb = new StringBuilder
      var i = 0
      while (i < n) { sb.append(ab.charAt(rnd.nextInt(26))); i += 1 }
      sb.toString
    }
  }

  def corpus(lang: String): Seq[String] = {
    val rnd = new Random(42)
    val ab = alphabets(lang)
    val sufs = suffixes.getOrElse(lang, Seq.empty)
    val real = realWords.getOrElse(lang, Seq.empty)
    val vowels = "aeiouyáéíóúàèìòùâêîôûäëïöüãõåæøœąęėįųūыаеиоуэюяըաեիոօ"
    def rndWord(minLen: Int, maxLen: Int): String = {
      val n = minLen + rnd.nextInt(maxLen - minLen + 1)
      val sb = new StringBuilder
      var i = 0
      while (i < n) { sb.append(ab.charAt(rnd.nextInt(ab.length))); i += 1 }
      sb.toString
    }
    // plausible stems: CV-alternating so regions exist
    def cvWord(): String = {
      val cons = ab.filterNot(c => vowels.indexOf(c.toInt) >= 0)
      val vs = ab.filter(c => vowels.indexOf(c.toInt) >= 0)
      if (cons.isEmpty || vs.isEmpty) return rndWord(3, 8)
      val n = 2 + rnd.nextInt(4)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        sb.append(cons.charAt(rnd.nextInt(cons.length)))
        sb.append(vs.charAt(rnd.nextInt(vs.length)))
        i += 1
      }
      sb.toString
    }
    val stems = Vector.fill(60)(cvWord()) ++ Vector.fill(40)(rndWord(2, 6))
    val crossed = for { s <- stems; suf <- sufs } yield s + suf
    val randoms = Vector.fill(8000)(rndWord(1, 14))
    (real ++ crossed ++ randoms ++ sharedAscii).distinct
  }

  def main(argv: Array[String]): Unit = {
    val outDir = Paths.get(argv(0))
    Files.createDirectories(outDir)
    val langs = if (argv.length > 1) argv(1).split(",").toSeq else alphabets.keys.toSeq
    for (lang <- langs) {
      val stemmer = Stemmers.forName(lang)
      val pw = new PrintWriter(
        Files.newBufferedWriter(outDir.resolve(s"$lang.tsv"), StandardCharsets.UTF_8))
      try corpus(lang).foreach { w =>
        if (w.nonEmpty && !w.contains('\t')) pw.println(s"$w\t${stemmer.stem(w)}")
      } finally pw.close()
      println(s"$lang: done")
    }
  }
}
