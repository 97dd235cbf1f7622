package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything except the rolling-hash fingerprint is native SQL functions
  * (oracle-replicable in ANSI SQL and whole-stage-codegen'd).
  */
object TextStats {

  /** BPE-ish pre-tokenization pattern: letter runs, single digits,
    * single non-alphanumeric glyphs (roughly GPT-2's pre-tokenizer shape).
    */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  def bpeTokens(text: Column): Column = regexp_count(text, lit(BpePattern))

  def tokenCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      wsTokens(col(textCol)).as("ws_tokens"),
      bpeTokens(col(textCol)).as("bpe_tokens"))

  // small deterministic stopword lists for the n-gram/stopword language
  // heuristic (presence-based so it is ANSI-SQL replicable)
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "una"),
    "fr" -> Seq("le", "la", "les", "et", "un", "des", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "pt" -> Seq("o", "os", "uma", "não", "com", "por", "são"),
    "it" -> Seq("il", "che", "di", "per", "sono", "della", "gli"),
    "nl" -> Seq("het", "een", "van", "niet", "zijn", "met", "voor"),
    "lt" -> Seq("ir", "yra", "kad", "tai", "kaip", "bet", "buvo"))

  /** Language-ID heuristic, two tiers:
    *  1. SCRIPT: whitespace-tokenized stopwords can't see languages
    *     written without spaces or in another alphabet, so texts whose
    *     non-space characters are ≥ 25% CJK → "zh", ≥ 25% Cyrillic →
    *     "ru" (checked in that order).
    *  2. STOPWORDS: distinct-stopword presence score per language;
    *     highest wins (ties resolve in list order — the original four
    *     languages stay first so their predictions are stable), zero
    *     everywhere → "und".
    *
    * Implemented as the codegen'd single-pass kernel
    * [[graft.spark.LangIdExpression]]: the r6 declarative `when`-fold
    * re-referenced `greatest(all 11 scores)` and every `array_intersect`
    * inside each branch — an O(n²) expression tree that cost 2.4× in
    * `q_pipeline`'s post-join stage (r7 verdict #1), and even the
    * linearized struct/`array_max` form still pays one `lower` + one
    * `split` + 11 `array_intersect` materializations per row. The kernel
    * does one character scan + one token scan. [[langIdDeclarative]]
    * keeps the native-SQL-functions formulation as the executable spec;
    * OpsSpec pins kernel ≡ declarative on the corpus and on adversarial
    * script/tie/blank cases.
    */
  def langId(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.LangIdExpression(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** The langId semantics spelled in native SQL functions — the
    * oracle-replicable executable specification the kernel is pinned
    * against. Each `array_intersect` appears exactly once inside an
    * array of `(score, -ord, lang)` structs; `array_max`'s
    * lexicographic struct ordering picks the winner (highest score,
    * list-order tie-break).
    */
  private[graft] def langIdDeclarative(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val cjk = regexp_count(text, lit("[一-龥]"))
    val cyr = regexp_count(lower(text), lit("[а-яё]"))
    val toks = array_distinct(split(lower(text), "\\s+"))
    val entries = langStopwords.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(-i).as("nord"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    val byStopwords =
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    when(cjk * 4 >= nonSpace && cjk > 0, "zh")
      .when(cyr * 4 >= nonSpace && cyr > 0, "ru")
      .otherwise(byStopwords)
  }

  /** Language ID WITH a confidence margin — the CCNet policy needs not
    * just an argmax but how decisively it won (fasttext-confidence
    * thresholds; low-margin docs are the mislabel/misfilter risk).
    * Returns struct(lang, top, second): on the stopword path `top` and
    * `second` are the two best stopword scores (margin = top − second;
    * 0 margin = a tie the list order broke — treat as unconfident);
    * script-tier rows (zh/ru) report the script char count with
    * second = 0; `und` is (0, 0). Declarative (one projection, no
    * shuffle) — this is a reporting/threshold column, not the
    * q_pipeline hot path, so the kernel policy doesn't apply; the
    * entries array feeds both the argmax and the sorted score list.
    */
  def langIdWithConfidence(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val cjk = regexp_count(text, lit("[一-龥]")).cast("int")
    val cyr = regexp_count(lower(text), lit("[а-яё]")).cast("int")
    val toks = array_distinct(split(lower(text), "\\s+"))
    val entries = array(langStopwords.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(-i).as("nord"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(entries)
    val sorted = reverse(array_sort(transform(entries,
      e => e.getField("score"))))
    val s1 = element_at(sorted, 1)
    val s2 = element_at(sorted, 2)
    when(cjk * 4 >= nonSpace && cjk > 0,
        struct(lit("zh").as("lang"), cjk.as("top"),
          lit(0).cast("int").as("second")))
      .when(cyr * 4 >= nonSpace && cyr > 0,
        struct(lit("ru").as("lang"), cyr.as("top"),
          lit(0).cast("int").as("second")))
      .otherwise(struct(
        when(s1 > 0, best.getField("lang")).otherwise(lit("und")).as("lang"),
        s1.as("top"), s2.as("second")))
  }

  // token → (language index, stopword bit) pairs; stopwords overlap
  // across languages ("la" es+fr, "que" es+fr, "und" de…) so the value
  // is a list. Built once; the kernel is a hash lookup per token.
  private val langNames: Array[String] = langStopwords.map(_._1).toArray
  private val stopwordBits: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for (((_, words), li) <- langStopwords.zipWithIndex;
         (w, wi) <- words.zipWithIndex) {
      val packed = (li << 8) | wi
      val prev = m.get(w)
      m.put(w, if (prev == null) Array(packed) else prev :+ packed)
    }
    m
  }

  /** Pure text → language kernel shared by the codegen'd
    * [[graft.spark.LangIdExpression]] and the tests. Exactly the
    * [[langIdDeclarative]] semantics: `nonSpace` counts non-`\s` code
    * points (Java regex `\s` = `[ \t\n\x0B\f\r]`, surrogate pairs count
    * once like Spark's `length`), CJK counts chars in U+4E00–U+9FA5,
    * Cyrillic counts chars lowercasing into U+0430–U+044F ∪ U+0451
    * (uppercase→lowercase Cyrillic is 1:1, so per-char equals
    * `regexp_count(lower(text), '[а-яё]')`), stopword scores are
    * distinct-token set intersections over `\s+`-split lowercased text.
    */
  private[graft] def langIdValue(text: String): String = {
    var nonSpace = 0; var cjk = 0; var cyr = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (!isWs && !Character.isLowSurrogate(c)) nonSpace += 1
      if (c >= '一' && c <= '龥') cjk += 1
      else {
        val lc = Character.toLowerCase(c)
        if ((lc >= 'а' && lc <= 'я') || lc == 'ё') cyr += 1
      }
      i += 1
    }
    if (cjk > 0 && cjk * 4 >= nonSpace) return "zh"
    if (cyr > 0 && cyr * 4 >= nonSpace) return "ru"
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val masks = new Array[Int](langNames.length)
    var start = 0
    val ln = lower.length
    i = 0
    while (i <= ln) {
      val atWs = i == ln || {
        val c = lower.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
          c == '\r'
      }
      if (atWs) {
        if (i > start) {
          val hits = stopwordBits.get(lower.substring(start, i))
          if (hits != null) {
            var h = 0
            while (h < hits.length) {
              masks(hits(h) >> 8) |= 1 << (hits(h) & 0xff)
              h += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    var bestLang = "und"; var bestScore = 0
    var li = 0
    while (li < masks.length) {
      val s = Integer.bitCount(masks(li))
      if (s > bestScore) { bestScore = s; bestLang = langNames(li) }
      li += 1
    }
    bestLang
  }

  /** Quality metrics: char/token counts, mean token length, stopword
    * ratio, alphanumeric ratio, and a coarse quality bucket. All integer /
    * rounded arithmetic for oracle comparability.
    */
  def quality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val nTok = wsTokens(t)
    val enStops = langStopwords.head._2
    val nStop = size(array_intersect(array_distinct(split(lower(t), "\\s+")),
      array(enStops.map(lit): _*)))
    val nChars = length(t)
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      nStop.as("n_stopwords"),
      round(nChars.cast("double") / greatest(nTok, lit(1)), 3).as("mean_tok_len"),
      when(nTok < 5, lit("too_short"))
        .when(nChars / greatest(nTok, lit(1)) > 15, lit("long_tokens"))
        .otherwise(lit("ok")).as("quality_bucket"))
  }

  /** Top-k characteristic terms per document by TF-IDF
    * (tf × ln(nDocs / docFreq)). Fully declarative: explode → two
    * aggregations (term frequency per doc, document frequency per term) →
    * join on the term → per-doc window rank. The doc-frequency relation is
    * vocabulary-sized (≪ corpus), so Catalyst broadcasts it; the only
    * corpus-sized shuffles are the two groupBys. Scores are rounded to 6
    * decimals BEFORE ranking so rank order is stable across engines
    * (ln differs in the last ulp between libm implementations).
    *
    * Output: (doc_id, rank, term, tfidf).
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val nDocs = df.select(count_distinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfT, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df_t")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** FNV-1a 64 per whitespace token. */
  private def tokenHashes(text: String): Array[Long] =
    text.split("\\s+").map { t =>
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < t.length) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
      h
    }

  /** 31-polynomial hash of each `window`-token rolling window; empty when
    * the doc is shorter than one window. Single definition shared by
    * [[fingerprint]] and [[fingerprintWindows]] so the q_fp_card oracle
    * certifies exactly the hash the fingerprint minimizes over.
    */
  private def windowHashes(hs: Array[Long], window: Int): Array[Long] =
    if (hs.length < window) Array.empty[Long]
    else Array.tabulate(hs.length - window + 1) { i =>
      var w = 0xcbf29ce484222325L
      var j = i
      while (j < i + window) { w = w * 31 + hs(j); j += 1 }
      w
    }

  /** Pure text → rolling-window-hash kernel shared by the codegen'd
    * [[graft.spark.WindowHashesExpression]] and the tests.
    */
  private[graft] def windowHashesValue(text: String, window: Int): Array[Long] =
    if (text == null || text.isEmpty) Array.empty[Long]
    else windowHashes(tokenHashes(text), window)

  /** All rolling-window hashes (the set [[fingerprint]] minimizes over).
    * Distinct-cardinality of these equals distinct window token-sequences
    * as long as the 64-bit hash is collision-free on the corpus — which is
    * what the q_fp_card oracle checks against DuckDB's string windows.
    * Codegen'd expression (`graft_window_hashes`), same kernel policy as
    * every other per-row text kernel.
    */
  def fingerprintWindows(textCol: Column, window: Int = 5): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.WindowHashesExpression(
        org.apache.spark.sql.GraftBridge.expression(textCol), window))

  /** Pure text → content-defined chunks kernel (Rabin-style CDC at
    * token granularity): cut AFTER token j = i+window−1 whenever the
    * `window`-token rolling hash starting at i has its low bits zero
    * (`hash & (divisor−1) == 0`, divisor a power of two → expected
    * chunk length ≈ divisor tokens). The masked-low-bits test is
    * two's-complement/HUGEINT-agnostic, so the q_cdc oracle replays the
    * cut decisions exactly. No min/max chunk constraint — every
    * boundary decision depends only on its own window, which is what
    * makes chunks REALIGN after an insertion (the fixed-stride
    * chunker's failure mode) and keeps the rule SQL-expressible.
    * Chunks re-join with single spaces; docs shorter than one window
    * (or with no qualifying window) come back whole; blank docs chunk
    * to nothing. A cut at the last token is dropped — the doc end is
    * already a boundary.
    */
  private[graft] def cdcChunksValue(text: String, window: Int,
      divisor: Long): Array[String] = {
    val trimmed = if (text == null) "" else text.trim
    if (trimmed.isEmpty) return Array.empty[String]
    val toks = trimmed.split("\\s+")
    val ws = windowHashes(tokenHashes(trimmed), window)
    val mask = divisor - 1
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < ws.length) {
      val j = i + window - 1
      if ((ws(i) & mask) == 0L && j < toks.length - 1) bounds += j + 1
      i += 1
    }
    bounds += toks.length
    Array.tabulate(bounds.length - 1) { k =>
      toks.slice(bounds(k), bounds(k + 1)).mkString(" ")
    }
  }

  /** Content-defined chunks of a text column (`graft_cdc_chunks`) —
    * codegen'd kernel, see [[cdcChunksValue]].
    */
  def cdcChunks(textCol: Column, window: Int = 5, divisor: Long = 64): Column = {
    require(divisor >= 2 && (divisor & (divisor - 1)) == 0,
      s"cdcChunks: divisor must be a power of two >= 2: $divisor")
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.CdcChunksExpression(
        org.apache.spark.sql.GraftBridge.expression(textCol), window, divisor))
  }

  /** Pure text → fingerprint kernel, shared by the Column wrapper and the
    * SQL function `graft_fingerprint`.
    */
  private[graft] def fingerprintValue(text: String, window: Int): Long = {
    if (text == null || text.isEmpty) 0L
    else {
      val hs = tokenHashes(text)
      val ws = windowHashes(hs, window)
      if (ws.isEmpty) hs.foldLeft(0xcbf29ce484222325L)((acc, h) => acc * 31 + h)
      else ws.min
    }
  }

  /** Rolling polynomial document fingerprint (winnowing-style): hash each
    * token (FNV-1a 64), roll a window of `window` token hashes, fingerprint
    * = minimum window hash. Content-defined, robust to doc reordering of
    * surrounding rows. Scalar function: scan-local, no shuffle.
    */
  /** Fixed-stride token-window chunking — the context-window slicing
    * step of a pretraining/RAG pipeline: each document becomes
    * ceil(max(n-overlap,1)/stride) chunks of up to `chunkTokens`
    * whitespace tokens, consecutive chunks sharing `overlap` tokens.
    * Pure per-row explode of native expressions (split/sequence/slice):
    * no shuffle, codegen'd, linear output size — the 100 TB shape.
    * Empty/blank docs produce no chunks.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens: $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    // whitespace tokens = \s+ runs of the trimmed text — consistent with
    // gopherQuality/wsTokens; consecutive spaces or newlines do not
    // produce empty tokens that would inflate n_tokens
    val toks = split(trim(col(textCol)), "\\s+")
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .withColumnsRenamed(Map("pos" -> "chunk_id", "col" -> "__start"))
      // a trailing window fully covered by the previous chunk is noise
      .filter(col("chunk_id") === 0 || col("__start") < col("__n") - lit(overlap))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1,
          lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("__start"))
          .cast("long").as("n_tokens"))
  }

  def fingerprint(textCol: Column, window: Int = 5): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.FingerprintExpression(
        org.apache.spark.sql.GraftBridge.expression(textCol), window))

  /** Per-document repetition counters, one pass over the text:
    * `[n_words, n_distinct_words, sum_word_chars, n_bigrams,
    * top_bigram_count, dup_bigram_occurrences]`. Pure kernel shared by
    * [[graft.spark.RepetitionCountsExpression]] (codegen'd) and the tests.
    * Words are `\s+`-separated runs of the trimmed text; bigrams are
    * adjacent word pairs; `dup_bigram_occurrences` counts every occurrence
    * of a bigram that occurs more than once (Gopher's "duplicate n-gram
    * fraction" numerator, Rae et al. 2021 §A1.1).
    */
  private[graft] def repetitionCountsValue(text: String): Array[Long] = {
    val trimmed = if (text == null) "" else text.trim
    val ws = if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
    val n = ws.length
    val distinct = new java.util.HashSet[String](n * 2)
    var sumChars = 0L
    var i = 0
    while (i < n) { distinct.add(ws(i)); sumChars += ws(i).length; i += 1 }
    val bigrams = new java.util.HashMap[String, Integer](n * 2)
    i = 0
    while (i < n - 1) {
      val k = ws(i) + " " + ws(i + 1)
      val prev = bigrams.get(k)
      bigrams.put(k, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var top = 0L
    var dup = 0L
    var tot = 0L
    val it = bigrams.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      tot += c
      if (c > top) top = c
      if (c > 1) dup += c
    }
    Array(n.toLong, distinct.size.toLong, sumChars, tot, top, dup)
  }

  /** Pure kernel for [[ngramRepetition]]: over whitespace tokens,
    * `[n_ngrams, top_ngram_count, dup_ngram_occurrences]` for word
    * n-grams of the given order. One pass, one hash map — the same
    * shape as [[repetitionCountsValue]] generalized beyond bigrams.
    */
  private[graft] def ngramRepetitionValue(text: String, n: Int): Array[Long] = {
    val ws = text.trim match {
      case "" => Array.empty[String]
      case t  => t.split("\\s+")
    }
    if (ws.length < n) return Array(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, java.lang.Integer]()
    var i = 0
    while (i <= ws.length - n) {
      val sb = new java.lang.StringBuilder(ws(i))
      var j = 1
      while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
      val k = sb.toString
      val prev = counts.get(k)
      counts.put(k, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var top = 0L; var dup = 0L; var tot = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue.toLong
      tot += c
      if (c > top) top = c
      if (c > 1) dup += c
    }
    Array(tot, top, dup)
  }

  /** RefinedWeb-style repeated n-gram signals (Penedo et al. 2023
    * §Appendix: the `rep_ngram` family, which extends Gopher's bigram
    * checks to higher orders): for each requested n, the fraction of
    * n-gram occurrences belonging to the single most frequent n-gram
    * (`top_{n}gram_frac`) and to any duplicated n-gram
    * (`dup_{n}gram_frac`), plus a `keep` flag thresholding each.
    * Per-row codegen'd kernels — zero shuffles; exact integer ratios
    * rounded to 6 decimals and keep derived from the ROUNDED values,
    * so the DuckDB oracle replays it bit-for-bit.
    */
  def ngramRepetition(df: DataFrame, textCol: String, idCol: String,
      ns: Seq[Int] = Seq(3, 4), maxTopFrac: Double = 0.16,
      maxDupFrac: Double = 0.5): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), s"ngramRepetition: bad orders $ns")
    val withCounts = ns.foldLeft(df.select(col(idCol), col(textCol))) {
      case (d, n) =>
        d.withColumn(s"__c$n", org.apache.spark.sql.GraftBridge.column(
          graft.spark.NgramRepetitionExpression(
            org.apache.spark.sql.GraftBridge.expression(col(textCol)), n)))
    }
    val withFracs = ns.foldLeft(withCounts) { case (d, n) =>
      val tot = element_at(col(s"__c$n"), 1)
      val top = element_at(col(s"__c$n"), 2)
      val dup = element_at(col(s"__c$n"), 3)
      d.withColumn(s"top_${n}gram_frac",
          when(tot === 0, lit(0.0))
            .otherwise(round(top.cast("double") / tot, 6)))
        .withColumn(s"dup_${n}gram_frac",
          when(tot === 0, lit(0.0))
            .otherwise(round(dup.cast("double") / tot, 6)))
    }
    val keep = ns.map(n =>
      (col(s"top_${n}gram_frac") <= maxTopFrac) &&
        (col(s"dup_${n}gram_frac") <= maxDupFrac))
      .reduce(_ && _)
    withFracs.withColumn("keep", keep.cast("long"))
      .drop(ns.map(n => s"__c$n"): _*)
      .drop(textCol)
  }

  /** Gopher-style quality/repetition signals (Rae et al. 2021 §A1.1,
    * adapted to single-line documents): per doc, the word count, duplicate
    * -word fraction, mean word length, top-bigram fraction (occurrences of
    * the most frequent adjacent word pair over all bigram occurrences) and
    * duplicate-bigram fraction, plus a `keep` flag applying the filter
    * thresholds. Fractions are exact integer ratios rounded to 6 decimals,
    * and `keep` is derived from the ROUNDED values, so the output is
    * bit-replicable in ANSI SQL (the q_gopher oracle).
    *
    * Scale shape: these are per-document statistics, so they are computed
    * by a scan-local codegen'd kernel — zero shuffles, no matter the corpus
    * size. (The relational alternative — explode bigrams, groupBy(doc,
    * bigram) — re-shuffles the entire corpus text twice for what one pass
    * over each row computes locally.)
    */
  def gopherQuality(df: DataFrame, textCol: String, idCol: String,
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxTopBigramFrac: Double = 0.18, maxDupWordFrac: Double = 0.9): DataFrame = {
    val rc = org.apache.spark.sql.GraftBridge.column(
      graft.spark.RepetitionCountsExpression(
        org.apache.spark.sql.GraftBridge.expression(col(textCol))))
    val nW = element_at(col("__rc"), 1)
    val nD = element_at(col("__rc"), 2)
    val sumC = element_at(col("__rc"), 3)
    val nB = element_at(col("__rc"), 4)
    val topB = element_at(col("__rc"), 5)
    val dupB = element_at(col("__rc"), 6)
    df.select(col(idCol), rc.as("__rc"))
      .select(col(idCol),
        nW.as("n_words"),
        when(nW === 0, lit(0.0))
          .otherwise(round((nW - nD).cast("double") / nW, 6)).as("dup_word_frac"),
        when(nW === 0, lit(0.0))
          .otherwise(round(sumC.cast("double") / nW, 6)).as("mean_word_len"),
        when(nB === 0, lit(0.0))
          .otherwise(round(topB.cast("double") / nB, 6)).as("top_bigram_frac"),
        when(nB === 0, lit(0.0))
          .otherwise(round(dupB.cast("double") / nB, 6)).as("dup_bigram_frac"))
      .withColumn("keep",
        (col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("top_bigram_frac") <= maxTopBigramFrac &&
          col("dup_word_frac") <= maxDupWordFrac).cast("long"))
  }

  /** The REMAINING published Gopher rules (Rae et al. 2021 §A1.1) that
    * [[gopherQuality]]'s repetition kernel doesn't cover: fraction of
    * words with at least one alphabetic character (< `minAlphaWordFrac`
    * rejects), symbol-to-word ratio for `#`/ellipsis (> `maxSymbolRatio`
    * rejects), fraction of lines starting with a bullet
    * (> `maxBulletLineFrac`), fraction of lines ending in an ellipsis
    * (> `maxEllipsisLineFrac`), and the ≥ `minStopwords`-of-eight
    * English stop-word presence test. Emits each signal (fractions
    * rounded to 6, ratios exact-integer-derived) plus `keep`; AND it
    * with [[gopherQuality]]'s flag for the full Gopher filter. All
    * native regexp/array work in the Java∩RE2 subset — scan-local,
    * zero shuffles, DuckDB-replayable.
    */
  def gopherPageRules(df: DataFrame, textCol: String, idCol: String,
      minAlphaWordFrac: Double = 0.8, maxSymbolRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9, maxEllipsisLineFrac: Double = 0.3,
      minStopwords: Int = 2): DataFrame = {
    val t = col(textCol)
    val words = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))
    val nW = size(words).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val lines = split(t, "\n")
    val nL = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      trim(l).rlike("^[•\\-*]"))).cast("long")
    val nEll = size(filter(lines, l =>
      trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val nSym = (regexp_count(t, lit("#")) +
      regexp_count(t, lit("\\.\\.\\.")) + regexp_count(t, lit("…"))).cast("long")
    val stopwords = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStop = stopwords.map(w =>
      when(lower(t).rlike("\\b" + w + "\\b"), 1L).otherwise(0L))
      .reduce(_ + _).cast("long")
    df.select(col(idCol), nW.as("n_words"),
        when(nW === 0, lit(0.0))
          .otherwise(round(nAlpha.cast("double") / nW, 6)).as("alpha_word_frac"),
        when(nW === 0, lit(0.0))
          .otherwise(round(nSym.cast("double") / nW, 6)).as("symbol_ratio"),
        when(nL === 0, lit(0.0))
          .otherwise(round(nBullet.cast("double") / nL, 6)).as("bullet_line_frac"),
        when(nL === 0, lit(0.0))
          .otherwise(round(nEll.cast("double") / nL, 6)).as("ellipsis_line_frac"),
        nStop.as("n_stopwords"))
      .withColumn("keep",
        ((col("n_words") > 0) &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_line_frac") <= maxBulletLineFrac &&
          col("ellipsis_line_frac") <= maxEllipsisLineFrac &&
          col("n_stopwords") >= minStopwords).cast("long"))
  }

  /** Sentence-boundary normalization: terminator runs (`[.!?]`)
    * followed by whitespace become a newline boundary — the naive
    * splitter behind C4's three-sentence-span policies. Regex stays in
    * the Java∩RE2 subset (no lookbehind — the capture-group rewrite
    * replicates in DuckDB as `\1`), so downstream sentence-level ops
    * are oracle-replicable. Compose with [[graft.ops.Dedup.lineDedup]]
    * for corpus-level sentence dedup or
    * [[graft.ops.Dedup.dedupLinesWithinDoc]] for per-doc repeats.
    */
  def sentenceDelimited(text: Column): Column =
    regexp_replace(text, "([.!?])\\s+", "$1\n")

  /** Deflate compression ratio (compressed/raw bytes, level 6) — the
    * Gopher-suite repetitiveness signal: highly repetitive boilerplate
    * compresses far below ~0.4 while diverse prose sits near 0.6–0.8.
    * Real zlib work (java.util.zip ships in the JVM), codegen'd via
    * [[graft.spark.CompressionRatioExpression]]; null/empty → null.
    */
  def compressionRatio(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.CompressionRatioExpression(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Pure kernel for [[compressionRatio]]: rounded to 4 decimals. */
  private[graft] def compressionRatioValue(s: String): java.lang.Double = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.isEmpty) null
    else {
      val d = new java.util.zip.Deflater(6)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        BigDecimal(total.toDouble / bytes.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      } finally d.end()
    }
  }

  /** Metadata-validation report: per group (source, crawl, shard…),
    * how often the recorded language label agrees with the [[langId]]
    * prediction — the standard screen for mislabeled or
    * machine-translated segments before trusting upstream metadata.
    * Output: (group, n_docs, n_agree, agree_frac round-6). One
    * scan-local kernel + one groupBy.
    */
  def langAgreementReport(df: DataFrame, textCol: String, langCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol).as("group"),
        (langId(col(textCol)) === col(langCol)).cast("long").as("__agree"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__agree")).as("n_agree"))
      .withColumn("agree_frac",
        round(col("n_agree").cast("double") / col("n_docs"), 6))

  /** Corpus datasheet card — the one-table summary a dataset release
    * ships (Datasheets for Datasets, Gebru et al. 2021): document and
    * token volume, exact-dup fraction, mean document length, short-doc
    * fraction, and the source-mix Shannon entropy (nats — how
    * concentrated the corpus is in a few sources; ln(#sources) =
    * perfectly balanced). Output: (metric, value) rows, one aggregation
    * pass for the scalars + one source-keyed aggregation for the
    * entropy. Entropy terms use the 1e-9 floor-grain convention
    * ([[graft.ops.Lm.bigramPerplexity]]) so the card replays
    * bit-for-bit in the oracle; ratios round-6, counts exact.
    */
  def corpusCard(df: DataFrame, textCol: String, idCol: String,
      sourceCol: String): DataFrame = {
    val t = col(textCol)
    val scalars = df.agg(
      count(lit(1)).as("n_docs"),
      sum(wsTokens(t)).cast("long").as("n_tokens"),
      count_distinct(md5(t)).as("n_distinct"),
      sum(when(wsTokens(t) < 5, 1L).otherwise(0L)).as("n_short"))
    // -Σ p ln p via 1e-9-grained per-source terms (partition-order
    // independent); the single-partition window over the |sources|-row
    // relation is free
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val srcEntropy = df.groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as("c"))
      .withColumn("__p", col("c").cast("double") / sum(col("c")).over(w))
      .select(floor(col("__p") * log(col("__p")) * lit(-1e9)).cast("long").as("t9"))
      .agg(round(sum(col("t9")) / lit(1e9), 6).as("source_entropy"))
    val s = scalars.crossJoin(srcEntropy)
    // ratio metrics report 0.0 on an empty corpus instead of null/NaN
    def ratio(c: Column): Column =
      when(col("n_docs") === 0, lit(0.0)).otherwise(round(c, 6))
    val rows = Seq(
      ("n_docs", col("n_docs").cast("double")),
      ("n_tokens", coalesce(col("n_tokens"), lit(0L)).cast("double")),
      ("dup_frac", ratio(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))),
      ("mean_doc_tokens", ratio(col("n_tokens").cast("double") / col("n_docs"))),
      ("short_doc_frac", ratio(col("n_short").cast("double") / col("n_docs"))),
      ("source_entropy", coalesce(col("source_entropy"), lit(0.0))))
    s.select(explode(array(rows.map { case (m, v) =>
        struct(lit(m).as("metric"), v.as("value")) }: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }

  /** One-pass corpus health report, per detected language: document /
    * token / character volume, exact token-count quantiles, exact-dup
    * rate (md5 groups), and the mean English-stopword presence — the
    * numbers an ops team reads before and after every pipeline stage.
    * One scan + one groupBy(lang) (the per-doc kernel is scan-local);
    * the dup rate folds a second md5-keyed aggregation whose shuffle
    * carries 16-byte hashes, never text. Exact `percentile` keeps the
    * report oracle-replicable; swap to approx_percentile at the
    * trillion-doc scale where a sort-based aggregate hurts.
    *
    * Output: one row per language, ordered by `n_docs` desc then lang.
    */
  def corpusReport(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // feeds both the dup-group aggregation and the per-language rollup —
    // persist so the text scans (and the langId kernel) run once
    val perDoc = df.select(
      col(idCol).as("__id"),
      langId(col(textCol)).as("lang"),
      wsTokens(col(textCol)).cast("long").as("__tok"),
      length(col(textCol)).cast("long").as("__chars"),
      md5(col(textCol)).as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dups = perDoc.groupBy(col("lang"), col("__h"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("lang"))
      .agg(sum(col("__n") - 1).as("n_exact_dups"))
    // released after the caller's first action (recompute-safe: every
    // column is a deterministic expression over the input)
    graft.spark.CacheRelease.afterFirstAction(
      perDoc.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__tok")).as("n_tokens"),
          sum(col("__chars")).as("n_chars"),
          expr("percentile(__tok, 0.5)").cast("double").as("p50_tokens"),
          expr("percentile(__tok, 0.9)").cast("double").as("p90_tokens"))
        .join(dups, Seq("lang"))
        .withColumn("dup_frac",
          round(col("n_exact_dups").cast("double") / col("n_docs"), 6))
        .orderBy(col("n_docs").desc, col("lang")),
      Seq(perDoc))
  }
}
