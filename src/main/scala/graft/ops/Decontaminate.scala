package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination by word n-gram overlap — the GPT-3 method
  * (Brown et al. 2020 appendix C, also PaLM / Llama): a corpus document
  * is contaminated iff it shares ANY word n-gram (default n=13) with the
  * benchmark/eval set, and the clean corpus is everything else.
  *
  * This complements the dictionary-based decontamination pipeline
  * (annotate with a blocklist → anti-join, `SparkEntry.qDecontaminate`):
  * that one needs curated phrases, this one needs only the eval set
  * itself.
  *
  * Scale shape (the 100 TB posture): the benchmark side is tiny relative
  * to the corpus, so its distinct n-grams are reduced to 8-byte 64-bit
  * hash keys and BROADCAST; the corpus side is one narrow projected
  * scan — `explode` of the per-row n-gram hash array is pipelined, never
  * materialized — probed through a broadcast LEFT SEMI join. The only
  * shuffles in the plan carry 8-byte keys: the corpus-side `distinct`
  * on doc ids and the bench-side `distinct` on gram hashes. No corpus
  * text and no gram strings ever cross the network. Both sides hash
  * with the SAME one-pass codegen'd kernel the jaccard dedup path uses
  * ([[graft.spark.ShingleHashesExpression]], FNV-1a 64 over the
  * space-joined gram — shingles ARE word n-grams), so no gram string is
  * ever materialized per row either; a false positive needs a 64-bit
  * collision between a corpus gram and a bench gram (p ≈ |corpus grams|
  * × |bench grams| / 2^64 — negligible even at 100 TB, and only ever
  * drops a single extra doc).
  */
object Decontaminate {

  /** All word n-grams of `text` as an array of space-joined strings
    * (words = `\s+` runs of the trimmed text); empty array when the doc
    * has fewer than `n` words. Inspection/debug surface — the join path
    * below never materializes gram strings, it uses the hash kernel.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val ws = split(trim(text), "\\s+")
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct 64-bit n-gram hashes of `text` — one codegen'd kernel pass
    * per row (the same shingle kernel as the jaccard dedup path). The
    * kernel tokenizes on single spaces, so the text is whitespace-
    * normalized first (trim + collapse `\s+` runs to one space — both
    * native codegen'd functions): documents whose shared n-gram differs
    * only in whitespace (tabs, newlines, double spaces) must still hash
    * identically, exactly matching [[wordNgrams]]'s `\s+` semantics.
    */
  private def gramHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.ShingleHashesExpression(
        org.apache.spark.sql.GraftBridge.expression(
          regexp_replace(trim(text), "\\s+", " ")), n))

  /** Ids of corpus documents sharing at least one word n-gram with the
    * benchmark set. Output: one `idCol` column, distinct.
    */
  def contaminatedIds(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    val benchGrams = bench
      .select(explode(gramHashes(col(textCol), n)).as("__gh"))
      .distinct()
    docs.select(col(idCol), explode(gramHashes(col(textCol), n)).as("__gh"))
      .join(broadcast(benchGrams), Seq("__gh"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** The clean corpus: `docs` minus every document contaminated by
    * `bench` n-gram overlap. All `docs` columns pass through.
    */
  def apply(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame =
    docs.join(contaminatedIds(docs, bench, textCol, idCol, n),
      Seq(idCol), "left_anti")

  /** [[contaminatedIds]] for a benchmark set too large to broadcast as
    * raw gram hashes: a Bloom prefilter + exact confirm join. EXACT
    * results — identical output to [[contaminatedIds]], not approximate:
    * the Bloom filter has no false negatives, so filtering the corpus
    * grams through it keeps a superset of the true hits, and the confirm
    * semi-join removes the false positives.
    *
    * Scale shape: [[contaminatedIds]] broadcasts every distinct bench
    * gram hash (8 bytes each — 8 GB of broadcast at 10⁹ grams, which
    * kills it). Here only the Bloom BITS broadcast (~1.2 GB at 10⁹
    * grams / 1% fpp — `n·ln(1/fpp)/ln²2` bits), the corpus scan probes
    * it scan-locally in whole-stage codegen, and the confirm join
    * shuffles just the surviving grams: ≈ fpp × |corpus grams| noise
    * plus the true hits, as 8-byte keys. The bench side pays two scans
    * (count to size the filter, then build) — it is the small side by
    * assumption, and at 100 TB corpus scale the corpus-side shuffle
    * reduction dominates.
    */
  def bloomContaminatedIds(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 13,
      fpp: Double = 0.01): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val spark = docs.sparkSession
    val benchGrams = bench
      .select(explode(gramHashes(col(textCol), n)).as("__gh"))
      .distinct()
    val nGrams = math.max(1L, benchGrams.count())
    val bloom = benchGrams.stat.bloomFilter("__gh", nGrams, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = org.apache.spark.sql.GraftBridge.column(
      graft.spark.BloomProbeExpression(
        org.apache.spark.sql.GraftBridge.expression(col("__gh")), bc))
    docs.select(col(idCol), explode(gramHashes(col(textCol), n)).as("__gh"))
      .filter(probe)
      .join(benchGrams.hint("shuffle_hash"), Seq("__gh"), "left_semi")
      .select(col(idCol))
      .distinct()
  }

  /** The clean corpus via the Bloom-prefilter path — exact, same output
    * as [[apply]]; use when the bench gram set outgrows broadcast.
    */
  def bloom(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, n: Int = 13,
      fpp: Double = 0.01): DataFrame =
    docs.join(bloomContaminatedIds(docs, bench, textCol, idCol, n, fpp),
      Seq(idCol), "left_anti")

  /** FUZZY decontamination pairs — the PaLM/Llama-class CONTAINMENT
    * rule rather than the GPT-3 any-13-gram trigger: a (train doc,
    * bench item) pair is flagged when ≥ `minFrac` of the bench item's
    * distinct word n-grams appear in the train doc. Catches partially
    * embedded / lightly edited eval items that never produce one long
    * verbatim n-gram, and yields an auditable per-pair score instead of
    * a binary verdict.
    *
    * Scale shape: the bench side reduces to (bench_id, 64-bit gram
    * hash) rows + a per-item gram count — both tiny and BROADCAST; the
    * corpus side is one projected scan whose exploded gram hashes probe
    * the broadcast table, then a (doc, bench_id) count aggregation.
    * Only (id, bench_id, count) rows shuffle; no text, no gram strings.
    * The verdict compares in integer micro-fraction arithmetic
    * (`shared × 1e6 ≥ micro(minFrac) × bench_grams`), so no float
    * threshold ever decides, and the q_decontam_fuzzy oracle replays
    * every score relationally (string grams vs our 64-bit hashes — a
    * divergence needs a 64-bit collision, the documented caveat above).
    *
    * Output: (idCol, bench_id, shared_grams, bench_grams, overlap) for
    * flagged pairs; `overlap` = shared/bench rounded to 6.
    */
  def fuzzyContaminationPairs(docs: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, benchIdCol: String,
      n: Int = 8, minFrac: Double = 0.7): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1: $n")
    require(0 < minFrac && minFrac <= 1, s"minFrac must be in (0,1]: $minFrac")
    val micro = math.round(minFrac * 1e6)
    val benchGrams = bench
      .select(col(benchIdCol).as("bench_id"),
        explode(gramHashes(col(textCol), n)).as("__gh"))
    val benchSizes = benchGrams.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("bench_grams"))
    docs.select(col(idCol), explode(gramHashes(col(textCol), n)).as("__gh"))
      .join(broadcast(benchGrams), Seq("__gh"))
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(broadcast(benchSizes), Seq("bench_id"))
      .filter(col("shared_grams") * lit(1000000L) >=
        lit(micro) * col("bench_grams"))
      .select(col(idCol), col("bench_id"), col("shared_grams"),
        col("bench_grams"),
        round(col("shared_grams").cast("double") / col("bench_grams"), 6)
          .as("overlap"))
  }

  /** The clean corpus under the fuzzy rule: `docs` minus every document
    * flagged against ANY bench item by [[fuzzyContaminationPairs]].
    */
  def fuzzy(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, benchIdCol: String, n: Int = 8,
      minFrac: Double = 0.7): DataFrame =
    docs.join(
      fuzzyContaminationPairs(docs, bench, textCol, idCol, benchIdCol,
        n, minFrac).select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
