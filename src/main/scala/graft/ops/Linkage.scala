package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: blocking + bounded fuzzy pair
  * scoring. The classic dedup-a-dimension problem ("are
  * `Customer#0041` and `Customer#0014` the same entity?") that exact
  * dedup ([[Dedup.exact]]) can't see and all-pairs comparison can't
  * afford.
  *
  * Scale shape: candidate pairs come ONLY from an equi-join on the
  * caller-supplied blocking key — the quadratic blowup is bounded by
  * the largest block, which the key design controls (nation × name
  * prefix, sorted-neighborhood prefix, phonetic key, …), and the plan
  * is a plain shuffled hash join a 1000-executor cluster partitions by
  * block. Edit distance runs with Spark's early-abandon threshold
  * variant (cost O(maxDist × len), not O(len²)) on the pairs inside a
  * block, after the join, never across blocks. The emitted match pairs
  * feed [[Dedup]]'s transitive-cluster labeler for entity ids.
  */
object Linkage {

  /** Candidate pairs within a block scored by Levenshtein distance,
    * keeping `dist <= maxDist`. Output: (id_a, id_b, name_a, name_b,
    * dist) with id_a < id_b, one row per unordered pair.
    */
  def blockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"blockedPairs: bad maxDist $maxDist")
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__name"),
      blockKey.as("__blk"))
    val a = base.select(col("__id").as("id_a"), col("__name").as("name_a"),
      col("__blk"))
    val b = base.select(col("__id").as("id_b"), col("__name").as("name_b"),
      col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      // threshold variant: early-abandons past maxDist (returns -1)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** Jaro-Winkler similarity kernel (the ER scorer Levenshtein's edit
    * counts under-serve: prefix-weighted, length-normalized, the
    * de-facto name-matching standard). Exact published semantics,
    * pinned against DuckDB's native `jaro_winkler_similarity`:
    * match window ⌊max(|a|,|b|)/2⌋−1, transpositions = half the
    * misaligned match pairs, Winkler boost `+ p·0.1·(1−jaro)` for the
    * common prefix p ≤ 4 applied only when jaro > 0.7, either-empty →
    * 0. Char granularity is Unicode CODE POINTS — the same unit
    * Catalyst's `length()` counts, which is what makes the length-ratio
    * prefilter ([[graft.spark.JaroWinklerPrefilterRule]] and the guard
    * in [[blockedPairsJw]]) sound for supplementary-plane text, not
    * just the BMP. (The per-call int[] materialization was benchmarked
    * against the old charAt path: q_er_jw got FASTER — 0.505 → 0.341 s
    * min at sf0.1 — so no ASCII fast path is carried.)
    */
  def jaroWinklerValue(a: String, b: String): Double = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val la = ca.length
    val lb = cb.length
    if (la == 0 || lb == 0) return 0.0
    val w = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + w)
      var j = math.max(0, i - w)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && ca(i) == cb(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (ca(i) != cb(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2.0) / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val cap = math.min(4, math.min(la, lb))
      var p = 0
      while (p < cap && ca(p) == cb(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  /** Byte-set Jaccard similarity kernel: |bytes(a) ∩ bytes(b)| /
    * |bytes(a) ∪ bytes(b)| over the UTF-8 encodings — pinned against
    * DuckDB's native `jaccard` (byte-granular by construction there
    * too; multi-byte code points contribute their individual bytes).
    * The cheap second ER signal next to [[jaroWinklerValue]]: order-
    * free, O(len), a 256-bit bitmap per side. Either side empty → 0
    * (DuckDB raises there; the oracle only compares non-empty pairs).
    */
  def byteJaccardValue(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = new Array[Long](4)
    val sb = new Array[Long](4)
    var i = 0
    while (i < a.length) {
      val v = a(i) & 0xff
      sa(v >> 6) |= 1L << (v & 63)
      i += 1
    }
    i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      sb(v >> 6) |= 1L << (v & 63)
      i += 1
    }
    var inter = 0
    var union = 0
    i = 0
    while (i < 4) {
      inter += java.lang.Long.bitCount(sa(i) & sb(i))
      union += java.lang.Long.bitCount(sa(i) | sb(i))
      i += 1
    }
    inter.toDouble / union
  }

  /** [[byteJaccardValue]] as a codegen'd column (SQL:
    * `graft_byte_jaccard`).
    */
  def byteJaccard(l: Column, r: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.ByteJaccardExpression(
        org.apache.spark.sql.GraftBridge.expression(l),
        org.apache.spark.sql.GraftBridge.expression(r)))

  /** [[jaroWinklerValue]] as a codegen'd column (Spark has no native
    * Jaro-Winkler; this is the custom-`Expression` escape hatch, also
    * registered as SQL `graft_jaro_winkler`).
    */
  def jaroWinkler(l: Column, r: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.JaroWinklerExpression(
        org.apache.spark.sql.GraftBridge.expression(l),
        org.apache.spark.sql.GraftBridge.expression(r)))

  /** [[blockedPairs]] scored by Jaro-Winkler similarity instead of edit
    * distance: keep in-block pairs with `sim >= minSim`. Same blocking
    * contract and (id_a < id_b) pair convention.
    */
  def blockedPairsJw(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, minSim: Double): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, s"blockedPairsJw: bad $minSim")
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__name"),
      blockKey.as("__blk"))
    val a = base.select(col("__id").as("id_a"), col("__name").as("name_a"),
      col("__blk"))
    val b = base.select(col("__id").as("id_b"), col("__name").as("name_b"),
      col("__blk"))
    val joined = a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
    // conservative length-ratio guard (see JaroWinklerPrefilterRule's
    // derivation: jw >= c forces lmin/lmax >= 3(c-0.4)/0.6 - 2) — the
    // kernel never runs for pairs lengths alone disqualify. The
    // optimizer rule injects the same guard for ad-hoc SQL filters;
    // here the operator carries it itself so no extension is needed.
    val ratio = 3 * ((minSim - 0.4) / 0.6) - 2
    val guarded = if (ratio > 0)
      joined.filter(
        least(length(col("name_a")), length(col("name_b"))).cast("double") >=
          lit(ratio) * greatest(length(col("name_a")), length(col("name_b")))
            .cast("double"))
    else joined
    guarded
      .withColumn("sim", jaroWinkler(col("name_a"), col("name_b")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("sim"))
  }

  /** Pair-level evaluation of an ER/dedup candidate relation against a
    * gold pair set — the metric every blocking-strategy decision needs:
    * (n_predicted, n_truth, n_hit, precision, recall, f1). Both inputs
    * are (id_a, id_b) with id_a < id_b (the repo-wide pair convention);
    * the intersection is one id-keyed join, metrics are exact integer
    * ratios rounded at 6.
    */
  def pairEval(predicted: DataFrame, truth: DataFrame): DataFrame = {
    val p = predicted.select(col("id_a"), col("id_b")).distinct()
    val g = truth.select(col("id_a"), col("id_b")).distinct()
    // one pass over the (possibly expensive) predicted lineage: a left
    // join against the gold markers yields n_predicted and n_hit from
    // the same execution
    val marked = p.join(g.withColumn("__hit", lit(1L)),
      Seq("id_a", "id_b"), "left")
    val row = marked.agg(count(lit(1)).as("np"),
      coalesce(sum(col("__hit")), lit(0L)).as("nh")).head()
    val np = row.getLong(0)
    val nh = row.getLong(1)
    val ng = g.count()
    val prec = if (np == 0) 0.0 else nh.toDouble / np
    val rec = if (ng == 0) 0.0 else nh.toDouble / ng
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    // HALF_UP at 6 decimals — the repo-wide round(col, 6) / DuckDB
    // round() convention (math.rint's half-even would diverge on ties)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spark = predicted.sparkSession
    import spark.implicits._
    Seq((np, ng, nh, r6(prec), r6(rec), r6(f1)))
      .toDF("n_predicted", "n_truth", "n_hit", "precision", "recall", "f1")
  }
}
