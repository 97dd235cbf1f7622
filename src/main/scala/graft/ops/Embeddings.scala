package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/compute compression for large corpora: int8
  * max-abs quantization (the faiss `SQ8` scalar quantizer shape). At
  * dim=768 a float32 vector is 3 KB; its int8 codes are 768 bytes plus
  * one double — 4× less through storage, shuffles, and broadcast ANN
  * indexes, with cosine preserved to ~1e-2 (pinned by OpsSpec). Cosine
  * is scale-invariant, so ranking runs directly on the codes
  * ([[graft.spark.Int8CosineExpression]]) with no dequantization.
  *
  * All per-row work is codegen'd kernel expressions (the repo's kernel
  * policy — no interpreted higher-order lambdas on hot scans);
  * [[dequantizeInt8]] is the reconstruction utility, not a hot path.
  */
object Embeddings {

  /** struct(scale, q): q_i = round(127 · x_i / maxabs) half away from
    * zero, scale = maxabs / 127. SQL surface: `graft_quantize_int8`.
    */
  def quantizeInt8(vec: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.QuantizeInt8Expression(
        org.apache.spark.sql.GraftBridge.expression(vec)))

  /** Cosine over int8 code vectors — integer accumulation, one pass. */
  def int8Cosine(qa: Column, qb: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.Int8CosineExpression(
        org.apache.spark.sql.GraftBridge.expression(qa),
        org.apache.spark.sql.GraftBridge.expression(qb)))

  /** x_i ≈ q_i · scale (reconstruction utility). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** The quantized corpus: (idCol, scale, q). */
  def quantize(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol), quantizeInt8(col(vecCol).cast("array<double>")).as("__s"))
      .select(col(idCol), col("__s.scale").as("scale"), col("__s.q").as("q"))

  /** Matryoshka truncation (Kusupati et al. 2022): keep the first
    * `dims` components and L2-renormalize — the standard
    * dimensionality/cost dial for MRL-trained embedding models (a
    * 768-dim corpus searched at 128 dims is 6× less through every
    * shuffle and index). Codegen'd kernel (the repo's no-interpreted-
    * HOF-on-hot-scans policy); zero vectors renormalize to zero, not
    * NaN. Compose with [[quantize]] for the truncated-int8 index.
    */
  def truncateNormalize(vec: Column, dims: Int): Column = {
    require(dims >= 1, s"truncateNormalize: bad dims $dims")
    org.apache.spark.sql.GraftBridge.column(
      graft.spark.TruncateNormExpression(
        org.apache.spark.sql.GraftBridge.expression(vec.cast("array<double>")),
        dims))
  }

  /** ±1 sign for projection cell (k, j): parity of the first 32 bits
    * of md5("salt:k:j") — the same cross-engine md5 convention as the
    * sketch family, so the oracle regenerates the matrix independently.
    */
  private[graft] def rpSign(salt: String, k: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$k:$j"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions
    * with a DETERMINISTIC dense ±1 matrix (Achlioptas 2003 — sign
    * matrices preserve pairwise distances like gaussians, need no
    * float random state, and the md5-parity seeding regenerates the
    * identical matrix on any engine). The third member of the
    * embedding-compression family: [[truncateNormalize]] needs
    * MRL-trained models, [[quantize]] keeps the dimension; JL shrinks
    * ANY embedding 4–8× with bounded distance distortion — the
    * cheap pre-pass before banded near-dup or IVF over 100 TB of
    * vectors.
    *
    * Determinism/oracle contract: components are floored to 1e-6
    * grains and accumulated as exact BIGINT sums in a fixed fold
    * order — no float accumulation anywhere — then divided by
    * 1e6·√outDim once and rounded to 6. The sign matrix broadcasts as
    * a literal (outDim×D ints — KBs); per row the work is one
    * zip-multiply-sum per output dim, all native codegen'd HOFs on a
    * LONG array (off the no-interpreted-HOF hot-scan concern:
    * integer lambdas here fold in codegen).
    *
    * Output: (idCol, k, value) exploded — one row per output
    * component, 0-based k.
    */
  def randomProject(df: DataFrame, vecCol: String, idCol: String,
      outDim: Int, salt: String = "jl"): DataFrame = {
    require(outDim >= 1, s"randomProject: bad outDim $outDim")
    // head(1) (not head()) so an empty relation raises a NAMED error
    // instead of a bare NoSuchElementException deep in the iterator
    val firstRow = df.select(size(col(vecCol))).head(1)
    require(firstRow.nonEmpty,
      "randomProject: empty input — the projection dimension is read " +
        "from the first row; nothing to project")
    val inDim = firstRow(0).getInt(0)
    require(inDim >= 1, "randomProject: empty vectors")
    val signs: Array[Array[Long]] = Array.tabulate(outDim)(k =>
      Array.tabulate(inDim)(j => rpSign(salt, k, j).toLong))
    val scale = 1e6 * math.sqrt(outDim.toDouble)
    // no final rounding: the sum is an exact integer (< 2^53), so the
    // single IEEE division is bit-identical on any engine — rounding
    // would only reintroduce half-point representation disagreements.
    // Codegen'd kernel ([[graft.spark.RandomProjectExpression]]): same
    // grain/sum/divide math as the aggregate/zip_with SQL formulation
    // it replaces (which evaluated interpreted — outDim × inDim lambda
    // calls per row — as Spark HOFs are CodegenFallback), bit-identical
    // by construction and pinned by an OpsSpec parity test.
    val proj = org.apache.spark.sql.GraftBridge.column(
      graft.spark.RandomProjectExpression(
        org.apache.spark.sql.GraftBridge.expression(
          col(vecCol).cast("array<double>")), signs, scale))
    df.select(col(idCol), posexplode(proj).as(Seq("k", "value")))
  }

  /** Per-label centroid-cosine outlier scoring: each vector's cosine to
    * its label's mean vector, plus an `is_outlier` flag below
    * `threshold` — the mislabeled-example / garbage-embedding sweep
    * over a labeled corpus (low cosine to your own class centroid is
    * the standard first-pass label-noise signal).
    *
    * Determinism at scale: the centroid is built from 1e-7-grain
    * integer sums (float→double casts are exact; the BIGINT sum is
    * partition-order-proof), and the per-vector cosine folds 1e-9-grain
    * integer terms — so the result is bit-replayable in ANSI SQL and
    * stable under any repartitioning. Norm products multiply as
    * doubles (the integer product could overflow int64 at high dims).
    *
    * Scale shape: explode to (label, dim, grain) longs with map-side
    * partial aggregation — the wire carries ~|labels|×dims rows — then
    * the centroid table broadcasts back onto the exploded scan. No
    * driver-side math.
    */
  def labelOutliers(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, threshold: Double): DataFrame = {
    val ex = df.select(col(idCol).as("id"), col(labelCol).as("label"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "v")))
    val cent = ex.groupBy(col("label"), col("i"))
      .agg(sum(floor(col("v") * 1e7).cast("long")).as("s7"),
        count(lit(1)).as("n"))
      .select(col("label"), col("i"),
        (col("s7").cast("double") / col("n") / 1e7).as("c"))
    val terms = ex.join(broadcast(cent), Seq("label", "i"))
      .select(col("id"), col("label"),
        floor(col("v") * col("c") * 1e9).cast("long").as("d9"),
        floor(col("v") * col("v") * 1e9).cast("long").as("nv9"),
        floor(col("c") * col("c") * 1e9).cast("long").as("nc9"))
    terms.groupBy(col("id"), col("label"))
      .agg(sum(col("d9")).as("sd"), sum(col("nv9")).as("sv"),
        sum(col("nc9")).as("sc"))
      .select(col("id"), col("label"),
        round(col("sd") / sqrt(col("sv").cast("double") *
          col("sc").cast("double")), 6).as("cosine"),
        (col("sd") / sqrt(col("sv").cast("double") *
          col("sc").cast("double")) < threshold).as("is_outlier"))
  }

  /** Pure kernel for [[truncateNormalize]]. */
  private[graft] def truncateNormalizeValue(v: Array[Double],
      dims: Int): Array[Double] = {
    val n = math.min(dims, v.length)
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { ss += v(i) * v(i); i += 1 }
    if (ss == 0.0) return out
    val inv = 1.0 / math.sqrt(ss)
    i = 0
    while (i < n) { out(i) = v(i) * inv; i += 1 }
    out
  }
}
