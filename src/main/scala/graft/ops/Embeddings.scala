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
