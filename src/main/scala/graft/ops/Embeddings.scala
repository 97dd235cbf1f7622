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
}
