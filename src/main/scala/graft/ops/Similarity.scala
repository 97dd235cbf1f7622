package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The scalar math (dot product, norm, cosine) is pure native SQL
  * functions (`zip_with` + `aggregate`) — whole-stage-codegen'd, no UDF.
  * Vectors are cast to array<double> once so accumulation order and
  * precision are deterministic and oracle-comparable.
  *
  * Scale paths:
  *  - brute-force top-k for one query: a single scan + TakeOrdered (no
  *    shuffle of the corpus; the executor-local top-k heaps merge on the
  *    driver).
  *  - knnJoin for a small query set: broadcast the queries, one corpus
  *    scan, per-query windowed rank.
  *  - lshTopK: random-hyperplane bucketing (same family as
  *    Dedup.embeddingPairs) with multi-probe over Hamming-adjacent
  *    buckets — the 100 TB path where even one full scan per query set is
  *    too much.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Top-k rows by cosine similarity to a constant query vector.
    * Output: (idCol, rank, cosine). Deterministic tie-break on id.
    */
  def bruteForceTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit).toIndexedSeq: _*)
    val v = col(vecCol).cast("array<double>")
    val scored = df.select(col(idCol).as("id"), cosine(v, q).as("cosine"))
    scored.orderBy(col("cosine").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("id").asc)))
      .select(col("id"), col("rank"), col("cosine"))
  }

  /** For each query row (small set — broadcast), the top-k corpus
    * neighbors by cosine. Output: (query_id, neighbor_id, rank, cosine).
    */
  def knnJoin(
      corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Random-hyperplane signature (nPlanes sign bits as a long). */
  def lshSignature(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
    val planesLit = array(planes.map(p => array(p.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val bits = transform(planesLit, p =>
      when(aggregate(zip_with(vec, p, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x) >= 0,
        lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** LSH-bucketed approximate top-k for one query vector: only corpus rows
    * whose signature is within `probeHamming` bits of the query signature
    * are scored (multi-probe). Recall < 1 by construction; the scale path
    * when a full scan per query is too expensive.
    */
  def lshTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Array[Double], k: Int, dim: Int,
      nPlanes: Int = 16, probeHamming: Int = 2, seed: Long = 11L): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val withSig = df.select(col(idCol).as("id"), v.as("v"),
      lshSignature(v, dim, nPlanes, seed).as("sig"))
    // query signature computed ONCE on the driver (same plane sequence as
    // lshSignature), shipped as a long literal
    val qSig: Long = {
      val rnd = new java.util.Random(seed)
      val planes = Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
      planes.foldLeft(0L) { (acc, p) =>
        var dotv = 0.0
        var i = 0
        while (i < dim) { dotv += p(i) * query(i); i += 1 }
        acc * 2 + (if (dotv >= 0) 1L else 0L)
      }
    }
    val cands = withSig
      .filter(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= probeHamming)
    val qLit = array(query.map(lit).toIndexedSeq: _*)
    cands.withColumn("cosine", cosine(col("v"), qLit))
      .orderBy(col("cosine").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("id").asc)))
      .select(col("id"), col("rank"), col("cosine"))
  }
}
