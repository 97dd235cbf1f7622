package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fit-once / serve-many persistence for the driver-side model objects
  * ([[Bpe.BpeModel]], [[Similarity.IvfModel]], [[Similarity.PqModel]]).
  * Each model serializes to one small parquet dataset, so fitted
  * tokenizers and ANN quantizers ride the same storage as the corpus
  * (HDFS/S3/local), version next to the data they were fitted on, and
  * reload into any later job — the operational contract every
  * production pipeline needs once fitting (hours over a sample) and
  * serving (every ingest batch) stop sharing a JVM.
  *
  * Models are driver-side by design (they broadcast into the scan
  * kernels), so save/load collects — bounded by vocabulary/centroid
  * counts, thousands of rows, never corpus-sized. Relational model
  * state (NB weights from [[Retrieval.fitNbWeights]], IVF assignments,
  * PQ code columns) is already a DataFrame — persist those with plain
  * `df.write.parquet`.
  */
object Models {

  /** Write a BPE model: one row per merge (rank asc) plus a rank=-1
    * meta row carrying the fit stats, so zero-merge models round-trip.
    */
  def saveBpe(spark: SparkSession, model: Bpe.BpeModel, path: String): Unit = {
    import spark.implicits._
    val meta = Seq((-1, null.asInstanceOf[String], null.asInstanceOf[String],
      model.nWordTypes, model.typesUsed, model.tokenMassCovered))
    val rows = model.merges.zipWithIndex.map { case ((a, b), r) =>
      (r, a, b, 0L, 0, 0.0)
    }
    (meta ++ rows)
      .toDF("rank", "left", "right", "n_word_types", "types_used", "token_mass")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadBpe(spark: SparkSession, path: String): Bpe.BpeModel = {
    val rows = spark.read.parquet(path).collect()
    val meta = rows.find(_.getInt(0) == -1)
      .getOrElse(throw new IllegalStateException(s"no BPE meta row in $path"))
    val merges = rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.BpeModel(merges, meta.getLong(3), meta.getInt(4), meta.getDouble(5))
  }

  /** Write an IVF coarse quantizer: one row per centroid. */
  def saveIvf(spark: SparkSession, model: Similarity.IvfModel, path: String): Unit = {
    import spark.implicits._
    model.centroids.indices
      .map(i => (i, model.centroids(i).toSeq, model.radii(i)))
      .toDF("cid", "centroid", "radius")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadIvf(spark: SparkSession, path: String): Similarity.IvfModel = {
    val rows = spark.read.parquet(path).collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"empty IVF model at $path")
    Similarity.IvfModel(
      rows.map(_.getSeq[Double](1).toArray),
      rows.map(_.getDouble(2)))
  }

  /** Write PQ codebooks: one row per (subspace, code) centroid. */
  def savePq(spark: SparkSession, model: Similarity.PqModel, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      sub <- model.codebooks.indices
      code <- model.codebooks(sub).indices
    } yield (sub, code, model.codebooks(sub)(code).toSeq)
    rows.toDF("sub", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPq(spark: SparkSession, path: String): Similarity.PqModel = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"empty PQ model at $path")
    val bySub = rows.groupBy(_.getInt(0))
    val codebooks = (0 until bySub.size).map { sub =>
      bySub(sub).sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
    }.toArray
    Similarity.PqModel(codebooks)
  }
}
