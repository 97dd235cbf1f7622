package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once parquet sink for `foreachBatch` — the piece Structured
  * Streaming leaves to the sink author: after a failure the engine
  * REPLAYS the last micro-batch with the same `batchId`, so an
  * append-blind sink duplicates it. This sink makes the write
  * idempotent in `batchId`:
  *
  *  - each batch lands in its own `dir/batch=<id>/` (overwrite mode, so
  *    a half-written crashed attempt is clobbered, never appended),
  *  - a commit MARKER (`_committed_<id>`) is created only after the
  *    parquet write returns,
  *  - a replayed id whose marker exists is skipped entirely,
  *  - readers ([[readCommitted]]) mount only marker-committed batch
  *    directories — a torn write without a marker is invisible.
  *
  * Scale notes: the marker directory is tiny (one empty file per
  * batch); batch dirs partition naturally by arrival, and a downstream
  * compactor ([[graft.ops.Materialize]]) can rewrite them to sized
  * files without touching the commit protocol. On a real cluster `dir`
  * is any Hadoop-API filesystem; markers rely only on create-after-
  * write ordering, not atomic rename.
  */
object IdempotentSink {

  private def markerPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(dir, s"_committed_$batchId")

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write one micro-batch; returns false (no-op) when `batchId` is
    * already committed — the replay case.
    */
  def writeBatch(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    if (f.exists(markerPath(dir, batchId))) false
    else {
      df.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
      f.create(markerPath(dir, batchId), true).close()
      true
    }
  }

  /** The `foreachBatch` function: `stream.writeStream.foreachBatch(
    * IdempotentSink.sink(dir)).start()`.
    */
  def sink(dir: String): (DataFrame, Long) => Unit =
    (df, id) => { writeBatch(df, dir, id); () }

  /** Read back exactly the committed batches (torn, uncommitted batch
    * dirs are never mounted). Empty frame with an empty schema cannot
    * be inferred, so callers with zero committed batches get an
    * IllegalArgumentException from Spark — by design, not silently
    * empty.
    */
  def readCommitted(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val committed = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .filter(_.startsWith("_committed_"))
      .map(_.stripPrefix("_committed_").toLong)
      .sorted
    val dirs = committed.map(id => s"$dir/batch=$id")
    require(dirs.nonEmpty, s"no committed batches under $dir")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
