package graft.streaming

import graft.dict.{HighlighterOpts, ValidatorCli}
import graft.engine.{CompiledDictionary, Compiler}
import graft.spark.AnnotateExpression
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

/** Dictionary hot-reload for long-running streams.
  *
  * The compiled dictionary is broadcast once per VERSION, not per batch:
  * each micro-batch checks the dictionary file's mtime and only when it
  * changed recompiles on the driver, broadcasts the new compiled form,
  * and lazily unpersists the old one (running tasks finish on the old
  * broadcast; subsequent batches read the new). This is the streaming
  * operational shape for a percolation service — queries are long-lived
  * state that ops teams update underneath a running stream.
  */
final class RefreshingAnnotator(
    dictPath: String,
    opts: HighlighterOpts = HighlighterOpts.default) extends Serializable {

  @transient private var lastMtime = Long.MinValue
  @transient private var current: Broadcast[CompiledDictionary] = _

  /** Current broadcast, recompiling + rebroadcasting iff the file's
    * mtime moved. Driver-side only (called from foreachBatch).
    */
  def refreshIfNeeded(spark: SparkSession): Broadcast[CompiledDictionary] =
    synchronized {
      val mtime = new java.io.File(dictPath).lastModified()
      if (current == null || mtime != lastMtime) {
        val entries = ValidatorCli.readJsonString(
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dictPath)),
            java.nio.charset.StandardCharsets.UTF_8))
        val compiled = Compiler.compile(entries, opts)
        val next = spark.sparkContext.broadcast(compiled)
        if (current != null) current.unpersist(blocking = false)
        current = next
        lastMtime = mtime
      }
      current
    }

  /** Annotate one (micro-)batch against the current dictionary version. */
  def annotateBatch(batch: DataFrame, textCol: String,
      outputCol: String = "annotations"): DataFrame = {
    val bc = refreshIfNeeded(batch.sparkSession)
    val expr = AnnotateExpression(
      org.apache.spark.sql.GraftBridge.expression(col(textCol)), bc, merge = false)
    batch.withColumn(outputCol, org.apache.spark.sql.GraftBridge.column(expr))
  }

  /** foreachBatch writer: `sink` receives each annotated micro-batch. */
  def writer(stream: DataFrame, textCol: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(annotateBatch(batch, textCol), batchId)
    }
}
