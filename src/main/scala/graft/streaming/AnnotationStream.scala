package graft.streaming

import graft.dict.{DictionaryEntry, HighlighterOpts}
import graft.spark.SparkHighlighter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over annotation streams.
  *
  * The matcher itself is a stateless per-row map, so it runs unchanged
  * under Structured Streaming (`readStream` → annotate → `writeStream`);
  * state appears only in the aggregations AROUND it, which are stock
  * Spark: event-time windows + watermarks. This is the shape the
  * reference's benchmark pipeline approximates with core.async
  * (`README.md:190`) re-expressed on a real streaming runtime:
  * per-window, per-dictionary-entry match counts that tolerate late data
  * up to the watermark and evict state beyond it (bounded memory at
  * 100 TB/day stream rates; parallelism = shuffle partitions on the
  * window+entry grouping key).
  */
object AnnotationStream {

  /** windowed per-entry match counts: (window, dict_entry_id, n_matches).
    * Works on both batch and streaming DataFrames; on a stream use
    * append/update mode with the given watermark.
    */
  def windowedMatchCounts(
      df: DataFrame, textCol: String, tsCol: String,
      dictionary: Seq[DictionaryEntry],
      windowDuration: String = "1 hour",
      watermark: String = "10 minutes",
      opts: HighlighterOpts = HighlighterOpts.default): DataFrame = {
    val hl = SparkHighlighter(dictionary, opts)
    hl.annotateExploded(df, textCol)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col("dict_entry_id"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Per-entry totals with approximate distinct documents — the
    * streaming-friendly sketch (HLL) instead of exact distinct.
    */
  def matchTotals(
      df: DataFrame, textCol: String, idCol: String,
      dictionary: Seq[DictionaryEntry],
      opts: HighlighterOpts = HighlighterOpts.default): DataFrame = {
    val hl = SparkHighlighter(dictionary, opts)
    hl.annotateExploded(df, textCol)
      .groupBy(col("dict_entry_id"))
      .agg(count(lit(1)).as("n_matches"),
        approx_count_distinct(col(idCol)).as("approx_docs"))
  }
}
