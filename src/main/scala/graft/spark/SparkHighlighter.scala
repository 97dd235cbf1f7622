package graft.spark

import graft.dict.{Annotation, DictionaryEntry, HighlighterOpts}
import graft.engine.{CompiledDictionary, Compiler, LuceneAlpha}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native highlighter: the reference's `phrases/highlighter`
  * (`phrases.clj:236-273`) lifted to DataFrames.
  *
  * Scale design (SURVEY §3.1, §4): the dictionary is compiled ONCE on the
  * driver into an immutable [[CompiledDictionary]] (inverted
  * term→query-id presearcher included) and broadcast — the single
  * driver→executor boundary. Matching is a per-row scalar function: the
  * UDF closure carries only the broadcast HANDLE, so tasks ship bytes,
  * not the dictionary; executors fetch the compiled dictionary once via
  * torrent broadcast regardless of task count. Everything downstream
  * (explode, groupBy) is stock Catalyst and optimizes/shuffles as usual.
  *
  * The same column expression works unchanged on streaming DataFrames
  * (stateless per-row map — the reference is stream-agnostic too,
  * `phrases.clj:271-273`).
  */
final class SparkHighlighter(
    dictionary: Seq[DictionaryEntry],
    opts: HighlighterOpts = HighlighterOpts.default,
    mergeAnnotations: Boolean = false) extends Serializable {

  val compiled: CompiledDictionary = Compiler.compile(dictionary, opts)

  @transient private var bcCache: Broadcast[CompiledDictionary] = _

  private def bc(df: DataFrame): Broadcast[CompiledDictionary] = synchronized {
    if (bcCache == null)
      bcCache = df.sparkSession.sparkContext.broadcast(compiled)
    bcCache
  }

  /** Column of array<struct<text,annType,dictEntryId,meta,beginOffset,endOffset>>.
    * Uses the native Catalyst [[AnnotateExpression]] (no per-row
    * reflection-encoder round trip); `annotateColumnUdf` keeps the plain
    * ScalaUDF path for comparison/debugging.
    */
  def annotateColumn(df: DataFrame, textCol: String): Column =
    annotateColumn(df, textCol, mergeAnnotations)

  /** Per-call override of merge-annotations, mirroring the reference's
    * match-time opts (`phrases.clj:231-234,271-273`): the compiled
    * dictionary is construction-time state, merging is a call-time choice.
    */
  def annotateColumn(df: DataFrame, textCol: String, merge: Boolean): Column = {
    val expr = AnnotateExpression(
      org.apache.spark.sql.GraftBridge.expression(col(textCol)),
      bc(df), merge)
    org.apache.spark.sql.GraftBridge.column(expr)
  }

  def annotateColumnUdf(df: DataFrame, textCol: String): Column = {
    val b = bc(df)
    val merge = mergeAnnotations
    val fn = udf((text: String) => b.value.matchDocMerged(text, merge))
    fn(col(textCol))
  }

  def annotate(df: DataFrame, textCol: String, outputCol: String = "annotations"): DataFrame =
    df.withColumn(outputCol, annotateColumn(df, textCol))

  def annotate(df: DataFrame, textCol: String, outputCol: String,
      merge: Boolean): DataFrame =
    df.withColumn(outputCol, annotateColumn(df, textCol, merge))

  /** Exploded, flattened view: one output row per annotation, original
    * columns retained. Rows with no matches are dropped (inner explode)
    * unless `keepUnmatched` — then they surface once with null annotation
    * columns (explode_outer), the shape joins/coverage audits want.
    */
  def annotateExploded(df: DataFrame, textCol: String,
      keepUnmatched: Boolean = false): DataFrame = {
    val ex = if (keepUnmatched) explode_outer(col("__anns")) else explode(col("__anns"))
    annotate(df, textCol, "__anns")
      .select(df.columns.map(col).toIndexedSeq :+ ex.as("ann"): _*)
      .select(df.columns.map(col).toIndexedSeq ++ Seq(
        col("ann.text").as("matched_text"),
        col("ann.annType").as("ann_type"),
        col("ann.dictEntryId").as("dict_entry_id"),
        col("ann.meta").as("ann_meta"),
        col("ann.beginOffset").as("begin_offset"),
        col("ann.endOffset").as("end_offset")): _*)
  }
}

/** Spark lift of the reference's `lucene-alpha/annotator`
  * (`lucene_alpha.clj:57-66`): boolean query-string matching, no offsets.
  */
final class SparkAlphaAnnotator(
    dictionary: Seq[DictionaryEntry],
    opts: HighlighterOpts = HighlighterOpts.default) extends Serializable {

  val annotator = new LuceneAlpha.AlphaAnnotator(dictionary, opts)

  @transient private var bcCache: Broadcast[LuceneAlpha.AlphaAnnotator] = _

  private def bc(df: DataFrame): Broadcast[LuceneAlpha.AlphaAnnotator] = synchronized {
    if (bcCache == null)
      bcCache = df.sparkSession.sparkContext.broadcast(annotator)
    bcCache
  }

  def annotate(df: DataFrame, textCol: String, outputCol: String = "annotations"): DataFrame = {
    val b = bc(df)
    val fn = udf((text: String) => b.value.annotate(text))
    df.withColumn(outputCol, fn(col(textCol)))
  }

  def annotateExploded(df: DataFrame, textCol: String): DataFrame =
    annotate(df, textCol, "__anns")
      .select(df.columns.map(col).toIndexedSeq :+ explode(col("__anns")).as("ann"): _*)
      .select(df.columns.map(col).toIndexedSeq ++ Seq(
        col("ann.text").as("query_string"),
        col("ann.annType").as("ann_type"),
        col("ann.dictEntryId").as("dict_entry_id"),
        col("ann.meta").as("ann_meta")): _*)
}

object SparkHighlighter {
  def apply(dictionary: Seq[DictionaryEntry], opts: HighlighterOpts = HighlighterOpts.default,
      mergeAnnotations: Boolean = false): SparkHighlighter =
    new SparkHighlighter(dictionary, opts, mergeAnnotations)
}
