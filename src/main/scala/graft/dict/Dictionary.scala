package graft.dict

/** A stored query ("dictionary entry") — the reference's
  * `beagle.schema/DictionaryEntry` (`schema.clj:25-32`) plus the
  * undocumented fuzzy fields used by matching (`phrases.clj:170,179-183`).
  * None means "inherit from highlighter opts / defaults" (three-way merge,
  * `text_analysis.clj:110-126`).
  */
final case class DictionaryEntry(
    text: String,
    entryType: Option[String] = None,
    id: Option[String] = None,
    synonyms: Seq[String] = Nil,
    caseSensitive: Option[Boolean] = None,
    asciiFold: Option[Boolean] = None,
    stem: Option[Boolean] = None,
    stemmer: Option[String] = None,
    slop: Option[Long] = None,
    tokenizer: Option[String] = None,
    inOrder: Option[Boolean] = None,
    fuzzy: Option[Boolean] = None,
    fuzziness: Option[Int] = None,
    meta: Map[String, String] = Map.empty)

/** Highlighter-level options (`phrases.clj:237-264` docstring). */
final case class HighlighterOpts(
    typeName: Option[String] = None,
    validateDictionary: Boolean = false,
    optimizeDictionary: Boolean = false,
    tokenizer: Option[String] = None,
    caseSensitive: Option[Boolean] = None,
    asciiFold: Option[Boolean] = None,
    stem: Option[Boolean] = None,
    stemmer: Option[String] = None,
    slop: Option[Long] = None,
    inOrder: Option[Boolean] = None)

object HighlighterOpts { val default: HighlighterOpts = HighlighterOpts() }

/** Match result — the reference's `Highlight` record (`schema.clj:44`).
  * `text` is the matched DOCUMENT substring (`phrases.clj:77,94`);
  * offsets are char offsets, end exclusive.
  */
final case class Annotation(
    text: String,
    annType: String,
    dictEntryId: String,
    meta: Map[String, String],
    beginOffset: Int,
    endOffset: Int)

/** Dictionary validation — the reference's `validator.clj:7-30` spec
  * conformance, re-expressed as explicit checks. Returns human-readable
  * error strings; empty = valid.
  */
object Validator {
  def validate(dictionary: Seq[DictionaryEntry]): Seq[String] =
    dictionary.zipWithIndex.flatMap { case (e, i) =>
      val errs = scala.collection.mutable.ArrayBuffer.empty[String]
      if (e.text == null || e.text.trim.isEmpty)
        errs += s"entry $i: text must be a non-blank string"
      if (e.synonyms != null && e.synonyms.exists(s => s == null || s.trim.isEmpty))
        errs += s"entry $i: synonyms must be non-blank strings"
      if (e.slop.exists(_ < 0))
        errs += s"entry $i: slop must be >= 0"
      errs.toSeq
    }

  def isValid(dictionary: Seq[DictionaryEntry]): Boolean = validate(dictionary).isEmpty
}

/** Dictionary dedup/merge — faithful port of
  * `dictionary_optimizer.clj` (grouping `:40-41`, meta-compat fold
  * `:27-38`, entry merge `:13-22`, suggestions `:47-58`).
  */
object Optimizer {

  def mergeableMeta(a: DictionaryEntry, b: DictionaryEntry): Boolean = {
    val shared = a.meta.keySet.intersect(b.meta.keySet)
    shared.forall(k => a.meta(k) == b.meta(k))
  }

  private def mergeEntries(entries: Seq[DictionaryEntry]): DictionaryEntry = {
    val first = entries.head
    val synonyms = entries.flatMap(_.synonyms).distinct.filterNot(_ == first.text)
    val meta = entries.foldLeft(Map.empty[String, String])((acc, e) => acc ++ e.meta)
    DictionaryEntry(
      text = first.text,
      id = first.id,
      synonyms = synonyms,
      meta = meta,
      caseSensitive = first.caseSensitive,
      asciiFold = first.asciiFold)
  }

  /** Within a [text, caseSensitive, asciiFold] group, fold together entries
    * whose meta maps agree on shared keys (`aggregate-entries-by-meta`).
    */
  def aggregateByMeta(entries: Seq[DictionaryEntry]): Seq[DictionaryEntry] = {
    var queue = entries.toList
    val acc = scala.collection.mutable.ArrayBuffer.empty[DictionaryEntry]
    while (queue.nonEmpty) {
      var current = queue.head
      var rest = queue.tail
      val exceptions = scala.collection.mutable.ArrayBuffer.empty[DictionaryEntry]
      while (rest.nonEmpty) {
        val b = rest.head
        if (mergeableMeta(current, b)) current = mergeEntries(Seq(current, b))
        else exceptions += b
        rest = rest.tail
      }
      acc += current
      queue = exceptions.toList
    }
    acc.toSeq
  }

  def groupKey(e: DictionaryEntry): (String, Option[Boolean], Option[Boolean]) =
    (e.text, e.caseSensitive, e.asciiFold)

  def optimize(dictionary: Seq[DictionaryEntry]): Seq[DictionaryEntry] =
    dictionary.groupBy(groupKey).valuesIterator.flatMap(aggregateByMeta).toSeq

  final case class Suggestion(suggestion: String, entries: Seq[DictionaryEntry])

  def dryRun(dictionary: Seq[DictionaryEntry]): Seq[Suggestion] =
    dictionary.groupBy(groupKey).valuesIterator.collect {
      case group if group.size > 1 =>
        val ids = group.map(e => e.id.getOrElse(e.text))
        Suggestion(
          s"Dictionary items '[${ids.mkString(" ")}]' have identical `[text case-sensitivity ascii-folding] features.",
          group)
    }.toSeq
}
