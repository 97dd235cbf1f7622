package graft.engine

import graft.dict.{Annotation, DictionaryEntry, HighlighterOpts}

/** Pure-Scala entry point mirroring the reference's `phrases/highlighter`
  * (`phrases.clj:236-273`): compile once, then annotate any number of
  * texts. Thread-safe after construction (the compiled dictionary is
  * immutable), so a single instance can be shared across Spark task
  * threads — same contract as the reference's single shared Monitor
  * (`CHANGELOG:48-50`).
  */
final class PhraseHighlighter(
    dictionary: Seq[DictionaryEntry],
    opts: HighlighterOpts = HighlighterOpts.default) extends Serializable {

  val compiled: CompiledDictionary = Compiler.compile(dictionary, opts)

  def annotate(text: String): Seq[Annotation] = compiled.matchDoc(text)

  def annotate(text: String, mergeAnnotations: Boolean): Seq[Annotation] =
    compiled.matchDocMerged(text, mergeAnnotations)
}

object Phrases {
  /** `(highlighter dictionary opts)` → annotate fn (`phrases.clj:265-273`). */
  def highlighter(
      dictionary: Seq[DictionaryEntry],
      opts: HighlighterOpts = HighlighterOpts.default): String => Seq[Annotation] = {
    val h = new PhraseHighlighter(dictionary, opts)
    h.annotate(_)
  }
}
