package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-cleaning operators for corpus ingest pipelines: PII redaction
  * and HTML boilerplate stripping — the scrubbing steps between raw-web
  * ingest (WARC/WET) and quality filtering in public pretraining
  * pipelines (The Pile, C4, RefinedWeb all document variants of both).
  *
  * Everything here is chains of native `regexp_replace`/`regexp_count`
  * — scan-local, whole-stage-codegen'd, zero shuffles at any corpus
  * size — and every pattern stays inside the regex subset Java and RE2
  * share (no lookaround, no backreferences), so the DuckDB oracles
  * replicate the transforms byte-for-byte.
  */
object TextClean {

  /** Email addresses: local part @ dotted domain with an alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range validation — redaction wants
    * recall; a 999.0.0.1 "address" is still not useful training text).
    */
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** International-ish phone numbers: optional +CC then 7-12 digits
    * grouped by spaces or dashes. Word-boundary anchored (the `\b` sits
    * BETWEEN the optional `+` and the first digit — `+` is a non-word
    * char, so a leading boundary would never fire after a space) so bare
    * long integers (ids, timestamps) don't match.
    */
  val PhoneRe = "\\+?\\b\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}(?:[- ]\\d{1,4})?\\b"

  /** Redact emails, IPv4 addresses, and phone numbers, in that fixed
    * order (emails first so an address like `u@10.0.0.1` is consumed as
    * one email rather than leaking its host as an "IP"). Output keeps
    * all input columns, replaces `textCol`, and appends per-kind match
    * counts (counted BEFORE replacement, so overlaps are attributed to
    * the kind that consumed them).
    */
  def redactPii(df: DataFrame, textCol: String,
      emailToken: String = "<EMAIL>", ipToken: String = "<IP>",
      phoneToken: String = "<PHONE>"): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, emailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Re, ipToken)
    val afterPhone = regexp_replace(afterIp, PhoneRe, phoneToken)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRe)).cast("long"))
      .withColumn(textCol, afterPhone)
  }

  // script/style blocks go first (their CONTENT must vanish, not just
  // the tags), then comments, then remaining tags; (?s) so blocks span
  // newlines, non-greedy so adjacent blocks don't fuse
  private val ScriptRe = "(?s)<script\\b[^>]*>.*?</script>"
  private val StyleRe = "(?s)<style\\b[^>]*>.*?</style>"
  private val CommentRe = "(?s)<!--.*?-->"
  private val TagRe = "<[^>]+>"

  // the named entities worth decoding without an entity table; &amp;
  // LAST so "&amp;lt;" decodes to the literal "&lt;", not to "<"
  private val entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Strip HTML to visible text: drop script/style blocks and comments
    * with their content, drop all remaining tags, decode the common
    * named entities, collapse whitespace runs to single spaces, trim.
    * A pure per-row `regexp_replace` chain — one codegen'd projection,
    * the shape that survives any corpus size.
    */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(regexp_replace(text, ScriptRe, " "), StyleRe, " "),
      CommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), r)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** [[stripHtml]] over a DataFrame, replacing `textCol` and appending
    * the visible-text length.
    */
  def stripHtmlDf(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, stripHtml(col(textCol)))
      .withColumn("n_chars_visible", length(col(textCol)).cast("long"))
}
