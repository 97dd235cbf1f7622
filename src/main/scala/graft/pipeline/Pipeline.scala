package graft.pipeline

import graft.dict.Edn
import graft.dict.Edn._
import graft.ops.{Dedup, Sampling, TextClean, TextStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative curation pipelines — the engine's config-driven surface,
  * in the same spirit as the reference's EDN dictionaries
  * (`/root/reference/src/beagle/dictionaries.clj` reads dictionaries
  * from EDN/CSV/JSON; here the PIPELINE itself is data): a vector of
  * stage maps compiled into the exact DataFrame chain a user would
  * hand-write, so curation recipes can be versioned, diffed, and
  * shipped without a code change.
  *
  * ```edn
  * [{:op :normalize :form "NFC"}
  *  {:op :filter-min-words :n 10}
  *  {:op :dedup-exact}
  *  {:op :lang-id :out "lang_pred"}
  *  {:op :filter-lang :langs ["en" "es"]}]
  * ```
  *
  * Compilation is a pure fold over lazy DataFrames — no action runs
  * here, each stage contributes its ordinary declarative plan and
  * Catalyst optimizes ACROSS stages (filters reorder into scans,
  * projections fuse) exactly as if the chain were hand-written; the
  * runner adds zero execution machinery of its own. Stage taxonomy:
  * TRANSFORM stages rewrite `textCol` in place and leave the schema
  * otherwise untouched (extra diagnostic columns an op emits are
  * dropped), FILTER stages only remove rows, ANNOTATE stages add one
  * named column. [[validate]] checks a spec without touching data;
  * [[run]] fails fast on the first bad stage with the stage index in
  * the message.
  */
object Pipeline {

  /** One parsed stage: the op name plus its keyword→value args. */
  final case class StageSpec(op: String, args: Map[String, Value])

  private def name(v: Value): Option[String] = v match {
    case EKw(n) => Some(n)
    case EStr(s) => Some(s)
    case _ => None
  }

  /** Parse an EDN pipeline spec: a vector of maps, each with an `:op`
    * keyword plus per-op args. Throws `IllegalArgumentException` with
    * the offending stage index on malformed input.
    */
  def parse(spec: String): Seq[StageSpec] = Edn.parse(spec) match {
    case EVec(items) => items.zipWithIndex.map {
      case (m: EMap, i) =>
        val entries = m.entries.flatMap { case (k, v) =>
          name(k).map(_ -> v)
        }.toMap
        val op = entries.get("op").flatMap(name).getOrElse(
          fail(i, "stage missing :op"))
        StageSpec(op, entries - "op")
      case (_, i) => fail(i, "stage must be a map")
    }.toSeq
    case _ =>
      throw new IllegalArgumentException(
        "pipeline spec must be an EDN vector of stage maps")
  }

  private def fail(i: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"pipeline stage $i: $msg")

  private def str(s: StageSpec, i: Int, k: String): Option[String] =
    s.args.get(k).map(v => name(v).getOrElse(fail(i, s":$k must be a string")))
  private def num(s: StageSpec, i: Int, k: String): Option[Double] =
    s.args.get(k).map {
      case ENum(d, _) => d
      case _ => fail(i, s":$k must be a number")
    }
  private def reqNum(s: StageSpec, i: Int, k: String): Double =
    num(s, i, k).getOrElse(fail(i, s"missing :$k"))
  private def bool(s: StageSpec, i: Int, k: String): Option[Boolean] =
    s.args.get(k).map {
      case EBool(b) => b
      case _ => fail(i, s":$k must be a boolean")
    }
  private def strSeq(s: StageSpec, i: Int, k: String): Seq[String] =
    s.args.get(k) match {
      case Some(EVec(items)) => items.map(v =>
        name(v).getOrElse(fail(i, s":$k must hold strings")))
      case Some(_) => fail(i, s":$k must be a vector")
      case None => fail(i, s"missing :$k")
    }

  /** The known op names — [[validate]]'s vocabulary. */
  val ops: Set[String] = Set("normalize", "fix-mojibake", "strip-html",
    "redact-pii", "pseudonymize", "c4-filter", "filter-min-words",
    "gopher-filter", "dedup-exact", "dedup-near", "lang-id",
    "filter-lang", "sample")

  /** Static spec check, no data touched: parse + per-stage arg
    * validation (by compiling against an empty frame is overkill — the
    * checks here mirror [[run]]'s arg reads). Returns human-readable
    * errors; empty = valid, same contract as
    * [[graft.dict.Validator.validateDictionary]].
    */
  def validate(spec: String): Seq[String] =
    try {
      parse(spec).zipWithIndex.flatMap { case (s, i) =>
        val unknown =
          if (!ops.contains(s.op)) Seq(s"stage $i: unknown op :${s.op}")
          else Seq.empty
        val argErr =
          try {
            s.op match {
              case "filter-min-words" => reqNum(s, i, "n"); Nil
              case "sample" =>
                val r = reqNum(s, i, "rate")
                if (r <= 0 || r > 1) Seq(s"stage $i: :rate out of (0,1]")
                else Nil
              case "dedup-near" =>
                val t = num(s, i, "threshold").getOrElse(0.8)
                if (t <= 0 || t > 1)
                  Seq(s"stage $i: :threshold out of (0,1]")
                else Nil
              case "filter-lang" => strSeq(s, i, "langs"); Nil
              case _ => Nil
            }
          } catch {
            case e: IllegalArgumentException => Seq(e.getMessage)
          }
        unknown ++ argErr
      }
    } catch {
      case e: IllegalArgumentException => Seq(e.getMessage)
    }

  /** Compile + attach the pipeline to `df`. Lazy — returns the composed
    * plan; nothing executes until an action.
    */
  def run(df: DataFrame, spec: String, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    parse(spec).zipWithIndex.foldLeft(df) { case (d, (s, i)) =>
      applyStage(d, s, i, textCol, idCol)
    }

  /** Keep only `d`'s original columns after an op that appends
    * diagnostics (the TRANSFORM-stage purity contract). */
  private def pure(before: Array[String], after: DataFrame): DataFrame =
    after.select(before.map(col).toIndexedSeq: _*)

  private def applyStage(d: DataFrame, s: StageSpec, i: Int,
      textCol: String, idCol: String): DataFrame = s.op match {
    case "normalize" =>
      d.withColumn(textCol, TextClean.normalizeUnicode(col(textCol),
        form = str(s, i, "form").getOrElse("NFC"),
        foldPunct = bool(s, i, "fold-punct").getOrElse(false)))
    case "fix-mojibake" =>
      d.withColumn(textCol, TextClean.fixMojibake(col(textCol)))
    case "strip-html" =>
      d.withColumn(textCol, TextClean.stripHtml(col(textCol)))
    case "redact-pii" =>
      pure(d.columns, TextClean.redactPii(d, textCol))
    case "pseudonymize" =>
      pure(d.columns, TextClean.pseudonymizeEmails(d, textCol))
    case "dedup-near" =>
      // n-gram jaccard pairs at :threshold (default 0.8), keep-first
      val thr = num(s, i, "threshold").getOrElse(0.8)
      if (!(thr > 0 && thr <= 1)) fail(i, ":threshold out of (0,1]")
      graft.ops.Dedup.dropNearDuplicates(d,
        graft.ops.Dedup.ngramJaccardPairs(d, textCol, idCol,
          n = num(s, i, "n").getOrElse(3.0).toInt, threshold = thr),
        idCol)
    case "c4-filter" =>
      // rewrite text to the kept lines AND drop pages the page-level
      // rules reject — c4Filter's keep flag applied, diagnostics dropped
      val out = TextClean.c4Filter(d, textCol,
        minSentences = num(s, i, "min-sentences").getOrElse(5.0).toInt,
        minLineWords = num(s, i, "min-line-words").getOrElse(3.0).toInt)
      pure(d.columns, out.filter(col("keep") === 1))
    case "filter-min-words" =>
      d.filter(TextStats.wsTokens(col(textCol)) >= reqNum(s, i, "n").toLong)
    case "gopher-filter" =>
      val g = TextStats.gopherQuality(d, textCol, idCol,
        minWords = num(s, i, "min-words").getOrElse(50.0).toLong,
        maxWords = num(s, i, "max-words").getOrElse(100000.0).toLong,
        minMeanWordLen = num(s, i, "min-mean-word-len").getOrElse(3.0),
        maxMeanWordLen = num(s, i, "max-mean-word-len").getOrElse(10.0),
        maxTopBigramFrac = num(s, i, "max-top-bigram-frac").getOrElse(0.18),
        maxDupWordFrac = num(s, i, "max-dup-word-frac").getOrElse(0.9))
      d.join(g.filter(col("keep") === 1).select(col(idCol)),
        Seq(idCol), "left_semi")
    case "dedup-exact" =>
      d.join(Dedup.exact(d, textCol, idCol)
        .select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")
    case "lang-id" =>
      d.withColumn(str(s, i, "out").getOrElse("lang_pred"),
        TextStats.langId(col(textCol)))
    case "filter-lang" =>
      val langs = strSeq(s, i, "langs")
      val c = str(s, i, "col").getOrElse("lang_pred")
      d.filter(col(c).isin(langs: _*))
    case "sample" =>
      Sampling.sample(d, idCol, reqNum(s, i, "rate"),
        str(s, i, "salt").getOrElse(""))
    case other => fail(i, s"unknown op :$other")
  }
}
