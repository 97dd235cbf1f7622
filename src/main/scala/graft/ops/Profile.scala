package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling and declarative data-quality gating — the
  * "look before you train" step: before a 100 TB corpus feeds a
  * pipeline, summarize every column (nullity, cardinality, extrema,
  * width) and assert the contracts downstream stages assume (ids
  * unique, text non-null, scores in range, metadata well-formed).
  *
  * Scale shape: [[profileColumns]] and [[checkSuite]] are each ONE
  * aggregation pass over the input — all per-column statistics fold in
  * a single `agg` (Catalyst plans the multi-`countDistinct` via one
  * expand + aggregate, still one scan), the result is a single row,
  * and the per-column/per-check rows explode from it driver-free.
  * Nothing but aggregation state shuffles; text never leaves the scan.
  * At corpus scale swap the exact `countDistinct` for
  * [[Hll.hllCountDistinct]] if the value space itself is the problem —
  * the exact variant is kept here because the oracle replays it.
  *
  * Determinism/oracle contract: every metric is a ratio of exact
  * integer counts rounded once (6 places), min/max aggregate on the
  * native type BEFORE the string cast (numeric extrema, not
  * lexicographic), and pass/fail thresholds compare in integer
  * micro-fraction arithmetic (`matching × 1e6 ≥ micro × n`) so no
  * floating-point comparison ever decides a gate. Everything replays
  * relationally in the q_profile / q_checks oracles.
  */
object Profile {

  /** One profile row per requested column:
    * (column, n_rows, n_null, null_frac, n_distinct, min_str, max_str,
    * avg_len) — `min_str`/`max_str` are the native-type extrema cast to
    * string after aggregation, `avg_len` is the mean string-cast length
    * of non-null values (null for an all-null column). Single scan,
    * single result row, exploded to |cols| rows.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: no columns")
    cols.foreach(c => require(df.columns.contains(c),
      s"profileColumns: no column $c"))
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
    }.toSet
    val aggs: Seq[Column] = cols.flatMap { c =>
      // string columns count distinct over md5(value): the multi-distinct
      // Expand then shuffles 16-byte hashes, not document text — same
      // count absent an md5 collision (the repo-wide documented caveat);
      // min/max/width still aggregate the value, but those reduce
      // map-side to one partial per partition
      val dKey = if (stringCols(c)) md5(col(c)) else col(c)
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(dKey).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"),
        sum(length(col(c).cast("string"))).as(s"__len_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val nn = col(s"__nn_$c")
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - nn).as("n_null"),
        round((col("__n") - nn).cast("double") /
          greatest(col("__n"), lit(1L)), 6).as("null_frac"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"),
        col(s"__mx_$c").as("max_str"),
        when(nn === 0, lit(null).cast("double"))
          .otherwise(round(col(s"__len_$c").cast("double") / nn, 6))
          .as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** A declarative data-quality assertion. `name` keys the report row. */
  sealed trait Check { def name: String }
  /** No nulls allowed. metric = null fraction; passes iff 0 nulls. */
  final case class NotNull(colName: String) extends Check {
    val name = s"not_null:$colName"
  }
  /** Non-null values all distinct. metric = distinct / non-null. */
  final case class Unique(colName: String) extends Check {
    val name = s"unique:$colName"
  }
  /** Non-null values within [lo, hi]. metric = in-range fraction;
    * passes iff every non-null value is in range. */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range:$colName"
  }
  /** At least `minFrac` of non-null values match `pattern` (Java
    * regex — keep patterns in the portable subset so the SQL oracle's
    * engine agrees). */
  final case class MatchesRegex(colName: String, pattern: String,
      minFrac: Double) extends Check {
    require(0 <= minFrac && minFrac <= 1, s"bad minFrac $minFrac")
    val name = s"regex:$colName"
  }
  /** At least `minFrac` of non-null values in the accepted set. */
  final case class AcceptedValues(colName: String, values: Seq[String],
      minFrac: Double) extends Check {
    require(values.nonEmpty, "AcceptedValues: empty set")
    require(0 <= minFrac && minFrac <= 1, s"bad minFrac $minFrac")
    val name = s"accepted:$colName"
  }

  private def micro(f: Double): Long = math.round(f * 1e6)

  /** Run a check suite in ONE aggregation pass. Output, one row per
    * check in input order: (check, metric, passed) — `metric` the
    * check's observed fraction rounded to 6 places, `passed` 1/0
    * decided on integer counts (never a float compare). An empty
    * relation (or all-null column) passes vacuously with metric null
    * for ratio checks.
    */
  def checkSuite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "checkSuite: no checks")
    checks.collect { case c: NotNull => c.colName
                     case c: Unique => c.colName
                     case c: InRange => c.colName
                     case c: MatchesRegex => c.colName
                     case c: AcceptedValues => c.colName }
      .foreach(c => require(df.columns.contains(c),
        s"checkSuite: no column $c"))
    val aggs: Seq[Column] = checks.zipWithIndex.flatMap { case (ck, i) =>
      ck match {
        case NotNull(c) => Seq(
          count(lit(1)).as(s"__n_$i"),
          count(col(c)).as(s"__nn_$i"))
        case Unique(c) => Seq(
          count(col(c)).as(s"__nn_$i"),
          countDistinct(col(c)).as(s"__nd_$i"))
        case InRange(c, lo, hi) => Seq(
          count(col(c)).as(s"__nn_$i"),
          count(when(col(c) >= lo && col(c) <= hi, lit(1))).as(s"__ok_$i"))
        case MatchesRegex(c, p, _) => Seq(
          count(col(c)).as(s"__nn_$i"),
          count(when(col(c).rlike(p), lit(1))).as(s"__ok_$i"))
        case AcceptedValues(c, vs, _) => Seq(
          count(col(c)).as(s"__nn_$i"),
          count(when(col(c).cast("string").isin(vs: _*), lit(1)))
            .as(s"__ok_$i"))
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    def frac(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round(num.cast("double") / den, 6))
    val rows = checks.zipWithIndex.map { case (ck, i) =>
      val (metric, passed) = ck match {
        case NotNull(_) =>
          (frac(col(s"__n_$i") - col(s"__nn_$i"), col(s"__n_$i")),
            col(s"__n_$i") === col(s"__nn_$i"))
        case Unique(_) =>
          (frac(col(s"__nd_$i"), col(s"__nn_$i")),
            col(s"__nd_$i") === col(s"__nn_$i"))
        case InRange(_, _, _) =>
          (frac(col(s"__ok_$i"), col(s"__nn_$i")),
            col(s"__ok_$i") === col(s"__nn_$i"))
        case MatchesRegex(_, _, mf) =>
          (frac(col(s"__ok_$i"), col(s"__nn_$i")),
            col(s"__ok_$i") * lit(1000000L) >=
              lit(micro(mf)) * col(s"__nn_$i"))
        case AcceptedValues(_, _, mf) =>
          (frac(col(s"__ok_$i"), col(s"__nn_$i")),
            col(s"__ok_$i") * lit(1000000L) >=
              lit(micro(mf)) * col(s"__nn_$i"))
      }
      struct(lit(ck.name).as("check"), metric.as("metric"),
        passed.cast("long").as("passed"))
    }
    one.select(explode(array(rows: _*)).as("c")).select(col("c.*"))
  }

  /** Exact per-group Pearson correlation between two numeric columns —
    * the cross-column profiling signal [[profileColumns]]'s per-column
    * stats can't see. Rather than Spark's `corr` (a float-accumulating
    * aggregate whose result depends on partition order), both columns
    * quantize to caller-supplied integer grains (`xGrain`, `yGrain` —
    * e.g. 1 for integer-valued doubles, 100 for cents) and the five
    * sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT
    * BIGINTs in one aggregation; the closed-form correlation is then a
    * handful of IEEE double ops on exact integers — bit-replayable in
    * ANSI SQL and invariant under repartitioning. Null rows (either
    * side) are excluded, groups with zero variance emit null.
    *
    * Scale: one map-side-combined aggregation; the wire carries five
    * longs + a count per group. Caveat the caller owns: Σx² at grain g
    * is bounded by n·(g·max|x|)², which must stay under 2^63 — pick the
    * grain for the column's actual range.
    */
  def groupedCorr(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, xGrain: Long = 1L, yGrain: Long = 1L): DataFrame = {
    val x = floor(col(xCol).cast("double") * xGrain).cast("long")
    val y = floor(col(yCol).cast("double") * yGrain).cast("long")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), x.as("__x"), y.as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
      .select(col(groupCol), col("n"), {
        val num = col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        val den = sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
          sqrt(col("n").cast("double") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double"))
        // zero variance on either side: correlation undefined -> null
        // (the when-guard also keeps ANSI mode from raising on /0)
        round(when(den > 0, num / den), 6).as("corr")
      })
  }

  /** Group-wise z-score standardization — the ML feature-prep step,
    * with the group statistics from EXACT integer-grain sums (grain as
    * in [[groupedCorr]]): mean = Σx/(g·n) and the population std from
    * (n·Σx² − (Σx)²)/n² are deterministic under any partitioning, and
    * every row's z replays in SQL. Output: input rows + `z` (round-6;
    * null for zero-variance groups). Two passes: one tiny stats
    * aggregation broadcast back onto the scan.
    */
  def groupedStandardize(df: DataFrame, groupCol: String, xCol: String,
      grain: Long = 1L): DataFrame = {
    val x = floor(col(xCol).cast("double") * grain).cast("long")
    val stats = df.filter(col(xCol).isNotNull)
      .select(col(groupCol), x.as("__x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val joined = df.join(broadcast(stats), Seq(groupCol), "left")
    val n = col("__n").cast("double")
    val mean = col("__sx").cast("double") / n / grain
    val varg = (n * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")) /
      (n * n) / (grain.toDouble * grain)
    joined
      .withColumn("z", round(
        when(varg > 0,
          (col(xCol).cast("double") - mean) / sqrt(varg)), 6))
      .drop("__n", "__sx", "__sxx")
  }

  /** Per-group winsorization — clip `xCol` into its own group's
    * [pLo, pHi] interpolated percentile band (the outlier-taming pass
    * quality scores get before a quantile cut or a model fit; clipping
    * beats dropping when the row itself must survive). Output: the
    * input plus `x_wins` round-6 (null x stays null). Percentiles are
    * Spark's exact interpolating `percentile` — the same arithmetic as
    * DuckDB's `quantile_cont`, the `q_quantiles` contract — computed
    * once per group and broadcast back; the clip itself is
    * least/greatest, no arithmetic on the surviving values.
    * Scale note: exact `percentile` buffers O(distinct values) per
    * group — the documented convention; per-domain billion-row groups
    * should use [[winsorizeSketch]] (bounded state, grain-bounded
    * error), keeping this form as the oracle contract.
    */
  def winsorize(df: DataFrame, groupCol: String, xCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1,
      s"winsorize: bad percentile band [$pLo, $pHi]")
    val x = col(xCol).cast("double")
    val bounds = df.filter(col(xCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile(x, lit(pLo)).as("__wlo"),
        percentile(x, lit(pHi)).as("__whi"))
    // Spark's greatest/least IGNORE nulls (they return the extreme of
    // the non-null operands), so an unguarded clip would snap a null x
    // to the lower bound instead of passing it through
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn("x_wins", when(col(xCol).isNotNull,
        round(least(greatest(x, col("__wlo")), col("__whi")), 6)))
      .drop("__wlo", "__whi")
  }

  /** Robust (median/MAD) standardization — [[groupedStandardize]]'s
    * outlier-immune twin: rz = (x − median) / (1.4826·MAD), where MAD
    * is the median absolute deviation from the group median and 1.4826
    * the consistency constant that makes MAD estimate σ under
    * normality. A single wild value moves a mean/std z-score for the
    * whole group; it barely moves this one — the robust scoring pass
    * quality filtering wants when the corpus has heavy tails. Groups
    * with zero MAD (over half the values identical) report null rz,
    * like the zero-variance guard in the classic version. Two
    * percentile aggregations, both broadcast back; no order-sensitive
    * float sums anywhere (percentiles are sort-selections plus one
    * interpolation). Scale note: as for [[winsorize]], the exact
    * percentiles buffer O(values) per group — at per-domain 100 TB
    * grain use [[robustStandardizeSketch]].
    */
  def robustStandardize(df: DataFrame, groupCol: String,
      xCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val med = df.filter(col(xCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile(x, lit(0.5)).as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol), "left")
    val mad = withMed.filter(col(xCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(percentile(abs(x - col("__med")), lit(0.5)).as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol), "left")
      .withColumn("rz", round(
        when(col("__mad") > 0,
          (x - col("__med")) / (lit(1.4826) * col("__mad"))), 6))
      .drop("__med", "__mad")
  }

  /** Per-group bucket-quantile SKETCH — the fixed-grain,
    * bounded-state quantile path the exact-`percentile` ops
    * ([[winsorize]], [[robustStandardize]]) name as their 100 TB
    * escape hatch: exact `percentile` buffers O(distinct values) per
    * group (on continuous scores, O(group rows)), while this reduces
    * each group to ≤ buckets+2 count rows (the [[Sketch.histTable]]
    * grain) before anything but a count shuffles.
    *
    * Output: one `(groupCol, p, n, q_lo, q_hi)` row per (group,
    * requested probability). Contract: the group's DISCRETE
    * p-quantile — the value at 1-indexed rank max(1, ceil(p·n)) of
    * its sorted non-null values — lies in `[q_lo, q_hi]`, and
    * `q_hi − q_lo` is exactly one bucket width `(hi−lo)/buckets` (the
    * sketch's grain) for quantiles inside `[lo, hi)`. A quantile
    * landing in the underflow/overflow bucket saturates: `q_lo` is
    * null for underflow (unbounded below), `q_hi` null for overflow —
    * callers treat a null edge as "outside the sketched range".
    * Rank arithmetic is IEEE `ceil(p·n)` — bit-identical in any
    * engine, so the sketch is SQL-replayable.
    *
    * Scale shape: one aggregation to (group, bucket) counts with
    * map-side combine — values never shuffle — then O(groups ×
    * buckets × |probs|) arithmetic; per-group aggregation state is
    * one long per occupied bucket, never a value buffer.
    */
  def groupQuantileSketch(df: DataFrame, groupCol: String, xCol: String,
      probs: Seq[Double], lo: Double, hi: Double,
      buckets: Int, weightCol: Option[String] = None): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"groupQuantileSketch: probabilities out of [0,1]: $probs")
    require(probs.distinct.size == probs.size,
      s"groupQuantileSketch: duplicate probabilities $probs")
    require(buckets >= 1 && hi > lo,
      s"groupQuantileSketch: bad range/buckets $lo/$hi/$buckets")
    val width = (hi - lo) / buckets
    val v = col(xCol).cast("double")
    // weighted mode ([[Sketch.countOrWeight]]'s 1e6-grain contract):
    // counters become mass, `n` total mass, and the rank-ceil(p·n)
    // quantile becomes the smallest value whose cumulative WEIGHT
    // reaches ceil(p·W) — the standard weighted discrete quantile.
    // Integer weights ≡ row replication exactly: the 1e6 scale
    // cancels through the nested-ceiling identity
    // ⌈⌈10⁶·p·n⌉/10⁶⌉ = ⌈p·n⌉, so the selected bucket cannot move.
    val counts = Sketch.weightDropNull(df.filter(col(xCol).isNotNull),
        weightCol)
      .select(Seq(col(groupCol).as("g"),
        when(v < lo, lit(-1)).when(v >= hi, lit(buckets))
          .otherwise(floor((v - lit(lo)) / lit(width)).cast("int"))
          .as("bucket")) ++ weightCol.map(col): _*)
      .groupBy(col("g"), col("bucket"))
      .agg(Sketch.countOrWeight(weightCol).as("c"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    val wtot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).rowsBetween(Long.MinValue, Long.MaxValue)
    counts
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(wtot))
      .select(col("g"), col("bucket"), col("cum"), col("n"),
        explode(typedLit(probs)).as("p"))
      .withColumn("rank", greatest(lit(1L), ceil(col("p") * col("n"))))
      .groupBy(col("g"), col("p"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= col("rank"), col("bucket"))).as("__b"))
      .select(col("g").as(groupCol), col("p"), col("n"),
        when(col("__b") >= 0, lit(lo) + col("__b") * lit(width))
          .as("q_lo"),
        when(col("__b") < buckets, lit(lo) + (col("__b") + 1) * lit(width))
          .as("q_hi"))
  }

  /** [[winsorize]]'s sketch-grain variant for per-domain 100 TB
    * groups: clip bounds from [[groupQuantileSketch]] instead of
    * exact per-group `percentile`. The lower bound is the pLo
    * bucket's LOWER edge, the upper the pHi bucket's UPPER edge —
    * both within one bucket width of the discrete quantiles, and
    * outward-conservative (the sketch never clips a value the exact
    * discrete bounds would keep). A bound whose quantile lands in the
    * under/overflow bucket disables that side's clip (greatest/least
    * ignore nulls) — size `[lo, hi)` to cover the band of interest.
    * Output: the input plus `x_wins` round-6 (null x stays null), the
    * [[winsorize]] shape. The exact path remains the oracle contract;
    * this is the documented `approx`-grain swap
    * ([[graft.ops.Sampling]] / [[graft.ops.TextStats]] convention).
    */
  def winsorizeSketch(df: DataFrame, groupCol: String, xCol: String,
      lo: Double, hi: Double, buckets: Int,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1,
      s"winsorizeSketch: bad percentile band [$pLo, $pHi]")
    val qs = groupQuantileSketch(df, groupCol, xCol, Seq(pLo, pHi),
      lo, hi, buckets)
    val bounds = qs.groupBy(col(groupCol))
      .agg(min(when(col("p") === pLo, col("q_lo"))).as("__wlo"),
        max(when(col("p") === pHi, col("q_hi"))).as("__whi"))
    val x = col(xCol).cast("double")
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn("x_wins", when(col(xCol).isNotNull,
        round(least(greatest(x, col("__wlo")), col("__whi")), 6)))
      .drop("__wlo", "__whi")
  }

  /** Per-group robust statistics at sketch grain: `(groupCol, n,
    * med_sketch, mad_sketch)` where `med_sketch` is the MIDPOINT of
    * the bucket holding the discrete median (within width/2 of it)
    * and `mad_sketch` the midpoint of the bucket holding the median
    * absolute deviation FROM `med_sketch` (deviations bucketed over
    * `[0, hi−lo)` at the same width — within one width of the true
    * discrete MAD: width/2 midpoint error + width/2 from measuring
    * deviations against the sketched median). Null med/mad when the
    * quantile saturates outside `[lo, hi)`.
    */
  def robustStatsSketch(df: DataFrame, groupCol: String, xCol: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    val mid = (c: String) => when(col("q_lo").isNotNull &&
      col("q_hi").isNotNull, (col("q_lo") + col("q_hi")) / 2).as(c)
    val med = groupQuantileSketch(df, groupCol, xCol, Seq(0.5),
        lo, hi, buckets)
      .select(col(groupCol), col("n"), mid("med_sketch"))
    val devs = df.filter(col(xCol).isNotNull)
      .join(broadcast(med.select(col(groupCol), col("med_sketch"))),
        Seq(groupCol), "left")
      .select(col(groupCol),
        abs(col(xCol).cast("double") - col("med_sketch")).as("__dev"))
    val mad = groupQuantileSketch(devs, groupCol, "__dev", Seq(0.5),
        0.0, hi - lo, buckets)
      .select(col(groupCol), mid("mad_sketch"))
    med.join(mad, Seq(groupCol), "left")
      .select(col(groupCol), col("n"), col("med_sketch"),
        col("mad_sketch"))
  }

  /** [[robustStandardize]]'s sketch-grain variant:
    * rz = (x − med_sketch) / (1.4826·mad_sketch) with both statistics
    * from [[robustStatsSketch]] — two bounded-state bucket passes,
    * no per-group value buffer anywhere. Honesty note: zero-MAD
    * detection sits BELOW the sketch's resolution — a group whose
    * true MAD is 0 (over half the values identical) reports a
    * grain-floored `mad_sketch` in (0, width], not the exact path's
    * null rz; callers needing that null must use
    * [[robustStandardize]]. rz is null when the sketch saturates
    * (med/mad outside the sketched range) or mad_sketch is 0.
    */
  def robustStandardizeSketch(df: DataFrame, groupCol: String,
      xCol: String, lo: Double, hi: Double, buckets: Int): DataFrame = {
    val stats = robustStatsSketch(df, groupCol, xCol, lo, hi, buckets)
      .select(col(groupCol), col("med_sketch").as("__med"),
        col("mad_sketch").as("__mad"))
    df.join(broadcast(stats), Seq(groupCol), "left")
      .withColumn("rz", round(
        when(col("__mad") > 0,
          (col(xCol).cast("double") - col("__med")) /
            (lit(1.4826) * col("__mad"))), 6))
      .drop("__med", "__mad")
  }

  /** Cramér's V — association strength between two categorical columns
    * (0 = independent, 1 = one determines the other): the profiling
    * read for "is `lang` just a proxy for `source`?" before stratifying
    * or deduplicating on either. χ² over the FULL r×c contingency grid
    * (absent combinations contribute their expected count — dropping
    * them biases χ² low), V = √(χ² / (n·(min(r,c)−1))); a single
    * category on either axis reports null (no association to measure).
    * Null categories are their own `__null__` level, the
    * [[graft.ops]] sentinel convention.
    *
    * Determinism: cell counts are exact longs; each cell's (o−e)²/e
    * term is floored to a 1e-9 grain and summed as exact BIGINTs —
    * partition-order-proof and SQL-replayable. Output one row:
    * `(n, r, c, chi2, v)` round-6.
    *
    * Scale shape: the corpus reduces to the (a, b) cell table
    * immediately (the only all-rows aggregation); the full grid is
    * distinct(a) × distinct(b) — r·c rows, broadcast-joined. Nothing
    * downstream sees corpus size.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = coalesce(col(aCol).cast("string"), lit("__null__"))
    val b = coalesce(col(bCol).cast("string"), lit("__null__"))
    val cells = df.select(a.as("a"), b.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val colT = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val grid = rowT.crossJoin(broadcast(colT))
      .join(cells, Seq("a", "b"), "left")
      .select(col("a"), col("b"), col("ra"), col("cb"),
        coalesce(col("o"), lit(0L)).as("o"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val e = col("ra").cast("double") * col("cb").cast("double") /
      col("n").cast("double")
    grid
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("r", size(collect_set(col("a")).over(wAll)).cast("long"))
      .withColumn("c", size(collect_set(col("b")).over(wAll)).cast("long"))
      .withColumn("t9", floor((col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e * 1e9).cast("long"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg((sum(col("t9")).cast("double") / 1e9).as("__chi2"))
      .select(col("n"), col("r"), col("c"),
        round(col("__chi2"), 6).as("chi2"),
        round(when(least(col("r"), col("c")) > 1,
          sqrt(col("__chi2") /
            (col("n").cast("double") *
              (least(col("r"), col("c")) - 1).cast("double")))), 6).as("v"))
  }

  /** Exact per-group simple linear regression (OLS y = a·x + b) from
    * the same integer-grain sufficient statistics as [[groupedCorr]] —
    * the per-domain trend fit (tokens vs quality, price vs quantity)
    * without `corr`/`avg` float-order nondeterminism. Output per
    * group: (n, slope, intercept), null when x has zero variance.
    * Grains as in [[groupedCorr]] (caller owns the range bound); the
    * fit is of the QUANTIZED values — at grain g the coefficients
    * differ from the unquantized fit by O(1/g).
    */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, xGrain: Long = 1L, yGrain: Long = 1L): DataFrame = {
    val x = floor(col(xCol).cast("double") * xGrain).cast("long")
    val y = floor(col(yCol).cast("double") * yGrain).cast("long")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(groupCol), x.as("__x"), y.as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
      .select(col(groupCol), col("n"), {
        val n = col("n").cast("double")
        val sx = col("sx").cast("double")
        val sy = col("sy").cast("double")
        val den = n * col("sxx").cast("double") - sx * sx
        val slope = (n * col("sxy").cast("double") - sx * sy) / den
        // de-quantize: x was scaled by xGrain, y by yGrain
        round(when(den > 0, slope * (xGrain.toDouble / yGrain)), 6)
          .as("slope")
      }, {
        val n = col("n").cast("double")
        val sx = col("sx").cast("double")
        val sy = col("sy").cast("double")
        val den = n * col("sxx").cast("double") - sx * sx
        val slope = (n * col("sxy").cast("double") - sx * sy) / den
        round(when(den > 0,
          (sy / yGrain - slope * (xGrain.toDouble / yGrain) * (sx / xGrain)) / n), 6)
          .as("intercept")
      })
  }
}
