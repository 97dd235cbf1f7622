package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal and skew-aware join operators.
  *
  * Spark has no built-in as-of join; the naive formulations (per-row
  * subquery, or range-join + groupBy-max) either don't distribute or
  * explode quadratically inside a time band. [[Joins.asofJoin]] instead
  * uses the merge shape: union both sides, one shuffle on the key, one
  * ordered window pass carrying the last-seen right row forward — cost
  * O(n log n) per key partition regardless of time skew, the same plan a
  * 1000-executor cluster wants (sort-merge on the key, no replication).
  */
object Joins {

  /** Monotonic suffix for `observe()` metric names — Spark rejects a
    * reused observation name within one query, so composed invocations
    * (e.g. two range joins unioned into one action) each get a
    * distinct name; consumers match on the documented prefix.
    */
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** One-time (per JVM) heads-up that the default `observeSkew = true`
    * inserts a CollectMetrics node: Catalyst deliberately does NOT push
    * caller-side filters through it (that would change the observed
    * values), so filtering the interval relation BEFORE the join is
    * load-bearing for interval-scan pruning — a caller that filters
    * AFTER the join reads the full scan. Logged once, not per call:
    * the behavior is documented at both operators and a per-plan-build
    * warning would drown real logs at 100-query scale.
    */
  private lazy val warnedObserveSkew: Unit =
    org.slf4j.LoggerFactory.getLogger("graft.ops.Joins").warn(
      "rangeJoin/intervalOverlapJoin carry observe() bin-skew metrics " +
        "(observeSkew=true, default): Catalyst does not push filters " +
        "through the CollectMetrics node, so filter inputs BEFORE the " +
        "join for scan pruning; pass observeSkew=false to opt a " +
        "proven-stable hot path out. [logged once per JVM]")

  /** Output-name collision guard shared by the prefixing joins: when
    * the LEFT side already carries a column named like a prefixed
    * right column (left has `r_v`, right has `v`), the output would
    * silently hold two identically-named columns — legal to construct,
    * broken on first reference ("ambiguous column") or, worse, quietly
    * resolved to the wrong one by positional consumers. Fail at plan
    * build with the rename named. (Prefixing is injective over the
    * right side itself, so intra-right collisions cannot happen.)
    */
  private def requireNoPrefixCollision(fn: String, leftCols: Seq[String],
      rightCols: Seq[String], rightPrefix: String): Unit = {
    val clash = leftCols.toSet.intersect(rightCols.map(rightPrefix + _).toSet)
    require(clash.isEmpty,
      s"$fn: left column(s) ${clash.mkString(", ")} collide with the " +
        s"prefixed right columns — pass a different rightPrefix or " +
        "rename the left column(s) first")
  }

  /** Internal temp-column reservation guard: the binned/salted joins
    * stage their routing state in `withColumn`s (`__bin`, `__nbins`,
    * `__salt`) that are dropped before returning — a user column with
    * one of those literal names is silently OVERWRITTEN and then
    * dropped from the output (silent column loss), or, for
    * `rangeJoin`'s interval side, mis-renamed into a broken plan. The
    * as-of joins stage through a fresh `select` (`__k`/`__ts`/`__src`/
    * `__l`/`__r`/`__rm`/`__rb`/`__rf`), which today resolves
    * unambiguously — reserved there too so a future refactor can't
    * silently change which column wins. Fail at plan build with the
    * rename named.
    */
  private def requireNoReservedNames(fn: String, side: String,
      df: DataFrame, cols: Seq[String], reserved: Set[String]): Unit =
    Ids.requireNoReservedNames(fn, side, cols, reserved,
      Some(df.sparkSession))

  /** Reserved staging names of the as-of family (see
    * [[requireNoReservedNames]]). */
  private val asofReserved =
    Set("__k", "__ts", "__src", "__l", "__r", "__rm", "__rb", "__rf")

  /** ADVICE r11 parity with [[requireOneNumericFamily]] for the as-of
    * joins: when BOTH ts columns are numeric, the tolerance/nearest
    * axis comes from the union-WIDENED type — a long left vs double
    * right widens to double and silently reintroduces the >2^53 ulp
    * inexactness the range-join guard rejects. Non-numeric (temporal)
    * axes are validated by [[timeAxis]]/[[requireSameTsFamily]]
    * instead.
    */
  private def requireTsOneFamilyIfNumeric(fn: String,
      lt: org.apache.spark.sql.types.DataType,
      rt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types.NumericType
    if (lt.isInstanceOf[NumericType] && rt.isInstanceOf[NumericType])
      requireOneNumericFamily(fn, "ts (left side)" -> lt, "ts (right side)" -> rt)
  }

  /** Guard for the native-comparison exactness contract of
    * [[rangeJoin]]/[[intervalOverlapJoin]]: Spark's numeric coercion is
    * exact within the integral/decimal family (int vs long → long,
    * long vs decimal → decimal) and within the fractional family
    * (float vs double → double), but a MIXED comparison (e.g. long
    * point vs double bounds) coerces BOTH sides to double — silently
    * reintroducing the >2^53 ulp admission the native filter exists to
    * avoid. Fail at plan-build time with the cast named rather than
    * admit phantom matches at nanos-since-epoch magnitudes.
    */
  private def requireOneNumericFamily(fn: String,
      cols: (String, org.apache.spark.sql.types.DataType)*): Unit = {
    import org.apache.spark.sql.types._
    def isFractional(dt: DataType) = dt == DoubleType || dt == FloatType
    def isExact(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
    cols.foreach { case (n, dt) =>
      require(isFractional(dt) || isExact(dt),
        s"$fn: column '$n' must be numeric, got ${dt.simpleString} — " +
          "convert timestamps to epoch numerics first")
    }
    val (frac, exact) = (cols.filter(c => isFractional(c._2)),
      cols.filter(c => isExact(c._2)))
    require(frac.isEmpty || exact.isEmpty,
      s"$fn: mixed exact/fractional comparison columns (" +
        cols.map { case (n, dt) => s"$n: ${dt.simpleString}" }.mkString(", ") +
        ") — Spark coerces the comparison to double, which is inexact " +
        "past 2^53 (e.g. nanos-since-epoch). Cast all sides to one " +
        "family (long/decimal, or double) explicitly first.")
  }

  /** The one shared time axis of every as-of tolerance/nearest
    * comparison: (axis expression, ticks per second), chosen from the
    * WIDENED type of the two sides' union (the left type alone would
    * long-truncate a fractional right side). Per type:
    *  - TIMESTAMP → `unix_micros` (a plain cast-to-long truncates to
    *    SECONDS and mis-ties sub-second races);
    *  - TIMESTAMP_NTZ → naive-axis micros computed from FIELDS
    *    (days·86400e6 + time-of-day) — casting NTZ through the session
    *    zone distorts deltas by the DST shift around gap/overlap hours;
    *  - DATE (both sides — a mixed date/timestamp union widens first)
    *    → naive day counts on the micros scale, DST-free;
    *  - integral numerics incl. decimal(≤18,0) → exact `long` (a double
    *    axis has 256-unit ulps at nanos-since-epoch magnitudes ~2^60);
    *  - wider/fractional decimals → exact decimal(38, scale);
    *  - float/double → `double` (their native precision);
    *  - anything else (string, boolean, …) → NAMED plan-build error: a
    *    `cast("double")` fallback is NULL for those, and a null axis
    *    silently nulls every tolerance match.
    */
  private def timeAxis(dt: org.apache.spark.sql.types.DataType)
      : (Column => Column, Long) = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType =>
        ((c: Column) => unix_micros(c.cast("timestamp")), 1000000L)
      case TimestampNTZType =>
        ((c: Column) =>
          datediff(c.cast("date"), lit("1970-01-01").cast("date"))
            .cast("long") * lit(86400000000L) +
            (hour(c).cast("long") * lit(3600L) +
              minute(c).cast("long") * lit(60L) +
              second(c).cast("long")) * lit(1000000L) +
            date_format(c, "SSSSSS").cast("long"), 1000000L)
      case DateType =>
        // both sides DATE (a mixed date/timestamp union widens before
        // this sees it): naive day counts on a micros scale — DST-free,
        // and a plain cast("double") on DATE would be NULL
        ((c: Column) => datediff(c, lit("1970-01-01").cast("date"))
          .cast("long") * lit(86400000000L), 1000000L)
      case t if Ids.isIntegral(t) =>
        ((c: Column) => c.cast("long"), 1L)
      case d: DecimalType =>
        // exact decimal arithmetic at max precision — the union of a
        // long side with a decimal(18,0) side widens to decimal(20,0),
        // which is integral-valued but past the long range; a double
        // axis would reintroduce the 2^53 ulp bug for it
        ((c: Column) => c.cast(DecimalType(38, d.scale)), 1L)
      case FloatType | DoubleType =>
        ((c: Column) => c.cast("double"), 1L)
      case other =>
        // fail fast: cast("double") on e.g. a STRING ts is NULL, and a
        // null axis silently nulls EVERY tolerance match (and breaks
        // every `nearest` delta comparison) instead of erroring
        throw new IllegalArgumentException(
          "as-of time axis: unsupported ts type " + other.simpleString +
            " — ts must be timestamp/timestamp_ntz/date or numeric; " +
            "cast string timestamps explicitly first")
    }
  }

  /** Guard for the as-of time axis: when one side's ts column is an
    * INSTANT (TIMESTAMP) and the other NAIVE (TIMESTAMP_NTZ or DATE),
    * the union widens to TIMESTAMP and the naive side is cast THROUGH
    * THE SESSION ZONE — silently reintroducing the DST delta
    * distortion the NTZ axis branch exists to avoid (a tolerance
    * window spanning a DST gap gains/loses an hour; a DATE side's
    * midnight shifts the same way). Both sides must share a family
    * (naive DATE + NTZ widens to NTZ, staying naive — allowed); cast
    * one side explicitly (choosing instant or naive semantics) to mix.
    */
  private def requireSameTsFamily(fn: String, lt: org.apache.spark.sql.types.DataType,
      rt: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}
    def naive(dt: DataType) = dt == TimestampNTZType || dt == DateType
    val mixed = (lt == TimestampType && naive(rt)) ||
      (naive(lt) && rt == TimestampType)
    require(!mixed,
      s"$fn: left ts is ${lt.simpleString} but right ts is " +
        s"${rt.simpleString} — the union would cast the naive side " +
        "through the session zone and distort deltas across DST. Cast " +
        "both ts columns to one family first (cast to timestamp for " +
        "instant semantics, to timestamp_ntz/date for naive wall-clock).")
  }

  /** Backward as-of join: for every left row, attach the single right row
    * with the greatest `right.tsCol <= left.tsCol` for the same `keyCol`
    * (inclusive at equality), or nulls when no such row exists — i.e.
    * ANSI/DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`.
    *
    * Null keys and null timestamps follow the same SQL semantics (a
    * null never satisfies the equality or the inequality): right rows
    * with a null key/ts are never matches, left rows with a null key/ts
    * pass through unmatched with null right columns — NOT matched to
    * each other, which is what the underlying window shape would do if
    * left alone (partitionBy groups null keys like a value).
    *
    * Right columns are emitted as `rightPrefix + name`. When several right
    * rows share the match timestamp the lexicographically greatest right
    * struct wins (deterministic; order right's columns accordingly).
    *
    * `toleranceSec`: when set, matches older than the tolerance are nulled
    * out (pandas `merge_asof` tolerance semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightPrefix: String = "r_", toleranceSec: Option[Long] = None): DataFrame = {
    requireSameTsFamily("asofJoin",
      Ids.fieldOf(left, tsCol, "asofJoin").dataType,
      Ids.fieldOf(right, tsCol, "asofJoin").dataType)
    requireNoPrefixCollision("asofJoin", left.columns.toSeq,
      right.columns.toSeq, rightPrefix)
    requireNoReservedNames("asofJoin", "left", left, left.columns.toSeq,
      asofReserved)
    requireNoReservedNames("asofJoin", "right", right, right.columns.toSeq,
      asofReserved)
    requireTsOneFamilyIfNumeric("asofJoin",
      Ids.fieldOf(left, tsCol, "asofJoin").dataType,
      Ids.fieldOf(right, tsCol, "asofJoin").dataType)
    // validate BOTH ts types up front (discarding the axes): without
    // this, a string ts "works" lexicographically untolerated but
    // silently nulls every match the moment a tolerance is added
    timeAxis(Ids.fieldOf(left, tsCol, "asofJoin").dataType)
    timeAxis(Ids.fieldOf(right, tsCol, "asofJoin").dataType)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lNorm = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__src"), struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rNorm = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(0).as("__src"), lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    // right rows sort before left rows at equal ts, so equality matches;
    // trailing __r tiebreak makes duplicate-timestamp matches deterministic
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__src").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL equality/inequality semantics on key and ts (the docstring's
    // DuckDB ASOF LEFT JOIN contract: `l.key = r.key AND l.ts >= r.ts`
    // is never true through a null) — but the merge-window shape treats
    // nulls like values: partitionBy collects null keys into ONE
    // partition and a null ts sorts FIRST and is carried forward as a
    // "match", silently diverging on exactly the rows production data
    // has. Null-key/null-ts RIGHT rows can never be matches — drop
    // them before the union; null-key/null-ts LEFT rows pass through
    // unmatched — null their carried match after.
    val matched = lNorm.union(
        rNorm.filter(col("__k").isNotNull && col("__ts").isNotNull))
      .withColumn("__rm", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .withColumn("__rm",
        when(col("__k").isNotNull && col("__ts").isNotNull, col("__rm")))
    val withTol = toleranceSec.fold(matched) { tol =>
      // axis from the UNION's widened __ts type — mixed int/double
      // sides compare on double, mixed-width integrals on long
      val (axis, scale) = timeAxis(
        Ids.fieldOf(matched, "__ts", "asofJoin").dataType)
      matched.withColumn("__rm",
        when(axis(col("__ts")) - axis(col(s"__rm.$tsCol")) <= tol * scale,
          col("__rm")))
    }
    withTol.select(
      left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        right.columns.map(c => col(s"__rm.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Directional as-of join — [[asofJoin]] (backward) generalized:
    * `"backward"` matches the latest right row at-or-before,
    * `"forward"` the earliest at-or-after, `"nearest"` whichever of
    * the two is closer in time (tie → the backward match, the pandas
    * `merge_asof` convention). Same one-shuffle union + window shape
    * as [[asofJoin]] — `nearest` reuses the single sorted window for
    * BOTH directions (one exchange, two window functions over it), so
    * direction costs nothing extra at scale. `toleranceSec` bounds
    * |Δts| in every direction. Null keys/timestamps follow SQL
    * semantics in every direction (see [[asofJoin]]): never matched,
    * left rows kept unmatched. Duplicate-timestamp determinism:
    * backward picks the lexicographically greatest right struct,
    * forward the smallest (the `last`/`first` duals of one ordering).
    */
  def asofJoinDirected(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, direction: String = "backward",
      rightPrefix: String = "r_",
      toleranceSec: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoinDirected: bad direction $direction")
    requireSameTsFamily("asofJoinDirected",
      Ids.fieldOf(left, tsCol, "asofJoinDirected").dataType,
      Ids.fieldOf(right, tsCol, "asofJoinDirected").dataType)
    requireNoPrefixCollision("asofJoinDirected", left.columns.toSeq,
      right.columns.toSeq, rightPrefix)
    requireNoReservedNames("asofJoinDirected", "left", left,
      left.columns.toSeq, asofReserved)
    requireNoReservedNames("asofJoinDirected", "right", right,
      right.columns.toSeq, asofReserved)
    requireTsOneFamilyIfNumeric("asofJoinDirected",
      Ids.fieldOf(left, tsCol, "asofJoinDirected").dataType,
      Ids.fieldOf(right, tsCol, "asofJoinDirected").dataType)
    timeAxis(Ids.fieldOf(left, tsCol, "asofJoinDirected").dataType)
    timeAxis(Ids.fieldOf(right, tsCol, "asofJoinDirected").dataType)
    if (direction == "backward")
      return asofJoin(left, right, keyCol, tsCol, rightPrefix, toleranceSec)
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lNorm = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__src"), struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rNorm = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(0).as("__src"), lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    // two orderings over ONE partitioning (a single exchange, two
    // in-partition sorts): backward wants equal-ts rights BEFORE the
    // left row (src asc) so (…, current] sees them; forward wants them
    // AFTER (src desc) so [current, …) sees them — inclusive-at-
    // equality on both sides
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__src").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__src").desc, col("__r").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // same null semantics as [[asofJoin]]: null-key/null-ts right rows
    // are never matches (dropped pre-union), null-key/null-ts left rows
    // pass through unmatched (both direction candidates nulled) — the
    // forward window otherwise hands a null-ts left row (sorts FIRST)
    // the earliest right row of its partition as a spurious match
    val both = lNorm.union(
        rNorm.filter(col("__k").isNotNull && col("__ts").isNotNull))
      .withColumn("__rb", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__rf", first(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__src") === 1)
      .withColumn("__rb",
        when(col("__k").isNotNull && col("__ts").isNotNull, col("__rb")))
      .withColumn("__rf",
        when(col("__k").isNotNull && col("__ts").isNotNull, col("__rf")))
    val (axis, scale) = timeAxis(
      Ids.fieldOf(both, "__ts", "asofJoinDirected").dataType)
    val matched = direction match {
      case "forward" => both.withColumn("__rm", col("__rf"))
      case _ /* nearest */ =>
        val dB = axis(col("__ts")) - axis(col(s"__rb.$tsCol"))
        val dF = axis(col(s"__rf.$tsCol")) - axis(col("__ts"))
        both.withColumn("__rm",
          when(col("__rb").isNull, col("__rf"))
            .when(col("__rf").isNull, col("__rb"))
            .when(dF < dB, col("__rf"))
            .otherwise(col("__rb")))
    }
    val withTol = toleranceSec.fold(matched) { tol =>
      matched.withColumn("__rm",
        when(org.apache.spark.sql.functions.abs(
          axis(col("__ts")) - axis(col(s"__rm.$tsCol"))) <= tol * scale,
          col("__rm")))
    }
    withTol.select(
      left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        right.columns.map(c => col(s"__rm.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Range join: pair each point row with every interval row whose
    * `[startCol, endCol]` contains its `pointCol` (inclusive). The naive
    * formulation is a cross join + theta filter — quadratic and
    * unshuffleable. Instead both sides are binned at `binWidth`: a point
    * lands in exactly one bin, an interval explodes into the bins it
    * overlaps, and the join becomes an equi-join on the bin key followed
    * by the exact containment filter. With binWidth ≥ the typical
    * interval width each interval lands in ≤2 bins, so the join input
    * grows ~2×, not |L|×|R|; the bin key shuffles like any equi-join and
    * AQE handles residual bin skew. Point and interval columns must be
    * numeric AND in one numeric family (all integral/decimal, or all
    * float/double — validated at plan build): the containment filter
    * compares them NATIVELY, which is exact within a family at any
    * magnitude, but a mixed long-vs-double comparison would coerce to
    * double and readmit the >2^53 ulp matches. Only the bin routing
    * uses a double axis, which is a monotonic candidate superset.
    * Convert timestamps to epoch numerics first.
    *
    * Observability (the 100 TB hot-bin failure mode): the plan carries
    * an `observe` metric named `graft_range_join_<n>` (counter-suffixed
    * — match on the `graft_range_join` PREFIX) with columns
    * `(intervals, exploded_rows, max_bins_per_interval)`, aggregated
    * during the existing pass (zero extra jobs). When
    * `max_bins_per_interval` reaches the thousands, one wide interval
    * is fanning out across that many bins and its replicated payload
    * dominates the shuffle — raise `binWidth` toward the WIDEST
    * interval (at the cost of more candidate pairs per bin), or split
    * outlier intervals upstream. Read it with a
    * `QueryExecutionListener` or `df.queryExecution.observedMetrics`.
    * Measured cost ~6–13% on a sub-second join (the CollectMetrics
    * node breaks the scan's codegen pipeline once per side — the
    * interleaved A/Bs in BENCH_AB_r11 §2 bound one metric at ~6.5% and
    * two at ≤13%); `observeSkew = false` opts a proven-stable hot path
    * out.
    * Catalyst deliberately does not push caller-side filters THROUGH a
    * CollectMetrics node (it would change the observed values), so
    * filter the interval relation BEFORE the join — the repo-wide
    * pattern anyway — or the scan reads unfiltered.
    *
    * Output: all point columns + all interval columns prefixed
    * `rightPrefix`.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, binWidth: Double,
      rightPrefix: String = "r_", observeSkew: Boolean = true): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // native comparison is only exact when point and bounds stay in one
    // numeric family — a long point vs double bounds coerces the filter
    // to double and readmits the >2^53 ulp matches
    requireOneNumericFamily("rangeJoin",
      pointCol -> Ids.fieldOf(points, pointCol, "rangeJoin").dataType,
      startCol -> Ids.fieldOf(intervals, startCol, "rangeJoin").dataType,
      endCol -> Ids.fieldOf(intervals, endCol, "rangeJoin").dataType)
    requireNoPrefixCollision("rangeJoin", points.columns.toSeq,
      intervals.columns.toSeq, rightPrefix)
    // `withColumn("__bin", …)` on the points side silently OVERWRITES a
    // user column of that name and then drops it from the output; the
    // interval side's `__bin`/`__nbins` staging would mis-rename
    requireNoReservedNames("rangeJoin", "points", points,
      points.columns.toSeq, Set("__bin"))
    requireNoReservedNames("rangeJoin", "intervals", intervals,
      intervals.columns.toSeq, Set("__bin", "__nbins"))
    // the interval side is renamed AFTER its __bin staging, so the
    // PREFIXED names must also stay clear: with a non-default prefix
    // like "__" an intervals column 'bin' renames onto the staged
    // __bin — a duplicate column and a confusing AnalysisException on
    // the USING join instead of this named plan-build error (same
    // post-prefix check intervalOverlapJoin makes). Only __bin here:
    // unlike intervalOverlapJoin, rangeJoin drops __nbins BEFORE the
    // rename fold, so a prefixed name equal to __nbins is safe
    // (ADVICE r13 — reserving it was an over-strict false positive)
    requireNoReservedNames("rangeJoin", "intervals (prefixed)", intervals,
      intervals.columns.map(rightPrefix + _).toSeq, Set("__bin"))
    val p = points.withColumn("__bin",
      floor(col(pointCol).cast("double") / binWidth).cast("long"))
    // bin-skew observability (docstring contract): bins-per-interval
    // measured BEFORE the explode, projected once in codegen so the
    // per-row metric accumulator evaluates a plain column reference
    val nBins = floor(col(endCol).cast("double") / binWidth).cast("long") -
      floor(col(startCol).cast("double") / binWidth).cast("long") + lit(1L)
    if (observeSkew) warnedObserveSkew
    val observed = if (!observeSkew) intervals else intervals
      .withColumn("__nbins", nBins)
      .observe(s"graft_range_join_${obsCounter.incrementAndGet()}",
        count(lit(1)).as("intervals"),
        coalesce(sum(col("__nbins")), lit(0L)).as("exploded_rows"),
        coalesce(max(col("__nbins")), lit(0L)).as("max_bins_per_interval"))
      .drop("__nbins")
    val i = observed
      .withColumn("__bin",
        explode(sequence(
          floor(col(startCol).cast("double") / binWidth).cast("long"),
          floor(col(endCol).cast("double") / binWidth).cast("long"))))
    val renamed = intervals.columns.foldLeft(i) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    // Bin math may round on the double axis — harmless, the cast is
    // monotonic so a point's bin always lies inside its interval's bin
    // range (candidates are a superset). The containment FILTER is the
    // correctness line and compares NATIVE values: a double-cast filter
    // admitted points one ulp past a long boundary at >2^53 magnitudes
    // (nanos-since-epoch), where 2^53 and 2^53+1 collapse to one double.
    p.join(renamed, Seq("__bin"))
      .filter(col(pointCol).between(
        col(s"$rightPrefix$startCol"), col(s"$rightPrefix$endCol")))
      .drop("__bin")
  }

  /** Interval-OVERLAP join — the interval×interval generalization of
    * [[rangeJoin]] (point-in-interval): emit every (left, right) pair
    * whose closed intervals intersect (`lStart ≤ rEnd ∧ rStart ≤
    * lEnd`), without a cross join. Both sides explode to the bins
    * their interval covers and equi-join on the bin; a pair sharing
    * k bins would surface k times, so it is emitted ONLY at its
    * canonical bin — the bin containing the LATER of the two starts,
    * which every overlapping pair covers on both sides exactly once.
    * Exactly-once is structural, not a post-hoc distinct (no wide
    * dedup shuffle).
    *
    * Scale shape: shuffle volume is rows × (interval length /
    * `binWidth`) per side — pick `binWidth` near the typical interval
    * length so the explode factor stays O(1) and no bin becomes a hot
    * key. Bounds must be numeric and in ONE numeric family (all
    * integral/decimal, or all float/double — same plan-build guard as
    * [[rangeJoin]]): the overlap filter compares natively, exact
    * within a family at any magnitude. Typical use is integral epochs
    * (micros, days); bin routing runs on the rounded double axis,
    * which is a monotonic candidate superset, so the plan stays
    * deterministic and SQL-replayable either way.
    *
    * Observability (the 100 TB hot-bin failure mode): the plan carries
    * TWO `observe` metrics, `graft_overlap_join_l_<n>` and
    * `graft_overlap_join_r_<n>` (counter-suffixed — match on the
    * prefixes), each `(intervals, exploded_rows,
    * max_bins_per_interval)` for its side, aggregated during the
    * existing pass. A `max_bins_per_interval` in the thousands means
    * one wide interval is replicating across that many bins and
    * dominating the shuffle — raise `binWidth` toward the widest
    * interval or split outliers upstream. Same measured ~6–13% cost
    * and `observeSkew = false` opt-out as [[rangeJoin]].
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long, rightPrefix: String = "r_",
      observeSkew: Boolean = true): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // same native-comparison exactness contract as rangeJoin: the
    // overlap filter compares lStart/rEnd (and rStart/lEnd) natively
    requireOneNumericFamily("intervalOverlapJoin",
      lStart -> Ids.fieldOf(left, lStart, "intervalOverlapJoin").dataType,
      lEnd -> Ids.fieldOf(left, lEnd, "intervalOverlapJoin").dataType,
      rStart -> Ids.fieldOf(right, rStart, "intervalOverlapJoin").dataType,
      rEnd -> Ids.fieldOf(right, rEnd, "intervalOverlapJoin").dataType)
    requireNoPrefixCollision("intervalOverlapJoin", left.columns.toSeq,
      right.columns.toSeq, rightPrefix)
    // left side stages `__bin`/`__nbins` on the raw names; the right
    // side stages them AFTER prefixing, so check the prefixed names
    // (with the default "r_" prefix a right `__bin` is safe, but an
    // empty prefix would re-expose the collision)
    requireNoReservedNames("intervalOverlapJoin", "left", left,
      left.columns.toSeq, Set("__bin", "__nbins"))
    requireNoReservedNames("intervalOverlapJoin", "right (prefixed)", right,
      right.columns.map(rightPrefix + _).toSeq, Set("__bin", "__nbins"))
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")
    // bin-skew observability (docstring contract), one metric per side.
    // The bins-per-interval expression is projected ONCE in codegen
    // before the observe so the per-row metric accumulator evaluates a
    // plain column reference, not interpreted floor-divisions.
    if (observeSkew) warnedObserveSkew
    def skewObs(df: DataFrame, name: String, s: String, e: String) =
      if (!observeSkew) df else df
        .withColumn("__nbins", bin(col(e)) - bin(col(s)) + lit(1L))
        .observe(s"graft_overlap_join_${name}_${obsCounter.incrementAndGet()}",
          count(lit(1)).as("intervals"),
          coalesce(sum(col("__nbins")), lit(0L)).as("exploded_rows"),
          coalesce(max(col("__nbins")), lit(0L)).as("max_bins_per_interval"))
        .drop("__nbins")
    val l = skewObs(left, "l", lStart, lEnd).withColumn("__bin",
      explode(sequence(bin(col(lStart)), bin(col(lEnd)))))
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val r = skewObs(renamed, "r", s"$rightPrefix$rStart", s"$rightPrefix$rEnd")
      .withColumn("__bin",
        explode(sequence(bin(col(s"$rightPrefix$rStart")),
          bin(col(s"$rightPrefix$rEnd")))))
    l.join(r, Seq("__bin"))
      .filter(col(lStart) <= col(s"$rightPrefix$rEnd") &&
        col(s"$rightPrefix$rStart") <= col(lEnd))
      .filter(col("__bin") ===
        bin(greatest(col(lStart), col(s"$rightPrefix$rStart"))))
      .drop("__bin")
  }

  /** Skew-resilient inner equi-join: the left (large, possibly skewed)
    * side's rows are salted into `buckets` sub-keys and the right side is
    * replicated once per bucket, so a hot key's rows spread over `buckets`
    * reducers instead of one straggler. Result is exactly
    * `left.join(right, keys, "inner")`. AQE's skew-join handles most cases
    * at runtime; explicit salting remains the tool when a single key
    * exceeds what one task can hold or the join is written by a framework
    * that must not depend on AQE heuristics.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int = 16): DataFrame = {
    // same silent-overwrite class as rangeJoin's __bin: a user __salt
    // on either side would be replaced and then dropped
    requireNoReservedNames("saltedJoin", "left", left, left.columns.toSeq,
      Set("__salt"))
    requireNoReservedNames("saltedJoin", "right", right, right.columns.toSeq,
      Set("__salt"))
    // Salt must be uniform per-row regardless of partition layout;
    // rand(seed) draws per-row from a seeded stream (layout-independent in
    // distribution), unlike salting off monotonically_increasing_id whose
    // low bits encode the partition index.
    val salted = left.withColumn("__salt",
      floor(rand(42L) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Bloom-pruned inner equi-join: when the small side is selective but
    * too big (or a shuffled-hash plan is forced anyway), build a Bloom
    * filter over its join keys and drop non-matching BIG-side rows at
    * the SCAN, before their payloads ever reach the exchange — the
    * runtime row-group/shuffle-volume reduction AQE's own runtime
    * filters target, as an explicit operator. EXACT: a Bloom filter
    * has no false negatives, so every matching row survives the
    * prefilter and the join itself removes the ~`fpp` false
    * positives — output == the plain join (q_bloom_join shares a plain
    * relational oracle). The filter ships as ONE broadcast handle per
    * executor and the probe is a codegen'd expression
    * ([[graft.spark.BloomProbeExpression]]), so the big-side scan
    * stays in whole-stage codegen. Integral join keys (the fact-table
    * norm); the small side should fit a count() + bloomFilter build —
    * its keys, not its rows, bound the filter size.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"bloomPrunedJoin: bad fpp $fpp")
    val keyType = graft.ops.Ids.fieldOf(big, key, "bloomPrunedJoin").dataType
    require(keyType == org.apache.spark.sql.types.LongType ||
      keyType == org.apache.spark.sql.types.IntegerType,
      s"bloomPrunedJoin needs an integral key (got $keyType)")
    val spark = big.sparkSession
    val nKeys = math.max(1L, small.select(col(key)).distinct().count())
    val bloom = small.select(col(key).cast("long").as(key))
      .stat.bloomFilter(key, nKeys, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = org.apache.spark.sql.GraftBridge.column(
      graft.spark.BloomProbeExpression(
        org.apache.spark.sql.GraftBridge.expression(col(key).cast("long")),
        bc))
    big.filter(probe).join(small, Seq(key))
  }
}
