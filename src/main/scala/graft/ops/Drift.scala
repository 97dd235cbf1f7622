package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots — the
  * daily-pipeline monitoring primitive: "did today's crawl's
  * length/quality/score distribution move away from yesterday's
  * (or from the reference corpus the filters were tuned on)?"
  * Population Stability Index (the banking-scorecard drift measure:
  * Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) over buckets — conventional read: <0.1 stable,
  * 0.1–0.25 moderate, >0.25 major drift) and the two-sample
  * Kolmogorov–Smirnov statistic (max |cdf_a − cdf_b|) over a shared
  * equi-width bucketing.
  *
  * Scale shape: each side reduces to its [[Sketch.histTable]] bucket
  * relation (≤ buckets+2 rows — the only shuffled key space; values
  * never shuffle), then one tiny outer join of the two bucket tables.
  * Works unchanged on 100 TB a side because everything after the two
  * scans is O(buckets). The bucket tables are also exactly what you'd
  * persist per day, so day-over-day drift needs no rescan of
  * yesterday.
  *
  * Determinism/oracle contract: bucket counts are exact longs; the
  * per-bucket PSI terms are floored to a 1e-9 grain and summed as
  * exact BIGINTs (the [[Embeddings]] convention — partition-order-
  * proof, SQL-replayable), then divided back once; the KS statistic
  * is a MAX over per-bucket doubles (no accumulation — IEEE-exact
  * cross-engine). Empty buckets substitute share `eps` inside the
  * PSI log (the standard finite-PSI convention; KS uses the true
  * zero). Both stats round to 6dp.
  */
object Drift {

  /** One-row drift report `(n_a, n_b, psi, ks)` between the
    * distributions of `valueCol` in `a` and `b` over the equi-width
    * bucketing `[lo, hi) / buckets` (under/overflow kept as their own
    * ordered buckets, exactly as [[Sketch.histTable]] emits them).
    * Raises on an empty side — drift against nothing is a pipeline
    * bug, not a zero.
    */
  def driftStats(a: DataFrame, b: DataFrame, valueCol: String,
      lo: Double, hi: Double, buckets: Int,
      eps: Double = 1e-6): DataFrame =
    driftFromHistTables(
      Sketch.histTable(a, valueCol, lo, hi, buckets),
      Sketch.histTable(b, valueCol, lo, hi, buckets), eps)

  /** [[driftStats]] over two ALREADY-BUILT `(bucket, c)` histogram
    * tables (the [[Sketch.histTable]] shape — same lo/hi/buckets on
    * both sides is the caller's contract, as for [[Sketch.histMerge]]).
    * This is the day-over-day path: persist each day's ≤buckets+2-row
    * bucket table and diff today against yesterday without rescanning
    * yesterday's corpus. Also accepts a streaming sink's complete-mode
    * histogram output batch-side.
    */
  def driftFromHistTables(histA: DataFrame, histB: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 1, s"driftStats: eps out of (0,1): $eps")
    val ha = histA.withColumnRenamed("c", "c_a")
    val hb = histB.withColumnRenamed("c", "c_b")
    val joined = ha.join(hb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val perBucket = joined
      .withColumn("n_a", sum(col("c_a")).over(tot))
      .withColumn("n_b", sum(col("c_b")).over(tot))
      // shares; the PSI log substitutes eps for an empty bucket so a
      // category seen on only one side contributes a finite penalty
      .withColumn("p", col("c_a").cast("double") / col("n_a"))
      .withColumn("q", col("c_b").cast("double") / col("n_b"))
      .withColumn("p_adj", when(col("c_a") === 0, lit(eps)).otherwise(col("p")))
      .withColumn("q_adj", when(col("c_b") === 0, lit(eps)).otherwise(col("q")))
      // 1e-9-grain PSI term as an exact long: partition-order-proof sum
      .withColumn("psi9",
        floor((col("p_adj") - col("q_adj")) * log(col("p_adj") / col("q_adj"))
          * 1e9).cast("long"))
      .withColumn("cum_a", sum(col("c_a")).over(w))
      .withColumn("cum_b", sum(col("c_b")).over(w))
      .withColumn("ksterm",
        abs(col("cum_a").cast("double") / col("n_a") -
          col("cum_b").cast("double") / col("n_b")))
    perBucket
      .groupBy(col("n_a"), col("n_b"))
      .agg(round(sum(col("psi9")).cast("double") / 1e9, 6).as("psi"),
        round(max(col("ksterm")), 6).as("ks"))
      .select(
        when(col("n_a").isNull || col("n_a") === 0,
          raise_error(lit("driftStats: empty side A"))).otherwise(col("n_a"))
          .as("n_a"),
        when(col("n_b").isNull || col("n_b") === 0,
          raise_error(lit("driftStats: empty side B"))).otherwise(col("n_b"))
          .as("n_b"),
        col("psi"), col("ks"))
  }

  /** Per-group drift: [[driftStats]] stratified by `groupCol` — one
    * `(group, n_a, n_b, psi, ks)` row per group present on EITHER side
    * (a group with an empty opposite side reports null psi/ks rather
    * than raising: at per-language grain, a language appearing or
    * vanishing IS the finding, and the n_a/n_b zeros carry it).
    * Same O(groups × buckets) post-scan cost.
    */
  def driftByGroup(a: DataFrame, b: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double, buckets: Int,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 1, s"driftByGroup: eps out of (0,1): $eps")
    require(buckets >= 1 && hi > lo,
      s"driftByGroup: bad range/buckets $lo/$hi/$buckets")
    val width = (hi - lo) / buckets
    def hist(df: DataFrame, cName: String) = {
      val v = col(valueCol).cast("double")
      df.select(col(groupCol).as("g"),
          when(v < lo, lit(-1)).when(v >= hi, lit(buckets))
            .otherwise(floor((v - lit(lo)) / lit(width)).cast("int"))
            .as("bucket"))
        .groupBy(col("g"), col("bucket"))
        .agg(count(lit(1)).as(cName))
    }
    val joined = hist(a, "c_a").join(hist(b, "c_b"),
        Seq("g", "bucket"), "full_outer")
      .select(col("g"), col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).rowsBetween(Long.MinValue, Long.MaxValue)
    joined
      .withColumn("n_a", sum(col("c_a")).over(tot))
      .withColumn("n_b", sum(col("c_b")).over(tot))
      .withColumn("p", col("c_a").cast("double") / col("n_a"))
      .withColumn("q", col("c_b").cast("double") / col("n_b"))
      .withColumn("p_adj", when(col("c_a") === 0, lit(eps)).otherwise(col("p")))
      .withColumn("q_adj", when(col("c_b") === 0, lit(eps)).otherwise(col("q")))
      .withColumn("psi9",
        when(col("n_a") === 0 || col("n_b") === 0, lit(null))
          .otherwise(floor((col("p_adj") - col("q_adj"))
            * log(col("p_adj") / col("q_adj")) * 1e9).cast("long")))
      .withColumn("cum_a", sum(col("c_a")).over(w))
      .withColumn("cum_b", sum(col("c_b")).over(w))
      .withColumn("ksterm",
        when(col("n_a") === 0 || col("n_b") === 0, lit(null))
          .otherwise(abs(col("cum_a").cast("double") / col("n_a") -
            col("cum_b").cast("double") / col("n_b"))))
      .groupBy(col("g").as(groupCol), col("n_a"), col("n_b"))
      .agg(round(sum(col("psi9")).cast("double") / 1e9, 6).as("psi"),
        round(max(col("ksterm")), 6).as("ks"))
      .select(col(groupCol), col("n_a"), col("n_b"), col("psi"), col("ks"))
  }
}
