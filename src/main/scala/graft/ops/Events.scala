package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over user streams — the funnel primitive
  * every product/ops corpus query eventually needs: how many users
  * completed step 1, then step 2 STRICTLY after it, then step 3 after
  * that. Complements the gap sessionization (`SparkEntry.qSessions`,
  * `streaming/StatefulOps.sessionize`) with ordered-subsequence
  * matching.
  *
  * Semantics: a user's `reached` is the longest prefix of `steps`
  * matchable as a subsequence of their events with STRICTLY increasing
  * timestamps between consecutive steps (equal-timestamp events cannot
  * chain — which also makes the result independent of how ties order).
  * Greedy earliest-match is optimal for subsequences, so the fold is
  * exact, and the cascade-of-min-timestamps oracle (q_funnel) computes
  * the identical number relationally.
  *
  * Scale shape: one shuffle of (user, ts, type) projections; the fold
  * runs over each user's SORTED event list inside the aggregation —
  * state is (step index, last-match ts), per-user cost linear in their
  * events. Event payloads never move.
  */
object Events {

  /** Per-user funnel depth: (userCol, reached) with reached in
    * [0, steps.length]. */
  def funnelSteps(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: no steps")
    val tsType = df.schema(tsCol).dataType
    val stepsLit = typedLit(steps)
    val n = steps.length
    val evs = sort_array(collect_list(
      struct(col(tsCol).as("ts"), col(typeCol).as("t"))))
    val reached = aggregate(
      evs,
      struct(lit(0).as("i"), lit(null).cast(tsType).as("last")),
      (acc, e) => {
        // least() keeps the lookup in bounds once the funnel completes
        // (ANSI mode errors on out-of-range element_at)
        val stepName = element_at(stepsLit,
          least(acc.getField("i") + 1, lit(n)))
        val advance = acc.getField("i") < n &&
          e.getField("t") === stepName &&
          (acc.getField("i") === 0 ||
            e.getField("ts") > acc.getField("last"))
        when(advance, struct((acc.getField("i") + 1).as("i"),
          e.getField("ts").as("last"))).otherwise(acc)
      },
      acc => acc.getField("i").cast("long"))
    df.groupBy(col(userCol))
      .agg(reached.as("reached"))
  }

  /** The funnel chart table: one row per step,
    * (step_idx 1-based, step, n_users who reached at least it). */
  def funnelReport(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val per = funnelSteps(df, userCol, tsCol, typeCol, steps)
    per.select(explode(sequence(lit(1), lit(steps.length)))
        .as("step_idx"), col("reached"))
      .groupBy(col("step_idx"))
      .agg(count(when(col("reached") >= col("step_idx"), lit(1)))
        .as("n_users"))
      .withColumn("step", element_at(typedLit(steps), col("step_idx")))
      .select(col("step_idx").cast("long").as("step_idx"), col("step"),
        col("n_users"))
  }
}
