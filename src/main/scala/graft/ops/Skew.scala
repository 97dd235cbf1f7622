package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-skew observability — the report a 100 TB shuffle plan needs
  * BEFORE it runs. Every `groupBy`/`join` on a key column shuffles by
  * that key; one pathological key (the empty string, a default id, a
  * mega-domain) turns into one straggler reducer that dominates the
  * stage. This op measures exactly that risk so a pipeline can decide
  * to salt (`Dedup`-style), AQE-skew-split, or blocklist the key.
  *
  * Scale posture: the input reduces to (key, count) immediately — the
  * per-key aggregation has map-side partial combine, so the full
  * relation never shuffles, only the key space. The summary statistics
  * then aggregate that reduced relation; the heavy-key top-k is a
  * TakeOrdered (no full sort). Determinism: ties on count break by key
  * string ascending, so the report is partition-order independent and
  * the q_skew oracle replays it relationally.
  */
object Skew {

  /** Per-key skew report for `keyCol`: the `topK` heaviest keys, each
    * with its row count, share of all rows, and rank, alongside the
    * corpus-level skew profile (key cardinality, max/mean/p50/p99
    * group sizes, and `skew_ratio` = max/mean — the salting trigger;
    * a uniform key space sits near 1, a degenerate one explodes).
    * Null keys count as a real group (they hash together in a shuffle,
    * so they are exactly the risk this measures) under the key string
    * "<null>".
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"skewReport: bad topK $topK")
    val counts = df
      .select(coalesce(col(keyCol).cast("string"), lit("<null>")).as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("c"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"),
      max(col("c")).as("max_rows"),
      round(avg(col("c")), 6).as("mean_rows"),
      round(expr("percentile(c, 0.5)"), 6).as("p50_rows"),
      round(expr("percentile(c, 0.99)"), 6).as("p99_rows"))
    val heavy = counts
      .orderBy(col("c").desc, col("key"))
      .limit(topK)
      // single-partition rank window BY DESIGN (Spark warns): its
      // input is the ≤topK limit survivors, never the key table
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("key"))))
    heavy.crossJoin(stats)
      .withColumn("share", round(col("c").cast("double") / col("n_rows"), 6))
      .withColumn("skew_ratio", round(col("max_rows") / col("mean_rows"), 6))
      .select("rank", "key", "c", "share", "n_keys", "n_rows", "max_rows",
        "mean_rows", "p50_rows", "p99_rows", "skew_ratio")
  }
}
