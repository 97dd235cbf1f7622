package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Dedup]]'s connected components:
  * PageRank over an (src, dst) edge table — link-graph authority for
  * crawl frontier ranking / domain weighting, the second classic
  * iterative-join workload.
  *
  * Determinism at scale: ranks live as INTEGER nano-units (1e9 = mass
  * 1.0). Each iteration ships `r9 div outdeg` integer contributions
  * (exact, partition-order-proof BIGINT sums) and applies
  * `r9' = base9 + floor(0.85 · Σ)` — one float multiply of an exact
  * integer, floored — so the whole fixed-iteration computation is
  * bit-replayable in ANSI SQL (the q_pagerank oracle unrolls the same
  * arithmetic). Simplifications, shared with the oracle: dangling-node
  * mass is not redistributed, and the damping base uses the standard
  * `0.15/N` (total mass decays slightly where dangling nodes exist —
  * fine for RANKING, which is the use here).
  *
  * Scale shape: the edge table (with per-src outdegree) is computed
  * once; each iteration is one join on `src` + one aggregation on
  * `dst` — only (node, r9) longs move. Fixed iteration count, no
  * driver-side convergence loop state beyond the loop counter.
  */
object Graph {

  /** (node, r9) after `iters` damped iterations; nodes = src ∪ dst.
    * `rank = r9 / 1e9`. Node ids must be integral (enforced): a lossy
    * long cast would collapse e.g. every string URL to the single null
    * node and silently rank garbage — hash or dimension-map string
    * nodes to longs first.
    */
  def pageRank9(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 100, s"pageRank9: bad iters $iters")
    Ids.requireIntegralId(edges, srcCol, "pageRank9")
    Ids.requireIntegralId(edges, dstCol, "pageRank9")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    // Deliberately NOT persisted (r18 opt round, measured): the node
    // set is referenced by the count below, the initial ranks, and every
    // iteration's left join, but those references compile to IDENTICAL
    // exchange subtrees that Spark's exchange reuse dedupes within the
    // caller's action for free — a persist here replaced that reuse
    // with cache write + per-use InMemoryTableScan reads and measured
    // a paired-interleaved 1.36x REGRESSION on q_pagerank (the pass-1
    // persist, reverted; see OPTIMIZATION_r18.md).
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    require(n > 0, "pageRank9: empty graph")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = e.join(deg, Seq("src")).cache()
    // exact-integer base: (1e9 − floor(d·1e9)) div n — NOT
    // floor((1−d)·1e9/n): `1.0 − 0.85` and a parsed `0.15` are
    // different doubles, so only the integer formulation replays
    // identically in the oracle
    val base9 = (1000000000L - math.floor(damping * 1e9).toLong) / n
    val init9 = 1000000000L / n
    var ranks = nodes.withColumn("r9", lit(init9))
    for (_ <- 1 to iters) {
      val inflow = withDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          floor(col("r9") / col("outdeg")).cast("long").as("c9"))
        .groupBy(col("node"))
        .agg(sum(col("c9")).as("s9"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base9) +
            floor(lit(damping) * coalesce(col("s9"), lit(0L))).cast("long"))
            .as("r9"))
        .localCheckpoint(eager = false) // truncate the growing lineage
    }
    // The withDeg cache must outlive plan construction: the caller's
    // FIRST action is what materializes the iteration chain (the
    // checkpoints are lazy), and the pre-r18 eager unpersist() here
    // silently dropped it before it was ever used — every iteration
    // then re-derived edges+outdegree from the source. CacheRelease
    // frees it right after that action (paired A/B: keeping it costs
    // nothing locally; at cluster scale it is what bounds the job to
    // ONE edge scan instead of one per iteration).
    graft.spark.CacheRelease.afterFirstAction(ranks, Seq(withDeg))
  }
}
