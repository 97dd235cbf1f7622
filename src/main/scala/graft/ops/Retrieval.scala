package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over the corpus: BM25 top-k for a constant term
  * query (Robertson/Spärck Jones probabilistic weighting with the
  * Lucene-style always-positive idf, `ln(1 + (N - df + ½)/(df + ½))`).
  * The relevance-scoring half of a corpus-curation stack (alongside
  * [[TextStats.tfidfTopTerms]]'s characteristic-term direction).
  *
  * Scale shape: the corpus scan filters to QUERY-TERM postings before
  * anything aggregates, so the single shuffle (the per-doc pivot
  * groupBy) carries only docs containing at least one query term;
  * corpus stats (N, avgdl) and per-term document frequencies are
  * single-row broadcast cross joins; top-k is orderBy+limit
  * (TakeOrdered — executor-local heaps, no full sort).
  *
  * Determinism: per-term tf/df/N/dl are integer-valued doubles (exact,
  * order-independent), the per-doc score adds the per-term
  * contributions in QUERY order (a fixed left fold, not a shuffled
  * `sum`), and the score is rounded to 6 decimals before ranking — so
  * the output is replicable in ANSI SQL as long as both engines'
  * `ln` agree to ~9 significant digits (the same contract tfidf's
  * oracle already relies on).
  *
  * Docs containing no query term never score (top-k may return fewer
  * than k rows when the query is rare). Output: (id, rank, score).
  */
object Retrieval {

  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25TopK: empty query")
    require(k >= 1, s"bm25TopK: k must be >= 1: $k")
    val qTerms = query.map(_.toLowerCase).distinct
    val base = df.select(col(idCol).as("id"),
      TextStats.wsTokens(col(textCol)).cast("double").as("dl"),
      split(lower(col(textCol)), "\\s+").as("__toks"))
    val stats = broadcast(base.agg(
      count(lit(1)).cast("double").as("__n"), avg(col("dl")).as("__avgdl")))
    val tfCols = qTerms.map(t =>
      sum(when(col("term") === t, 1.0).otherwise(0.0)).as(s"__tf_$t"))
    val pivoted = base
      .select(col("id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("id"), col("dl"))
      .agg(tfCols.head, tfCols.tail: _*)
    val dfCols = qTerms.map(t =>
      sum(when(col(s"__tf_$t") > 0, 1.0).otherwise(0.0)).as(s"__df_$t"))
    val dfT = broadcast(pivoted.agg(dfCols.head, dfCols.tail: _*))
    val score = qTerms.foldLeft(lit(0.0)) { (acc, t) =>
      val tf = col(s"__tf_$t")
      val dft = col(s"__df_$t")
      val idf = log(lit(1.0) + (col("__n") - dft + 0.5) / (dft + 0.5))
      acc + when(tf > 0,
        idf * tf * lit(k1 + 1) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("__avgdl"))))
        .otherwise(0.0)
    }
    pivoted.crossJoin(stats).crossJoin(dfT)
      .withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("rank"), col("score"))
  }
}
