package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: blocking + bounded fuzzy pair
  * scoring. The classic dedup-a-dimension problem ("are
  * `Customer#0041` and `Customer#0014` the same entity?") that exact
  * dedup ([[Dedup.exact]]) can't see and all-pairs comparison can't
  * afford.
  *
  * Scale shape: candidate pairs come ONLY from an equi-join on the
  * caller-supplied blocking key — the quadratic blowup is bounded by
  * the largest block, which the key design controls (nation × name
  * prefix, sorted-neighborhood prefix, phonetic key, …), and the plan
  * is a plain shuffled hash join a 1000-executor cluster partitions by
  * block. Edit distance runs with Spark's early-abandon threshold
  * variant (cost O(maxDist × len), not O(len²)) on the pairs inside a
  * block, after the join, never across blocks. The emitted match pairs
  * feed [[Dedup]]'s transitive-cluster labeler for entity ids.
  */
object Linkage {

  /** Candidate pairs within a block scored by Levenshtein distance,
    * keeping `dist <= maxDist`. Output: (id_a, id_b, name_a, name_b,
    * dist) with id_a < id_b, one row per unordered pair.
    */
  def blockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"blockedPairs: bad maxDist $maxDist")
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__name"),
      blockKey.as("__blk"))
    val a = base.select(col("__id").as("id_a"), col("__name").as("name_a"),
      col("__blk"))
    val b = base.select(col("__id").as("id_b"), col("__name").as("name_b"),
      col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      // threshold variant: early-abandons past maxDist (returns -1)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }
}
