package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-cardinality estimation (Flajolet et al. 2007)
  * over arbitrary value columns — the sketch companion to
  * [[Sketch]]'s count-min: distinct tokens / URLs / n-grams at corpus
  * scale WITHOUT shuffling the value space. The only shuffled key space
  * is the fixed m=2^p register table; registers merge across shards by
  * per-register MAX (like CMS's counter sums, the multi-region ingest
  * shape), and the register aggregation runs unchanged as a streaming
  * max-aggregation with sketch-bounded state.
  *
  * Determinism/oracle contract (same policy as [[Sketch]]): the value
  * hash is the first 15 hex chars of md5 (60 bits, cross-engine
  * replicable in Spark, DuckDB and JVM code); `register` = low p bits,
  * `rank` = 49 − bitlength(high 48 bits) (via `bin()` string length —
  * exact integer arithmetic, no log2 float edges; zero quotient →
  * rank 49 for p=12). The estimate uses the EXACT integer register sum
  * S = Σ 2^(49−M_j) (fits a signed 64-bit long: ≤ 2^p·2^49), so both
  * engines divide the same two exact numbers — the only floats are one
  * final division and the standard bias constant.
  *
  * Note Spark ships `approx_count_distinct` (its own HLL++); this
  * operator exists for the pipeline contract the built-in can't give:
  * materialized, shard-mergeable, STREAMING-maintainable register
  * tables with a cross-engine-replayable estimate.
  *
  * Accuracy contract (CLASSIC HLL, deliberately — HLL++'s empirical
  * bias table is not oracle-replayable): σ ≈ 1.04/√m (1.6% at p=12)
  * outside the 2.5m–5m band; inside that band the raw estimator runs a
  * few percent high (OpsSpec pins ≤10% there, ≤5% elsewhere); below
  * 2.5m linear counting takes over and is near-exact.
  */
object Hll {

  /** Number of registers for precision p. */
  def m(p: Int): Int = 1 << p

  private def checkP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"hll: precision p out of range [4,16]: $p")

  /** 60-bit md5 value hash (cross-engine: DuckDB computes the identical
    * value as ('0x' || substr(md5(v), 1, 15))::BIGINT).
    */
  private def hash60(v: Column): Column =
    conv(substring(md5(v), 1, 15), 16, 10).cast("long")

  /** Sparse register table `(register, m_j)` for the values of `valueCol`
    * — at most 2^p rows; registers no value hashed into are implicit
    * zeros. An ordinary max-aggregation: map-side partial max, streamable.
    */
  def hllRegisters(df: DataFrame, valueCol: String, p: Int = 12): DataFrame = {
    checkP(p)
    val mm = m(p)
    val width = 60 - p
    // integer DIV, not float /: above 2^53 a double quotient can land a
    // hash in the wrong rank vs the oracle's exact integer division
    df.select(hash60(col(valueCol)).as("__h"))
      .select((col("__h") % mm).cast("int").as("register"),
        expr(s"__h DIV $mm").as("__q"))
      .select(col("register"),
        when(col("__q") === 0, lit(width + 1))
          .otherwise(lit(width + 1) - length(bin(col("__q"))))
          .cast("int").as("rank"))
      .groupBy(col("register"))
      .agg(max(col("rank")).as("m_j"))
  }

  /** Merge independently-built register tables (same p): per-register
    * MAX. Like CMS sums, merged registers are EXACTLY the registers the
    * concatenated corpus would produce.
    */
  def hllMerge(tables: DataFrame*): DataFrame = {
    require(tables.nonEmpty, "hllMerge: no register tables")
    tables.reduce(_ unionByName _)
      .groupBy(col("register"))
      .agg(max(col("m_j")).as("m_j"))
  }

  /** Cardinality estimate from a register table: one row
    * `(v_empty, s_scaled, est)` where `s_scaled` = Σ 2^(width+1−M_j)
    * over ALL m registers (empty → 2^(width+1), exact integers) and
    * `est` applies the standard bias constant plus the small-range
    * linear-counting correction, rounded to 4 decimals for cross-engine
    * comparability.
    */
  def hllEstimate(registers: DataFrame, p: Int = 12): DataFrame = {
    checkP(p)
    val mm = m(p)
    val width = 60 - p
    val alpha = 0.7213 / (1.0 + 1.079 / mm)
    val scale = math.pow(2.0, width + 1) // 2^(width+1) as exact double
    registers
      .agg(count(lit(1)).as("__nz"),
        // coalesce: an EMPTY register table (empty corpus / all-blank
        // shard) must yield s_scaled = m·2^(w+1) and est 0 via linear
        // counting, not a null that poisons the arithmetic
        coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${width + 1} - m_j)")),
          lit(0L)).as("__s_nz"))
      .select(
        (lit(mm) - col("__nz")).cast("long").as("v_empty"),
        (col("__s_nz") + (lit(mm.toLong) - col("__nz")) * lit(1L << (width + 1)))
          .cast("long").as("s_scaled"))
      .select(col("v_empty"), col("s_scaled"),
        round(
          when(col("v_empty") > 0 &&
              lit(alpha * mm.toDouble * mm.toDouble * scale) / col("s_scaled")
                <= lit(2.5 * mm),
            lit(mm.toDouble) * log(lit(mm.toDouble) / col("v_empty")))
          .otherwise(
            lit(alpha * mm.toDouble * mm.toDouble * scale) / col("s_scaled")),
          4).as("est"))
  }

  /** One-call distinct-cardinality estimate of `valueCol`. */
  def hllCountDistinct(df: DataFrame, valueCol: String, p: Int = 12): DataFrame =
    hllEstimate(hllRegisters(df, valueCol, p), p)
}
