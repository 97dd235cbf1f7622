package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** The numeric-id contract shared by every operator that casts an id
  * column to long (tie-breaks, typed stateful streams, integer graph
  * math): the cast must be LOSSLESS. `cast("long")` on e.g. a string id
  * yields null, and downstream that null either silently empties the
  * result (a self-exclusion filter), collapses distinct keys into one,
  * or dies deep inside an encoder with an error naming no column — so
  * operators fail fast HERE with the column and the contract named.
  */
private[graft] object Ids {

  def isIntegral(dt: DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType

  /** Fail fast when `idCol` is not an integral type. Resolves the
    * column the way Spark does (case-insensitive fallback), so callers
    * that `col(idCol)` accepts are not rejected on case alone.
    */
  def requireIntegralId(df: DataFrame, idCol: String, fn: String): Unit = {
    val field = df.schema.fields.find(_.name == idCol)
      .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(idCol)))
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: no column '$idCol' in ${df.schema.fieldNames.mkString(", ")}"))
    require(isIntegral(field.dataType),
      s"$fn: column '$idCol' must be an integral type (byte/short/int/" +
        s"long — the numeric-id contract), got ${field.dataType.simpleString}; " +
        "a lossy cast('long') would null non-numeric values and silently " +
        "corrupt or empty the result. Map ids to longs first (e.g. " +
        "xxhash64 or a dimension table) if they are strings.")
  }
}
