package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** SQL-surface wrappers over the pure text kernels, so SQL users get the
  * same scalar functions the DataFrame API composes with:
  * `graft_simhash(text)` and `graft_fingerprint(text[, window])`.
  * Null input → null (standard SQL scalar-function contract).
  */
final case class SimhashExpression(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def withNewChildInternal(newChild: Expression): SimhashExpression =
    copy(child = newChild)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else graft.ops.Dedup.simhashValue(v.toString)
  }
}

final case class FingerprintExpression(child: Expression, window: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpression =
    copy(child = newChild)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else graft.ops.TextStats.fingerprintValue(v.toString, window)
  }
}
