package graft.spark

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface wrappers over the pure text kernels, so SQL users get the
  * same scalar functions the DataFrame API composes with:
  * `graft_simhash(text)` and `graft_fingerprint(text[, window])`.
  * Null input → null (standard SQL scalar-function contract). Both
  * generate a direct kernel call, keeping the stage in whole-stage
  * codegen.
  */
final case class SimhashExpression(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def withNewChildInternal(newChild: Expression): SimhashExpression =
    copy(child = newChild)
  def kernel(s: UTF8String): Long = graft.ops.Dedup.simhashValue(s.toString)
  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimhashExpression].getName)
    defineCodeGen(ctx, ev, c => s"$self.kernel($c)")
  }
}

final case class FingerprintExpression(child: Expression, window: Int)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpression =
    copy(child = newChild)
  def kernel(s: UTF8String): Long =
    graft.ops.TextStats.fingerprintValue(s.toString, window)
  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("fpExpr", this, classOf[FingerprintExpression].getName)
    defineCodeGen(ctx, ev, c => s"$self.kernel($c)")
  }
}
