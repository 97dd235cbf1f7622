package graft.spark

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Coalesce, CreateNamedStruct, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Single-pass argmax with a deterministic tie-break, as a
  * DeclarativeAggregate over a PRIMITIVE (double, long) buffer.
  *
  * `max(struct(score, tie))` expresses the same election but its
  * struct-typed buffer is not hash-aggregable, so Spark plans it as
  * SortAggregate — the partial side then SORTS every scored candidate
  * row per partition, which is exactly the cost a map-side-combining
  * argmax exists to avoid (measured on the hard-negative scan: the sort
  * dominated the whole query). Two mutable primitive buffer slots keep
  * this in HashAggregateExec with whole-stage codegen and map-side
  * partial aggregation: each partition emits one row per group.
  *
  * Ordering contract: rows compare by (score, tie) descending-max —
  * highest score wins, ties by the LARGEST tie value (pass a negated id
  * for a min-id tie-break), matching `row_number() OVER (ORDER BY score
  * DESC, id ASC) = 1` and `max(struct(score, -id))` bit for bit. Null
  * scores are ignored; an all-null/empty group evaluates to null. A
  * null TIE on a non-null score coalesces to Long.MinValue at update —
  * deterministic "sorts last on equal score", the same relative order
  * `max(struct)`'s nulls-smallest field comparison gives (without the
  * guard, `GreaterThan(newT, curT)` would go null on score ties and
  * silently keep the incumbent — r9 advice); the output then carries
  * Long.MinValue, not null. Consequently **Long.MinValue is a RESERVED
  * sentinel in the tie column**: an output tie of Long.MinValue cannot
  * be distinguished from a genuine input tie of Long.MinValue (they
  * compare and merge identically), and under the negate-id convention
  * `-id` for id = Long.MinValue overflows back to Long.MinValue itself
  * — callers using the full long domain as ties must avoid
  * Long.MinValue (ids ≥ 0, the universal case, are never affected).
  * Result: struct(score double, tie long).
  */
final case class ArgMaxTie(score: Expression, tie: Expression)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = tie
  override def prettyName: String = "graft_argmax_tie"
  override def nullable: Boolean = true
  override def dataType: DataType =
    StructType(Seq(StructField("score", DoubleType), StructField("tie", LongType)))

  private lazy val bufScore = AttributeReference("bufScore", DoubleType)()
  private lazy val bufTie = AttributeReference("bufTie", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bufScore, bufTie)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal.create(null, LongType))

  /** (newS, newT) displaces (curS, curT): non-null new beats empty
    * buffer, higher score, or equal score with larger tie. The IsNull
    * short-circuits via Or(true, _) so the null-buffer case never
    * reaches the comparisons.
    */
  private def takeNew(curS: Expression, curT: Expression,
      newS: Expression, newT: Expression): Expression =
    And(IsNotNull(newS),
      Or(IsNull(curS),
        Or(GreaterThan(newS, curS),
          And(EqualTo(newS, curS), GreaterThan(newT, curT)))))

  override lazy val updateExpressions: Seq[Expression] = {
    // null-tie guard: buffer ties are always non-null once a score
    // lands (this Coalesce is the only writer), so merge/compare paths
    // never see a null tie
    val safeTie = Coalesce(Seq(tie, Literal(Long.MinValue)))
    val take = takeNew(bufScore, bufTie, score, safeTie)
    Seq(If(take, score, bufScore), If(take, safeTie, bufTie))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = takeNew(bufScore.left, bufTie.left, bufScore.right, bufTie.right)
    Seq(If(take, bufScore.right, bufScore.left),
      If(take, bufTie.right, bufTie.left))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bufScore), Literal.create(null, dataType),
      CreateNamedStruct(Seq(
        Literal("score"), bufScore, Literal("tie"), bufTie)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxTie =
    copy(score = newLeft, tie = newRight)
}

object ArgMaxTie {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** `argMaxTie(score, tie)` as a Column aggregate: struct(score, tie)
    * of the group's (score desc, tie desc)-maximal row. For a min-id
    * tie-break pass `-id` and negate the result's `tie` back.
    */
  def apply(score: Column, tie: Column): Column =
    GraftBridge.column(new ArgMaxTie(
      GraftBridge.expression(score),
      GraftBridge.expression(tie)).toAggregateExpression())
}
