package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native codegen'd IEEE-754 raw bits of a double, as a signed long.
  *
  * For NON-NEGATIVE doubles (the only graft use: squared distances) the
  * bit pattern is order-isomorphic to the value — `a <= b` ⟺
  * `bits(a) <= bits(b)` — which turns "argmin by (distance, code)" into
  * a plain `min` over the packed integer key
  * `bits(d)·nCodes + c`. That matters because `min(struct(d, c))` is not
  * hash-aggregable (struct buffers fall back to SortAggregate, which
  * SORTS the full scored pair set before combining), while a long/decimal
  * min runs as a map-side-combined HashAggregate. Exactness is free:
  * equal doubles have equal bits, so ties break on the code exactly as
  * the struct comparison would.
  *
  * Negative inputs would break the isomorphism (sign-magnitude order) —
  * callers own that invariant; the expression itself is just raw bits.
  */
case class DoubleBits(child: Expression)
  extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dbits requires a double argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dbits"

  override def nullSafeEval(a: Any): Any =
    java.lang.Double.doubleToRawLongBits(a.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"java.lang.Double.doubleToRawLongBits($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
