package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native codegen'd 64-bit Hamming distance: `Long.bitCount(a ^ b)` as a
  * single fused expression.
  *
  * Semantically identical to `bit_count(a ^ b)` (both operands long, both
  * engines' two's-complement XOR) — the win is mechanical, not numeric:
  * the fused form evaluates as one virtual call per row instead of two
  * chained expressions with an intermediate, and in multi-block
  * fingerprint verifies (simhash sums 8 of these per candidate pair,
  * pHash bands 1) it keeps the whole distance a flat sum of intrinsics
  * inside one codegen region. The oracle side stays
  * `bit_count(xor(...))` — outputs are bit-identical by construction, so
  * swapping the Spark side is invisible to every hash-checked query.
  */
case class Hamming64(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming64 requires two long arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming64"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
