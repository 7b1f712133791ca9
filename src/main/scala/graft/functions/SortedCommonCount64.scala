package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd intersection COUNT of two ascending-sorted long
  * arrays: the classic two-pointer merge, one branch per element, zero
  * allocation.
  *
  * `size(array_intersect(a, b))` builds an OpenHashSet per ROW and then
  * materializes the intersection array just to take its length — in the
  * dedup verify (millions of candidate pairs × ~100-element shingle
  * digests) that per-row allocation is the hot path. The two-pointer form
  * needs both inputs sorted ascending, which the shingle build guarantees
  * with one `array_sort` at digest time (paid once per document, not per
  * pair). CALLERS OWN the sortedness invariant, exactly as [[DoubleBits]]
  * callers own non-negativity; unsorted input returns an undercount, so
  * the verify pipelines sort at the single place arrays are built.
  *
  * Count semantics match `size(array_intersect)` on duplicate-free inputs
  * (the digest arrays are array_distinct'd); both engines hash and sort
  * longs identically, so oracle parity is unaffected.
  */
case class SortedCommonCount64(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_common64 requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  // getLong on a null slot silently reads 0 and would skew the count, so
  // when the input SCHEMA admits null elements (most computed arrays do,
  // even when no null ever occurs) the loop null-checks each slot and
  // fails loudly. Schemas proven null-free skip the branch entirely.
  private def mayHaveNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  private def nullElement(): Nothing =
    throw new IllegalArgumentException(
      "graft_sorted_common64: null array element — inputs must be " +
        "null-free ascending-sorted long arrays")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_common64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    val checkNulls = mayHaveNulls
    while (i < nx && j < ny) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(j))) nullElement()
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val nullCheck = if (mayHaveNulls)
        s"""if ($a.isNullAt($i) || $b.isNullAt($j)) {
           |    throw new IllegalArgumentException(
           |      "graft_sorted_common64: null array element — inputs must be " +
           |      "null-free ascending-sorted long arrays");
           |  }""".stripMargin
      else ""
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  $nullCheck
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
