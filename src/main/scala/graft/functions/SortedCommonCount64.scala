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

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_common64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
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
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
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
