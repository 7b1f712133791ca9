package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd SQUARED Euclidean distance over two FLOAT arrays.
  *
  * Semantics are EXACTLY the index-ordered double fold the portable
  * `aggregate(...)` formulation (and DuckDB's `list_reduce`) computes:
  * acc starts at 0.0 and accumulates (xᵢ−yᵢ)·(xᵢ−yᵢ) in element order —
  * bit-identical, but one generated loop instead of an interpreted
  * ArrayAggregate tree. This is the hot-path form for quantization /
  * nearest-centroid scoring (product quantization codes 64 subvector
  * distances per row per subspace — interpreted HOFs there would
  * dominate a 100 TB encode pass).
  *
  * The square root is deliberately NOT taken: every consumer (argmin
  * code assignment, ADC ranking) is order-equivalent under the monotone
  * sqrt, and skipping it keeps the expression a pure fused loop.
  *
  * Nulls: a null array yields null (standard BinaryExpression null
  * handling); array elements are assumed non-null (embedding vectors).
  */
case class L2DistanceSq(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // a silent min() here would make a corrupted short vector score a
    // SMALLER distance (fewer summed terms) and silently outrank honest
    // ones — dimensional mismatch is data corruption, fail loudly
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_l2sq: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_l2sq: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
