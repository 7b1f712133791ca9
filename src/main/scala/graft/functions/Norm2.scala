package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd SQUARED L2 norm (Σ xᵢ²) over a FLOAT or DOUBLE array.
  *
  * Semantics are EXACTLY the index-ordered double fold the portable
  * `aggregate(transform(...))` formulation (and DuckDB's `list_reduce`)
  * computes: acc starts at 0.0 and accumulates xᵢ·xᵢ in element order —
  * bit-identical results, one generated loop instead of an interpreted
  * ArrayAggregate tree. Interpreted HOF folds measure ~1.5 ms/row at
  * d = 64 (lambda binding + boxing per element); this is the norm form
  * for any per-row normalization pass over a vector column.
  *
  * The square root is deliberately NOT taken — callers `sqrt(...)` when
  * they need the norm itself, and zero-norm filters compare against 0
  * either way.
  *
  * Nulls: a null array yields null (standard UnaryExpression handling);
  * array elements are assumed non-null (embedding vectors).
  */
case class Norm2(child: Expression) extends UnaryExpression with Serializable {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_norm2 requires an array<float> or array<double> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    if (elemIsFloat) {
      while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    } else {
      while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $get;
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
