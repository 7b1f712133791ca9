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
  * Nulls: a null array yields null (standard UnaryExpression handling),
  * and a null ELEMENT yields null too — matching the portable
  * aggregate/transform fold, whose `acc + x*x` step nulls the whole fold
  * when any element is null. (Embedding vectors never carry null
  * elements, but the claimed bit-identity with the fold must hold on
  * every input; the element check is emitted only when the array type
  * admits nulls, so the common containsNull=false path is unchanged.)
  */
case class Norm2(child: Expression) extends UnaryExpression with Serializable {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean = child.nullable || elemNullable

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
    if (elemNullable) {
      var i = 0
      while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    }
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
      // null-element short circuit — only emitted when the array type
      // admits null elements, so the embedding hot path pays nothing
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val guardResult =
        if (elemNullable) s"if (!${ev.isNull}) ${ev.value} = $acc;"
        else s"${ev.value} = $acc;"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $v = $get;
         |  $acc += $v * $v;
         |}
         |$guardResult
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
