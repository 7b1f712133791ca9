package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native as-of join — the custom-operator ladder's last rung (logical
  * node + strategy + physical operator), used where composition genuinely
  * pays a cost: the union+window form materializes a tagged union of both
  * sides through ONE window pass, while this operator streams each
  * co-partitioned sorted partition pair through a two-pointer merge with
  * O(1) state — no tagged union, no window buffer, no row amplification.
  *
  * Semantics (LEFT OUTER, `>=`): for every left row, the right row with
  * the same key and the greatest time ≤ the left row's time; unmatched
  * left rows null-extend. Output = left columns ++ right columns minus
  * the right key (the right time column survives — it is the "as-of
  * matched at" timestamp).
  *
  * Scale shape: requiredChildDistribution co-partitions both sides on the
  * key (one hash exchange each — exactly what sort-merge join would pay)
  * and requiredChildOrdering sorts within partitions by (key, time), so
  * the merge itself holds ONE candidate row. Keys and times must be
  * 64-bit-backed (long / timestamp / timestamp_ntz) — enforced at
  * construction.
  *
  * Registered at call time via `spark.experimental.extraStrategies`
  * (session-local, idempotent) — no cluster-wide config needed.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(_.exprId == rightKey.exprId).map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute) extends BinaryExecNode with CodegenSupport {

  private def rightKept: Seq[Attribute] =
    right.output.filterNot(_.exprId == rightKey.exprId)

  override def output: Seq[Attribute] =
    left.output ++ rightKept.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rightSchema = right.output
    val keptIdx = rightSchema.zipWithIndex.collect {
      case (a, i) if a.exprId != rightKey.exprId => i
    }
    // the projection input schema must mark right columns nullable — it
    // is what BindReferences consults, and a non-nullable right column
    // (e.g. an aggregate count) would otherwise skip the isNullAt check
    // and read garbage 0s from the null-extension row
    val allAttrs = left.output ++ rightKept.map(_.withNullability(true))
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      // project the full right row down to the kept columns (drop key)
      val keptProj = UnsafeProjection.create(keptIdx.map(i => rightSchema(i)), rightSchema)
      val resultProj = UnsafeProjection.create(outAttrs, allAttrs)
      val nullRight = new GenericInternalRow(keptIdx.length)
      val joined = new JoinedRow
      var candKey = 0L
      var hasCand = false
      var cand: InternalRow = null
      lIter.map { lRow =>
        val lk = lRow.getLong(lKeyIdx)
        val lt = lRow.getLong(lTimeIdx)
        // retire candidates from earlier keys
        if (hasCand && candKey != lk) { hasCand = false; cand = null }
        // advance the right side through every row usable by this left row
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val rk = head.getLong(rKeyIdx)
          val rt = head.getLong(rTimeIdx)
          if (rk < lk || (rk == lk && rt <= lt)) {
            val r = rBuf.next()
            if (rk == lk) { cand = keptProj(r).copy(); candKey = lk; hasCand = true }
          } else advancing = false
        }
        if (hasCand) resultProj(joined(lRow, cand))
        else resultProj(joined(lRow, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ── whole-stage codegen (the SortMergeJoinExec two-input pattern) ────
  //
  // The merge compiles into the stage's generated processNext(): the
  // two-pointer loop reads both sorted inputs as iterators, holds ONE
  // candidate row, and feeds output columns to the parent's consume() as
  // plain Java locals — no JoinedRow, no per-row UnsafeProjection, no
  // iterator-of-iterators virtual dispatch. doExecute() above remains the
  // interpreted fallback (spark.sql.codegen.wholeStage=false, or codegen
  // compile failure).

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(left.execute(), right.execute())

  // emitted column values alias the current left row / retained candidate
  // row buffers, which advance with the loop — a buffering parent must
  // copy (same contract as SortMergeJoinExec)
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];", forceInline = true)
    val rightHead = ctx.addMutableState("InternalRow", "asofRightHead", forceInline = true)
    val candRow = ctx.addMutableState("InternalRow", "asofCandRow", forceInline = true)
    val candKey = ctx.addMutableState("long", "asofCandKey", forceInline = true)
    val hasCand = ctx.addMutableState("boolean", "asofHasCand", forceInline = true)

    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    // candRow retains the FULL right row — kept columns index by their
    // position in the right child's output
    val keptIdx = right.output.zipWithIndex.collect {
      case (a, i) if a.exprId != rightKey.exprId => i
    }

    val leftRow = ctx.freshName("asofLeftRow")
    val lk = ctx.freshName("asofLk")
    val lt = ctx.freshName("asofLt")
    val advancing = ctx.freshName("asofAdvancing")
    val rk = ctx.freshName("asofRk")
    val rt = ctx.freshName("asofRt")

    // left columns: plain reads off the current left row (null-checked
    // only where the attribute is nullable)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      val value = ctx.freshName("asofLVal")
      val jt = CodeGenerator.javaType(a.dataType)
      val getV = CodeGenerator.getValue(leftRow, a.dataType, i.toString)
      if (a.nullable) {
        val isNull = ctx.freshName("asofLNull")
        ExprCode(
          code"""
            |boolean $isNull = $leftRow.isNullAt($i);
            |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getV);
          """.stripMargin,
          JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
      } else {
        ExprCode(code"$jt $value = $getV;",
          FalseLiteral, JavaCode.variable(value, a.dataType))
      }
    }
    // right kept columns: null-extend when no candidate matched (output
    // marks them nullable regardless of the child's nullability)
    val rightVars = rightKept.zip(keptIdx).map { case (a, j) =>
      val isNull = ctx.freshName("asofRNull")
      val value = ctx.freshName("asofRVal")
      val jt = CodeGenerator.javaType(a.dataType)
      val getV = CodeGenerator.getValue(candRow, a.dataType, j.toString)
      ExprCode(
        code"""
          |boolean $isNull = !$hasCand || $candRow.isNullAt($j);
          |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getV);
        """.stripMargin,
        JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }

    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  long $lk = $leftRow.getLong($lKeyIdx);
       |  long $lt = $leftRow.getLong($lTimeIdx);
       |  if ($hasCand && $candKey != $lk) { $hasCand = false; $candRow = null; }
       |  boolean $advancing = true;
       |  while ($advancing && ($rightHead != null || $rightInput.hasNext())) {
       |    if ($rightHead == null) { $rightHead = (InternalRow) $rightInput.next(); }
       |    long $rk = $rightHead.getLong($rKeyIdx);
       |    long $rt = $rightHead.getLong($rTimeIdx);
       |    if ($rk < $lk || ($rk == $lk && $rt <= $lt)) {
       |      if ($rk == $lk) {
       |        $candRow = (InternalRow) $rightHead.copy();
       |        $candKey = $lk;
       |        $hasCand = true;
       |      }
       |      $rightHead = null;
       |    } else {
       |      $advancing = false;
       |    }
       |  }
       |  ${leftVars.map(_.code.toString).mkString("\n")}
       |  ${rightVars.map(_.code.toString).mkString("\n")}
       |  ${consume(ctx, (leftVars ++ rightVars).map(_.copy(code =
              org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock)))}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }
}

object AsOf {

  private val longBacked = Set[org.apache.spark.sql.types.DataType](
    LongType, TimestampType, TimestampNTZType)

  /** As-of join two frames: for each `left` row, the `right` row with
    * equal `rightKeyCol` and the greatest `rightTimeCol` ≤ the left
    * row's `leftTimeCol` (LEFT OUTER). Right columns other than its key
    * must not collide with left column names. Rows with a null key or
    * time are dropped from BOTH sides before the merge (it reads raw
    * longs, where a null would silently compare as 0). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKeyCol: String, leftTimeCol: String,
      rightKeyCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // the merge reads key/time as raw longs, where a null would silently
    // compare as 0 — drop null keys/times up front so that can't happen
    // (parquet attributes are nullable by default even when no nulls exist;
    // the filter is a codegen'd IsNotNull, free when the data is clean)
    val lPlan = left
      .where(col(leftKeyCol).isNotNull && col(leftTimeCol).isNotNull)
      .queryExecution.analyzed
    val rPlan = right
      .where(col(rightKeyCol).isNotNull && col(rightTimeCol).isNotNull)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$name' in ${plan.output.map(_.name).mkString(", ")}"))
    val (lk, lt) = (attr(lPlan, leftKeyCol), attr(lPlan, leftTimeCol))
    val (rk, rt) = (attr(rPlan, rightKeyCol), attr(rPlan, rightTimeCol))
    Seq(lk, lt, rk, rt).foreach { a =>
      require(longBacked(a.dataType),
        s"as-of join: column '${a.name}' must be long/timestamp-backed, got ${a.dataType.simpleString}")
    }
    GraftPlanBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan, lk, lt, rk, rt))
  }
}
