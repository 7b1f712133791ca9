package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Mutable (ord, value) argmax state for [[MaxByHash]]. `ord == null`
  * means "no row seen yet" (input rows with a null ordering key are
  * skipped, matching `max_by` semantics). */
final class MaxByBuf(var ord: Any, var value: Any)

/** Hash-aggregable `max_by(value, ord)` (and, with `reverse = true`,
  * `min_by`): the latest-row-per-key primitive of the CDC apply path,
  * planned through ObjectHashAggregateExec instead of SortAggregateExec.
  *
  * Why it exists: Spark's `Max(struct(...))` and `MaxBy` are
  * DeclarativeAggregates whose aggregation buffer holds the struct itself;
  * struct (and string) buffer slots are not UnsafeRow-mutable, so
  * HashAggregateExec refuses the plan and every latest-change
  * materialization falls back to SortAggregate — each task sorts its whole
  * partition by the grouping key before reducing. At 100 TB of changelog
  * that is a per-partition sort on the hottest operator in the engine
  * (reference: backend/ingestion/sink_config.py upsert-mode apply). As a
  * TypedImperativeAggregate this keeps the group state in an in-memory
  * hash map (ObjectHashAggregate), still with map-side partial reduction;
  * the buffer is a single (ord, value) pair, so memory per group is
  * bounded and small — unlike collect_list-style aggregates the
  * sort-based fallback threshold can safely be raised (see
  * Tables.localSession).
  *
  * Ordering: the interpreted ordering of `ord`'s type — for the
  * changelog's `struct(ts, seq)` that is lexicographic (ts, seq), exactly
  * the `max(struct(ts, seq, ...))` contract it replaces. Ties keep the
  * first-seen row; callers own tie-freedom (the (ts, seq) key is unique
  * per changelog row), exactly like SQL `max_by`.
  */
case class MaxByHash(
    valueExpr: Expression,
    ordExpr: Expression,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxByBuf] with BinaryLike[Expression] {

  override def left: Expression = valueExpr
  override def right: Expression = ordExpr
  override def prettyName: String = if (reverse) "graft_min_by" else "graft_max_by"
  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ordExpr.dataType, prettyName)

  @transient private lazy val ordering = {
    val asc = TypeUtils.getInterpretedOrdering(ordExpr.dataType)
    if (reverse) asc.reverse else asc
  }

  override def createAggregationBuffer(): MaxByBuf = new MaxByBuf(null, null)

  override def update(buf: MaxByBuf, input: InternalRow): MaxByBuf = {
    val ord = ordExpr.eval(input)
    if (ord != null && (buf.ord == null || ordering.compare(ord, buf.ord) > 0)) {
      buf.ord = InternalRow.copyValue(ord)
      buf.value = InternalRow.copyValue(valueExpr.eval(input))
    }
    buf
  }

  override def merge(buf: MaxByBuf, other: MaxByBuf): MaxByBuf = {
    if (other.ord != null &&
        (buf.ord == null || ordering.compare(other.ord, buf.ord) > 0)) {
      buf.ord = other.ord
      buf.value = other.value
    }
    buf
  }

  override def eval(buf: MaxByBuf): Any = buf.value

  // Shuffle format: one UnsafeRow of struct(ord, value) — both fields
  // nullable so an empty partial (no non-null ord seen) round-trips.
  @transient private lazy val serSchema = StructType(Seq(
    StructField("ord", ordExpr.dataType, nullable = true),
    StructField("value", valueExpr.dataType, nullable = true)))
  @transient private lazy val serProj = UnsafeProjection.create(serSchema)

  override def serialize(buf: MaxByBuf): Array[Byte] =
    serProj(InternalRow(buf.ord, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): MaxByBuf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    new MaxByBuf(
      InternalRow.copyValue(row.get(0, ordExpr.dataType)),
      InternalRow.copyValue(row.get(1, valueExpr.dataType)))
  }

  override def withNewMutableAggBufferOffset(offset: Int): MaxByHash =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MaxByHash =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxByHash =
    copy(valueExpr = newLeft, ordExpr = newRight)
}
