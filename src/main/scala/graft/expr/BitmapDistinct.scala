package graft.expr

import java.util.{BitSet => JBitSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `bitmap_distinct(id, max_id)` — EXACT distinct count of a bounded
  * non-negative id column as a custom [[TypedImperativeAggregate]].
  *
  * Why: `count(DISTINCT x)` expands and re-shuffles every distinct value
  * (two aggregation phases over the value set), and `approx_count_distinct`
  * trades exactness for its sketch. For *bounded* id domains — user ids,
  * route ids, enum surrogates — the classic warehouse trick (Druid/
  * ClickHouse `groupBitmap`) is a fixed-size bitmap: one map-side pass sets
  * bits, partial states OR-merge, and the final cardinality is exact. State
  * is ≤ maxId/8 bytes regardless of row count, so at 100 TB the shuffle
  * carries one small buffer per (group × partition) instead of the distinct
  * value stream.
  *
  * Contract: ids must be in `[0, maxId)` — out-of-range values throw
  * (silent dropping would corrupt the count), nulls are skipped like every
  * SQL aggregate. `maxId` must be a foldable int literal.
  */
case class BitmapDistinct(child: Expression, maxIdExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBitSet] {

  private lazy val maxId: Int = maxIdExpr.eval(null).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, maxIdExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct requires an int/long id column, got ${child.dataType}")
    else if (maxIdExpr.dataType != IntegerType || !maxIdExpr.foldable)
      TypeCheckResult.TypeCheckFailure("bitmap_distinct max_id must be an int literal")
    else maxIdExpr.eval(null) match {
      // reject at analysis: a NULL literal would unbox to 0 and fail every
      // row at runtime with a misleading range error (or silently return 0
      // on an all-null id column)
      case null => TypeCheckResult.TypeCheckFailure("bitmap_distinct max_id must not be null")
      case m: Integer if m <= 0 =>
        TypeCheckResult.TypeCheckFailure(s"bitmap_distinct max_id must be positive, got $m")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): JBitSet = new JBitSet()

  override def update(buffer: JBitSet, input: InternalRow): JBitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (id < 0 || id >= maxId)
        throw new IllegalArgumentException(
          s"bitmap_distinct: id $id outside [0, $maxId)")
      buffer.set(id.toInt)
    }
    buffer
  }

  override def merge(buffer: JBitSet, other: JBitSet): JBitSet = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: JBitSet): Any = buffer.cardinality().toLong

  override def serialize(buffer: JBitSet): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): JBitSet = JBitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren(0), maxIdExpr = newChildren(1))

  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinct {
  /** Column factory for `agg(...)`: exact distinct of ids in [0, maxId). */
  def bitmapDistinct(id: Column, maxId: Int): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(id),
        org.apache.spark.sql.catalyst.expressions.Literal(maxId, IntegerType))
        .toAggregateExpression())
}
