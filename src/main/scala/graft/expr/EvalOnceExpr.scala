package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins an expensive projected column to ONE
  * evaluation per row.
  *
  * The optimizer freely duplicates deterministic expressions: a filter on
  * a projected column is pushed below the projection by INLINING the
  * column's definition, so the expression is evaluated once inside the
  * (join) filter and AGAIN in the projection that produces the column —
  * the same double-evaluation the optimization guide (§4.4) documents for
  * filters over UDF-computed columns, where the published fix is marking
  * the expression non-deterministic. `EvalOnce` is that fix for native
  * columns: value, nullability and codegen are exactly the child's (the
  * generated code IS the child's — bit-identical results), but the
  * non-deterministic marker stops predicate pushdown, constant folding
  * and `CollapseProject` inlining, so a compute-heavy column (a haversine
  * distance, say) is materialized once, filtered on, and REUSED
  * downstream instead of being re-derived in every consumer.
  *
  * Use it only where the duplication is measured: the marker also blocks
  * legitimate optimizations (filter reordering across the projection), so
  * a blanket application would hurt (guide §4.4 makes the same point for
  * UDFs).
  */
case class EvalOnce(child: Expression) extends UnaryExpression with Nondeterministic {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any = child.eval(input)

  // the generated code is literally the child's — no wrapper cost, and
  // bit-identical values by construction
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnceExpr {
  /** Column wrapper for [[EvalOnce]]. */
  def evalOnce(c: Column): Column =
    ColumnBridge.column(EvalOnce(ColumnBridge.expression(c)))
}
