package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are
  * CodegenFallback — every element goes through an interpreted lambda with
  * boxing. For 64-dim embeddings × O(n²) candidate pairs that interpretation
  * dominates the runtime, so the dot product gets a real `doGenCode`: a
  * tight primitive loop over the two ArrayData buffers (the preference
  * order SURVEY §7.3 reserves for exactly this case — scalar kernel Spark
  * can't express efficiently with built-ins).
  */
case class DotProductD(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Codegen'd Σ aᵢ·bᵢ over two array&lt;double&gt; columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native dot — for pair loops prefer pre-normalizing each
    * side once (Similarity.normalized) so each pair costs ONE dot.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
