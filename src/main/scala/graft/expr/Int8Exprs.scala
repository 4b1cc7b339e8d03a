package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Int8 scalar quantization for the embedding column (FAISS-SQ8-style).
  *
  * At 100 TB the embedding column dominates shuffle and cache footprint:
  * a 64-dim `array<double>` row costs 512 bytes + array headers, while the
  * int8 code vector is 64 bytes of flat `binary` — an 8× reduction that
  * compounds through every exchange, broadcast, and cache the ANN path
  * touches. Candidate ranking then runs on an integer dot product
  * (`DotProductI8`, a codegen'd byte loop) and only the two per-vector
  * scales re-enter float arithmetic.
  *
  * Quantization rule (per vector, symmetric around zero):
  *   m      = max_i |v_i|              (the vector's own max-abs)
  *   code_i = clamp(floor(v_i * 127.0 / m + 0.5), -127, 127)   (m > 0)
  *   code_i = 0                                                 (m = 0)
  * Null elements quantize to 0 and do not contribute to `m`. The
  * reconstruction scale is `m / 127.0`, so
  *   a·b ≈ (scale_a * scale_b) * Σ code_ai * code_bi
  * with per-element error ≤ scale/2 — see `Int8AnnSpec` for the pinned
  * bound. Every arithmetic step (abs/max, `x*127.0/m + 0.5`, floor, clamp)
  * is an exactly-rounded IEEE op in evaluation order, so DuckDB re-derives
  * the codes bit-for-bit from the same parquet doubles — the s05 oracle
  * hash-matches the integer dot products, not a tolerance.
  */
case class Int8Pack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"int8_pack requires array<double>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(arr.getDouble(i))
        if (a > m) m = a
      }
      i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0.0) {
      i = 0
      while (i < n) {
        val x = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i)
        var c = math.floor(x * 127.0 / m + 0.5)
        if (c > 127.0) c = 127.0
        if (c < -127.0) c = -127.0
        out(i) = c.toByte
        i += 1
      }
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val a = ctx.freshName("a")
      val x = ctx.freshName("x")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = $in.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$in.isNullAt($i)) {
         |    double $a = java.lang.Math.abs($in.getDouble($i));
         |    if ($a > $m) $m = $a;
         |  }
         |}
         |byte[] $out = new byte[$n];
         |if ($m > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $in.isNullAt($i) ? 0.0 : $in.getDouble($i);
         |    double $c = java.lang.Math.floor($x * 127.0 / $m + 0.5);
         |    if ($c > 127.0) $c = 127.0;
         |    if ($c < -127.0) $c = -127.0;
         |    $out[$i] = (byte) $c;
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Pack =
    copy(child = newChild)
}

/** Codegen'd Σ aᵢ·bᵢ over two int8 code vectors (`binary` columns, signed
  * bytes), summed over the shorter length. Products are at most 127² and
  * the accumulator is a long, so 64-dim dots are exact integers — the
  * currency the s05 oracle hash-matches.
  */
case class DotProductI8(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i8 requires binary inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i) * y(i)
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
         |int $n = java.lang.Math.min($x.length, $y.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $x[$i]) * ((long) $y[$i]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI8 =
    copy(left = newLeft, right = newRight)
}

object Int8Exprs {

  /** Pack an `array<double>` into its int8 code vector (binary). */
  def pack(v: Column): Column =
    ColumnBridge.column(Int8Pack(ColumnBridge.expression(v)))

  /** Exact integer dot over two code vectors. */
  def dotI8(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductI8(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
