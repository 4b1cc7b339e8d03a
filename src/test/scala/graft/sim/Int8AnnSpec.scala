package graft.sim

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType}

import graft.SparkSpec
import graft.expr.{DotProductI8, Int8Exprs, Int8Pack}

/** Int8 scalar-quantized ANN: exact code semantics, interpreted/codegen
  * parity, the analytic error bound, and recall against the exact cosine
  * baseline on real embeddings.
  */
class Int8AnnSpec extends SparkSpec {

  import spark.implicits._

  private def packOne(arraySql: String): Array[Byte] =
    spark.range(1)
      .select(Int8Exprs.pack(expr(arraySql).cast("array<double>")).as("c"))
      .head().getAs[Array[Byte]]("c")

  test("int8 codes: hand-computed bytes, max-abs element hits ±127") {
    // m = 2.0 → codes = floor(x * 63.5 + 0.5)
    val codes = packOne("array(2.0D, -2.0D, 1.0D, 0.5D, -0.25D, 0.0D)")
    assert(codes.toSeq == Seq[Byte](127, -127, 64, 32, -16, 0))
  }

  test("int8 codes: zero vector and null elements quantize to 0") {
    assert(packOne("array(0.0D, 0.0D, 0.0D)").toSeq == Seq[Byte](0, 0, 0))
    // null element → 0 byte, and it doesn't contribute to the scale
    assert(packOne("array(cast(null AS double), 1.0D)").toSeq == Seq[Byte](0, 127))
  }

  test("interpreted eval matches the codegen'd DataFrame path") {
    val vs = Seq(
      Seq(0.3, -1.7, 0.004, 0.9999, -0.5),
      Seq(1e-12, -1e-12, 0.0, 5e-13, 1e-12),
      Seq(123.456, -654.321, 0.111, 99.99, -0.001))
    // interpreted: Expression.eval over a bound reference (no codegen)
    val packExpr = Int8Pack(BoundReference(0, ArrayType(DoubleType), nullable = true))
    val interpretedCodes = vs.map { v =>
      packExpr.eval(InternalRow(ArrayData.toArrayData(v.toArray)))
        .asInstanceOf[Array[Byte]].toSeq
    }
    val df = vs.map(Tuple1(_)).toDF("v")
    val codegenCodes = df.select(Int8Exprs.pack(col("v")).as("c"))
      .collect().map(_.getAs[Array[Byte]]("c").toSeq).toSeq
    assert(interpretedCodes == codegenCodes)

    val dotExpr = DotProductI8(
      BoundReference(0, BinaryType, nullable = true),
      BoundReference(1, BinaryType, nullable = true))
    val a = interpretedCodes(0).toArray
    val b = interpretedCodes(2).toArray
    val interpretedDot = dotExpr.eval(InternalRow(a, b)).asInstanceOf[Long]
    val codegenDot = Seq((a, b)).toDF("a", "b")
      .select(Int8Exprs.dotI8(col("a"), col("b")).as("d")).head().getLong(0)
    assert(interpretedDot == codegenDot)
    assert(interpretedDot ==
      a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum)
  }

  test("dot_i8: mismatched lengths sum over the shorter; nulls propagate") {
    val df = Seq((Array[Byte](1, 2, 3), Array[Byte](4, 5)))
      .toDF("a", "b")
    assert(df.select(Int8Exprs.dotI8(col("a"), col("b"))).head().getLong(0) == 14L)
    val withNull = df.select(
      Int8Exprs.dotI8(lit(null).cast("binary"), col("b")).as("d"))
    assert(withNull.head().isNullAt(0))
  }

  test("reconstruction error stays inside the analytic per-pair bound") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") < 5)
    val c = e.where(col("vec_id") >= 5 && col("vec_id") < 105)
    val approxDf = Similarity.int8TopK(q, c, "vec_id", "embedding", k = 100)
    val exactDf = Similarity.withNorm(q, "vec_id", "embedding", "query_id", "qv", "qn")
      .crossJoin(Similarity.withNorm(c, "vec_id", "embedding", "neighbor_id", "cv", "cn"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expr.VectorExprs.dot(col("qv"), col("cv")).as("dot"),
        array_max(transform(col("qv"), x => abs(x))).as("ma"),
        array_max(transform(col("cv"), x => abs(x))).as("mb"))
    val joined = approxDf.join(exactDf, Seq("query_id", "neighbor_id"))
      .withColumn("sa", col("ma") / 127.0)
      .withColumn("sb", col("mb") / 127.0)
      // |a·b − ŝ| ≤ Σ |aᵢ||b̂ᵢ−bᵢ| + |b̂ᵢ||aᵢ−âᵢ| ≤ n·(ma·sb/2 + (mb+sb/2)·sa/2)
      .withColumn("bound",
        lit(64.0) * (col("ma") * col("sb") / 2.0 +
          (col("mb") + col("sb") / 2.0) * col("sa") / 2.0))
      .withColumn("err", abs(col("score") - col("dot")))
    val violations = joined.where(col("err") > col("bound")).count()
    assert(violations == 0L, s"$violations pairs outside the quantization bound")
  }

  test("normalized int8 top-k recalls the exact cosine top-k on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.where(col("vec_id") < 10)
    val c = e.where(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.int8TopK(q, c, "vec_id", "embedding", k = 3, normalize = true)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    // 64-dim int8 keeps ~7 bits/dim of the unit vector — near-lossless ranking
    assert(recall >= 0.8, s"recall $recall")
  }
}
