package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Map-side Bloom probe backed by a TorrentBroadcast instead of a plan
  * Literal.
  *
  * Spark's own `BloomFilterMightContain` carries the serialized filter as
  * an expression-tree `Literal(bytes)` — fine at the ≲8 MB its runtime
  * filters cap themselves to, but a corpus-snapshot filter (~1.2 GB for
  * 10⁹ docs at 1% fpp) embedded as a Literal is serialized into every
  * task binary and interned by codegen references; at that size it wedges
  * the driver. Broadcasting the filter routes the bytes through the
  * torrent protocol ONCE per executor (the same path a broadcast join's
  * hash relation takes), and the expression holds only the broadcast
  * handle: tasks deserialize nothing, `bf.value` is the executor-local
  * cached object. The probe itself stays inside whole-stage codegen — one
  * `mightContainLong` call per row against a lazily-resolved instance
  * field, no UDF, no fallback.
  */
case class BloomMightContainBcast(bf: Broadcast[BloomFilter], child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_bcast requires bigint input, got $t")
  }

  // resolved once per task from the executor-local broadcast cache
  @transient private lazy val filter: BloomFilter = bf.value

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bfRef = ctx.addReferenceObj("bloomBcast", bf, bcastCls)
    // one .value() resolution per generated-class instance, not per row
    val f = ctx.addMutableState(bfCls, "bloomFilter",
      v => s"$v = ($bfCls) ((($bcastCls) $bfRef).value());")
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $f.mightContainLong($in);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBcast =
    copy(child = newChild)
}

object BloomExprs {

  /** `mightContainLong(hash)` against a broadcast filter, as a Column. */
  def mightContain(bf: Broadcast[BloomFilter], hash: Column): Column =
    ColumnBridge.column(BloomMightContainBcast(bf, ColumnBridge.expression(hash)))
}
