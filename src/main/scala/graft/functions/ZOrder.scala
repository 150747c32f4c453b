package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order bit interleaving (static kernel, codegen-callable). */
object ZKernels {
  /** Interleave the low 31 bits of two non-negative longs: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Adjacent z-values
    * are adjacent in BOTH dimensions — the property that makes a
    * range-partition on z a 2-D tiling.
    */
  def interleave2(a: Long, b: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 31) {
      r |= ((a >>> i) & 1L) << (2 * i)
      r |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }
}

/** Native z-value expression over two long columns (low 31 bits each).
  * Codegen'd: one static call in the generated row loop, no boxing.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint columns, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZKernels.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZKernels.interleave2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Raw interleave of two (already bucketed) long columns. */
  def z2(a: Column, b: Column): Column =
    Bridge.column(ZOrder2(Bridge.expression(a), Bridge.expression(b)))

  /** Map `x` in [mn, mx] to a 16-bit bucket (degenerate domain
    * collapses to bucket 0). The scale happens in DOUBLE: the integer
    * form (x - mn) * 65535 overflows Long for domains wider than
    * ~2^47 (epoch-micros spanning years, snowflake ids) and would
    * silently wreck the clustering; double precision loss only blurs
    * a bucket boundary, which layout clustering tolerates.
    */
  def bucket16(x: Column, mn: Column, mx: Column): Column =
    when(mx <= mn, 0L)
      .otherwise(
        ((x.cast("double") - mn.cast("double")) /
          (mx.cast("double") - mn.cast("double")) * 65535.0).cast("long"))
      .cast("long")
}
