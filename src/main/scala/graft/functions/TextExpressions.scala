package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-pinned text kernels. Spark's own `lower()` takes a fast
  * byte-wise path for all-ASCII strings but falls back to Java's
  * `String.toLowerCase()` — the JVM-DEFAULT-LOCALE overload — the
  * moment one non-ASCII byte appears. Under tr_TR that folds ASCII
  * 'I' to dotless 'ı' (the Turkish-i problem): a hostile-locale gate
  * sweep caught `q_normalize`'s fixture (em-dash + "NOISY") hashing
  * differently, and on a real cluster two executors with different
  * default locales would diverge WITHIN one query. These kernels pin
  * `Locale.ROOT`, making the fold a pure function of the input bytes.
  */
object CaseKernels {
  def lowerRoot(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    // full-ASCII: UTF8String's own byte-wise fold (no allocation, no
    // locale anywhere on that path); otherwise String fold under ROOT
    if (ascii) s.toLowerCase
    else UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
  }
}

/** Native locale-independent `lower()` — same codegen shape as the IP
  * codecs, so it stays inside whole-stage pipelines.
  */
case class LowerRoot(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lower_root"

  override def nullSafeEval(input: Any): Any =
    CaseKernels.lowerRoot(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CaseKernels.lowerRoot($c)")

  override protected def withNewChildInternal(newChild: Expression): LowerRoot =
    copy(child = newChild)
}

/** Column-level entry points. */
object TextExpressions {
  def lowerRoot(s: Column): Column = Bridge.column(LowerRoot(Bridge.expression(s)))
}
