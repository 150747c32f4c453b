package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel behind [[graft.operators.TextAnalysis.repetition]]
  * (T5, the Gopher-style repetition filters).
  *
  * The declarative formulation needed SIX interpreted higher-order
  * passes per row — array_sort + a filter/transform run-length chain
  * for the top-token count, then per gram size a transform building
  * n concat'd gram strings plus an array_distinct — and
  * HigherOrderFunction lambdas evaluate OUTSIDE whole-stage codegen,
  * so a pure row-local map was paying interpreter dispatch per token.
  * This kernel computes the same three statistics in ~2 passes of
  * plain Java (one hash-count pass for the top token, one windowed
  * pass building 2-/3-gram strings into hash sets), invoked as a
  * codegen'd static call: no lambda dispatch, no intermediate gram
  * ARRAYS (only the distinct set survives), no sorted copy.
  *
  * Exactness contract (the DuckDB oracle pins it): gram identity is
  * the single-space join of the tokens — identical to the
  * `concat_ws(' ', ...)` + `array_distinct` formulation because
  * whitespace-split tokens cannot contain the joint character — and
  * equality is UTF8 binary, the same comparison array_distinct and
  * the oracle's string DISTINCT use. Null array elements cannot occur
  * for `split` output; if fed anyway they count as one distinct token
  * (HashMap null key) and concat-skip like concat_ws.
  */
object TextKernels {

  private val Space = UTF8String.fromString(" ")

  /** [top_token_count, distinct_2grams, distinct_3grams] of a token
    * array (longs; gram counts 0 when the array is shorter than the
    * gram).
    */
  def repetitionStats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](Math.max(16, n * 2))
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(toks.getUTF8String(i), 1, RepetitionStats.SumInts)
      if (c > top) top = c
      i += 1
    }
    val g2 = new java.util.HashSet[UTF8String]()
    val g3 = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n - 1) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      g2.add(UTF8String.concatWs(Space, a, b))
      if (i < n - 2)
        g3.add(UTF8String.concatWs(Space, a, b, toks.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(
      Array(top.toLong, g2.size.toLong, g3.size.toLong))
  }
}

/** Native expression over a string-array column: see
  * [[TextKernels.repetitionStats]]. Codegen'd — one static call in the
  * generated row loop.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(toks: Any): Any =
    TextKernels.repetitionStats(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  /** Boxing-stable merge fn (a Scala lambda would re-box per call). */
  private[functions] val SumInts =
    new java.util.function.BiFunction[Integer, Integer, Integer] {
      def apply(a: Integer, b: Integer): Integer = a + b
    }

  def of(toks: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(toks)))
}
