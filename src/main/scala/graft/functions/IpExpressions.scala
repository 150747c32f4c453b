package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the native expressions. Static, allocation-free
  * on the hot path; called directly from generated code.
  */
object GraftKernels {

  /** ClickHouse `IPv4StringToNum` semantics (reference main.go:238):
    * dotted-quad -> unsigned 32-bit value as long. Returns -1 for
    * malformed input (mapped to null by the expression), mirroring the
    * SQL-side cast-failure -> null of the Column fallback.
    */
  def ip4ToNum(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var part = 0L
    var digits = 0
    var dots = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') {
        part = part * 10 + (b - '0')
        digits += 1
        if (digits > 3 || part > 255) return -1L
      } else if (b == '.') {
        if (digits == 0) return -1L
        acc = (acc << 8) | part
        part = 0
        digits = 0
        dots += 1
        if (dots > 3) return -1L
      } else return -1L
      i += 1
    }
    if (dots != 3 || digits == 0) return -1L
    (acc << 8) | part
  }

  def numToIp4(v: Long): UTF8String = {
    val sb = new java.lang.StringBuilder(15)
    sb.append((v >> 24) & 255).append('.')
      .append((v >> 16) & 255).append('.')
      .append((v >> 8) & 255).append('.')
      .append(v & 255)
    UTF8String.fromString(sb.toString)
  }

  /** Sequential-fold double dot product — same evaluation order as the
    * oracle engine's, so results are bit-identical.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  private def dotArr(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b(i)
      i += 1
    }
    acc
  }

  /** L2-argmin centroid index for `v` — the IVF cell-assignment
    * kernel (r18). Bit-identical replication of the SQL form
    * `array_position(ds, array_min(ds)) - 1` over
    * ds_i = (dot(v,v) - 2.0*dot(v, c_i)) + |c_i|^2:
    * each distance folds in the same IEEE order, and the scan keeps
    * the FIRST minimum under the SQL double ordering (NaN greatest,
    * ±0.0 equal — `d == best` short-circuits before Double.compare,
    * exactly SQLOrderingUtil.compareDoubles), so ties and degenerate
    * NaN rows land on the identical cell. Throws on a null vector or
    * an empty centroid set, mirroring the SQL form's raise_error arm.
    */
  def nearestCell(v: ArrayData, centroids: Array[Array[Double]],
      norms: Array[Double]): Int = {
    if (v == null || centroids.length == 0)
      throw new IllegalArgumentException(NearestCell.DegenerateMsg)
    val nrm2 = dot(v, v)
    var best = 0.0
    var bestIdx = -1
    var i = 0
    while (i < centroids.length) {
      val d = (nrm2 - 2.0 * dotArr(v, centroids(i))) + norms(i)
      if (bestIdx < 0 ||
          (d != best && java.lang.Double.compare(d, best) < 0)) {
        best = d
        bestIdx = i
      }
      i += 1
    }
    bestIdx
  }
}

/** Native `IPv4StringToNum`: parses the dotted quad in one pass with no
  * regex/array allocation (the pure-Column fallback splits on a regex,
  * allocating an array + 4 string slices per row). Codegen emits a
  * static call that stays inside the whole-stage pipeline.
  */
case class Ip4ToNum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ip4_to_num"

  override def nullSafeEval(input: Any): Any = {
    val v = GraftKernels.ip4ToNum(input.asInstanceOf[UTF8String])
    if (v < 0) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.GraftKernels.ip4ToNum($c);
         |if (${ev.value} < 0) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Ip4ToNum =
    copy(child = newChild)
}

/** Native `IPv4NumToString`. */
case class NumToIp4(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_num_to_ip4"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.numToIp4(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.numToIp4($c)")

  override protected def withNewChildInternal(newChild: Expression): NumToIp4 =
    copy(child = newChild)
}

/** Native double-array dot product: a tight primitive loop over the
  * ArrayData, vs. zip_with+aggregate which materializes an intermediate
  * array of products per row. Same sequential fold order.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> columns, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native IVF cell assignment: ONE kernel call per corpus row where
  * the SQL form (`array_position(ds, array_min(ds))` over a 16-entry
  * distance array) inlined the float->double cast of the vector into
  * EVERY centroid dot — and, being nullable via its raise_error arm,
  * baited the probe join into a pushed-down `isnotnull(cell)` filter
  * that re-derived the entire expression a second time per row. That
  * duplicated tree was the ~14k-line generated stage janino refused
  * (InternalCompilerException, "Code grows beyond 64 KB") — the ANN
  * probe stage then ran INTERPRETED (r17 known issue). This
  * expression is non-nullable (null input raises, same contract), so
  * no null filter is ever inserted, and its codegen is one static
  * call — the stage compiles and the cast materializes once.
  */
case class NearestCell(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {
  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> column, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_cell"

  @transient private lazy val norms: Array[Double] =
    centroids.map(_.foldLeft(0.0)((acc, x) => acc + x * x))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) throw new IllegalArgumentException(NearestCell.DegenerateMsg)
    GraftKernels.nearestCell(v.asInstanceOf[ArrayData], centroids, norms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("cnorms", norms, "double[]")
    val msg = ctx.addReferenceObj("cellmsg", NearestCell.DegenerateMsg, "String")
    ev.copy(code =
      code"""
        |${c.code}
        |if (${c.isNull}) { throw new IllegalArgumentException($msg); }
        |int ${ev.value} =
        |  graft.functions.GraftKernels.nearestCell(${c.value}, $cRef, $nRef);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  /** Same contract (and test-pinned phrase) as the SQL raise_error arm. */
  val DegenerateMsg: String =
    "IvfIndex: null/degenerate vector has no nearest cell — scrub or " +
      "impute before assignment"
}

/** Column-level entry points for the native expressions. */
object IpExpressions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def ip4ToNum(ip: Column): Column = c(Ip4ToNum(e(ip)))
  def numToIp4(n: Column): Column = c(NumToIp4(e(n)))
  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def nearestCell(v: Column, centroids: Array[Array[Double]]): Column =
    c(NearestCell(e(v), centroids))
}
