package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Differential property test for the govaluate-surface parser: random
  * expression trees rendered to strings, evaluated by an independent
  * in-test Long interpreter, and compared against the Catalyst column
  * ThresholdExpr compiles — over the exact-arithmetic fragment
  * (+, -, *, unary minus, comparators, &&, ||, ternary over integer
  * literals and `value`), where both evaluations are exact and any
  * mismatch is a real parser/semantics bug, not a float boundary.
  */
class ThresholdExprPropertySpec extends SparkSuite {
  import spark.implicits._

  private sealed trait Num
  private case class Lit(v: Long) extends Num
  private case object Value extends Num
  private case class Neg(a: Num) extends Num
  private case class Bin(op: Char, l: Num, r: Num) extends Num
  private case class Tern(c: Bool, t: Num, e: Num) extends Num

  private sealed trait Bool
  private case class Cmp(op: String, l: Num, r: Num) extends Bool
  private case class Logic(op: String, l: Bool, r: Bool) extends Bool

  private def evalN(a: Num, v: Long): Long = a match {
    case Lit(x) => x
    case Value => v
    case Neg(x) => -evalN(x, v)
    case Bin('+', l, r) => evalN(l, v) + evalN(r, v)
    case Bin('-', l, r) => evalN(l, v) - evalN(r, v)
    case Bin('*', l, r) => evalN(l, v) * evalN(r, v)
    case Bin(op, _, _) => sys.error(s"op $op")
    case Tern(c, t, e) => if (evalB(c, v)) evalN(t, v) else evalN(e, v)
  }

  private def evalB(b: Bool, v: Long): Boolean = b match {
    case Cmp("<", l, r) => evalN(l, v) < evalN(r, v)
    case Cmp(">", l, r) => evalN(l, v) > evalN(r, v)
    case Cmp("<=", l, r) => evalN(l, v) <= evalN(r, v)
    case Cmp(">=", l, r) => evalN(l, v) >= evalN(r, v)
    case Cmp("==", l, r) => evalN(l, v) == evalN(r, v)
    case Cmp("!=", l, r) => evalN(l, v) != evalN(r, v)
    case Cmp(op, _, _) => sys.error(s"cmp $op")
    case Logic("&&", l, r) => evalB(l, v) && evalB(r, v)
    case Logic("||", l, r) => evalB(l, v) || evalB(r, v)
    case Logic(op, _, _) => sys.error(s"logic $op")
  }

  // fully parenthesized render with jittered spacing — exercises the
  // tokenizer; precedence-sensitive rendering is covered by the
  // example-based ThresholdExprSpec
  private def renderN(a: Num): String = a match {
    case Lit(x) => x.toString
    case Value => "value"
    case Neg(x) => s"(- ${renderN(x)})"
    case Bin(op, l, r) => s"(${renderN(l)} $op ${renderN(r)})"
    case Tern(c, t, e) => s"(${renderB(c)} ? ${renderN(t)} : ${renderN(e)})"
  }

  private def renderB(b: Bool): String = b match {
    case Cmp(op, l, r) => s"(${renderN(l)} $op ${renderN(r)})"
    case Logic(op, l, r) => s"(${renderB(l)} $op ${renderB(r)})"
  }

  private def numGen(depth: Int): Gen[Num] =
    if (depth <= 0) Gen.oneOf(Gen.chooseNum(0L, 20L).map(Lit.apply), Gen.const(Value))
    else Gen.frequency(
      (2, Gen.chooseNum(0L, 20L).map(Lit.apply)),
      (2, Gen.const(Value)),
      (1, numGen(depth - 1).map(Neg.apply)),
      (4, for {
        op <- Gen.oneOf('+', '-', '*')
        l <- numGen(depth - 1); r <- numGen(depth - 1)
      } yield Bin(op, l, r)),
      (1, for {
        c <- boolGen(depth - 1)
        t <- numGen(depth - 1); e <- numGen(depth - 1)
      } yield Tern(c, t, e)))

  private def boolGen(depth: Int): Gen[Bool] = {
    val cmp = for {
      op <- Gen.oneOf("<", ">", "<=", ">=", "==", "!=")
      l <- numGen(depth); r <- numGen(depth)
    } yield Cmp(op, l, r): Bool
    if (depth <= 0) cmp
    else Gen.frequency(
      (3, cmp),
      (1, for {
        op <- Gen.oneOf("&&", "||")
        l <- boolGen(depth - 1); r <- boolGen(depth - 1)
      } yield Logic(op, l, r): Bool))
  }

  test("compiled column equals the reference interpreter on random trees") {
    val values = (-5L to 15L).toSeq
    val df = values.toDF("v")
    val prop = Prop.forAll(numGen(3)) { ast =>
      val rendered = renderN(ast)
      val got = df
        .select(col("v"), ThresholdExpr.withValue(rendered, col("v")).as("r"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      values.forall(v => got(v) == evalN(ast, v))
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(r.passed, r.status.toString)
  }
}
