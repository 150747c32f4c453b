package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ThresholdExprSpec extends SparkSuite {
  import spark.implicits._

  private def eval(expr: String, value: Long): Double =
    Seq(value).toDF("v")
      .select(ThresholdExpr.withValue(expr, col("v")).cast("double"))
      .as[Double].head()

  test("the reference's example expressions (README/main.go:352-435)") {
    assert(eval("value * 2", 21) == 42.0)
    assert(eval("value + 200", 5) == 205.0)
    assert(eval("value * 3", 7) == 21.0)
  }

  test("precedence and parentheses") {
    assert(eval("2 + 3 * 4", 0) == 14.0)
    assert(eval("(2 + 3) * 4", 0) == 20.0)
    assert(eval("value * 2 + 1", 10) == 21.0)
    assert(eval("-value + 1", 10) == -9.0)
    assert(eval("10 % 3", 0) == 1.0)
    assert(eval("7 / 2.0", 0) == 3.5)
  }

  test("ternary with comparisons (govaluate surface)") {
    // cap-style config: double small baselines, floor large ones
    assert(eval("value < 100 ? value * 2 : value + 50", 40) == 80.0)
    assert(eval("value < 100 ? value * 2 : value + 50", 200) == 250.0)
    // nested ternary associates through the else branch
    assert(eval("value < 10 ? 1 : value < 100 ? 2 : 3", 5) == 1.0)
    assert(eval("value < 10 ? 1 : value < 100 ? 2 : 3", 50) == 2.0)
    assert(eval("value < 10 ? 1 : value < 100 ? 2 : 3", 500) == 3.0)
  }

  test("boolean operators and equality") {
    assert(eval("value >= 10 && value <= 20 ? 1 : 0", 15) == 1.0)
    assert(eval("value >= 10 && value <= 20 ? 1 : 0", 25) == 0.0)
    assert(eval("value == 7 || value == 9 ? 1 : 0", 9) == 1.0)
    assert(eval("value != 7 ? 1 : 0", 7) == 0.0)
    assert(eval("!(value > 5) ? 1 : 0", 3) == 1.0)
    assert(eval("true ? 10 : 20", 0) == 10.0)
    assert(eval("false ? 10 : 20", 0) == 20.0)
  }

  test("whitespace robustness") {
    assert(eval("  value  *  2  ", 21) == 42.0)
    assert(eval("\tvalue+1", 1) == 2.0)
  }

  test("unknown variable rejected") {
    intercept[IllegalArgumentException](eval("bogus * 2", 1))
  }

  test("trailing garbage rejected") {
    intercept[IllegalArgumentException](eval("value * 2 )", 1))
  }

  test("bitwise operators and shifts (govaluate surface)") {
    assert(eval("value & 12", 10) == 8.0)
    assert(eval("value | 5", 10) == 15.0)
    assert(eval("value ^ 6", 10) == 12.0)
    assert(eval("value << 3", 5) == 40.0)
    assert(eval("value >> 2", 40) == 10.0)
    assert(eval("~value & 255", 0) == 255.0)
    // shifts bind tighter than the mixed bitwise level (govaluate order)
    assert(eval("1 | value << 2", 1) == 5.0)
    // bitwise sits between arithmetic and comparators
    assert(eval("value & 3 == 2 ? 1 : 0", 6) == 1.0)
  }

  test("exponent operator") {
    assert(eval("value ** 2", 5) == 25.0)
    assert(eval("2 ** value", 10) == 1024.0)
    assert(eval("value * 2 ** 3", 5) == 40.0)
  }

  test("string literals, equality and regex match") {
    def evalS(expr: String, s: String): Double =
      Seq(s).toDF("v")
        .select(ThresholdExpr.withValue(expr, col("v")).cast("double"))
        .as[Double].head()
    assert(evalS("value == 'alert' ? 1 : 0", "alert") == 1.0)
    assert(evalS("value == \"alert\" ? 1 : 0", "calm") == 0.0)
    assert(evalS("value =~ '^10\\.0\\.' ? 1 : 0", "10.0.3.7") == 1.0)
    assert(evalS("value =~ '^10\\.0\\.' ? 1 : 0", "192.168.0.1") == 0.0)
    assert(evalS("value !~ 'error' ? 1 : 0", "all good") == 1.0)
  }

  test("nil coalescing") {
    val out = Seq[(java.lang.Long, Long)]((null, 1L), (7L, 2L))
      .toDF("v", "id")
      .select(ThresholdExpr.withValue("value ?? 42", col("v")).cast("long").as("r"))
      .as[Long].collect().sorted
    assert(out.toSeq == Seq(7L, 42L))
  }
}
