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
}
