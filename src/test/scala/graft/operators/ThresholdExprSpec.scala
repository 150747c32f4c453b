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
