package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.validation.{IncomparableException, ScalarCompare}

/** Unit tests for the Python-parity scalar comparison semantics
  * (reference: sparvi/validations/validator.py:99-113). These are the
  * validator's soul: Python's dynamic typing must be reproduced exactly
  * — numeric widening, bool-as-1/0, string-vs-number incomparability,
  * NaN never raising, unknown operators failing quietly.
  */
class ScalarCompareSpec extends AnyFunSuite with Matchers {

  import ScalarCompare.evaluate

  // ---- equals / not_equals --------------------------------------------
  test("equals widens numeric types (1L == 1.0 == BigDecimal(1))") {
    evaluate(1L, "equals", 1.0) shouldBe true
    evaluate(1, "==", BigDecimal(1)) shouldBe true
    evaluate(new java.math.BigDecimal("2.50"), "equals", 2.5) shouldBe true
  }

  test("equals: string-vs-number is false, not an error ('5' != 5)") {
    evaluate("5", "equals", 5) shouldBe false
    evaluate(5, "equals", "5") shouldBe false
    evaluate("5", "not_equals", 5) shouldBe true
  }

  test("equals: booleans act as 1/0 like Python") {
    evaluate(true, "equals", 1) shouldBe true
    evaluate(false, "equals", 0) shouldBe true
    evaluate(true, "equals", 0) shouldBe false
  }

  test("equals: nulls — null==null true, null==x false") {
    evaluate(null, "equals", null) shouldBe true
    evaluate(null, "equals", 0) shouldBe false
    evaluate(0, "not_equals", null) shouldBe true
  }

  test("equals: NaN equals nothing, including itself") {
    evaluate(Double.NaN, "equals", Double.NaN) shouldBe false
    evaluate(Double.NaN, "equals", 5) shouldBe false
    evaluate(Double.NaN, "not_equals", 5) shouldBe true
  }

  // ---- ordering operators ---------------------------------------------
  test("greater_than / less_than across numeric types") {
    evaluate(10L, "greater_than", 5) shouldBe true
    evaluate(10L, ">", 10.0) shouldBe false
    evaluate(4.99, "less_than", 5) shouldBe true
    evaluate(BigDecimal("5.00"), "<", 5) shouldBe false
  }

  test(">= and <= include equality under widening") {
    evaluate(5, "greater_than_or_equal", 5.0) shouldBe true
    evaluate(5, ">=", 6) shouldBe false
    evaluate(5, "less_than_or_equal", 5L) shouldBe true
    evaluate(7, "<=", 6.5) shouldBe false
  }

  test("string ordering is lexicographic (Python 'b' > 'a')") {
    evaluate("b", "greater_than", "a") shouldBe true
    evaluate("abc", "less_than", "abd") shouldBe true
  }

  test("ordering string-vs-number raises like Python TypeError") {
    an[IncomparableException] should be thrownBy
      ScalarCompare.evaluate("5", "greater_than", 5)
    an[IncomparableException] should be thrownBy
      ScalarCompare.evaluate(5, "less_than", "5")
  }

  test("ordering with NaN is false, never an error (Python nan<5 is False)") {
    evaluate(Double.NaN, "less_than", 5) shouldBe false
    evaluate(Double.NaN, "greater_than", 5) shouldBe false
    evaluate(5, "less_than_or_equal", Double.NaN) shouldBe false
  }

  test("±Infinity orders beyond any finite value, including beyond Double range") {
    evaluate(Double.PositiveInfinity, "greater_than", Long.MaxValue) shouldBe true
    evaluate(Double.NegativeInfinity, "less_than", Long.MinValue) shouldBe true
    // A BigDecimal beyond Double.MaxValue is still FINITE: strictly less
    // than +inf (the naive toDouble overflow would call them equal).
    val huge = BigDecimal(10).pow(400)
    evaluate(Double.PositiveInfinity, "greater_than", huge) shouldBe true
    evaluate(huge, "less_than", Double.PositiveInfinity) shouldBe true
    evaluate(huge, "equals", Double.PositiveInfinity) shouldBe false
    evaluate(-huge, "greater_than", Double.NegativeInfinity) shouldBe true
  }

  test("infinity against a non-numeric is false/incomparable, not a crash") {
    evaluate(Double.PositiveInfinity, "equals", "inf") shouldBe false
    an[IncomparableException] should be thrownBy
      ScalarCompare.evaluate(Double.PositiveInfinity, "greater_than", "x")
  }

  // ---- between ---------------------------------------------------------
  test("between: inclusive two-element range") {
    evaluate(5, "between", Seq(1, 10)) shouldBe true
    evaluate(1, "between", Seq(1, 10)) shouldBe true
    evaluate(10.0, "between", Seq(1, 10)) shouldBe true
    evaluate(0, "between", Seq(1, 10)) shouldBe false
    evaluate(11, "between", Seq(1, 10)) shouldBe false
  }

  test("between: malformed expected value is invalid, not an error") {
    evaluate(5, "between", Seq(1)) shouldBe false
    evaluate(5, "between", 5) shouldBe false
    evaluate(5, "between", null) shouldBe false
  }

  // ---- unknown operator ------------------------------------------------
  test("unknown operator is invalid, never an exception") {
    evaluate(5, "approximately", 5) shouldBe false
    evaluate(5, "", 5) shouldBe false
  }

  // ---- dates -----------------------------------------------------------
  test("same-class Comparables (dates) order naturally") {
    val d1 = java.sql.Date.valueOf("2020-01-01")
    val d2 = java.sql.Date.valueOf("2021-01-01")
    evaluate(d1, "less_than", d2) shouldBe true
    evaluate(d2, "greater_than_or_equal", d2) shouldBe true
  }
}
