package graft.validation

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.model.{ValidationResult, ValidationRule}

/** Scalar-rule validator: the Spark-native replacement for
  * `sparvi.validations.run_validations`
  * (reference: sparvi/validations/validator.py:67-139).
  *
  * Each rule's `query` is Spark SQL over registered temp views; the
  * first column of the first row is the actual value, compared to the
  * expected value with the rule's operator. Semantics preserved from
  * the reference:
  *   - unknown operator → is_valid = false (validator.py:99);
  *   - a failing rule captures its error and keeps going
  *     (validator.py:122-128);
  *   - `between` expects a 2-element sequence (validator.py:112-113);
  *   - comparisons are dynamically typed in the reference (Python) —
  *     [[ScalarCompare]] reproduces that with numeric widening to
  *     BigDecimal and string/boolean equality otherwise.
  *
  * Scale notes: each rule is one Spark job over the (ideally
  * persisted) input views; Catalyst pushes rule predicates into the
  * scan. `parallelism > 1` submits rules from a thread pool — Spark's
  * scheduler interleaves the jobs across the cluster, which hides the
  * per-job driver latency when rules are many and small.
  */
object Validator {

  def run(
      spark: SparkSession,
      rules: Seq[ValidationRule],
      parallelism: Int = 1): Seq[ValidationResult] = {
    if (parallelism <= 1) rules.map(runOne(spark, _))
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      import java.util.concurrent.Executors
      val pool = Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fs = rules.map(r => Future(runOne(spark, r)))
        Await.result(Future.sequence(fs), Duration.Inf)
      } finally pool.shutdown()
    }
  }

  def runOne(spark: SparkSession, rule: ValidationRule): ValidationResult =
    try {
      val row = spark.sql(rule.query).limit(1).collect().headOption
      val actual: Any = row.map(r => if (r.isNullAt(0)) null else r.get(0)).orNull
      val isValid = ScalarCompare.evaluate(actual, rule.operator, rule.expectedValue)
      ValidationResult(rule.name, isValid, actual, rule.expectedValue, rule.description, None)
    } catch {
      case NonFatal(e) =>
        ValidationResult(rule.name, isValid = false, null, rule.expectedValue,
          rule.description, Some(e.getMessage))
    }
}

/** Cross-type scalar comparison with Python-like numeric widening.
  * The reference relies on Python's dynamic `==`/`<` across
  * int/float/Decimal (validator.py:99-113); here every numeric pair is
  * widened to BigDecimal before comparing. */
object ScalarCompare {

  def toBigDecimal(v: Any): Option[BigDecimal] = v match {
    case null => None
    case b: Byte => Some(BigDecimal(b.toInt))
    case s: Short => Some(BigDecimal(s.toInt))
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case f: Float => Some(BigDecimal(f.toDouble))
    case d: Double => Some(BigDecimal(d))
    case bd: BigDecimal => Some(bd)
    case bd: java.math.BigDecimal => Some(BigDecimal(bd))
    case bi: BigInt => Some(BigDecimal(bi))
    case s: String => try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }
    case _ => None
  }

  /** 3-way compare returning None when the pair is not comparable. */
  def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, null) => Some(0)
    case (null, _) | (_, null) => None
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case _ =>
      (toBigDecimal(a), toBigDecimal(b)) match {
        case (Some(x), Some(y)) => Some(x.compare(y))
        case _ => (a, b) match {
          case (x: String, y: String) => Some(x.compareTo(y))
          case (x, y) => if (x == y) Some(0) else None
        }
      }
  }

  def equalsLoose(a: Any, b: Any): Boolean = compare(a, b).contains(0)

  def evaluate(actual: Any, operator: String, expected: Any): Boolean = operator match {
    case "equals" | "==" => equalsLoose(actual, expected)
    case "not_equals" | "!=" =>
      // Python `a != b` on incomparable-but-unequal values is True.
      if (actual == null && expected == null) false
      else if (actual == null || expected == null) true
      else !equalsLoose(actual, expected)
    case "greater_than" | ">" => compare(actual, expected).exists(_ > 0)
    case "less_than" | "<" => compare(actual, expected).exists(_ < 0)
    case "greater_than_or_equal" | ">=" => compare(actual, expected).exists(_ >= 0)
    case "less_than_or_equal" | "<=" => compare(actual, expected).exists(_ <= 0)
    case "between" => expected match {
      case s: Seq[_] if s.size == 2 =>
        compare(s(0), actual).exists(_ <= 0) && compare(actual, s(1)).exists(_ <= 0)
      case _ => false
    }
    case _ => false // unknown operator — reference leaves is_valid False
  }
}
