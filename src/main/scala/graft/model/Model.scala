package graft.model

/** Output data model of the engine.
  *
  * Shapes mirror the reference profile document
  * (reference: sparvi/profiler/profile_engine.py:408-454) and the
  * validation result shape (sparvi/validations/validator.py:115-128)
  * so JSON output diffs cleanly against the reference.
  */
final case class ColumnCompleteness(
    nulls: Long,
    nullPercentage: Double,
    distinctCount: Long,
    distinctPercentage: Double)

final case class NumericStats(
    min: Option[Double],
    max: Option[Double],
    avg: Option[Double],
    sum: Option[Double],
    stdev: Option[Double],
    q1: Option[Double],
    median: Option[Double],
    q3: Option[Double])

final case class TextLengthStats(
    minLength: Option[Long],
    maxLength: Option[Long],
    avgLength: Option[Double])

/** Counts of values matching the reference's three fixed regexes
  * (sparvi/profiler/profile_engine.py:212-214). */
final case class TextPatterns(
    emailPatternCount: Long,
    numericPatternCount: Long,
    datePatternCount: Long)

final case class DateStats(
    minDate: Option[String],
    maxDate: Option[String],
    distinctCount: Long,
    dateRangeDays: Option[Long])

final case class FrequentValue(
    value: Any,
    frequency: Long,
    percentage: Double)

/** Profile of a nested (array/map/struct) column — the multimodal
  * north-star extension (SURVEY §1.2: nested types fall outside the
  * reference's three buckets and were profiled for completeness only).
  * Sizes are element counts for arrays/maps and are absent for
  * structs; `fieldNulls` is per-top-level-field null counts within
  * non-null structs. */
final case class NestedColumnStats(
    kind: String, // array | map | struct
    minSize: Option[Long],
    maxSize: Option[Long],
    avgSize: Option[Double],
    totalElements: Option[Long],
    elementNulls: Option[Long],
    fieldNulls: Map[String, Long])

/** Anomaly contract per reference tests/test_profiler.py:35-61 and the
  * CLI renderer sparvi/cli/profile.py:210-231 (type, description,
  * severity in {low, medium, high}, column). */
final case class Anomaly(
    anomalyType: String,
    description: String,
    severity: String,
    column: Option[String])

/** Schema-shift contract per sparvi/cli/profile.py:233-249. */
final case class SchemaShift(
    shiftType: String, // column_added | column_removed | type_changed
    column: String,
    description: String,
    severity: String)

final case class TrendPoint(timestamp: String, value: Double)

final case class Trends(
    rowCounts: Seq[TrendPoint],
    nullRates: Map[String, Seq[TrendPoint]],
    duplicates: Seq[TrendPoint])

object Trends { val empty: Trends = Trends(Nil, Map.empty, Nil) }

final case class TableProfile(
    table: String,
    timestamp: String,
    rowCount: Long,
    duplicateCount: Long,
    completeness: Map[String, ColumnCompleteness],
    numericStats: Map[String, NumericStats],
    textPatterns: Map[String, TextPatterns],
    textLengthStats: Map[String, TextLengthStats],
    dateStats: Map[String, DateStats],
    frequentValues: Map[String, FrequentValue],
    outliers: Map[String, Seq[Double]],
    samples: Seq[Map[String, Any]],
    anomalies: Seq[Anomaly],
    schemaShifts: Seq[SchemaShift],
    trends: Trends,
    nestedStats: Map[String, NestedColumnStats] = Map.empty)

/** A scalar validation rule (sparvi/validations/validator.py:47-64):
  * `query` must return a single scalar; `operator` one of
  * equals/greater_than/less_than/>=/<=/!=/between (symbol aliases
  * accepted); missing operator defaults to equals, missing
  * expectedValue to 0, missing description generated. */
final case class ValidationRule(
    name: String,
    description: String,
    query: String,
    operator: String,
    expectedValue: Any)

final case class ValidationResult(
    ruleName: String,
    isValid: Boolean,
    actualValue: Any,
    expectedValue: Any,
    description: String,
    error: Option[String])

/** Metadata Spark cannot discover from a DataFrame: primary key,
  * foreign keys, and varchar max lengths (the reference reads these
  * from the warehouse inspector, default_validations.py:22-37). */
final case class TableMeta(
    primaryKey: Seq[String] = Nil,
    foreignKeys: Seq[String] = Nil,
    varcharLengths: Map[String, Int] = Map.empty)

object TableMeta { val empty: TableMeta = TableMeta() }
