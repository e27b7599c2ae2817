package graft.model

/** JSON rendering of the output model, with key names matching the
  * reference's documents exactly (profile:
  * sparvi/profiler/profile_engine.py:408-454; validation result:
  * sparvi/validations/validator.py:115-128 — the reference emits key
  * "name" while its tests read "rule_name"
  * (tests/test_validations.py:25), so both keys are emitted).
  * Hand-rolled writer: no new dependencies, deterministic key order.
  */
object Json {

  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
    case ch => ch.toString
  } + "\""

  def any(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => any(x)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null"
      else if (d == math.floor(d) && math.abs(d) < 1e15) {
        // Render integral doubles like Python (1.0 not 1)
        val l = d.toLong; s"$l.0"
      } else d.toString
    case f: Float => any(f.toDouble)
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: BigDecimal => bd.underlying.toPlainString
    case s: String => str(s)
    case m: Map[_, _] => obj(m.toSeq.map { case (k, x) => String.valueOf(k) -> any(x) })
    case s: Seq[_] => s.map(any).mkString("[", ", ", "]")
    case a: Array[_] => a.toSeq.map(any).mkString("[", ", ", "]")
    case other => str(other.toString)
  }

  private def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")

  def completeness(c: ColumnCompleteness): String = obj(Seq(
    "nulls" -> any(c.nulls),
    "null_percentage" -> any(c.nullPercentage),
    "distinct_count" -> any(c.distinctCount),
    "distinct_percentage" -> any(c.distinctPercentage)))

  def numericStats(n: NumericStats): String = obj(Seq(
    "min" -> any(n.min), "max" -> any(n.max), "avg" -> any(n.avg),
    "sum" -> any(n.sum), "stdev" -> any(n.stdev), "q1" -> any(n.q1),
    "median" -> any(n.median), "q3" -> any(n.q3)))

  def textLengthStats(t: TextLengthStats): String = obj(Seq(
    "min_length" -> any(t.minLength),
    "max_length" -> any(t.maxLength),
    "avg_length" -> any(t.avgLength)))

  def textPatterns(t: TextPatterns): String = obj(Seq(
    "email_pattern_count" -> any(t.emailPatternCount),
    "numeric_pattern_count" -> any(t.numericPatternCount),
    "date_pattern_count" -> any(t.datePatternCount)))

  def dateStats(d: DateStats): String = obj(Seq(
    "min_date" -> any(d.minDate), "max_date" -> any(d.maxDate),
    "distinct_count" -> any(d.distinctCount),
    "date_range_days" -> any(d.dateRangeDays)))

  def frequentValue(f: FrequentValue): String = obj(Seq(
    "value" -> any(f.value),
    "frequency" -> any(f.frequency),
    "percentage" -> any(f.percentage)))

  def nestedStats(n: NestedColumnStats): String = obj(Seq(
    "kind" -> any(n.kind),
    "min_size" -> any(n.minSize),
    "max_size" -> any(n.maxSize),
    "avg_size" -> any(n.avgSize),
    "total_elements" -> any(n.totalElements),
    "element_nulls" -> any(n.elementNulls),
    "field_nulls" -> obj(n.fieldNulls.toSeq.sortBy(_._1).map { case (k, v) => k -> any(v) })))

  def anomaly(a: Anomaly): String = obj(Seq(
    "type" -> any(a.anomalyType),
    "description" -> any(a.description),
    "severity" -> any(a.severity),
    "column" -> any(a.column)))

  def schemaShift(s: SchemaShift): String = obj(Seq(
    "type" -> any(s.shiftType),
    "column" -> any(s.column),
    "description" -> any(s.description),
    "severity" -> any(s.severity)))

  def trends(t: Trends): String = obj(Seq(
    "row_counts" -> t.rowCounts.map(p => obj(Seq(
      "timestamp" -> any(p.timestamp), "value" -> any(p.value)))).mkString("[", ", ", "]"),
    "null_rates" -> obj(t.nullRates.toSeq.sortBy(_._1).map { case (k, v) =>
      k -> v.map(p => obj(Seq(
        "timestamp" -> any(p.timestamp), "value" -> any(p.value)))).mkString("[", ", ", "]")
    }),
    "duplicates" -> t.duplicates.map(p => obj(Seq(
      "timestamp" -> any(p.timestamp), "value" -> any(p.value)))).mkString("[", ", ", "]")))

  private def mapOf[T](m: Map[String, T], f: T => String): String =
    obj(m.toSeq.sortBy(_._1).map { case (k, v) => k -> f(v) })

  def profile(p: TableProfile): String = {
    val base = Seq(
      "table" -> any(p.table),
      "timestamp" -> any(p.timestamp),
      "row_count" -> any(p.rowCount),
      "duplicate_count" -> any(p.duplicateCount),
      "completeness" -> mapOf(p.completeness, completeness),
      "numeric_stats" -> mapOf(p.numericStats, numericStats),
      "text_patterns" -> mapOf(p.textPatterns, textPatterns),
      "text_length_stats" -> mapOf(p.textLengthStats, textLengthStats),
      "date_stats" -> mapOf(p.dateStats, dateStats),
      "frequent_values" -> mapOf(p.frequentValues, frequentValue),
      "outliers" -> mapOf(p.outliers, (vs: Seq[Double]) => any(vs))) ++
      // Extension key, absent unless nested columns exist so plain
      // reference-shaped profiles diff cleanly.
      (if (p.nestedStats.nonEmpty)
        Seq("nested_stats" -> mapOf(p.nestedStats, nestedStats))
      else Nil)
    val withSamples =
      if (p.samples.nonEmpty)
        base :+ ("samples" -> p.samples.map(s =>
          obj(s.toSeq.sortBy(_._1).map { case (k, v) => k -> any(v) })).mkString("[", ", ", "]"))
      else base
    obj(withSamples ++ Seq(
      "anomalies" -> p.anomalies.map(anomaly).mkString("[", ", ", "]"),
      "schema_shifts" -> p.schemaShifts.map(schemaShift).mkString("[", ", ", "]"),
      "trends" -> trends(p.trends)))
  }

  def validationResult(r: ValidationResult): String = {
    val base = Seq(
      "name" -> any(r.ruleName),
      "rule_name" -> any(r.ruleName),
      "is_valid" -> any(r.isValid),
      "actual_value" -> any(r.actualValue),
      "expected_value" -> any(r.expectedValue),
      "description" -> any(r.description))
    obj(r.error match {
      case Some(e) => base :+ ("error" -> any(e))
      case None => base
    })
  }

  def validationResults(rs: Seq[ValidationResult]): String =
    rs.map(validationResult).mkString("[", ", ", "]")
}
