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

  // ---- read-back ------------------------------------------------------
  // Parses a profile document (this writer's output, or any JSON with
  // the reference's key names, profile_engine.py:408-454) back into a
  // TableProfile — what makes the `--compare` flow possible from a
  // stored profile (reference cli/profile.py:74-82).

  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def readProfile(json: String): TableProfile = {
    import scala.jdk.CollectionConverters._
    def toScala(v: Any): Any = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
      case l: java.util.List[_] => l.asScala.map(toScala).toSeq
      case other => other
    }
    val root = toScala(jsonMapper.readValue(json, classOf[Object]))
      .asInstanceOf[Map[String, Any]]

    def asLong(v: Any): Long = v match {
      case i: Int => i.toLong
      case l: Long => l
      case d: Double => d.toLong
      case b: java.math.BigInteger => b.longValue
      case null => 0L
      case other => other.toString.toLong
    }
    def asDouble(v: Any): Double = v match {
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: Double => d
      case b: java.math.BigDecimal => b.doubleValue
      case null => 0.0
      case other => other.toString.toDouble
    }
    def optLong(m: Map[String, Any], k: String): Option[Long] =
      m.get(k).filter(_ != null).map(asLong)
    def optDouble(m: Map[String, Any], k: String): Option[Double] =
      m.get(k).filter(_ != null).map(asDouble)
    def optString(m: Map[String, Any], k: String): Option[String] =
      m.get(k).filter(_ != null).map(String.valueOf)
    def sub(k: String): Map[String, Map[String, Any]] =
      root.getOrElse(k, Map.empty) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Map[String, Any]]]
        case _ => Map.empty
      }
    def points(v: Any): Seq[TrendPoint] = v match {
      case s: Seq[_] => s.collect { case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        TrendPoint(String.valueOf(mm.getOrElse("timestamp", "")), asDouble(mm.getOrElse("value", 0.0)))
      }
      case _ => Nil
    }

    val trends = root.get("trends") match {
      case Some(t: Map[_, _]) =>
        val tm = t.asInstanceOf[Map[String, Any]]
        Trends(
          rowCounts = points(tm.getOrElse("row_counts", Nil)),
          nullRates = (tm.getOrElse("null_rates", Map.empty) match {
            case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map {
              case (k, v) => k -> points(v)
            }
            case _ => Map.empty[String, Seq[TrendPoint]]
          }),
          duplicates = points(tm.getOrElse("duplicates", Nil)))
      case _ => Trends.empty
    }

    TableProfile(
      table = String.valueOf(root.getOrElse("table", "")),
      timestamp = String.valueOf(root.getOrElse("timestamp", "")),
      rowCount = asLong(root.getOrElse("row_count", 0L)),
      duplicateCount = asLong(root.getOrElse("duplicate_count", 0L)),
      completeness = sub("completeness").map { case (k, m) =>
        k -> ColumnCompleteness(
          asLong(m.getOrElse("nulls", 0L)),
          asDouble(m.getOrElse("null_percentage", 0.0)),
          asLong(m.getOrElse("distinct_count", 0L)),
          asDouble(m.getOrElse("distinct_percentage", 0.0)))
      },
      numericStats = sub("numeric_stats").map { case (k, m) =>
        k -> NumericStats(
          optDouble(m, "min"), optDouble(m, "max"), optDouble(m, "avg"),
          optDouble(m, "sum"), optDouble(m, "stdev"), optDouble(m, "q1"),
          optDouble(m, "median"), optDouble(m, "q3"))
      },
      textPatterns = sub("text_patterns").map { case (k, m) =>
        k -> TextPatterns(
          asLong(m.getOrElse("email_pattern_count", 0L)),
          asLong(m.getOrElse("numeric_pattern_count", 0L)),
          asLong(m.getOrElse("date_pattern_count", 0L)))
      },
      textLengthStats = sub("text_length_stats").map { case (k, m) =>
        k -> TextLengthStats(
          optLong(m, "min_length"), optLong(m, "max_length"), optDouble(m, "avg_length"))
      },
      dateStats = sub("date_stats").map { case (k, m) =>
        k -> DateStats(
          optString(m, "min_date"), optString(m, "max_date"),
          asLong(m.getOrElse("distinct_count", 0L)), optLong(m, "date_range_days"))
      },
      frequentValues = sub("frequent_values").map { case (k, m) =>
        k -> FrequentValue(
          m.getOrElse("value", null),
          asLong(m.getOrElse("frequency", 0L)),
          asDouble(m.getOrElse("percentage", 0.0)))
      },
      outliers = (root.getOrElse("outliers", Map.empty) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map { case (k, v) =>
          k -> (v match {
            case s: Seq[_] => s.map(asDouble)
            case _ => Nil
          })
        }
        case _ => Map.empty[String, Seq[Double]]
      }),
      samples = (root.getOrElse("samples", Nil) match {
        case s: Seq[_] => s.collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
        case _ => Nil
      }),
      anomalies = (root.getOrElse("anomalies", Nil) match {
        case s: Seq[_] => s.collect { case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          Anomaly(String.valueOf(mm.getOrElse("type", "")),
            String.valueOf(mm.getOrElse("description", "")),
            String.valueOf(mm.getOrElse("severity", "")),
            mm.get("column").filter(_ != null).map(String.valueOf))
        }
        case _ => Nil
      }),
      schemaShifts = (root.getOrElse("schema_shifts", Nil) match {
        case s: Seq[_] => s.collect { case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          SchemaShift(String.valueOf(mm.getOrElse("type", "")),
            String.valueOf(mm.getOrElse("column", "")),
            String.valueOf(mm.getOrElse("description", "")),
            String.valueOf(mm.getOrElse("severity", "")))
        }
        case _ => Nil
      }),
      trends = trends,
      nestedStats = sub("nested_stats").map { case (k, m) =>
        k -> NestedColumnStats(
          String.valueOf(m.getOrElse("kind", "")),
          optLong(m, "min_size"), optLong(m, "max_size"), optDouble(m, "avg_size"),
          optLong(m, "total_elements"), optLong(m, "element_nulls"),
          (m.getOrElse("field_nulls", Map.empty) match {
            case fm: Map[_, _] => fm.asInstanceOf[Map[String, Any]].map {
              case (fk, fv) => fk -> asLong(fv)
            }
            case _ => Map.empty[String, Long]
          }))
      })
  }

  def readProfileFile(path: String): TableProfile =
    readProfile(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
