package graft.validation

import org.apache.spark.sql.types.StructType

import graft.model.{TableMeta, ValidationRule}
import graft.types.ColumnBuckets

/** Default validation-rule generator: 15 heuristic rule families
  * derived from the schema, ported family-by-family from the reference
  * (reference: sparvi/validations/default_validations.py:11-425), with
  * query strings emitted in Spark SQL dialect.
  *
  * Spark has no PK/FK/varchar-length catalog, so those inputs arrive
  * through [[graft.model.TableMeta]] hints; nullability comes from
  * `StructField.nullable`. All queries are scalar aggregates over one
  * table — each runs as a single scan with the predicate evaluated in
  * codegen; none materializes rows on the driver.
  */
object DefaultValidations {

  /** Name fragments suggesting a column should be unique (D4,
    * reference default_validations.py:106). */
  private val UniquePatterns =
    Seq("id", "code", "number", "uuid", "guid", "key", "hash", "identifier")

  private val NegativeAllowedPatterns = Seq(
    "balance", "difference", "delta", "change", "temperature",
    "coordinate", "adjustment", "net", "profit_loss", "margin")

  private val NonZeroPatterns = Seq(
    "price", "amount", "total", "cost", "rate", "fee", "tax",
    "revenue", "salary", "income", "expense")

  private val PastDatePatterns = Seq(
    "birth", "created", "start", "registered", "joined", "purchase",
    "transaction", "order", "payment", "issued", "shipped", "received")

  private val EndDatePatterns =
    Seq("end", "finish", "completed", "closed", "expiry", "expiration")

  private val ImportantColumnPatterns = Seq(
    "name", "description", "address", "city", "state", "country", "postal", "zip",
    "email", "phone", "status", "type", "category", "price", "cost", "amount")

  private val CategoricalPatterns = Seq(
    "status", "type", "category", "level", "tier", "class", "grade",
    "priority", "severity", "state", "region", "stage", "gender")

  private val RefTablePatterns = Seq("ref", "type", "status", "category", "lookup")

  /** Phone regex from the reference (default_validations.py:270) —
    * Java-regex-compatible as written. */
  val PhoneRegex = "(\\+)?[0-9][0-9 ()-]+"

  def generate(schema: StructType, table: String,
      meta: TableMeta = TableMeta.empty): Seq[ValidationRule] = {
    val out = Seq.newBuilder[ValidationRule]
    val pk = meta.primaryKey
    val fk = meta.foreignKeys
    def hasAny(name: String, pats: Seq[String]): Boolean =
      pats.exists(name.toLowerCase.contains)

    val numericCols = schema.fields.filter(f => ColumnBuckets.isNumeric(f.dataType))
    val dateCols = schema.fields.filter(f => ColumnBuckets.isDate(f.dataType))
    val textCols = schema.fields.filter(f => ColumnBuckets.isText(f.dataType))

    // D1: not_empty — always.
    out += ValidationRule(
      s"check_${table}_not_empty",
      s"Ensure $table table has at least one row",
      s"SELECT COUNT(*) FROM $table", "greater_than", 0)

    // D2: pk_unique — when a primary key hint is supplied.
    if (pk.nonEmpty) {
      val pkCols = pk.mkString(", ")
      out += ValidationRule(
        s"check_${table}_pk_unique",
        s"Ensure primary key ($pkCols) has no duplicates",
        s"""SELECT COUNT(*) FROM (
           |  SELECT $pkCols, COUNT(*) as count
           |  FROM $table GROUP BY $pkCols HAVING COUNT(*) > 1
           |) AS duplicates""".stripMargin,
        "equals", 0)
    }

    // D3: row_growth — the reference's query is a self-referential
    // placeholder (prev count reads the same table, Δ always 0,
    // default_validations.py:82 "Replace with your historical count
    // logic"); kept verbatim for parity. Real history-aware detection
    // lives in ProfileCompare.detectAnomalies.
    out += ValidationRule(
      s"check_${table}_row_growth",
      s"Detect unusual growth in $table row count (>20% change)",
      s"""WITH current_count AS (SELECT COUNT(*) as count FROM $table),
         |prev_count AS (
         |  SELECT CASE WHEN COUNT(*) = 0 THEN NULL ELSE COUNT(*) END as count FROM $table
         |)
         |SELECT CASE
         |  WHEN prev_count.count IS NULL THEN 0
         |  WHEN ABS(current_count.count - prev_count.count) > prev_count.count * 0.2 THEN 1
         |  ELSE 0 END
         |FROM current_count, prev_count""".stripMargin,
      "equals", 0)

    // D4: {col}_unique for uniqueness-suggesting names (non-PK/FK).
    for (f <- schema.fields
         if !pk.contains(f.name) && !fk.contains(f.name)
         if hasAny(f.name, UniquePatterns)) {
      out += ValidationRule(
        s"check_${f.name}_unique",
        s"Check that ${f.name} values are unique",
        s"""SELECT COUNT(*) FROM (
           |  SELECT ${f.name}, COUNT(*) as count
           |  FROM $table WHERE ${f.name} IS NOT NULL
           |  GROUP BY ${f.name} HAVING COUNT(*) > 1
           |) AS duplicates""".stripMargin,
        "equals", 0)
    }

    // D5: not_null for non-nullable non-PK columns.
    for (f <- schema.fields if !f.nullable && !pk.contains(f.name)) {
      out += ValidationRule(
        s"check_${f.name}_not_null",
        s"Ensure ${f.name} has no NULL values",
        s"SELECT COUNT(*) FROM $table WHERE ${f.name} IS NULL",
        "equals", 0)
    }

    // D6: positive for numeric columns not name-matched as signed.
    for (f <- numericCols if !hasAny(f.name, NegativeAllowedPatterns)) {
      out += ValidationRule(
        s"check_${f.name}_positive",
        s"Ensure ${f.name} has no negative values",
        s"SELECT COUNT(*) FROM $table WHERE ${f.name} < 0",
        "equals", 0)
    }

    // D7: not_zero for money-ish names.
    for (f <- numericCols if hasAny(f.name, NonZeroPatterns)) {
      out += ValidationRule(
        s"check_${f.name}_not_zero",
        s"Ensure ${f.name} has no zero values",
        s"SELECT COUNT(*) FROM $table WHERE ${f.name} = 0",
        "equals", 0)
    }

    // D8: date sanity.
    for (f <- dateCols) {
      if (hasAny(f.name, PastDatePatterns)) {
        out += ValidationRule(
          s"check_${f.name}_not_future",
          s"Ensure ${f.name} contains no future dates",
          s"SELECT COUNT(*) FROM $table WHERE ${f.name} > CURRENT_DATE",
          "equals", 0)
      }
      out += ValidationRule(
        s"check_${f.name}_reasonable_past",
        s"Ensure ${f.name} contains no unreasonably old dates",
        s"SELECT COUNT(*) FROM $table WHERE ${f.name} < '1970-01-01'",
        "equals", 0)
      if (hasAny(f.name, EndDatePatterns)) {
        val startCol = guessStartDateColumn(f.name, schema.fields.map(_.name).toSeq)
        out += ValidationRule(
          s"check_${f.name}_end_date_order",
          s"Ensure ${f.name} occurs after any start date (if applicable)",
          s"""SELECT COUNT(*) FROM $table
             |WHERE ${f.name} IS NOT NULL AND $startCol IS NOT NULL
             |AND ${f.name} < $startCol""".stripMargin,
          "equals", 0)
      }
    }

    // D9: string constraints.
    for (f <- textCols) {
      meta.varcharLengths.get(f.name).foreach { len =>
        out += ValidationRule(
          s"check_${f.name}_max_length",
          s"Ensure ${f.name} does not exceed max length ($len)",
          s"SELECT COUNT(*) FROM $table WHERE LENGTH(${f.name}) > $len",
          "equals", 0)
      }
      if (!f.nullable) {
        out += ValidationRule(
          s"check_${f.name}_not_empty_string",
          s"Ensure ${f.name} has no empty strings",
          s"SELECT COUNT(*) FROM $table WHERE ${f.name} = ''",
          "equals", 0)
      }
      if (f.name.toLowerCase.contains("email")) {
        out += ValidationRule(
          s"check_${f.name}_valid_email",
          s"Ensure ${f.name} contains valid email format",
          s"""SELECT COUNT(*) FROM $table
             |WHERE ${f.name} IS NOT NULL AND ${f.name} NOT LIKE '%@%.%'""".stripMargin,
          "equals", 0)
      }
      if (f.name.toLowerCase.contains("phone") || f.name.toLowerCase.contains("mobile")) {
        // Spark SQL processes backslash escapes inside '...' literals
        // (unlike standard SQL), so the regex backslash must be
        // doubled or '\+' would parse as the invalid pattern '(+)?'.
        val sqlRegex = PhoneRegex.replace("\\", "\\\\")
        out += ValidationRule(
          s"check_${f.name}_valid_phone",
          s"Ensure ${f.name} contains valid phone number format",
          s"""SELECT COUNT(*) FROM $table
             |WHERE ${f.name} IS NOT NULL AND NOT (${f.name} RLIKE '$sqlRegex')""".stripMargin,
          "equals", 0)
      }
      if (f.name.toLowerCase.contains("zip") || f.name.toLowerCase.contains("postal")) {
        out += ValidationRule(
          s"check_${f.name}_valid_postal",
          s"Ensure ${f.name} follows postal/zip code patterns",
          s"""SELECT COUNT(*) FROM $table
             |WHERE ${f.name} IS NOT NULL AND LENGTH(TRIM(${f.name})) < 3""".stripMargin,
          "equals", 0)
      }
    }

    // D10: 3-sigma outlier count per numeric column, threshold by
    // table-name heuristic.
    for (f <- numericCols) {
      out += ValidationRule(
        s"check_${f.name}_outliers",
        s"Check for extreme outliers in ${f.name} (> 3 std deviations)",
        s"""WITH stats AS (
           |  SELECT AVG(${f.name}) as avg_val, STDDEV(${f.name}) as stddev_val
           |  FROM $table WHERE ${f.name} IS NOT NULL
           |)
           |SELECT COUNT(*) FROM $table, stats
           |WHERE ${f.name} > stats.avg_val + 3 * stats.stddev_val
           |OR ${f.name} < stats.avg_val - 3 * stats.stddev_val""".stripMargin,
        "less_than", outlierThreshold(table))
    }

    // D11: reference-table size cap.
    if (hasAny(table, RefTablePatterns)) {
      out += ValidationRule(
        s"check_${table}_ref_table_size",
        s"Ensure reference table $table has a reasonable number of rows",
        s"SELECT COUNT(*) FROM $table", "less_than", 1000)
    }

    // D12: null-rate cap for important nullable non-PK columns.
    for (f <- schema.fields
         if !pk.contains(f.name) && f.nullable
         if hasAny(f.name, ImportantColumnPatterns)) {
      // ROUND(CAST(... AS DOUBLE), 4): bigint * 100.0 / bigint resolves
      // to DECIMAL in Spark but DOUBLE in DuckDB — casting keeps the
      // scalar type identical across engines for the correctness gate.
      out += ValidationRule(
        s"check_${f.name}_null_rate",
        s"Ensure ${f.name} null rate is below acceptable threshold",
        s"""SELECT ROUND(CAST(COUNT(*) FILTER (WHERE ${f.name} IS NULL) * 100.0 / NULLIF(COUNT(*), 0) AS DOUBLE), 4)
           |FROM $table""".stripMargin,
        "less_than", 25.0)
    }

    // D13: categorical distribution — no single value > 95%.
    for (f <- textCols if hasAny(f.name, CategoricalPatterns)) {
      out += ValidationRule(
        s"check_${f.name}_distribution",
        s"Ensure ${f.name} has a reasonable value distribution",
        s"""WITH val_counts AS (
           |  SELECT ${f.name}, COUNT(*) as count,
           |  (COUNT(*) * 100.0 / NULLIF((SELECT COUNT(*) FROM $table), 0)) as pct
           |  FROM $table WHERE ${f.name} IS NOT NULL GROUP BY ${f.name}
           |)
           |SELECT COUNT(*) FROM val_counts WHERE pct > 95.0""".stripMargin,
        "equals", 0)
    }

    // D14: FK columns must reference >1 distinct value.
    for (f <- schema.fields if fk.contains(f.name)) {
      out += ValidationRule(
        s"check_${f.name}_ref_distribution",
        s"Ensure ${f.name} references a reasonable number of distinct values",
        s"""SELECT CASE
           |  WHEN (SELECT COUNT(DISTINCT ${f.name}) FROM $table WHERE ${f.name} IS NOT NULL) = 1
           |  THEN 1 ELSE 0 END""".stripMargin,
        "equals", 0)
    }

    // D15: updated-ish timestamps not before created-ish ones.
    val tsCols = dateCols.map(_.name)
    val updatedCols = tsCols.filter(c =>
      Seq("updated", "modified", "edited", "changed").exists(c.toLowerCase.contains))
    val createdCols = tsCols.filter(c =>
      Seq("created", "inserted", "added").exists(c.toLowerCase.contains))
    for (u <- updatedCols; cr <- createdCols) {
      out += ValidationRule(
        s"check_${u}_after_$cr",
        s"Ensure $u is not before $cr",
        s"""SELECT COUNT(*) FROM $table
           |WHERE $u IS NOT NULL AND $cr IS NOT NULL AND $u < $cr""".stripMargin,
        "equals", 0)
    }

    out.result()
  }

  /** Ported verbatim from default_validations.py:428-462. */
  def guessStartDateColumn(endDateColumn: String, columns: Seq[String]): String = {
    val startTermMap = Seq(
      "end" -> "start", "finish" -> "start", "completed" -> "created",
      "closed" -> "opened", "expiry" -> "issue", "expiration" -> "issue")
    val lower = endDateColumn.toLowerCase
    startTermMap.collectFirst { case (end, start) if lower.contains(end) =>
      lower.replace(end, start)
    }.flatMap(cand => columns.find(_.toLowerCase == cand)) match {
      case Some(c) => c
      case None =>
        val startIndicators = Seq("start", "created", "opened", "issue", "begin")
        val dateIndicators = Seq("date", "time", "timestamp", "dt")
        columns.find { c =>
          val l = c.toLowerCase
          startIndicators.exists(l.contains) && dateIndicators.exists(l.contains)
        }.getOrElse(endDateColumn)
    }
  }

  /** Ported verbatim from default_validations.py:465-481. */
  def outlierThreshold(table: String): Int = {
    val lower = table.toLowerCase
    val large = Seq("fact", "transaction", "event", "log", "history", "audit", "detail")
    val medium = Seq("order", "customer", "user", "account", "product", "item")
    if (large.exists(lower.contains)) 50
    else if (medium.exists(lower.contains)) 20
    else 5
  }
}
