package graft.cli

import graft.model._

/** Plain-text renderers mirroring the reference CLI's three profile
  * formats FIELD FOR FIELD (reference: sparvi/cli/profile.py:122-455
  * — `_print_minimal_summary`, `_print_default_summary`,
  * `_print_detailed_summary`), including the anomaly and schema-shift
  * panels and the verbose-only outlier/sample sections. The reference
  * renders through `rich` (ANSI colors, box glyphs); this renders the
  * same tables as aligned text — same sections, same columns, same
  * per-cell formatting (Python `str()` float shapes, 2dp averages,
  * 1dp text lengths, `N/A` for missing) — so a reference user sees
  * the same information in the same order.
  *
  * Renderers return the full string (one trailing newline) so golden
  * tests can pin the exact output; `cli.Main` prints it.
  */
object Render {

  /** `rich.Panel`-style single-row box. */
  private def panel(text: String): String = {
    val w = text.length + 2
    s"╭${"─" * w}╮\n│ $text │\n╰${"─" * w}╯\n"
  }

  /** `rich box.SIMPLE`-style table: two-space gutters, a `─` rule
    * under the header when shown; right-justified columns where the
    * reference sets `justify="right"`. */
  private def table(
      cols: Seq[(String, Boolean)], rows: Seq[Seq[String]],
      showHeader: Boolean = true): String = {
    val widths = cols.indices.map { i =>
      val head = if (showHeader) cols(i)._1.length else 0
      (head +: rows.map(r => r(i).length)).max
    }
    def fmt(cells: Seq[String]): String =
      cells.indices.map { i =>
        val (_, right) = cols(i)
        val w = widths(i)
        if (right) cells(i).reverse.padTo(w, ' ').reverse else cells(i).padTo(w, ' ')
      }.mkString("  ", "  ", "").replaceAll("\\s+$", "")
    val sb = new StringBuilder
    if (showHeader) {
      sb.append(fmt(cols.map(_._1))).append('\n')
      sb.append(widths.map("─" * _).mkString("  ", "  ", "")).append('\n')
    }
    rows.foreach(r => sb.append(fmt(r)).append('\n'))
    sb.toString
  }

  /** Python `str(float)` shape for already-rounded doubles: whole
    * numbers keep one decimal ("2.0"), others drop trailing zeros. */
  private def pyNum(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite) s"${d.toLong}.0"
    else BigDecimal.valueOf(d).underlying.stripTrailingZeros.toPlainString

  private def fixed(v: Option[Double], dp: Int): String =
    v.map(x => s"%.${dp}f".format(x)).getOrElse("N/A")

  private def opt(v: Option[Any]): String = v.map {
    case d: Double => pyNum(d)
    case x => x.toString
  }.getOrElse("N/A")

  /** Column type tag by stats-map membership (profile.py:176-186). */
  private def colTypes(p: TableProfile): Map[String, String] =
    p.completeness.keys.map { c =>
      c -> (if (p.numericStats.contains(c)) "numeric"
            else if (p.dateStats.contains(c)) "date/time"
            else if (p.textLengthStats.contains(c)) "text"
            else "unknown")
    }.toMap

  /** Shared basic-stats block (Timestamp / Row count / Columns /
    * Duplicate rows); minimal mode appends anomaly and shift counts
    * (profile.py:136-145). */
  private def basicStats(p: TableProfile, withAlertCounts: Boolean): String = {
    val rows = Seq(
      Seq("Timestamp", p.timestamp),
      Seq("Row count", p.rowCount.toString),
      Seq("Columns", p.completeness.size.toString),
      Seq("Duplicate rows", p.duplicateCount.toString)) ++
      (if (withAlertCounts && p.anomalies.nonEmpty)
         Seq(Seq("Anomalies detected", p.anomalies.size.toString)) else Nil) ++
      (if (withAlertCounts && p.schemaShifts.nonEmpty)
         Seq(Seq("Schema shifts", p.schemaShifts.size.toString)) else Nil)
    table(Seq("Metric" -> false, "Value" -> false), rows, showHeader = false)
  }

  /** profile.py:122-147. */
  def minimal(p: TableProfile): String =
    panel(s"Profile Summary: ${p.table}") + basicStats(p, withAlertCounts = true)

  /** profile.py:149-247: completeness sorted by NULL %% descending
    * (ties by column name for a deterministic order), then anomalies
    * (Type/Description/Severity) and schema shifts
    * (Type/Column/Description). */
  def default(p: TableProfile): String = {
    val sb = new StringBuilder
    sb.append(panel(s"Profile Summary: ${p.table}"))
    sb.append(basicStats(p, withAlertCounts = false))
    sb.append("\nColumn Completeness:\n")
    val types = colTypes(p)
    val sorted = p.completeness.toSeq.sortBy { case (c, cc) => (-cc.nullPercentage, c) }
    sb.append(table(
      Seq("Column" -> false, "NULL %" -> true, "Distinct %" -> true, "Type" -> false),
      sorted.map { case (c, cc) =>
        Seq(c, s"${pyNum(cc.nullPercentage)}%", s"${pyNum(cc.distinctPercentage)}%", types(c))
      }))
    if (p.anomalies.nonEmpty) {
      sb.append(s"\nAnomalies Detected (${p.anomalies.size}):\n")
      sb.append(table(
        Seq("Type" -> false, "Description" -> false, "Severity" -> true),
        p.anomalies.map(a => Seq(a.anomalyType, a.description, a.severity))))
    }
    if (p.schemaShifts.nonEmpty) {
      sb.append(s"\nSchema Shifts Detected (${p.schemaShifts.size}):\n")
      sb.append(table(
        Seq("Type" -> false, "Column" -> false, "Description" -> false),
        p.schemaShifts.map(sh => Seq(sh.shiftType, sh.column, sh.description))))
    }
    sb.toString
  }

  /** profile.py:249-455: full completeness (counts + percentages),
    * numeric/text/date stat tables, verbose-only outliers and
    * samples, anomalies with their column, shifts with severity.
    * Stats tables iterate in column-name order (the reference's
    * insertion order is the source column order, which a Map does not
    * preserve — name order keeps the output deterministic). */
  def detailed(p: TableProfile, verbose: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append(panel(s"Detailed Profile: ${p.table}"))
    sb.append(basicStats(p, withAlertCounts = false))
    val types = colTypes(p)
    sb.append("\nColumn Completeness:\n")
    sb.append(table(
      Seq("Column" -> false, "Nulls" -> true, "NULL %" -> true,
        "Distinct" -> true, "Distinct %" -> true, "Type" -> false),
      p.completeness.toSeq.sortBy(_._1).map { case (c, cc) =>
        Seq(c, cc.nulls.toString, s"${pyNum(cc.nullPercentage)}%",
          cc.distinctCount.toString, s"${pyNum(cc.distinctPercentage)}%", types(c))
      }))
    if (p.numericStats.nonEmpty) {
      sb.append("\nNumeric Column Statistics:\n")
      sb.append(table(
        Seq("Column" -> false, "Min" -> true, "Max" -> true,
          "Average" -> true, "Median" -> true, "StdDev" -> true),
        p.numericStats.toSeq.sortBy(_._1).map { case (c, n) =>
          Seq(c, opt(n.min), opt(n.max), fixed(n.avg, 2), fixed(n.median, 2), fixed(n.stdev, 2))
        }))
    }
    if (p.textLengthStats.nonEmpty) {
      sb.append("\nText Column Statistics:\n")
      sb.append(table(
        Seq("Column" -> false, "Min Length" -> true, "Max Length" -> true, "Avg Length" -> true),
        p.textLengthStats.toSeq.sortBy(_._1).map { case (c, t) =>
          Seq(c, opt(t.minLength), opt(t.maxLength), fixed(t.avgLength, 1))
        }))
    }
    if (p.dateStats.nonEmpty) {
      sb.append("\nDate Column Statistics:\n")
      sb.append(table(
        Seq("Column" -> false, "Min Date" -> false, "Max Date" -> false,
          "Distinct Values" -> true, "Date Range (days)" -> true),
        p.dateStats.toSeq.sortBy(_._1).map { case (c, d) =>
          Seq(c, d.minDate.getOrElse("N/A"), d.maxDate.getOrElse("N/A"),
            d.distinctCount.toString, opt(d.dateRangeDays))
        }))
    }
    if (p.outliers.nonEmpty && verbose) {
      sb.append("\nOutliers Detected:\n")
      p.outliers.toSeq.sortBy(_._1).foreach { case (c, vs) =>
        sb.append(s"  $c: ${vs.map(pyNum).mkString(", ")}\n")
      }
    }
    if (p.anomalies.nonEmpty) {
      sb.append(s"\nAnomalies Detected (${p.anomalies.size}):\n")
      sb.append(table(
        Seq("Type" -> false, "Description" -> false, "Column" -> false, "Severity" -> true),
        p.anomalies.map(a =>
          Seq(a.anomalyType, a.description, a.column.getOrElse("-"), a.severity))))
    }
    if (p.schemaShifts.nonEmpty) {
      sb.append(s"\nSchema Shifts Detected (${p.schemaShifts.size}):\n")
      sb.append(table(
        Seq("Type" -> false, "Column" -> false, "Description" -> false, "Severity" -> true),
        p.schemaShifts.map(sh => Seq(sh.shiftType, sh.column, sh.description, sh.severity))))
    }
    if (p.samples.nonEmpty && verbose) {
      sb.append("\nSample Data (first 5 rows):\n")
      val columns = p.samples.head.keys.toSeq.sorted
      sb.append(table(
        columns.map(_ -> false),
        p.samples.take(5).map(row =>
          columns.map(c => row.get(c).flatMap(Option(_)).map(_.toString).getOrElse("")))))
      if (p.samples.size > 5)
        sb.append(s"...and ${p.samples.size - 5} more rows (total: ${p.samples.size})\n")
    }
    sb.toString
  }

  /** validate.py:187-206: rule-type summary before the run — the type
    * is the first `_`-segment of the rule name (`other` when the name
    * has no underscore), counted and listed by descending count.
    * Python's stable sort keeps first-seen insertion order among equal
    * counts; a LinkedHashMap plus Scala's stable sortBy mirrors that. */
  def rulesSummary(rules: Seq[graft.model.ValidationRule]): String = {
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    rules.foreach { r =>
      val t = if (r.name.contains('_')) r.name.takeWhile(_ != '_') else "other"
      counts.update(t, counts.getOrElse(t, 0) + 1)
    }
    s"\nValidation Rules Summary (${rules.size} total):\n" +
      table(Seq("Type" -> false, "Count" -> true),
        counts.toSeq.sortBy(-_._2).map { case (t, c) => Seq(t, c.toString) },
        showHeader = false)
  }

  /** validate.py:209-245: results table — Rule, Status (`✓ PASS` /
    * `✗ FAIL`), Expected and Actual rendered as JSON scalars
    * (`json.dumps` parity via Json.any: strings quoted, None → null,
    * integral floats keep `.0`), Description; an errored rule shows
    * `Error: <message>` in its Actual cell. */
  def validationResults(results: Seq[graft.model.ValidationResult]): String =
    "\nValidation Results:\n" +
      table(
        Seq("Rule" -> false, "Status" -> false, "Expected" -> true,
          "Actual" -> true, "Description" -> false),
        results.map { r =>
          val status = if (r.isValid) "✓ PASS" else "✗ FAIL"
          val actual = r.error.map(e => s"Error: $e")
            .getOrElse(graft.model.Json.any(r.actualValue))
          Seq(r.ruleName, status, graft.model.Json.any(r.expectedValue),
            actual, r.description)
        })

  /** validate.py:169-174: the post-run pass/fail summary line. */
  def validationSummary(results: Seq[graft.model.ValidationResult]): String = {
    val passed = results.count(_.isValid)
    val failed = results.size - passed
    if (failed > 0) s"\nValidation summary: $passed passed, $failed failed\n"
    else s"\nValidation summary: All $passed validations passed!\n"
  }
}
