package graft.compare

import graft.model._

/** Historical-comparison logic: anomaly detection, schema-shift
  * detection, and trend accumulation.
  *
  * The reference DECLARES these but ships stubs returning empty lists
  * (reference: sparvi/profiler/profile_engine.py:437-447). The intended
  * behavior is specified by its test
  * (tests/test_profiler.py:35-61 — a row-count change must emit an
  * anomaly of type "row_count"), the CLI renderers
  * (cli/profile.py:210-249, 385-435 — fields type/description/column/
  * severity with severity in {low, medium, high}), and the row-growth
  * default rule's 20% threshold
  * (sparvi/validations/default_validations.py:76-100). This module
  * implements that specification. Pure driver-side arithmetic over two
  * profile documents — no Spark job.
  */
object ProfileCompare {

  /** Severity from a relative delta: >50% high, >20% medium, else low. */
  private def severityOf(relDelta: Double): String =
    if (relDelta > 0.5) "high" else if (relDelta > 0.2) "medium" else "low"

  def detectAnomalies(
      current: TableProfile,
      historical: TableProfile,
      sigmaThreshold: Double = 3.0): Seq[Anomaly] = {
    val out = Seq.newBuilder[Anomaly]

    // Row-count shift (> 20% — mirrors the row_growth rule family D3).
    if (historical.rowCount > 0) {
      val rel = math.abs(current.rowCount - historical.rowCount).toDouble / historical.rowCount
      if (rel > 0.2) out += Anomaly(
        anomalyType = "row_count",
        description = s"Row count changed from ${historical.rowCount} to ${current.rowCount} " +
          f"(${rel * 100}%.1f%%)",
        severity = severityOf(rel),
        column = None)
    } else if (current.rowCount != historical.rowCount) {
      out += Anomaly("row_count",
        s"Row count changed from ${historical.rowCount} to ${current.rowCount}",
        "high", None)
    }

    // Duplicate-count shift.
    if (current.duplicateCount != historical.duplicateCount) {
      val base = math.max(historical.duplicateCount, 1L).toDouble
      val rel = math.abs(current.duplicateCount - historical.duplicateCount) / base
      if (rel > 0.2) out += Anomaly("duplicate_count",
        s"Duplicate rows changed from ${historical.duplicateCount} to ${current.duplicateCount}",
        severityOf(rel), None)
    }

    // Null-rate shifts per column (absolute percentage-point delta).
    for ((col, cur) <- current.completeness; hist <- historical.completeness.get(col)) {
      val delta = math.abs(cur.nullPercentage - hist.nullPercentage)
      if (delta > 5.0) out += Anomaly(
        anomalyType = "null_rate",
        description = f"Null rate for $col changed from ${hist.nullPercentage}%.2f%% " +
          f"to ${cur.nullPercentage}%.2f%%",
        severity = if (delta > 20) "high" else if (delta > 10) "medium" else "low",
        column = Some(col))
    }

    // Mean shifts per numeric column: |Δmean| > threshold × historical σ
    // (threshold = config anomaly_threshold, reference config.py:66).
    for {
      (col, cur) <- current.numericStats
      hist <- historical.numericStats.get(col)
      cm <- cur.avg; hm <- hist.avg
    } {
      val scale = hist.stdev.filter(_ > 0)
        .getOrElse(math.max(math.abs(hm), 1e-9) * 0.1)
      val shift = math.abs(cm - hm) / scale
      if (shift > sigmaThreshold) out += Anomaly(
        anomalyType = "numeric_mean",
        description = f"Mean of $col shifted from $hm%.4f to $cm%.4f (${shift}%.1f σ)",
        severity = if (shift > 2 * sigmaThreshold) "high" else "medium",
        column = Some(col))
    }

    out.result()
  }

  def detectSchemaShifts(
      current: TableProfile,
      historical: TableProfile): Seq[SchemaShift] = {
    val curCols = current.completeness.keySet
    val histCols = historical.completeness.keySet
    val added = (curCols -- histCols).toSeq.sorted.map { c =>
      SchemaShift("column_added", c, s"Column $c was added", "medium")
    }
    val removed = (histCols -- curCols).toSeq.sorted.map { c =>
      SchemaShift("column_removed", c, s"Column $c was removed", "high")
    }
    // Type changes are inferred from bucket membership transitions
    // (a column moving between numeric/text/date stat maps).
    def bucketOf(p: TableProfile, c: String): String =
      if (p.numericStats.contains(c)) "numeric"
      else if (p.dateStats.contains(c)) "date"
      else if (p.textLengthStats.contains(c)) "text"
      else "other"
    val typeChanged = (curCols intersect histCols).toSeq.sorted.flatMap { c =>
      val (cb, hb) = (bucketOf(current, c), bucketOf(historical, c))
      if (cb != hb)
        Some(SchemaShift("type_changed", c, s"Column $c changed type: $hb -> $cb", "high"))
      else None
    }
    added ++ removed ++ typeChanged
  }

  /** Append the historical profile's point AND the current profile's
    * own observation to the trend series (populates the reference's
    * empty scaffold, profile_engine.py:449-454). Null-rate series keys
    * are the union of prior series, historical columns, and current
    * columns — a column absent from one profile keeps its history.
    *
    * The historical profile's trends already end with its own point
    * (appended as "current" in the prior run), so a point is only
    * appended when the series does not already end at that timestamp —
    * otherwise every intermediate observation would duplicate from the
    * third run onward. A same-timestamp point with a DIFFERENT value
    * (a corrected re-run) replaces the stale point instead of being
    * silently dropped. */
  def appendTrends(prior: Trends, historical: TableProfile, current: TableProfile,
      maxHistory: Int = 50, historyRetentionDays: Int = 30): Trends = {
    def appendOnce(series: Seq[TrendPoint], p: TrendPoint): Seq[TrendPoint] =
      series.indexWhere(_.timestamp == p.timestamp) match {
        case -1 => series :+ p
        case i => if (series(i).value == p.value) series else series.updated(i, p)
      }
    // Enforce the reference's history caps (config.py:19-20,56-60):
    // age-prune against the CURRENT profile's timestamp (not wall
    // clock, so replays are deterministic), then keep the newest
    // `maxHistory` points. Unparseable timestamps survive age pruning.
    val cutoff: Option[java.time.Instant] =
      try Some(java.time.Instant.parse(current.timestamp)
        .minus(java.time.Duration.ofDays(historyRetentionDays.toLong)))
      catch { case _: Exception => None }
    def cap(series: Seq[TrendPoint]): Seq[TrendPoint] = {
      val aged = cutoff match {
        case Some(cut) => series.filter { p =>
          try !java.time.Instant.parse(p.timestamp).isBefore(cut)
          catch { case _: Exception => true }
        }
        case None => series
      }
      aged.takeRight(math.max(maxHistory, 1))
    }
    def pointsFor(c: String): Seq[TrendPoint] = {
      val base = prior.nullRates.getOrElse(c, Nil)
      val withHist = historical.completeness.get(c)
        .map(comp => appendOnce(base, TrendPoint(historical.timestamp, comp.nullPercentage)))
        .getOrElse(base)
      current.completeness.get(c)
        .map(comp => appendOnce(withHist, TrendPoint(current.timestamp, comp.nullPercentage)))
        .getOrElse(withHist)
    }
    val cols = prior.nullRates.keySet ++ historical.completeness.keySet ++ current.completeness.keySet
    Trends(
      rowCounts = cap(appendOnce(
        appendOnce(prior.rowCounts, TrendPoint(historical.timestamp, historical.rowCount.toDouble)),
        TrendPoint(current.timestamp, current.rowCount.toDouble))),
      nullRates = cols.map(c => c -> cap(pointsFor(c))).toMap,
      duplicates = cap(appendOnce(
        appendOnce(prior.duplicates, TrendPoint(historical.timestamp, historical.duplicateCount.toDouble)),
        TrendPoint(current.timestamp, current.duplicateCount.toDouble))))
  }
}
