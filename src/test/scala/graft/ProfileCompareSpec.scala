package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.compare.{Drift, ProfileCompare}
import graft.model._
import graft.profiler.{Profiler, ProfilerConfig}

/** Pins the reference's historical-comparison contract: a row-count
  * change must produce an anomaly of type "row_count" with a severity
  * in {low, medium, high} (reference: tests/test_profiler.py:35-61 —
  * aspirational there, implemented here), plus schema-shift and trend
  * semantics from the CLI renderer contracts (cli/profile.py:210-249).
  */
class ProfileCompareSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def bareProfile(
      table: String = "t",
      ts: String = "2026-01-01T00:00:00Z",
      rowCount: Long = 10,
      duplicateCount: Long = 0,
      completeness: Map[String, ColumnCompleteness] = Map.empty,
      numericStats: Map[String, NumericStats] = Map.empty,
      textLengthStats: Map[String, TextLengthStats] = Map.empty,
      dateStats: Map[String, DateStats] = Map.empty,
      trends: Trends = Trends.empty): TableProfile =
    TableProfile(table, ts, rowCount, duplicateCount, completeness,
      numericStats, Map.empty, textLengthStats, dateStats,
      Map.empty, Map.empty, Nil, Nil, Nil, trends)

  // ---- the reference test's exact scenario ----------------------------
  test("row-count change vs historical profile emits a row_count anomaly") {
    val historical = Profiler.profile(employeesDf, "employees",
      ProfilerConfig(persist = false)).copy(rowCount = 8)
    val current = Profiler.profile(employeesDf, "employees",
      ProfilerConfig(persist = false), historical = Some(historical))
    current.anomalies should not be empty
    val rc = current.anomalies.filter(_.anomalyType == "row_count")
    rc should have size 1
    Set("low", "medium", "high") should contain(rc.head.severity)
  }

  test("identical profiles produce no anomalies") {
    val p = bareProfile()
    ProfileCompare.detectAnomalies(p, p) shouldBe empty
  }

  test("row-count shift below 20% is not anomalous; above is") {
    val hist = bareProfile(rowCount = 100)
    ProfileCompare.detectAnomalies(bareProfile(rowCount = 115), hist) shouldBe empty
    val hit = ProfileCompare.detectAnomalies(bareProfile(rowCount = 130), hist)
    hit.map(_.anomalyType) shouldBe Seq("row_count")
    hit.head.severity shouldBe "medium"
    // >50% is high.
    ProfileCompare.detectAnomalies(bareProfile(rowCount = 200), hist)
      .head.severity shouldBe "high"
  }

  test("null-rate jump emits a column-tagged null_rate anomaly") {
    val hist = bareProfile(completeness = Map("c" -> ColumnCompleteness(0, 1.0, 5, 50)))
    val cur = bareProfile(completeness = Map("c" -> ColumnCompleteness(3, 31.0, 5, 50)))
    val a = ProfileCompare.detectAnomalies(cur, hist)
    a.map(_.anomalyType) shouldBe Seq("null_rate")
    a.head.column shouldBe Some("c")
    a.head.severity shouldBe "high" // 30pp > 20pp
  }

  test("mean shift beyond threshold·σ emits numeric_mean anomaly") {
    def stats(avg: Double, stdev: Double) = NumericStats(
      Some(0), Some(1), Some(avg), Some(1), Some(stdev), None, None, None)
    val hist = bareProfile(numericStats = Map("x" -> stats(100, 1)))
    val small = bareProfile(numericStats = Map("x" -> stats(102, 1)))
    ProfileCompare.detectAnomalies(small, hist) shouldBe empty // 2σ < 3σ
    val big = bareProfile(numericStats = Map("x" -> stats(104, 1)))
    val a = ProfileCompare.detectAnomalies(big, hist)
    a.map(_.anomalyType) shouldBe Seq("numeric_mean")
    a.head.column shouldBe Some("x")
  }

  // ---- schema shifts ---------------------------------------------------
  test("added/removed/type-changed columns are all detected") {
    val hist = bareProfile(
      completeness = Map(
        "stays" -> ColumnCompleteness(0, 0, 1, 1),
        "goes" -> ColumnCompleteness(0, 0, 1, 1),
        "flips" -> ColumnCompleteness(0, 0, 1, 1)),
      numericStats = Map("flips" -> NumericStats(None, None, None, None, None, None, None, None)))
    val cur = bareProfile(
      completeness = Map(
        "stays" -> ColumnCompleteness(0, 0, 1, 1),
        "arrives" -> ColumnCompleteness(0, 0, 1, 1),
        "flips" -> ColumnCompleteness(0, 0, 1, 1)),
      textLengthStats = Map("flips" -> TextLengthStats(None, None, None)))
    val shifts = ProfileCompare.detectSchemaShifts(cur, hist)
    shifts.map(s => (s.shiftType, s.column)).toSet shouldBe Set(
      ("column_added", "arrives"),
      ("column_removed", "goes"),
      ("type_changed", "flips"))
    shifts.find(_.column == "goes").get.severity shouldBe "high"
  }

  test("no shifts for identical schemas") {
    val p = bareProfile(completeness = Map("a" -> ColumnCompleteness(0, 0, 1, 1)))
    ProfileCompare.detectSchemaShifts(p, p) shouldBe empty
  }

  // ---- trends ----------------------------------------------------------
  test("trends accumulate across three runs without duplicating points") {
    val p1 = bareProfile(ts = "t1", rowCount = 10)
    val p2 = bareProfile(ts = "t2", rowCount = 12)
    val p3 = bareProfile(ts = "t3", rowCount = 15)
    val t2 = ProfileCompare.appendTrends(Trends.empty, p1, p2)
    t2.rowCounts.map(_.timestamp) shouldBe Seq("t1", "t2")
    val t3 = ProfileCompare.appendTrends(t2, p2, p3)
    t3.rowCounts.map(_.timestamp) shouldBe Seq("t1", "t2", "t3")
    t3.rowCounts.map(_.value) shouldBe Seq(10.0, 12.0, 15.0)
  }

  test("trends: a corrected observation at the same timestamp replaces the point") {
    val p1 = bareProfile(ts = "t1", rowCount = 10)
    val p2 = bareProfile(ts = "t2", rowCount = 12)
    val t2 = ProfileCompare.appendTrends(Trends.empty, p1, p2)
    // Re-run of t2 with a corrected count: point is replaced, not
    // duplicated and not silently dropped.
    val p2fixed = bareProfile(ts = "t2", rowCount = 13)
    val t2b = ProfileCompare.appendTrends(t2, p1, p2fixed)
    t2b.rowCounts.map(_.timestamp) shouldBe Seq("t1", "t2")
    t2b.rowCounts.last.value shouldBe 13.0
  }

  test("trends: series are truncated to maxHistory newest points") {
    val prior = Trends(
      rowCounts = (1 to 8).map(i => TrendPoint(f"2026-01-0${i}T00:00:00Z", i.toDouble)),
      nullRates = Map.empty, duplicates = Nil)
    val t = ProfileCompare.appendTrends(prior,
      bareProfile(ts = "2026-01-09T00:00:00Z", rowCount = 9),
      bareProfile(ts = "2026-01-10T00:00:00Z", rowCount = 10),
      maxHistory = 4)
    t.rowCounts should have size 4
    t.rowCounts.map(_.value) shouldBe Seq(7.0, 8.0, 9.0, 10.0)
  }

  test("trends: points older than the retention window are pruned") {
    val prior = Trends(
      rowCounts = Seq(
        TrendPoint("2026-01-01T00:00:00Z", 1.0),   // 40 days before current
        TrendPoint("2026-02-01T00:00:00Z", 2.0)),  // 9 days before current
      nullRates = Map.empty, duplicates = Nil)
    val t = ProfileCompare.appendTrends(prior,
      bareProfile(ts = "2026-02-09T00:00:00Z", rowCount = 3),
      bareProfile(ts = "2026-02-10T00:00:00Z", rowCount = 4),
      historyRetentionDays = 30)
    t.rowCounts.map(_.value) shouldBe Seq(2.0, 3.0, 4.0)
  }

  test("trends: non-ISO timestamps skip age pruning but still truncate") {
    val prior = Trends(
      rowCounts = (1 to 6).map(i => TrendPoint(s"t$i", i.toDouble)),
      nullRates = Map.empty, duplicates = Nil)
    val t = ProfileCompare.appendTrends(prior,
      bareProfile(ts = "t7", rowCount = 7), bareProfile(ts = "t8", rowCount = 8),
      maxHistory = 3)
    t.rowCounts.map(_.value) shouldBe Seq(6.0, 7.0, 8.0)
  }

  test("null-rate trends keep series for columns absent from one profile") {
    val histC = Map("a" -> ColumnCompleteness(1, 10.0, 1, 1))
    val curC = Map("b" -> ColumnCompleteness(2, 20.0, 1, 1))
    val t = ProfileCompare.appendTrends(Trends.empty,
      bareProfile(ts = "t1", completeness = histC),
      bareProfile(ts = "t2", completeness = curC))
    t.nullRates.keySet shouldBe Set("a", "b")
    t.nullRates("a").map(_.value) shouldBe Seq(10.0)
    t.nullRates("b").map(_.value) shouldBe Seq(20.0)
  }

  test("binnedDrift: identical halves ≈ 0 PSI, a shift scores, spine complete, constant ref safe") {
    import graft.compare.Drift
    val s = spark
    import s.implicits._
    val vals = (0 until 1000).map(i => i.toDouble % 100)
    val ref = vals.toDF("v")
    // Identical distribution → every bin matches, PSI total ~0, KS 0.
    val same = Drift.binnedDrift(ref, ref, "v", numBins = 10).collect()
    same should have length 10
    same.map(_.getAs[Double]("psi_term")).sum shouldBe 0.0 +- 1e-9
    same.map(_.getAs[Double]("cum_gap")).max shouldBe 0.0 +- 1e-9
    // A +30 shift empties the low bins and overflows the top bin:
    // PSI total well past the 0.25 "shifted" threshold, KS gap ≈ the
    // shifted mass share.
    val cur = vals.map(_ + 30.0).toDF("v")
    val drift = Drift.binnedDrift(ref, cur, "v", numBins = 10).collect()
    drift should have length 10 // spine keeps emptied bins visible
    drift.map(_.getAs[Double]("psi_term")).sum should be > 0.25
    drift.map(_.getAs[Double]("cum_gap")).max shouldBe 0.3 +- 0.02
    // Out-of-range current mass clamps into the top bin.
    drift.find(_.getAs[Int]("bin") == 9).get
      .getAs[Double]("cur_share") should be > 0.3
    // Constant reference: width 0 → everything in bin 0, no NaN.
    val const = Seq.fill(5)(7.0).toDF("v")
    val c = Drift.binnedDrift(const, ref, "v", numBins = 10).collect()
    c.find(_.getAs[Int]("bin") == 0).get.getAs[Double]("cur_share") shouldBe 1.0 +- 1e-9
    c.foreach(r => r.getAs[Double]("psi_term").isNaN shouldBe false)
  }

  test("categoryDrift: added/removed/shared statuses and the TVD total") {
    import graft.compare.Drift
    val s = spark
    import s.implicits._
    val ref = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("gone")).toDF("v")
    val cur = (Seq.fill(3)("a") ++ Seq.fill(6)("b") ++ Seq.fill(1)("new")).toDF("v")
    val out = Drift.categoryDrift(ref, cur, "v").collect()
      .map(r => r.getString(0) -> r).toMap
    out("a").getAs[String]("status") shouldBe "shared"
    out("new").getAs[String]("status") shouldBe "added"
    out("gone").getAs[String]("status") shouldBe "removed"
    out("new").getAs[Long]("ref_n") shouldBe 0L
    // TVD: shares ref (.6,.3,.1,0) vs cur (.3,.6,0,.1) → ½(0.3+0.3+0.1+0.1) = 0.4
    out.values.map(_.getAs[Double]("tvd_term")).sum shouldBe 0.4 +- 1e-9
    // Identical snapshots → zero drift, all shared.
    val same = Drift.categoryDrift(ref, ref, "v").collect()
    same.map(_.getAs[Double]("tvd_term")).sum shouldBe 0.0 +- 1e-12
    same.forall(_.getAs[String]("status") == "shared") shouldBe true
  }

  test("ksStatistic: hand-computed gap, identical → 0, empty side → nulls, shift detected") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val ref = Seq(1.0, 2.0, 3.0).toDF("v")
    val cur = Seq(3.0, 4.0).toDF("v")
    // F_ref at {1,2,3,4} = 1/3, 2/3, 1, 1; F_cur = 0, 0, 1/2, 1 →
    // gaps .333, .667, .5, 0 → ks 2/3 at v=2
    val r = Drift.ksStatistic(ref, cur, "v").head()
    r.getDouble(0) shouldBe (2.0 / 3.0 +- 1e-12)
    r.getDouble(1) shouldBe 2.0
    r.getLong(2) shouldBe 3L
    r.getLong(3) shouldBe 2L

    val same = Drift.ksStatistic(ref, ref, "v").head()
    same.getDouble(0) shouldBe 0.0
    same.getDouble(1) shouldBe 1.0 // smallest value attains the (zero) max

    val empty = Drift.ksStatistic(ref, Seq.empty[Double].toDF("v"), "v").head()
    empty.isNullAt(0) shouldBe true
    empty.getLong(3) shouldBe 0L

    // a location shift on a bigger sample is clearly detected and the
    // result is stable across recomputation (determinism)
    val a = s.range(2000).select((col("id") % 97).cast("double").as("v"))
    val b = s.range(2000).select((col("id") % 97 + 25).cast("double").as("v"))
    val shift = Drift.ksStatistic(a, b, "v").head()
    shift.getDouble(0) should be > 0.2
    Drift.ksStatistic(a, b, "v").head().toSeq shouldBe shift.toSeq
  }
}
