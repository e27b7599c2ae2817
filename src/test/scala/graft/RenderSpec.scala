package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.cli.Render
import graft.model._

/** Byte-level golden tests for every CLI renderer. Each expected
  * output lives in `src/test/resources/render/<name>.txt`; any drift
  * in layout, alignment, number shapes, or section order fails the
  * corresponding test with a unified diff of the first divergence.
  *
  * The goldens were authored from output hand-checked section-by-
  * section against the reference renderers
  * (sparvi/cli/profile.py:122-455, cli/validate.py:169-245). To
  * regenerate after an INTENTIONAL format change:
  * `GOLDEN_UPDATE=1 sbt "testOnly graft.RenderSpec"`, then re-verify
  * and commit the changed files.
  */
class RenderSpec extends AnyFunSuite with Matchers {

  private val goldenDir = Paths.get("src/test/resources/render")
  private val update = sys.env.contains("GOLDEN_UPDATE")

  private def checkGolden(name: String, actual: String): Unit = {
    val path = goldenDir.resolve(s"$name.txt")
    if (update) {
      Files.createDirectories(goldenDir)
      Files.write(path, actual.getBytes(StandardCharsets.UTF_8))
    }
    withClue(s"golden file $path (GOLDEN_UPDATE=1 regenerates): ") {
      val expected = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      if (actual != expected) {
        val aLines = actual.linesIterator.toSeq
        val eLines = expected.linesIterator.toSeq
        val firstDiff = aLines.zipAll(eLines, "<missing>", "<missing>")
          .indexWhere { case (a, e) => a != e }
        // Equal line sequences but unequal strings = trailing
        // whitespace/newline drift (e.g. an editor's final-newline
        // setting touched the golden file); say so instead of
        // reporting a meaningless line 0.
        if (firstDiff == -1)
          fail(s"output differs only in trailing whitespace/newlines " +
            s"(actual ${actual.length} chars vs expected ${expected.length})")
        else
          fail(s"output drifted at line ${firstDiff + 1}:\n" +
            s"  expected: ${eLines.lift(firstDiff).getOrElse("<missing>")}\n" +
            s"  actual:   ${aLines.lift(firstDiff).getOrElse("<missing>")}")
      }
    }
  }

  // ---- Fixture: exercises every rendered section — all four column
  // type buckets, a NULL%-sort tie (name/score at 2.0%, broken by
  // column name), missing stats (score StdDev → N/A), verbose-only
  // outliers and samples (with a null cell and a 6th overflow row),
  // anomalies with and without a column, and schema shifts.
  private val profile = TableProfile(
    table = "users",
    timestamp = "2026-08-12T00:00:00",
    rowCount = 1000L,
    duplicateCount = 7L,
    completeness = Map(
      "id" -> ColumnCompleteness(0L, 0.0, 1000L, 100.0),
      "name" -> ColumnCompleteness(20L, 2.0, 950L, 95.0),
      "score" -> ColumnCompleteness(20L, 2.0, 412L, 41.2),
      "signup" -> ColumnCompleteness(5L, 0.5, 365L, 36.5),
      "blob" -> ColumnCompleteness(0L, 0.0, 3L, 0.3)),
    numericStats = Map(
      "id" -> NumericStats(Some(1.0), Some(1000.0), Some(500.5), Some(500500.0),
        Some(288.82), Some(250.75), Some(500.5), Some(750.25)),
      "score" -> NumericStats(Some(-3.5), Some(120.0), Some(51.27), None,
        None, Some(25.0), Some(50.0), Some(75.0))),
    textPatterns = Map.empty,
    textLengthStats = Map(
      "name" -> TextLengthStats(Some(2L), Some(31L), Some(11.46))),
    dateStats = Map(
      "signup" -> DateStats(Some("2024-01-01"), Some("2024-12-30"), 365L, Some(364L))),
    frequentValues = Map.empty,
    outliers = Map("score" -> Seq(99.5, 120.0)),
    samples = Seq(
      Map[String, Any]("id" -> 1L, "name" -> "alice", "score" -> 12.5),
      Map[String, Any]("id" -> 2L, "name" -> null, "score" -> 99.0),
      Map[String, Any]("id" -> 3L, "name" -> "carol", "score" -> 7.25),
      Map[String, Any]("id" -> 4L, "name" -> "dan", "score" -> 64.0),
      Map[String, Any]("id" -> 5L, "name" -> "erin", "score" -> 33.1),
      Map[String, Any]("id" -> 6L, "name" -> "frank", "score" -> 2.0)),
    anomalies = Seq(
      Anomaly("row_count", "Row count dropped by 50%", "high", None),
      Anomaly("null_rate", "Null rate of name rose from 0% to 2%", "medium", Some("name"))),
    schemaShifts = Seq(
      SchemaShift("column_added", "blob", "Column blob was added", "info")),
    trends = Trends.empty)

  // Rule names hit the type-extraction paths: two `not_*`, one
  // `unique_*`, and an underscore-free name → "other"; counts tie
  // between unique and other, preserving first-seen order.
  private val rules = Seq(
    ValidationRule("not_null_id", "", "SELECT 1", "equals", 0),
    ValidationRule("unique_id", "", "SELECT 1", "equals", 0),
    ValidationRule("not_null_name", "", "SELECT 1", "equals", 0),
    ValidationRule("rowcount", "", "SELECT 1", "greater_than", 0))

  // Pass, fail, float shapes (255.5 / 31.0), and the error branch
  // (actual cell becomes `Error: <message>`; string expected value
  // renders JSON-quoted).
  private val results = Seq(
    ValidationResult("not_null_id", isValid = true, 0L, 0,
      "Check id has no NULLs", None),
    ValidationResult("unique_id", isValid = false, 3L, 0,
      "Check id is unique", None),
    ValidationResult("max_name_len", isValid = true, 31.0, 255.5,
      "Check name fits", None),
    ValidationResult("bad_query", isValid = false, null, "n/a",
      "Broken rule", Some("TABLE_OR_VIEW_NOT_FOUND")))

  test("minimal profile format matches golden") {
    checkGolden("profile_minimal", Render.minimal(profile))
  }

  test("default profile format matches golden") {
    checkGolden("profile_default", Render.default(profile))
  }

  test("detailed profile format matches golden") {
    checkGolden("profile_detailed", Render.detailed(profile))
  }

  test("detailed verbose profile format matches golden") {
    checkGolden("profile_detailed_verbose", Render.detailed(profile, verbose = true))
  }

  test("rules summary matches golden") {
    checkGolden("rules_summary", Render.rulesSummary(rules))
  }

  test("validation results table matches golden") {
    checkGolden("validation_results", Render.validationResults(results))
  }

  test("validation summary lines (mixed and all-pass)") {
    Render.validationSummary(results) shouldBe
      "\nValidation summary: 2 passed, 2 failed\n"
    Render.validationSummary(results.filter(_.isValid)) shouldBe
      "\nValidation summary: All 2 validations passed!\n"
  }
}
