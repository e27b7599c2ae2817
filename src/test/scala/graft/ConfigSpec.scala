package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.config.Config

/** Layered-config semantics pinned to the reference
  * (sparvi/config.py:16-197). */
class ConfigSpec extends AnyFunSuite with Matchers {

  test("defaults carry the reference's knobs") {
    val c = Config.load(None, env = Map.empty)
    Config.getInt(c, "sample_row_limit") shouldBe Some(100)
    Config.getInt(c, "history_retention_days") shouldBe Some(30)
    Config.getDouble(c, "profiling.anomaly_threshold") shouldBe Some(3.0)
    Config.getInt(c, "validation.max_rules") shouldBe Some(100)
    Config.getString(c, "validation.default_operator") shouldBe Some("equals")
    Config.getBoolean(c, "profiling.include_samples") shouldBe Some(false)
  }

  test("yaml file deep-merges over defaults without clobbering sections") {
    val f = Files.createTempFile("cfg", ".yaml")
    Files.writeString(f,
      """sample_row_limit: 25
        |profiling:
        |  anomaly_threshold: 2.5
        |""".stripMargin)
    val c = Config.load(Some(f.toString), env = Map.empty)
    Config.getInt(c, "sample_row_limit") shouldBe Some(25)
    Config.getDouble(c, "profiling.anomaly_threshold") shouldBe Some(2.5)
    // untouched sibling keys survive the merge
    Config.getInt(c, "profiling.numeric_distribution_buckets") shouldBe Some(10)
  }

  test("env overrides: SPARVI_SECTION_KEY with type coercion") {
    val c = Config.load(None, env = Map(
      "SPARVI_VALIDATION_MAX_RULES" -> "7",
      "SPARVI_PROFILING_ANOMALY_THRESHOLD" -> "2.0",
      "SPARVI_PROFILING_INCLUDE_SAMPLES" -> "true",
      "SPARVI_LOG" -> "debug",
      "OTHER_VAR" -> "ignored"))
    Config.getInt(c, "validation.max_rules") shouldBe Some(7)
    Config.getDouble(c, "profiling.anomaly_threshold") shouldBe Some(2.0)
    Config.getBoolean(c, "profiling.include_samples") shouldBe Some(true)
    Config.getString(c, "log") shouldBe Some("debug") // single part → top level
    Config.getAny(c, "other") shouldBe None
  }

  test("env value coercion: bool/none/int/float/string") {
    Config.parseEnvValue("true") shouldBe true
    Config.parseEnvValue("False") shouldBe false
    (Config.parseEnvValue("none") == null) shouldBe true
    Config.parseEnvValue("42") shouldBe 42
    Config.parseEnvValue("2.5") shouldBe 2.5
    Config.parseEnvValue("hello") shouldBe "hello"
  }

  test("env beats yaml beats defaults") {
    val f = Files.createTempFile("cfg", ".yaml")
    Files.writeString(f, "sample_row_limit: 25\n")
    val c = Config.load(Some(f.toString),
      env = Map("SPARVI_SAMPLE_ROW_LIMIT" -> "5"))
    // Multi-part top-level key: SPARVI_SAMPLE_ROW_LIMIT parses as
    // section "sample" key "row_limit" per the reference's split rule.
    Config.getInt(c, "sample.row_limit") shouldBe Some(5)
    Config.getInt(c, "sample_row_limit") shouldBe Some(25) // yaml wins over default
  }

  test("unreadable config file degrades to defaults (reference warns + continues)") {
    val c = Config.load(Some("/nonexistent/path.yaml"), env = Map.empty)
    Config.getInt(c, "sample_row_limit") shouldBe Some(100)
  }
}
