package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.ValidationRule
import graft.validation.RuleFiles

/** Rule-file I/O round trips against the reference's accepted shapes
  * and defaulting semantics (reference:
  * sparvi/validations/validator.py:11-64, my_rules.yaml at repo root).
  */
class RuleFilesSpec extends AnyFunSuite with Matchers {

  private def tmp(suffix: String, content: String): String = {
    val f = Files.createTempFile("rules", suffix)
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("loads a bare YAML list of rules") {
    val path = tmp(".yaml",
      """- name: check_not_empty
        |  description: Table has rows
        |  query: SELECT COUNT(*) FROM t
        |  operator: greater_than
        |  expected_value: 0
        |- name: check_salary_positive
        |  query: SELECT COUNT(*) FROM t WHERE salary < 0
        |""".stripMargin)
    val rules = RuleFiles.load(path)
    rules should have size 2
    rules.head shouldBe ValidationRule("check_not_empty", "Table has rows",
      "SELECT COUNT(*) FROM t", "greater_than", 0)
  }

  test("loads the {rules: [...]} wrapper shape (my_rules.yaml style)") {
    val path = tmp(".yml",
      """rules:
        |  - name: check_id_unique
        |    query: SELECT COUNT(*) FROM (SELECT id FROM t GROUP BY id HAVING COUNT(*) > 1) d
        |    operator: equals
        |    expected_value: 0
        |""".stripMargin)
    val rules = RuleFiles.load(path)
    rules.map(_.name) shouldBe Seq("check_id_unique")
  }

  test("defaulting: missing description/operator/expected_value") {
    val path = tmp(".json",
      """[{"name": "r1", "query": "SELECT 1"}]""")
    val r = RuleFiles.load(path).head
    r.description shouldBe "Validation rule: r1"
    r.operator shouldBe "equals"
    r.expectedValue shouldBe 0
  }

  test("between expected_value list survives the round trip as a Seq") {
    val path = tmp(".json",
      """[{"name": "r", "query": "SELECT avg(x) FROM t",
        |  "operator": "between", "expected_value": [1, 50]}]""".stripMargin)
    val r = RuleFiles.load(path).head
    r.expectedValue shouldBe a[Seq[_]]
    r.expectedValue.asInstanceOf[Seq[Any]].map(_.toString) shouldBe Seq("1", "50")
  }

  test("missing required fields raise with the field names") {
    val path = tmp(".yaml", "- name: incomplete\n  operator: equals\n")
    val e = the[IllegalArgumentException] thrownBy RuleFiles.load(path)
    e.getMessage should include("query")
  }

  test("invalid root shape raises") {
    val path = tmp(".json", """{"not_rules": []}""")
    an[IllegalArgumentException] should be thrownBy RuleFiles.load(path)
  }

  test("unsupported extension raises") {
    val path = tmp(".txt", "whatever")
    an[IllegalArgumentException] should be thrownBy RuleFiles.load(path)
  }

  test("export(yaml) → load round trip preserves every field") {
    val rules = Seq(
      ValidationRule("a", "desc a", "SELECT 1", "equals", 1),
      ValidationRule("b", "desc b", "SELECT avg(x) FROM t", "between", Seq(1, 10)))
    val out = Files.createTempFile("rules_out", ".yaml").toString
    RuleFiles.export(rules, out, "yaml")
    val loaded = RuleFiles.load(out)
    loaded.map(_.name) shouldBe Seq("a", "b")
    loaded.map(_.operator) shouldBe Seq("equals", "between")
    loaded(1).expectedValue.asInstanceOf[Seq[Any]].map(_.toString) shouldBe Seq("1", "10")
  }

  test("export(json) → load round trip") {
    val rules = Seq(ValidationRule("j", "d", "SELECT 2", "less_than", 5))
    val out = Files.createTempFile("rules_out", ".json").toString
    RuleFiles.export(rules, out, "json")
    RuleFiles.load(out) shouldBe rules.map(_.copy(expectedValue = 5))
  }

  test("the reference's live my_rules.yaml loads with 7 rules") {
    val ref = "/root/reference/my_rules.yaml"
    assume(Files.exists(java.nio.file.Paths.get(ref)))
    val rules = RuleFiles.load(ref)
    rules should have size 7
    rules.map(_.name) should contain("check_employees_not_empty")
  }
}
