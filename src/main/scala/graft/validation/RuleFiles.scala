package graft.validation

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.{YAMLFactory, YAMLGenerator}

import graft.model.ValidationRule

/** YAML/JSON rule-file I/O with the reference's exact accepted shapes
  * and defaulting semantics (reference:
  * sparvi/validations/validator.py:11-64, export :142-167):
  *   - a file may contain a bare list of rules or `{rules: [...]}`;
  *   - `name` and `query` are required, error if missing;
  *   - defaults: description = "Validation rule: <name>",
  *     operator = "equals", expected_value = 0;
  *   - export wraps as `{rules: [...]}` in YAML or JSON.
  *
  * Jackson (core + dataformat-yaml, on Spark's classpath) replaces
  * PyYAML/json.
  */
object RuleFiles {

  private val jsonMapper = new ObjectMapper()
  private val yamlMapper = new ObjectMapper(
    new YAMLFactory().disable(YAMLGenerator.Feature.WRITE_DOC_START_MARKER))

  def load(filePath: String): Seq[ValidationRule] = {
    val path = Paths.get(filePath)
    require(Files.exists(path), s"File not found: $path")
    val lower = filePath.toLowerCase
    val mapper =
      if (lower.endsWith(".yaml") || lower.endsWith(".yml")) yamlMapper
      else if (lower.endsWith(".json")) jsonMapper
      else throw new IllegalArgumentException(
        s"Unsupported file format: $filePath. Use .yaml, .yml, or .json")
    val root = mapper.readValue(Files.readString(path), classOf[Object])
    fromParsed(root)
  }

  /** Accepts the already-parsed structure (list, or map with "rules"). */
  def fromParsed(root: Object): Seq[ValidationRule] = {
    val rules: Seq[Any] = root match {
      case l: java.util.List[_] => l.asScala.toSeq
      case m: java.util.Map[_, _] if m.containsKey("rules") =>
        m.asInstanceOf[java.util.Map[String, Object]]
          .get("rules").asInstanceOf[java.util.List[_]].asScala.toSeq
      case _ => throw new IllegalArgumentException(
        "Invalid rule file format. Expected a list of rules or a dict with a 'rules' key")
    }
    rules.map {
      case m: java.util.Map[_, _] =>
        val rule = m.asInstanceOf[java.util.Map[String, Object]].asScala
        val missing = Seq("name", "query").filterNot(rule.contains)
        if (missing.nonEmpty)
          throw new IllegalArgumentException(
            s"Rule is missing required fields: ${missing.mkString(", ")}")
        val name = rule("name").toString
        ValidationRule(
          name = name,
          description = rule.get("description").map(_.toString)
            .getOrElse(s"Validation rule: $name"),
          query = rule("query").toString,
          operator = rule.get("operator").map(_.toString).getOrElse("equals"),
          expectedValue = normalizeExpected(rule.get("expected_value").orNull))
      case other => throw new IllegalArgumentException(s"Invalid rule entry: $other")
    }
  }

  private def normalizeExpected(v: Object): Any = v match {
    case null => 0
    case l: java.util.List[_] => l.asScala.toSeq.map(x => x: Any)
    case other => other
  }

  def export(rules: Seq[ValidationRule], filePath: String, format: String = "yaml"): Unit = {
    val mapper = format.toLowerCase match {
      case "yaml" => yamlMapper
      case "json" => jsonMapper
      case other => throw new IllegalArgumentException(
        s"Unsupported format: $other. Use 'yaml' or 'json'")
    }
    val doc = Map("rules" -> rules.map { r =>
      java.util.Map.of(
        "name", r.name.asInstanceOf[Object],
        "description", r.description.asInstanceOf[Object],
        "query", r.query.asInstanceOf[Object],
        "operator", r.operator.asInstanceOf[Object],
        "expected_value", boxExpected(r.expectedValue))
    }.asJava).asJava
    val path: Path = Paths.get(filePath)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.writeString(path,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(doc))
    ()
  }

  private def boxExpected(v: Any): Object = v match {
    case s: Seq[_] => s.map(boxExpected).asJava
    case i: Int => Integer.valueOf(i)
    case l: Long => java.lang.Long.valueOf(l)
    case d: Double => java.lang.Double.valueOf(d)
    case b: Boolean => java.lang.Boolean.valueOf(b)
    case o: Object => o
    case other => String.valueOf(other)
  }
}
