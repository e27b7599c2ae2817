package graft.config

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Layered configuration with the reference's exact semantics
  * (reference: sparvi/config.py:16-197): built-in defaults ← YAML file
  * (explicit path, else the first existing default location) ←
  * `SPARVI_SECTION_KEY` environment overrides with type coercion
  * (true/false/none, int, float, else string). Warehouse-specific
  * sections collapse into a `spark` section — the engine IS the
  * warehouse.
  */
object Config {

  /** Mirrors DEFAULT_SETTINGS (config.py:16-69) minus remote-warehouse
    * sections, plus the Spark engine knobs. */
  val defaults: Map[String, Any] = Map(
    "default_source" -> "",
    "sample_row_limit" -> 100,
    "history_retention_days" -> 30,
    "log_level" -> "INFO",
    "spark" -> Map(
      "master" -> "local[*]",
      "shuffle_partitions" -> 32,
      "session_timezone" -> "UTC"),
    "validation" -> Map(
      "default_operator" -> "equals",
      "max_rules" -> 100,
      "max_history" -> 50),
    "profiling" -> Map(
      "include_samples" -> false,
      "sample_method" -> "random",
      "anomaly_threshold" -> 3.0,
      "numeric_distribution_buckets" -> 10,
      "text_pattern_detection" -> true),
    // state_store: "default" (Spark's HDFS-backed on-heap provider) or
    // "rocksdb" (off-heap local-SSD state — the 100 TB stream choice);
    // applied by graft.streaming.StateStores.fromConfig.
    "streaming" -> Map(
      "state_store" -> "default"))

  /** Search order for an unspecified config file (config.py:72-78). */
  def userConfigLocations: Seq[String] =
    sys.props.get("user.home").toSeq.flatMap(h =>
      Seq(s"$h/.sparvi/config.yaml", s"$h/.config/sparvi/config.yaml")) ++
      Seq("sparvi.yaml", ".sparvi.yaml")

  private val yamlMapper = new ObjectMapper(new YAMLFactory())

  def load(
      configPath: Option[String] = None,
      env: Map[String, String] = sys.env.toMap): Map[String, Any] = {
    val fromFile = configPath match {
      case Some(p) => readYaml(p)
      case None => userConfigLocations.find(p => Files.exists(Paths.get(p)))
        .map(readYaml).getOrElse(Map.empty)
    }
    overrideFromEnv(deepMerge(defaults, fromFile), env)
  }

  private def readYaml(path: String): Map[String, Any] =
    try {
      val root = yamlMapper.readValue(Files.readString(Paths.get(path)), classOf[Object])
      toScala(root) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty } // config.py warns and continues

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => String.valueOf(k) -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  /** Deep merge: nested maps merge recursively, everything else is
    * replaced by the source value (config.py:127-139). */
  def deepMerge(target: Map[String, Any], source: Map[String, Any]): Map[String, Any] =
    source.foldLeft(target) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(t: Map[_, _]), s: Map[_, _]) =>
          acc.updated(k, deepMerge(
            t.asInstanceOf[Map[String, Any]], s.asInstanceOf[Map[String, Any]]))
        case _ => acc.updated(k, v)
      }
    }

  /** `SPARVI_X=v` → top-level x; `SPARVI_SECTION_KEY_PART=v` →
    * section.key_part (config.py:142-168). */
  def overrideFromEnv(config: Map[String, Any], env: Map[String, String]): Map[String, Any] =
    env.toSeq.filter(_._1.startsWith("SPARVI_")).sortBy(_._1)
      .foldLeft(config) { case (acc, (name, value)) =>
        name.stripPrefix("SPARVI_").split("_").toSeq match {
          case Seq(single) => acc.updated(single.toLowerCase, parseEnvValue(value))
          case section +: rest if rest.nonEmpty =>
            val sec = section.toLowerCase
            val key = rest.map(_.toLowerCase).mkString("_")
            val current = acc.get(sec) match {
              case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
              case _ => Map.empty[String, Any]
            }
            acc.updated(sec, current.updated(key, parseEnvValue(value)))
          case _ => acc
        }
      }

  /** Type coercion of env strings (config.py:171-197). */
  def parseEnvValue(value: String): Any = value.toLowerCase match {
    case "true" => true
    case "false" => false
    case "none" => null
    case _ =>
      try Integer.parseInt(value)
      catch {
        case _: NumberFormatException =>
          try java.lang.Double.parseDouble(value)
          catch { case _: NumberFormatException => value }
      }
  }

  // ---- typed dotted-path getters --------------------------------------

  def getAny(config: Map[String, Any], path: String): Option[Any] =
    path.split("\\.").toSeq.foldLeft(Option[Any](config)) {
      case (Some(m: Map[_, _]), k) => m.asInstanceOf[Map[String, Any]].get(k)
      case _ => None
    }

  def getString(config: Map[String, Any], path: String): Option[String] =
    getAny(config, path).map(String.valueOf)

  def getInt(config: Map[String, Any], path: String): Option[Int] =
    getAny(config, path).collect {
      case i: Int => i
      case l: Long => l.toInt
      case d: Double => d.toInt
      case s: String => s.toInt
    }

  def getDouble(config: Map[String, Any], path: String): Option[Double] =
    getAny(config, path).collect {
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: Double => d
      case s: String => s.toDouble
    }

  def getBoolean(config: Map[String, Any], path: String): Option[Boolean] =
    getAny(config, path).collect {
      case b: Boolean => b
      case s: String => s.equalsIgnoreCase("true")
    }
}
