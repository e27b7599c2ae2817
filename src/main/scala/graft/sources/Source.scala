package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source resolution: the engine-side replacement for the reference's
  * connection-manager factory (reference:
  * sparvi/db/connection.py:266-305) and env fallback
  * (sparvi/utils/env.py:88-112). There is no remote warehouse — a
  * "connection" resolves to a DataFrame read.
  *
  * Spec grammar (URL-prefix dispatch mirroring the reference's):
  *   - `parquet:/path`            → spark.read.parquet
  *   - `csv:/path`                → spark.read.csv (header + inferSchema)
  *   - `json:/path`               → spark.read.json
  *   - `orc:/path`                → spark.read.orc
  *   - `delta:/path`              → format("delta") (if the runtime has it)
  *   - `jdbc:<url>::<table>`      → spark.read.jdbc
  *   - `table:<name>` / bare name → spark.table(name)
  *   - a bare path ending in .parquet/.csv/.json/.orc → by extension
  *
  * Env fallback (reference precedence: explicit arg, then
  * DATABASE_URL): explicit spec, then `SPARVI_SOURCE`.
  */
sealed trait Source {
  def load(spark: SparkSession): DataFrame
}

object Source {

  final case class Parquet(path: String) extends Source {
    def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
  }
  final case class Csv(path: String) extends Source {
    def load(spark: SparkSession): DataFrame =
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
  }
  final case class JsonSrc(path: String) extends Source {
    def load(spark: SparkSession): DataFrame = spark.read.json(path)
  }
  final case class Orc(path: String) extends Source {
    def load(spark: SparkSession): DataFrame = spark.read.orc(path)
  }
  final case class Delta(path: String) extends Source {
    def load(spark: SparkSession): DataFrame = spark.read.format("delta").load(path)
  }
  final case class Jdbc(url: String, table: String) extends Source {
    def load(spark: SparkSession): DataFrame =
      spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
  }
  final case class CatalogTable(name: String) extends Source {
    def load(spark: SparkSession): DataFrame = spark.table(name)
  }

  def parse(spec0: String): Source = {
    val spec = Option(spec0).map(_.trim).filter(_.nonEmpty)
      .orElse(sys.env.get("SPARVI_SOURCE"))
      .getOrElse(throw new IllegalArgumentException(
        "No source specified and SPARVI_SOURCE is not set"))
    spec match {
      case s if s.startsWith("parquet:") => Parquet(s.stripPrefix("parquet:"))
      case s if s.startsWith("csv:") => Csv(s.stripPrefix("csv:"))
      case s if s.startsWith("json:") => JsonSrc(s.stripPrefix("json:"))
      case s if s.startsWith("orc:") => Orc(s.stripPrefix("orc:"))
      case s if s.startsWith("delta:") => Delta(s.stripPrefix("delta:"))
      case s if s.startsWith("jdbc:") =>
        s.split("::", 2) match {
          case Array(url, table) => Jdbc(url, table)
          case _ => throw new IllegalArgumentException(
            s"jdbc source must be jdbc:<url>::<table>, got: $s")
        }
      case s if s.startsWith("table:") => CatalogTable(s.stripPrefix("table:"))
      case s if s.endsWith(".parquet") => Parquet(s)
      case s if s.endsWith(".csv") => Csv(s)
      case s if s.endsWith(".json") => JsonSrc(s)
      case s if s.endsWith(".orc") => Orc(s)
      case s => CatalogTable(s)
    }
  }

  /** Load and register as a temp view so rule SQL can address the
    * table by name (the Spark analogue of the reference's
    * warehouse-table-by-name model). */
  def loadAsView(spark: SparkSession, spec: String, viewName: String): DataFrame = {
    val df = parse(spec).load(spark)
    df.createOrReplaceTempView(viewName)
    df
  }
}
