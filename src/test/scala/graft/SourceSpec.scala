package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Source

/** Source-factory dispatch and round trips through real readers. */
class SourceSpec extends AnyFunSuite with Matchers with SparkTestBase {

  test("spec prefixes dispatch to the right source type") {
    Source.parse("parquet:/data/x") shouldBe Source.Parquet("/data/x")
    Source.parse("csv:/data/x.csv") shouldBe Source.Csv("/data/x.csv")
    Source.parse("json:/d/x") shouldBe Source.JsonSrc("/d/x")
    Source.parse("orc:/d/x") shouldBe Source.Orc("/d/x")
    Source.parse("delta:/d/t") shouldBe Source.Delta("/d/t")
    // A JDBC spec is the JDBC url itself (they already start jdbc:).
    Source.parse("jdbc:postgresql://h/db::tbl") shouldBe
      Source.Jdbc("jdbc:postgresql://h/db", "tbl")
    Source.parse("table:my_table") shouldBe Source.CatalogTable("my_table")
  }

  test("bare paths dispatch by extension; bare names become tables") {
    Source.parse("/data/t.parquet") shouldBe Source.Parquet("/data/t.parquet")
    Source.parse("/data/t.csv") shouldBe Source.Csv("/data/t.csv")
    Source.parse("orders") shouldBe Source.CatalogTable("orders")
  }

  test("malformed jdbc spec raises") {
    an[IllegalArgumentException] should be thrownBy Source.parse("jdbc:no-table-part")
  }

  test("empty spec without SPARVI_SOURCE raises") {
    an[IllegalArgumentException] should be thrownBy Source.parse("")
    an[IllegalArgumentException] should be thrownBy Source.parse(null)
  }

  test("parquet source loads the fixture and registers a view") {
    val df = Source.loadAsView(spark,
      "parquet:/root/testdata/sf0.001/region.parquet", "region_v")
    df.count() should be > 0L
    spark.sql("SELECT COUNT(*) FROM region_v").head().getLong(0) shouldBe df.count()
  }

  test("csv and json sources round-trip a written DataFrame") {
    val dir = Files.createTempDirectory("src_rt")
    dir.toFile.deleteOnExit()
    val out = employeesDf.select("id", "name", "department")
    out.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    out.write.mode("overwrite").json(s"$dir/json")
    Source.parse(s"csv:$dir/csv").load(spark).count() shouldBe 10L
    Source.parse(s"json:$dir/json").load(spark).count() shouldBe 10L
    // csv inferSchema restores the numeric id column.
    Source.parse(s"csv:$dir/csv").load(spark).schema("id").dataType.typeName should
      (equal("integer") or equal("long"))
  }

  test("orc source round-trips") {
    val dir = Files.createTempDirectory("src_orc")
    dir.toFile.deleteOnExit()
    employeesDf.write.mode("overwrite").orc(s"$dir/orc")
    Source.parse(s"orc:$dir/orc").load(spark).count() shouldBe 10L
  }

  test("jdbc source loads, profiles, and validates an embedded Derby table") {
    // The live-warehouse path (reference: tests/test_db.py:58-219)
    // exercised without a warehouse: embedded Derby (on the Spark
    // classpath) through the exact spark.read.jdbc codepath a
    // Postgres/Snowflake URL takes.
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE employees (id INT NOT NULL, name VARCHAR(32), salary DOUBLE)")
      (1 to 8).foreach(i => st.executeUpdate(
        s"INSERT INTO employees VALUES ($i, 'emp$i', ${i * 1000.0})"))
      st.executeUpdate("INSERT INTO employees VALUES (9, NULL, NULL)")
      st.close()
    } finally conn.close()

    Source.parse(s"$url::employees") shouldBe Source.Jdbc(url, "employees")
    val df = Source.loadAsView(spark, s"$url::employees", "jdbc_employees")
    df.count() shouldBe 9L
    // JDBC type mapping survives the round trip (Derby upper-cases).
    df.schema.fieldNames.map(_.toLowerCase).sorted shouldBe Array("id", "name", "salary")

    // Profile through the engine, as the reference's live-DB test does.
    val profile = graft.profiler.Profiler.profile(df, "jdbc_employees")
    profile.rowCount shouldBe 9L
    val nameComp = profile.completeness
      .collectFirst { case (k, v) if k.equalsIgnoreCase("name") => v }.get
    nameComp.nulls shouldBe 1L

    // And validate over the registered view (scalar SQL rule).
    val results = graft.validation.Validator.run(spark, Seq(
      graft.model.ValidationRule(
        name = "jdbc_min_rows",
        description = "at least 5 employees",
        query = "SELECT COUNT(*) FROM jdbc_employees",
        operator = ">=", expectedValue = 5)))
    results should have size 1
    results.head.isValid shouldBe true
  }
}
