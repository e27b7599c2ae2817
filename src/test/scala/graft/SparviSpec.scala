package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.{TableMeta, ValidationRule}

/** The public facade — the reference's four Python entry points
  * (reference: sparvi/__init__.py:22-32) — exercised end-to-end. */
class SparviSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val regionSrc = "parquet:/root/testdata/sf0.001/region.parquet"

  test("profileTable loads a source, registers the view, and profiles it") {
    val p = Sparvi.profileTable(spark, regionSrc, "region_facade")
    p.table shouldBe "region_facade"
    p.rowCount should be > 0L
    // The temp view is registered for rule SQL.
    spark.sql("SELECT COUNT(*) FROM region_facade").head().getLong(0) shouldBe p.rowCount
  }

  test("profileDataFrame profiles an in-memory frame") {
    val p = Sparvi.profileDataFrame(spark, productsDf, "products")
    p.rowCount shouldBe 5L
    p.numericStats("price").min shouldBe Some(-1.0)
  }

  test("getDefaultValidations + runValidations close the loop") {
    productsDf.createOrReplaceTempView("products")
    val rules = Sparvi.getDefaultValidations(spark, "products",
      TableMeta(primaryKey = Seq("product_id")))
    rules should not be empty
    val results = Sparvi.runValidations(spark, rules)
    results.size shouldBe rules.size
    results.find(_.ruleName == "check_price_positive").get.isValid shouldBe false
  }

  test("loadRulesFromFile feeds runValidations") {
    productsDf.createOrReplaceTempView("products")
    val f = java.nio.file.Files.createTempFile("facade_rules", ".yaml")
    java.nio.file.Files.writeString(f,
      """- name: has_products
        |  query: SELECT COUNT(*) FROM products
        |  operator: greater_than
        |  expected_value: 0
        |""".stripMargin)
    val rules = Sparvi.loadRulesFromFile(f.toString)
    rules shouldBe Seq(ValidationRule("has_products", "Validation rule: has_products",
      "SELECT COUNT(*) FROM products", "greater_than", 0))
    Sparvi.runValidations(spark, rules).head.isValid shouldBe true
  }
}
