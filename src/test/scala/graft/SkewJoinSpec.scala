package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.join.SkewJoin

/** Salted-join semantics: result-identical to the plain join, salt
  * spread actually happens, and the plan joins on (key, salt). */
class SkewJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val (big, small) = {
    val s = spark
    import s.implicits._
    // 90% of the big side lands on key 1 — the skew shape.
    val big = (1 to 200).map(i => (i.toLong, if (i <= 180) 1L else (i % 10).toLong, i * 1.0))
      .toDF("row_id", "k", "v")
    val small = (0L to 9L).map(k => (k, s"dim_$k")).toDF("k", "label")
    (big, small)
  }

  test("salted join returns exactly the plain join's rows") {
    val plain = big.join(small, Seq("k")).select("row_id", "k", "label")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), "row_id", saltFactor = 4)
      .select("row_id", "k", "label").collect().map(_.toSeq).toSet
    salted shouldBe plain
    salted.size shouldBe 200 // no dup, no loss
  }

  test("the hot key's rows spread over multiple salt values") {
    val s = spark
    import s.implicits._
    val salts = big.filter(col("k") === 1L)
      .withColumn("salt", pmod(xxhash64(col("row_id")), lit(4L)))
      .select(countDistinct(col("salt"))).head().getLong(0)
    salts should be > 1L
  }

  test("the physical join keys include the salt column") {
    val plan = SkewJoin.saltedJoin(big, small, Seq("k"), "row_id", saltFactor = 4)
      .queryExecution.executedPlan.toString
    plan should include("__salt")
    plan should not include "CartesianProduct"
  }

  test("saltFactor below 2 is rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), "row_id", saltFactor = 1)
    }
  }

  test("skewReport surfaces the hot key with its share, ties broken by key") {
    val out = SkewJoin.skewReport(big, "k", topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.head._1 shouldBe 1L // the 90% key
    out.head._2 shouldBe 182L // 180 skewed + rows 181 & 191 hit k=1 via i%10
    out.head._3 shouldBe (182.0 / 200.0) +- 1e-12
    out.map(_._2).toSeq shouldBe out.map(_._2).sorted.reverse // descending
  }

  test("skewReport counts nulls as a key") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), None, None, None).toDF("k")
    val top = SkewJoin.skewReport(df, "k", topK = 1).head()
    top.isNullAt(0) shouldBe true
    top.getLong(1) shouldBe 3L
  }

  test("skewReport releases its internal cache before returning") {
    val s = spark
    import s.implicits._
    // The grouped counts persist only for the report's own lifetime;
    // a leaked cache would pin key-cardinality-sized blocks in
    // executor storage on every call in a long-lived session. Compare
    // against the pre-call census: other suites may legitimately hold
    // caches on the shared session.
    val before = s.sparkContext.getPersistentRDDs.size
    SkewJoin.skewReport(big, "k", topK = 3).collect()
    s.sparkContext.getPersistentRDDs.size shouldBe before
  }
}
