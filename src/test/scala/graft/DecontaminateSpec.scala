package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.dedup.Decontaminate

/** Unit tests for benchmark decontamination (token n-gram overlap
  * between a small benchmark set and the corpus). */
class DecontaminateSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def frame(cols: (String, String), rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF(cols._1, cols._2)
  }

  private def corpus(rows: (Long, String)*) = frame(("doc_id", "text"), rows: _*)
  private def bench(rows: (Long, String)*) = frame(("q_id", "q_text"), rows: _*)

  // A 12-token document; the benchmark quotes its middle 8 tokens.
  private val host =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
  private val quoted = "charlie delta echo foxtrot golf hotel india juliet"

  test("gramKeys: distinct n-gram posting list, short docs collapse") {
    val g = Decontaminate.gramKeys(
      corpus((1L, "a b c d"), (2L, "x y"), (3L, "a b c d")), "doc_id", "text",
      gramSize = 3, hashMode = "md5")
    g.columns.toSeq shouldBe Seq("id", "gram")
    val byId = g.collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    byId shouldBe Map(1L -> 2, 2L -> 1, 3L -> 2) // "a b c","b c d"; whole-text
    // Identical docs produce identical gram keys.
    g.groupBy("gram").count().filter(col("count") === 2).count() shouldBe 2L
  }

  test("contaminationReport: finds the quoting document, exact fraction") {
    val c = corpus((10L, host), (11L, "zulu yankee xray whiskey victor uniform tango sierra"))
    val b = bench((100L, quoted))
    val rep = Decontaminate.contaminationReport(
      c, "doc_id", "text", b, "q_id", "q_text",
      gramSize = 4, minOverlap = 0.5, hashMode = "md5")
    val rows = rep.collect()
    rows should have length 1
    val r = rows.head
    r.getLong(0) shouldBe 10L       // corpus_id
    r.getLong(1) shouldBe 100L      // bench_id
    r.getLong(2) shouldBe 5L        // shared: all 5 4-grams of the quote
    r.getLong(3) shouldBe 5L        // bench_grams
    r.getDouble(4) shouldBe 1.0     // overlap_frac
  }

  test("minOverlap thresholds on the FULL bench gram count") {
    // Bench example: 8 tokens = 5 4-grams; corpus doc contains only the
    // first 5 tokens → shares 2 of 5 grams = 0.4.
    val c = corpus((1L, "charlie delta echo foxtrot golf zulu yankee xray"))
    val b = bench((9L, quoted))
    def rep(th: Double) = Decontaminate.contaminationReport(
      c, "doc_id", "text", b, "q_id", "q_text",
      gramSize = 4, minOverlap = th, hashMode = "md5")
    rep(0.5).count() shouldBe 0L
    val r = rep(0.3).collect().head
    r.getLong(2) shouldBe 2L
    r.getDouble(4) shouldBe 0.4
  }

  test("bench-df cap prunes shared boilerplate; denominator keeps it; audit names it") {
    // Every bench example starts with the same 4-token preamble → its
    // whole-preamble gram has bench_df = 3 > cap = 2.
    val pre = "please answer the following"
    val b = bench(
      (1L, s"$pre $quoted"),
      (2L, s"$pre zulu yankee xray whiskey"),
      (3L, s"$pre victor uniform tango sierra"))
    val c = corpus((10L, host))
    val audit = Decontaminate.cappedBenchGrams(
      b, "q_id", "q_text", gramSize = 4, maxBenchGramDf = 2, hashMode = "md5")
    audit.count() shouldBe 1L // exactly the preamble gram
    audit.collect().head.getLong(1) shouldBe 3L
    // Example 1 has 9 grams (12 tokens); doc 10 contains the 5 grams
    // fully inside the quote but none of the preamble/straddle grams.
    val rep = Decontaminate.contaminationReport(
      c, "doc_id", "text", b, "q_id", "q_text",
      gramSize = 4, minOverlap = 0.5, maxBenchGramDf = 2, hashMode = "md5")
    val r = rep.collect()
    r should have length 1
    r.head.getLong(2) shouldBe 5L
    r.head.getLong(3) shouldBe 9L   // full count, not the capped count
    r.head.getDouble(4) shouldBe math.rint(5.0 / 9.0 * 10000) / 10000
  }

  test("xxhash64 and md5 modes agree on the report (keys differ)") {
    val c = corpus((10L, host), (11L, "unrelated words entirely here today"))
    val b = bench((5L, quoted))
    def run(mode: String) = Decontaminate.contaminationReport(
        c, "doc_id", "text", b, "q_id", "q_text",
        gramSize = 4, minOverlap = 0.5, hashMode = mode)
      .orderBy("corpus_id", "bench_id").collect().toSeq
    run("xxhash64") shouldBe run("md5")
  }

  test("decontaminate drops exactly the contaminated corpus rows") {
    val c = corpus((10L, host), (11L, "zulu yankee xray whiskey victor uniform"), (12L, host + " extra tail"))
    val b = bench((1L, quoted))
    val kept = Decontaminate.decontaminate(
      c, "doc_id", "text", b, "q_id", "q_text",
      gramSize = 4, minOverlap = 0.9, hashMode = "md5")
    kept.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(11L)
    kept.columns.toSeq shouldBe c.columns.toSeq
  }

  test("null corpus text and empty benchmark are safe") {
    val s = spark
    import s.implicits._
    val c = Seq((1L, Option("alpha bravo charlie delta")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val b = bench()
    Decontaminate.contaminationReport(
      c, "doc_id", "text", b, "q_id", "q_text", gramSize = 2).count() shouldBe 0L
    Decontaminate.decontaminate(
      c, "doc_id", "text", b, "q_id", "q_text", gramSize = 2).count() shouldBe 2L
  }

  test("FromGrams variants validate the posting-list shape") {
    val bad = corpus((1L, "a b c"))
    an[IllegalArgumentException] should be thrownBy
      Decontaminate.contaminationReportFromGrams(bad, bad)
    an[IllegalArgumentException] should be thrownBy
      Decontaminate.cappedBenchGramsFromGrams(bad)
  }
}
