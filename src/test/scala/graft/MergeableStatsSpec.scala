package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profiler.MergeableStats

/** Mergeable numeric profiles: split-then-merge must reproduce the
  * whole-table statistics exactly (to float rounding), including the
  * degenerate split shapes (empty, single-value). */
class MergeableStatsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val data = {
    val s = spark
    import s.implicits._
    (1 to 1000).map(i => (i.toLong, i * 0.5, if (i % 10 == 0) None else Some(i * 2.0)))
      .toDF("k", "a", "b")
  }

  private def wholeStats(colName: String): (Long, Double, Double, Double, Double) = {
    val r = data.agg(count(col(colName)), avg(col(colName)), stddev_samp(col(colName)),
      min(col(colName)).cast("double"), max(col(colName)).cast("double")).collect().head
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("merging 4 disjoint split summaries reproduces whole-table stats") {
    val splits = (0 until 4).map(k =>
      MergeableStats.numericSummary(data.filter(pmod(col("k"), lit(4)) === k), Seq("a", "b")))
    val merged = MergeableStats.merge(splits.reduce(_ unionAll _))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    for (c <- Seq("a", "b")) {
      val (n, mean, sd, mn, mx) = wholeStats(c)
      val (n2, mean2, sd2, mn2, mx2) = merged(c)
      withClue(c) {
        n2 shouldBe n
        mean2 shouldBe mean +- 1e-9
        sd2 shouldBe sd +- 1e-9
        mn2 shouldBe mn
        mx2 shouldBe mx
      }
    }
  }

  test("an empty split is a merge identity") {
    val whole = MergeableStats.numericSummary(data, Seq("a"))
    val empty = MergeableStats.numericSummary(data.filter(lit(false)), Seq("a"))
    val merged = MergeableStats.merge(whole.unionAll(empty)).collect().head
    val (n, mean, sd, _, _) = wholeStats("a")
    merged.getLong(1) shouldBe n
    merged.getDouble(2) shouldBe mean +- 1e-9
    merged.getDouble(3) shouldBe sd +- 1e-9
  }

  test("single-value splits merge with M2 = 0, not null") {
    val s = spark
    import s.implicits._
    val one = Seq((1L, 5.0)).toDF("k", "a")
    val two = Seq((2L, 7.0)).toDF("k", "a")
    val merged = MergeableStats.merge(
      MergeableStats.numericSummary(one, Seq("a"))
        .unionAll(MergeableStats.numericSummary(two, Seq("a")))).collect().head
    merged.getLong(1) shouldBe 2L
    merged.getDouble(2) shouldBe 6.0 +- 1e-12
    // stddev_samp of {5, 7} = sqrt(2)
    merged.getDouble(3) shouldBe math.sqrt(2.0) +- 1e-12
  }
}
