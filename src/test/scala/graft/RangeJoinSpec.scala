package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.join.RangeJoin

/** Range-join semantics: half-open intervals, binned ≡ broadcast ≡
  * naive, bin-boundary edge cases, and the fan-out cap. */
class RangeJoinSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val ranges = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 0.0, 10.0),
      ("b", 10.0, 25.0),  // adjacent to a: 10.0 belongs to b only
      ("c", 20.0, 30.0),  // overlaps b: points in [20, 25) match both
      ("d", 100.0, 101.0) // nothing lands here
    ).toDF("range_id", "lo", "hi")
  }

  private lazy val points = {
    val s = spark
    import s.implicits._
    Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 22.0), (5L, 29.999),
      (6L, 30.0), (7L, 55.5)).toDF("pid", "p")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("pid", "range_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private val expected = Set(
    1L -> "a", 2L -> "a", // [0, 10)
    3L -> "b",            // boundary 10.0: half-open — b, not a
    4L -> "b", 4L -> "c", // overlap region
    5L -> "c")            // 6 (= hi) and 7 (uncovered) match nothing

  test("broadcastRangeJoin matches half-open [lo, hi) intervals") {
    pairs(RangeJoin.broadcastRangeJoin(points, "p", ranges, "lo", "hi")) shouldBe expected
  }

  test("binnedRangeJoin agrees with the broadcast plan on every boundary") {
    for (w <- Seq(1.0, 3.0, 7.5, 10.0, 200.0))
      withClue(s"binWidth=$w: ") {
        pairs(RangeJoin.binnedRangeJoin(points, "p", ranges, "lo", "hi",
          binWidth = w)) shouldBe expected
      }
  }

  test("binnedRangeJoin never duplicates a (point, range) pair") {
    val out = RangeJoin.binnedRangeJoin(points, "p", ranges, "lo", "hi", binWidth = 3.0)
    out.count() shouldBe out.select("pid", "range_id").distinct().count()
  }

  test("a point exactly at an interval's exclusive end never matches it") {
    val s = spark
    import s.implicits._
    // [0, 10) with binWidth 5: the point at 10.0 shares hi's bin as a
    // candidate but the exact [lo, hi) recheck rejects it.
    val r = Seq(("a", 0.0, 10.0)).toDF("range_id", "lo", "hi")
    val p = Seq((1L, 10.0)).toDF("pid", "p")
    RangeJoin.binnedRangeJoin(p, "p", r, "lo", "hi", binWidth = 5.0).count() shouldBe 0L
  }

  test("binnedRangeJoin fails loudly when an interval exceeds the fan-out cap") {
    val e = intercept[Exception] {
      RangeJoin.binnedRangeJoin(points, "p", ranges, "lo", "hi",
        binWidth = 0.01, maxBinsPerRange = 100).count()
    }
    e.getMessage should include("maxBinsPerRange")
  }

  test("intervalOverlapJoin matches the naive overlap filter exactly, no duplicates") {
    val s = spark
    import s.implicits._
    val a = Seq(("a1", 0.0, 10.0), ("a2", 9.0, 12.0), ("a3", 20.0, 21.0),
      ("a4", 0.0, 100.0)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq(("b1", 5.0, 9.5), ("b2", 10.0, 15.0), ("b3", 21.0, 25.0))
      .toDF("b_id", "b_lo", "b_hi")
    val naive = a.crossJoin(b)
      .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select("a_id", "b_id").collect().map(_.toSeq).toList
    for (w <- Seq(1.0, 3.0, 10.0, 500.0)) withClue(s"binWidth=$w: ") {
      val out = RangeJoin.intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
          binWidth = w)
        .select("a_id", "b_id").collect().map(_.toSeq).toList
      // list (not set) compare: binning must not duplicate any pair
      out.sortBy(_.toString) shouldBe naive.sortBy(_.toString)
    }
    // a4 spans every b: wide intervals still pair exactly once each.
    naive.count(_.head == "a4") shouldBe 3
  }

  test("intervalOverlapJoin: touching endpoints (aHi == bLo) do not overlap") {
    val s = spark
    import s.implicits._
    val a = Seq(("a1", 0.0, 10.0)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq(("b1", 10.0, 20.0)).toDF("b_id", "b_lo", "b_hi")
    RangeJoin.intervalOverlapJoin(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
      binWidth = 5.0).count() shouldBe 0L
  }

  test("degenerate empty-interval rows (lo >= hi) match nothing") {
    val s = spark
    import s.implicits._
    val r = Seq(("z", 5.0, 5.0)).toDF("range_id", "lo", "hi")
    RangeJoin.binnedRangeJoin(points, "p", r, "lo", "hi", binWidth = 2.0)
      .count() shouldBe 0L
    RangeJoin.broadcastRangeJoin(points, "p", r, "lo", "hi").count() shouldBe 0L
  }
}
