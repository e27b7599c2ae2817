package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.events.Events

/** Batch event analytics: gap sessionization boundaries and the
  * strictly-ordered funnel semantics. */
class EventsSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private lazy val log = {
    val s = spark
    import s.implicits._
    Seq(
      // user 1: events at 0, 10, 25 min (gaps 10, 15) then 59 (gap 34 > 30 → new session)
      (1L, ts(0), 1L, "view", 1.0),
      (2L, ts(10), 1L, "click", 2.0),
      (3L, ts(25), 1L, "purchase", 3.0),
      (4L, ts(59), 1L, "view", 4.0),
      // user 2: one event
      (5L, ts(5), 2L, "click", 10.0),
      // user 3: purchase BEFORE view/click — reaches view only
      (6L, ts(1), 3L, "purchase", 0.5),
      (7L, ts(2), 3L, "view", 0.5),
      (8L, ts(3), 3L, "click", 0.5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("sessionize breaks on gaps strictly greater than maxGap and aggregates per session") {
    val out = Events.sessionize(log, "user_id", "ts",
        maxGapSeconds = 1800, valueCol = "value", tiebreakCol = "event_id")
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r.getDouble(5)))
    out shouldBe Array(
      (1L, 0L, ts(0), ts(25), 3L, 6.0),
      (1L, 1L, ts(59), ts(59), 1L, 4.0),
      (2L, 0L, ts(5), ts(5), 1L, 10.0),
      (3L, 0L, ts(1), ts(3), 3L, 1.5))
  }

  test("sessionize keeps a gap exactly equal to maxGap in one session") {
    val s = spark
    import s.implicits._
    val twoEvents = Seq((1L, ts(0), 9L, "view", 1.0), (2L, ts(30), 9L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    Events.sessionize(twoEvents, "user_id", "ts",
      maxGapSeconds = 1800, valueCol = "value", tiebreakCol = "event_id")
      .count() shouldBe 1L
  }

  test("sessionWindows: native semantics — exact gap merges (adjacent windows), end = last + gap") {
    val s = spark
    import s.implicits._
    // gaps: exactly 30 min (adjacent windows MERGE), 30m01s (breaks)
    val log3 = Seq((1L, ts(0), 7L, "view", 1.0), (2L, ts(30), 7L, "view", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 01:00:01"), 7L, "view", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionWindows(log3, "user_id", "ts", "30 minutes", "value")
      .orderBy("session_start").collect()
      .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
    out shouldBe Array(
      (ts(0), Timestamp.valueOf("2024-01-01 01:00:00"), 2L, 3.0), // [0, 30] closes at 30+30
      (Timestamp.valueOf("2024-01-01 01:00:01"),
        Timestamp.valueOf("2024-01-01 01:30:01"), 1L, 4.0))
  }

  test("funnel counts stages only when reached strictly in order") {
    val out = Events.funnel(log, "user_id", "ts", "event_type",
        stages = Seq("view", "click", "purchase"), tiebreakCol = "event_id")
      .orderBy("stage_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // user 1: view→click→purchase in order (all 3 stages)
    // user 2: click only, never a view → no stage at all
    // user 3: purchase precedes view+click → view and click, NOT purchase
    out shouldBe Array((0L, "view", 2L), (1L, "click", 2L), (2L, "purchase", 1L))
  }

  test("funnel stage-k events before stage k-1 never count") {
    val s = spark
    import s.implicits._
    // click at the SAME timestamp as the view, earlier event_id order →
    // strictly-before frame excludes it; click after does count.
    val sameTs = Seq(
      (1L, ts(0), 1L, "click", 0.0),
      (2L, ts(0), 1L, "view", 0.0),
      (3L, ts(1), 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnel(sameTs, "user_id", "ts", "event_type",
        stages = Seq("view", "click"), tiebreakCol = "event_id")
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    out shouldBe Array(("view", 1L), ("click", 1L))
  }

  test("funnel conversion window: a stage too long after the prior reach does not count") {
    val s = spark
    import s.implicits._
    // user 1: view at 0, click at 10 min (in a 5-min window? no — 600s
    // > 300s → click must NOT count). user 2: view 0, click 4 min → counts.
    val log = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(10), 1L, "click", 0.0),
      (3L, ts(0), 2L, "view", 0.0),
      (4L, ts(4), 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnel(log, "user_id", "ts", "event_type",
        stages = Seq("view", "click"), tiebreakCol = "event_id",
        maxStepSeconds = Some(300L))
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    out shouldBe Array(("view", 2L), ("click", 1L))
    // Unbounded: both clicks count — and the max-based rewrite must
    // reproduce the original min-based semantics exactly.
    val unbounded = Events.funnel(log, "user_id", "ts", "event_type",
        stages = Seq("view", "click"), tiebreakCol = "event_id")
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    unbounded shouldBe Array(("view", 2L), ("click", 2L))
  }

  test("funnel conversion window measures from the LATEST prior reach, not the first") {
    val s = spark
    import s.implicits._
    // views at 0 and 50 min; click at 52 min. First view is 52 min ago
    // (out of a 5-min window) but the latest is 2 min ago → counts.
    val log = Seq(
      (1L, ts(0), 1L, "view", 0.0),
      (2L, ts(50), 1L, "view", 0.0),
      (3L, ts(52), 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnel(log, "user_id", "ts", "event_type",
        stages = Seq("view", "click"), tiebreakCol = "event_id",
        maxStepSeconds = Some(300L))
      .orderBy("stage_idx").collect().map(r => (r.getString(1), r.getLong(2)))
    out shouldBe Array(("view", 1L), ("click", 1L))
  }

  test("interArrivalStats: exact gaps, single-event entities absent, regular cadence → cv 0") {
    val s = spark
    import s.implicits._
    val log2 = Seq(
      (1L, ts(0), 1L, "view", 0.0),  // user 1: gaps 60 s, 60 s → cv 0
      (2L, ts(1), 1L, "view", 0.0),
      (3L, ts(2), 1L, "view", 0.0),
      (4L, ts(0), 2L, "view", 0.0),  // user 2: gaps 60 s, 540 s → bursty
      (5L, ts(1), 2L, "view", 0.0),
      (6L, ts(10), 2L, "view", 0.0),
      (7L, ts(5), 3L, "view", 0.0)   // user 3: one event → no gaps
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.interArrivalStats(log2, "user_id", "ts", "event_id")
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(5)))
    out.map(_._1).toSeq shouldBe Seq(1L, 2L) // user 3 absent
    out(0) shouldBe ((1L, 2L, 60.0, 0.0))
    out(1)._2 shouldBe 2L
    out(1)._3 shouldBe 300.0
    out(1)._4 should be > 1.0 // bursty
  }

  test("retentionCohorts counts entities by first-activity period and offset") {
    val s = spark
    import s.implicits._
    // periods: day index. u1 starts day 0, active days 0, 1; u2 starts
    // day 0, active day 0 only; u3 starts day 1, active days 1, 2.
    def d(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    val log2 = Seq(
      (1L, d(0), 1L), (2L, d(1), 1L), (3L, d(0), 1L), // dup same-day activity
      (4L, d(0), 2L),
      (5L, d(1), 3L), (6L, d(2), 3L)
    ).toDF("event_id", "ts", "user_id")
    val out = Events.retentionCohorts(log2, "user_id", "ts",
        t => org.apache.spark.sql.functions.dayofmonth(t) - 1)
      .orderBy("cohort_period", "period_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array(
      (0L, 0L, 2L), // u1, u2 in cohort 0
      (0L, 1L, 1L), // only u1 retained at +1
      (1L, 0L, 1L), // u3's cohort
      (1L, 1L, 1L))
  }

  private lazy val asOfLeft = {
    val s = spark
    import s.implicits._
    Seq(
      (100L, 1L, ts(20)), // matches click id 2 (ts 10), not 3 (ts 25)
      (101L, 1L, ts(25)), // equal-ts click 3 matches (<= semantics)
      (102L, 2L, ts(4)),  // user 2's click is at ts 5 → no match yet
      (103L, 4L, ts(30))  // user 4 has no clicks at all
    ).toDF("pid", "user_id", "pts")
  }

  private lazy val asOfRight = {
    val s = spark
    import s.implicits._
    Seq(
      (2L, 1L, ts(10), 2.0),
      (3L, 1L, ts(25), 3.0),
      (5L, 2L, ts(5), 10.0)
    ).toDF("event_id", "user_id", "ts", "value")
  }

  test("asOfJoin attaches the latest right row at-or-before each left timestamp") {
    val out = Events.asOfJoin(asOfLeft, asOfRight, "user_id", "user_id",
        "pts", "ts", rightValueCols = Seq("event_id", "value"),
        rightTiebreakCol = "event_id")
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    out shouldBe Array(
      (100L, Some(2L), Some(2.0)),
      (101L, Some(3L), Some(3.0)),
      (102L, None, None),
      (103L, None, None))
  }

  test("asOfJoin resolves equal right timestamps to the greatest tiebreak") {
    val s = spark
    import s.implicits._
    val right = Seq(
      (9L, 1L, ts(10), 9.0),
      (11L, 1L, ts(10), 11.0) // same ts, higher id wins (numeric, not string, order)
    ).toDF("event_id", "user_id", "ts", "value")
    val left = Seq((100L, 1L, ts(20))).toDF("pid", "user_id", "pts")
    val out = Events.asOfJoin(left, right, "user_id", "user_id", "pts", "ts",
        rightValueCols = Seq("event_id"), rightTiebreakCol = "event_id")
      .collect().map(r => r.getLong(3))
    out shouldBe Array(11L)
  }

  test("asOfJoin tolerance nulls out matches older than the lookback") {
    val out = Events.asOfJoin(asOfLeft, asOfRight, "user_id", "user_id",
        "pts", "ts", rightValueCols = Seq("event_id"),
        rightTiebreakCol = "event_id", toleranceSeconds = Some(300L))
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    // pid 100 at ts 20min: latest click ts 10min = 600s ago > 300s → null;
    // pid 101 at 25min: click at exactly 25min, 0s ago → kept.
    out shouldBe Array((100L, None), (101L, Some(3L)), (102L, None), (103L, None))
  }

  test("asOfJoin forward attaches the earliest right row at-or-after, smallest-id ties") {
    val s = spark
    import s.implicits._
    val right = Seq(
      (9L, 1L, ts(30), 9.0),
      (7L, 1L, ts(30), 7.0), // same ts: smallest id wins forward
      (5L, 1L, ts(10), 5.0)  // in the past: never matches forward
    ).toDF("event_id", "user_id", "ts", "value")
    val left = Seq(
      (100L, 1L, ts(20)), // next right at 30 → id 7
      (101L, 1L, ts(30)), // equal ts qualifies (>= semantics) → id 7
      (102L, 1L, ts(31)), // nothing after
      (103L, 2L, ts(0))   // no rights at all
    ).toDF("pid", "user_id", "pts")
    val out = Events.asOfJoin(left, right, "user_id", "user_id", "pts", "ts",
        rightValueCols = Seq("event_id"), rightTiebreakCol = "event_id",
        direction = "forward")
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    out shouldBe Array(
      (100L, Some(7L)), (101L, Some(7L)), (102L, None), (103L, None))
  }

  test("asOfJoin forward tolerance bounds the lookahead") {
    val s = spark
    import s.implicits._
    val right = Seq((9L, 1L, ts(30), 9.0)).toDF("event_id", "user_id", "ts", "value")
    val left = Seq((100L, 1L, ts(20)), (101L, 1L, ts(28)))
      .toDF("pid", "user_id", "pts")
    val out = Events.asOfJoin(left, right, "user_id", "user_id", "pts", "ts",
        rightValueCols = Seq("event_id"), rightTiebreakCol = "event_id",
        toleranceSeconds = Some(300L), direction = "forward")
      .orderBy("pid").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    // pid 100: next right is 600 s ahead > 300 s → null; pid 101: 120 s → match.
    out shouldBe Array((100L, None), (101L, Some(9L)))
  }

  test("rollingStats computes the trailing ROWS frame per entity") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, ts(0), 1L, 10.0),
      (2L, ts(1), 1L, 20.0),
      (3L, ts(2), 1L, 30.0),
      (4L, ts(3), 1L, 40.0),
      (5L, ts(0), 2L, 5.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Events.rollingStats(df, "user_id", "ts", "value",
        windowRows = 3, tiebreakCol = "event_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    out shouldBe Array(
      (1L, 1L, 10.0, 10.0, 10.0, 10.0),
      (2L, 2L, 30.0, 10.0, 20.0, 15.0),
      (3L, 3L, 60.0, 10.0, 30.0, 20.0),
      (4L, 3L, 90.0, 20.0, 40.0, 30.0), // event 1 fell out of the frame
      (5L, 1L, 5.0, 5.0, 5.0, 5.0))
  }

  test("capPerEntity keeps a deterministic hash-ordered subset; audit names capped entities") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 40L).map(i => (i, if (i <= 30) 1L else 2L, s"e$i"))
      .toDF("event_id", "user_id", "payload")
    val capped = Events.capPerEntity(df, "user_id", cap = 10, idCol = "event_id")
    // Schema passes through unchanged — no internal columns leak.
    capped.columns.toSeq shouldBe df.columns.toSeq
    val byUser = capped.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byUser shouldBe Map(1L -> 10L, 2L -> 10L) // user 2 had 10 — untouched
    // Determinism: the same call keeps the SAME ids (hash order, not
    // arbitrary row order), and they match a hand-derived rank.
    val kept1 = capped.filter(col("user_id") === 1L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val kept2 = Events.capPerEntity(df, "user_id", cap = 10, idCol = "event_id")
      .filter(col("user_id") === 1L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    kept1.toSeq shouldBe kept2.toSeq
    // A different seed keeps a different (still size-10) subset.
    val kept3 = Events.capPerEntity(df, "user_id", cap = 10, idCol = "event_id", seed = 7L)
      .filter(col("user_id") === 1L)
      .select("event_id").collect().map(_.getLong(0)).sorted
    kept3.length shouldBe 10
    assert(kept3.toSeq != kept1.toSeq,
      "a different seed must keep a different subset")
    val audit = Events.cappedEntities(df, "user_id", cap = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    audit.toSeq shouldBe Seq(1L -> 30L) // only the truncated entity, true count
  }

  test("capPerEntity md5 mode matches an externally-replayable rank") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 20L).map(i => (i, 1L)).toDF("event_id", "user_id")
    val kept = Events.capPerEntity(df, "user_id", cap = 5, idCol = "event_id",
        hashMode = "md5")
      .select("event_id").collect().map(_.getLong(0)).toSet
    // Replay the md5 uniform hash on the driver: first 8 hex digits of
    // md5("42:" + id) over 2^32, rank by (u, id), keep 5.
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"42:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expected = (1L to 20L).sortBy(id => (u(id), id)).take(5).toSet
    kept shouldBe expected
  }
}
