package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Unit tests for the bench harness's pure contention math —
  * interpolation, trailing-rate, and starvation predicates. These
  * exist because an interpolation off-by-one (reading a long query's
  * START cpu as "60 s ago") silently disabled starvation detection
  * for exactly the >60 s inflated queries it targets. No Spark
  * session needed. */
class BenchMathSpec extends AnyFunSuite with Matchers {

  test("cpuAt interpolates linearly between boundaries and clamps outside") {
    val pts = IndexedSeq((0.0, 0.0), (10.0, 100.0), (20.0, 100.0), (30.0, 160.0))
    Bench.cpuAt(pts, -5.0) shouldBe 0.0 // before first → clamp
    Bench.cpuAt(pts, 0.0) shouldBe 0.0
    Bench.cpuAt(pts, 5.0) shouldBe 50.0 // midway through a 10 cores/s span
    Bench.cpuAt(pts, 15.0) shouldBe 100.0 // idle span stays flat
    Bench.cpuAt(pts, 25.0) shouldBe 130.0
    Bench.cpuAt(pts, 99.0) shouldBe 160.0 // past last → clamp
  }

  test("trailingRate averages the last 60 s, using the final point as now") {
    // 120 s of history at 2 cores, then 60 s at 8 cores.
    val pts = IndexedSeq((0.0, 0.0), (120.0, 240.0), (180.0, 720.0))
    Bench.trailingRate(pts, 180.0) shouldBe 8.0 +- 1e-9
    // Mid-span "now" must carry a matching virtual point.
    val mid = IndexedSeq((0.0, 0.0), (120.0, 240.0), (150.0, 480.0))
    Bench.trailingRate(mid, 150.0) shouldBe ((480.0 - 180.0) / 60.0) +- 1e-9
  }

  test("trailingRate regression: a >60 s query must not absorb its whole delta") {
    // The round-10 review scenario: one query runs 0→180 s burning
    // 1440 cpu·s (8 cores). The only recorded boundary is the start;
    // the virtual now-point makes the trailing rate the true 8 cores,
    // not 1440/60 = 24.
    val pts = IndexedSeq((0.0, 0.0), (180.0, 1440.0))
    Bench.trailingRate(pts, 180.0) shouldBe 8.0 +- 1e-9
  }

  test("trailingRate with under-60 s of history uses the full span") {
    val pts = IndexedSeq((0.0, 0.0), (30.0, 120.0))
    Bench.trailingRate(pts, 30.0) shouldBe 4.0 +- 1e-9
  }

  test("isStarved needs real cpu, inflated wall, AND external demand") {
    val cores = 32
    // The canonical starved query: 8 s wall for 16 cpu·s on 32 workers
    // (floor 0.5 s) under external load 20.
    Bench.isStarved(8.0, 16.0, 20.0, 32, cores) shouldBe true
    // Same query on a quiet host: not starved, merely driver-heavy.
    Bench.isStarved(8.0, 16.0, 0.0, 32, cores) shouldBe false
    // Perfectly-parallel query (wall ≈ cpu/workers) is never starved.
    Bench.isStarved(1.1, 32.0, 20.0, 32, cores) shouldBe false
    // Sub-second cpu never qualifies (scheduling noise).
    Bench.isStarved(5.0, 0.5, 20.0, 32, cores) shouldBe false
    // NaNs (unsupported beans) never qualify.
    Bench.isStarved(8.0, Double.NaN, 20.0, 32, cores) shouldBe false
    Bench.isStarved(8.0, 16.0, Double.NaN, 32, cores) shouldBe false
  }

  test("isStarved floor uses session workers, not host cores") {
    // local[4] on a 32-core host: 16 cpu·s cannot wall under ~4 s, so
    // a 5 s wall is NORMAL (floor 3*16/4 = 12 s), not starvation —
    // a host-cores denominator (floor 1.5 s) would flag every
    // correctly-executing query once external load appears.
    Bench.isStarved(5.0, 16.0, 20.0, 4, 32) shouldBe false
    // The same 4-worker query walled past 3× its own floor IS starved.
    Bench.isStarved(13.0, 16.0, 20.0, 4, 32) shouldBe true
  }

  test("isDirty: starvation or boundary external demand, NaN never flags") {
    val cores = 32
    // Starved ⇒ dirty.
    Bench.isDirty(8.0, 16.0, 20.0, 32, cores) shouldBe true
    // Not starved (wall fine) but heavy external demand at the
    // boundary ⇒ still dirty — the timing is suspect either way.
    Bench.isDirty(1.1, 32.0, 20.0, 32, cores) shouldBe true
    // Quiet host ⇒ clean, whatever the query's own shape.
    Bench.isDirty(8.0, 16.0, 3.0, 32, cores) shouldBe false
    // Unknown external load (no CPU bean) must not condemn the run.
    Bench.isDirty(8.0, 16.0, Double.NaN, 32, cores) shouldBe false
  }

  test("recertAttempt: forced failures populate recert_failed and keep the first pass") {
    import scala.collection.mutable
    val failed = mutable.ArrayBuffer.empty[(String, String)]

    // 1. The rerun THROWS: recorded with the exception's first line,
    //    None returned (caller keeps the first-pass result).
    Bench.recertAttempt[Int]("boom",
      _ => throw new IllegalStateException("kaboom\nstack line 2"),
      _ => None, _ => (), failed) shouldBe None
    failed should have size 1
    failed.head._1 shouldBe "boom"
    failed.head._2 should include("IllegalStateException")
    failed.head._2 should not include "stack line 2"

    // 2. The rerun returns but registered an error (the runQuery path:
    //    exceptions are caught internally and logged to the registry):
    //    recorded with the registry's first line, registry cleared.
    val registry = mutable.Map("flaky" -> "first line of error\nsecond line")
    Bench.recertAttempt("flaky", _ => 42,
      n => registry.get(n), n => registry -= n, failed) shouldBe None
    failed should have size 2
    failed(1) shouldBe ("flaky" -> "first line of error")
    registry shouldBe empty

    // 3. A clean rerun passes through untouched and records nothing.
    Bench.recertAttempt("ok", _ => 7, _ => None, _ => (), failed) shouldBe Some(7)
    failed should have size 2
  }

  test("jstr escapes quotes, backslashes and control chars for artifact JSON") {
    Bench.jstr("plain") shouldBe "\"plain\""
    Bench.jstr("a\"b\\c") shouldBe "\"a\\\"b\\\\c\""
    Bench.jstr("x\ny") shouldBe "\"x\\u000ay\""
  }
}
