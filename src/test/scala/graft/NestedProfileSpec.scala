package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.Json
import graft.profiler.{Profiler, ProfilerConfig}
import graft.types.ColumnBuckets

/** Multimodal (nested-type) profiling: arrays, maps, structs. */
class NestedProfileSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val nestedDf = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Map("a" -> 1), ("x", Some(1))),
      (2L, Seq(4.0, 5.0), Map("a" -> 1, "b" -> 2), ("y", None)),
      (3L, Seq.empty[Double], Map.empty[String, Int], ("z", Some(3)))
    ).toDF("id", "arr", "m", "st")
  }

  test("bucketing: nested types land in the nested bucket") {
    val b = ColumnBuckets.of(nestedDf.schema)
    b.nested shouldBe Seq("arr", "m", "st")
    b.numeric shouldBe Seq("id")
  }

  test("array stats: sizes, totals, element nulls") {
    val p = Profiler.profile(nestedDf, "t", ProfilerConfig(persist = false))
    val a = p.nestedStats("arr")
    a.kind shouldBe "array"
    a.minSize shouldBe Some(0L)
    a.maxSize shouldBe Some(3L)
    a.totalElements shouldBe Some(5L)
    a.elementNulls shouldBe Some(0L)
  }

  test("array element nulls are counted") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(Some(1.0), None, Some(3.0))),
      (2L, Seq(Option.empty[Double]))).toDF("id", "arr")
    val p = Profiler.profile(df, "t", ProfilerConfig(persist = false))
    p.nestedStats("arr").elementNulls shouldBe Some(2L)
    p.nestedStats("arr").totalElements shouldBe Some(4L)
  }

  test("map stats: size distribution over entries") {
    val p = Profiler.profile(nestedDf, "t", ProfilerConfig(persist = false))
    val m = p.nestedStats("m")
    m.kind shouldBe "map"
    m.minSize shouldBe Some(0L)
    m.maxSize shouldBe Some(2L)
    m.totalElements shouldBe Some(3L)
  }

  test("struct stats: per-field null counts within non-null structs") {
    val p = Profiler.profile(nestedDf, "t", ProfilerConfig(persist = false))
    val st = p.nestedStats("st")
    st.kind shouldBe "struct"
    st.fieldNulls("_1") shouldBe 0L
    st.fieldNulls("_2") shouldBe 1L // row 2 has None
  }

  test("nested columns still get completeness like any other column") {
    val p = Profiler.profile(nestedDf, "t", ProfilerConfig(persist = false))
    p.completeness("arr").nulls shouldBe 0L
    p.completeness("arr").distinctCount shouldBe 3L
  }

  test("profile JSON carries nested_stats only when present") {
    val p = Profiler.profile(nestedDf, "t", ProfilerConfig(persist = false))
    Json.profile(p) should include("\"nested_stats\"")
    val flat = Profiler.profile(employeesDf, "employees", ProfilerConfig(persist = false))
    Json.profile(flat) should not include "\"nested_stats\""
  }
}
