package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.compare.SnapshotDiff

/** Row-level snapshot diff: status classification, null-safe column
  * compares, and per-column change counts. */
class SnapshotDiffSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private lazy val (ref, cur) = {
    val s = spark
    import s.implicits._
    val r = Seq(
      (1L, "a", Some(10.0)), // unchanged
      (2L, "b", Some(20.0)), // value changes
      (3L, "c", None),       // null → value (a change)
      (4L, "d", Some(40.0)), // removed in cur
      (5L, "e", None)        // null stays null → unchanged
    ).toDF("k", "status", "price")
    val c = Seq(
      (1L, "a", Some(10.0)),
      (2L, "b", Some(21.0)),
      (3L, "c", Some(30.0)),
      (5L, "e", None),
      (6L, "f", Some(60.0)) // added
    ).toDF("k", "status", "price")
    (r, c)
  }

  test("summary classifies added/removed/changed/unchanged with null-safe compares") {
    val row = SnapshotDiff.summary(ref, cur, Seq("k"), Seq("status", "price")).collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) shouldBe ((1L, 1L, 2L, 2L))
  }

  test("columnChanges counts per-column changes over rows present in both") {
    val m = SnapshotDiff.columnChanges(ref, cur, Seq("k"), Seq("status", "price"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    m shouldBe Map("status" -> 0L, "price" -> 2L)
  }

  test("rowStatus emits a row-granular CDC feed") {
    val statuses = SnapshotDiff.rowStatus(ref, cur, Seq("k"), Seq("status", "price"))
      .select(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col("ref.k"),
          org.apache.spark.sql.functions.col("cur.k")).as("k"),
        org.apache.spark.sql.functions.col("diff_status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    statuses shouldBe Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "unchanged", 6L -> "added")
  }
}
