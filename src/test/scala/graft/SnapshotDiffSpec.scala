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

  test("Scd2.applyChanges: carried/closed/opened intervals and the as-of read-back") {
    import graft.compare.Scd2
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val snap0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val snap1 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v") // 2 changes, 3 gone, 4 new
    val h1 = Scd2.applyChanges(Scd2.initial(snap0, lit("2024-01-01")), snap1,
      Seq("k"), Seq("v"), lit("2024-02-01"), closeMissing = true)
    val rows = h1.select(col("k"), col("v"),
        to_date(col("valid_from")).cast("string"), to_date(col("valid_to")).cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), Option(r.getString(3))))
      .toSet
    rows shouldBe Set(
      (1L, "a", "2024-01-01", None),               // carried
      (2L, "b", "2024-01-01", Some("2024-02-01")), // closed
      (2L, "B", "2024-02-01", None),               // reopened with new value
      (3L, "c", "2024-01-01", Some("2024-02-01")), // deleted (closeMissing)
      (4L, "d", "2024-02-01", None))               // born
    // Point-in-time: mid-January sees snap0 exactly; today sees snap1.
    Scd2.asOf(h1, lit("2024-01-15")).select("k", "v").collect().map(_.toSeq).toSet shouldBe
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"))
    Scd2.asOf(h1, lit("2024-03-01")).select("k", "v").collect().map(_.toSeq).toSet shouldBe
      Set(Seq(1L, "a"), Seq(2L, "B"), Seq(4L, "d"))
    // Idempotence: re-applying the same snapshot changes nothing.
    val h2 = Scd2.applyChanges(h1, snap1, Seq("k"), Seq("v"),
      lit("2024-03-01"), closeMissing = true)
    h2.count() shouldBe h1.count()
    h2.filter(col("valid_to").isNull).count() shouldBe 3L
  }

  test("Scd2.applyChanges without closeMissing carries absent keys forward") {
    import graft.compare.Scd2
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val snap0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val partial = Seq((1L, "A")).toDF("k", "v")
    val h = Scd2.applyChanges(Scd2.initial(snap0, lit("2024-01-01")), partial,
      Seq("k"), Seq("v"), lit("2024-02-01"))
    h.filter(col("valid_to").isNull).select("k", "v").collect()
      .map(_.toSeq).toSet shouldBe Set(Seq(1L, "A"), Seq(2L, "b"))
  }

  test("Scd2.applyChanges folds null-keyed rows — the null-safe join's legit match") {
    import graft.compare.Scd2
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // The join is null-safe (<=>), so a null key is an ordinary key
    // value: it must match across sides, close/reopen on change, and
    // never be silently dropped from the fold.
    val snap0 = Seq((Option(1L), "a"), (Option.empty[Long], "n0")).toDF("k", "v")
    val snap1 = Seq((Option(1L), "a"), (Option.empty[Long], "n1")).toDF("k", "v")
    val h = Scd2.applyChanges(Scd2.initial(snap0, lit("2024-01-01")), snap1,
      Seq("k"), Seq("v"), lit("2024-02-01"), closeMissing = true)
    val rows = h.select(col("k"), col("v"),
        to_date(col("valid_from")).cast("string"), to_date(col("valid_to")).cast("string"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getString(2), Option(r.getString(3))))
      .toSet
    rows shouldBe Set(
      (Some(1L), "a", "2024-01-01", None),       // carried
      (None, "n0", "2024-01-01", Some("2024-02-01")), // null key CLOSED on change
      (None, "n1", "2024-02-01", None))          // null key reopened
    // And with closeMissing = false, an open null-keyed row missing
    // from the snapshot carries forward instead of vanishing.
    val partial = Seq((Option(1L), "a")).toDF("k", "v")
    val h2 = Scd2.applyChanges(Scd2.initial(snap0, lit("2024-01-01")), partial,
      Seq("k"), Seq("v"), lit("2024-02-01"))
    h2.filter(col("valid_to").isNull).count() shouldBe 2L
  }

  test("categoryDrift counts a both-sides null category ONCE, as shared") {
    import graft.compare.Drift
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val ref = Seq(Some("x"), Some("x"), None, None).toDF("c")
    val cur = Seq(Some("x"), None, None, None).toDF("c")
    val out = Drift.categoryDrift(ref, cur, "c").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getString(5),
        r.getDouble(6)))
    out.length shouldBe 2 // one 'x' row + ONE null row, never added+removed
    val nullRow = out.find(_._1.isEmpty).get
    nullRow._2 shouldBe 2L
    nullRow._3 shouldBe 3L
    nullRow._4 shouldBe "shared"
    // TVD term is |p − q|/2 = |0.5 − 0.75|/2, not (0.5 + 0.75)/2.
    nullRow._5 shouldBe (0.125 +- 1e-12)
    // Σ tvd_term stays a true total-variation distance.
    out.map(_._5).sum shouldBe (0.25 +- 1e-12)
  }
}
