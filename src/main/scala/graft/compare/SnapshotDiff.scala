package graft.compare

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of the same table, keyed by a
  * primary key: which rows were added, removed, changed, unchanged —
  * and, per column, how many rows changed in THAT column. The
  * row-granular complement of the aggregate-level comparators in
  * [[ProfileCompare]] (anomalies/trends) and [[Drift]] (distribution
  * shift): those say THAT a table moved; this says WHICH rows and
  * columns moved.
  *
  * Scale design: one full-outer join hash-partitioned on the key —
  * the minimum possible shuffle for row matching (both sides shuffle
  * once on the same key; AQE handles skewed keys). All per-column
  * comparisons are map-side expressions AFTER the join; the outputs
  * are tiny aggregates. No window, no collect, no row cache.
  */
object SnapshotDiff {

  private def changedCol(c: String): Column =
    // Null-safe inequality: a null→value or value→null transition
    // counts as a change; null→null does not.
    !(col(s"ref.`$c`") <=> col(s"cur.`$c`"))

  /** Joined frame with a per-row `diff_status`:
    * added (key only in `cur`), removed (only in `ref`), changed
    * (both sides, any compare column differs null-safely), unchanged.
    * The building block for [[summary]] / [[columnChanges]]; callers
    * wanting row-level output (e.g. a CDC feed) use this directly. */
  def rowStatus(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rowDiff needs at least one key column")
    val joinCond = keyCols.map(k => col(s"ref.`$k`") <=> col(s"cur.`$k`"))
      .reduce(_ && _)
    val anyChanged = compareCols.map(changedCol).reduce(_ || _)
    val refPresent = keyCols.map(k => col(s"ref.`$k`").isNotNull).reduce(_ && _)
    val curPresent = keyCols.map(k => col(s"cur.`$k`").isNotNull).reduce(_ && _)
    ref.alias("ref").join(cur.alias("cur"), joinCond, "full_outer")
      .withColumn("diff_status",
        when(!refPresent, lit("added"))
          .when(!curPresent, lit("removed"))
          .when(anyChanged, lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** One-row diff summary: (added, removed, changed, unchanged). */
  def summary(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame =
    rowStatus(ref, cur, keyCols, compareCols).agg(
      sum(when(col("diff_status") === "added", 1L).otherwise(0L)).as("added"),
      sum(when(col("diff_status") === "removed", 1L).otherwise(0L)).as("removed"),
      sum(when(col("diff_status") === "changed", 1L).otherwise(0L)).as("changed"),
      sum(when(col("diff_status") === "unchanged", 1L).otherwise(0L)).as("unchanged"))

  /** Per-column change counts over rows present in BOTH snapshots:
    * (column_name, changed_rows). One aggregate over the same joined
    * frame — the per-column flags are map-side — melted to rows with a
    * literal-array explode (no second scan, no shuffle per column). */
  def columnChanges(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val refPresent = keyCols.map(k => col(s"ref.`$k`").isNotNull).reduce(_ && _)
    val curPresent = keyCols.map(k => col(s"cur.`$k`").isNotNull).reduce(_ && _)
    val joinCond = keyCols.map(k => col(s"ref.`$k`") <=> col(s"cur.`$k`"))
      .reduce(_ && _)
    val counts = compareCols.map(c =>
      sum(when(refPresent && curPresent && changedCol(c), 1L).otherwise(0L))
        .as(s"chg_$c"))
    ref.alias("ref").join(cur.alias("cur"), joinCond, "full_outer")
      .agg(counts.head, counts.tail: _*)
      .select(explode(array(compareCols.map(c =>
        struct(lit(c).as("column_name"), col(s"chg_$c").as("changed_rows"))): _*)).as("e"))
      .select(col("e.column_name"), col("e.changed_rows"))
  }
}
