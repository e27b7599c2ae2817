package graft.compare

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history maintenance: fold a new
  * snapshot into a versioned history table so every attribute change
  * becomes a closed interval and current truth stays one open row per
  * key — the standard warehouse answer to "what did this row look
  * like on date X". Completes the compare family's ledger:
  * [[SnapshotDiff]] reports what changed between snapshots; this
  * APPLIES the change as history.
  *
  * History schema contract: the key and attribute columns plus
  * `valid_from` / `valid_to` (timestamps; `valid_to` null = the open
  * row). [[initial]] builds it from a first snapshot.
  *
  * Scale design: ONE full-outer join of the history's open rows
  * against the snapshot, hash-partitioned on the key (the closed rows
  * pass through untouched — they cannot change by definition, so they
  * are never shuffled); every output interval derives from that ONE
  * joined stream via a conditional-array explode (a filter-per-status
  * union would re-plan the join once per branch — PlanSpec pins the
  * single join). No window, no collect.
  *
  * Semantics per key:
  *  - open row + snapshot row, attributes equal (null-safe): open row
  *    carries forward unchanged;
  *  - attributes differ: the open row CLOSES at `effectiveTs` and a
  *    new open row starts there;
  *  - snapshot row with no open row: a new open row starts (a re-born
  *    key's earlier closed intervals remain);
  *  - open row with no snapshot row: `closeMissing` decides — false
  *    (default: partial feeds) carries it forward, true (full
  *    snapshots) closes it at `effectiveTs` (a logical delete).
  */
object Scd2 {

  /** First load: every snapshot row opens at `effectiveTs`. */
  def initial(snapshot: DataFrame, effectiveTs: Column): DataFrame =
    snapshot
      .withColumn("valid_from", effectiveTs.cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))

  /** Fold one snapshot into the history. `history` must carry
    * `valid_from`/`valid_to`; `snapshot` must carry exactly the key +
    * attribute columns. */
  def applyChanges(history: DataFrame, snapshot: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String],
      effectiveTs: Column, closeMissing: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    require(attrCols.nonEmpty, "applyChanges needs at least one attribute column")
    Seq("valid_from", "valid_to").foreach { c =>
      require(history.columns.contains(c), s"history is missing '$c'")
      require(!snapshot.columns.contains(c), s"snapshot must not carry '$c'")
    }
    val ts = effectiveTs.cast("timestamp")
    val outCols = (keyCols ++ attrCols).map(col) :+ col("valid_from") :+ col("valid_to")
    val closed = history.filter(col("valid_to").isNotNull).select(outCols: _*)
    val open = history.filter(col("valid_to").isNull)

    val joinCond = keyCols.map(k => col(s"h.`$k`") <=> col(s"s.`$k`")).reduce(_ && _)
    // Side presence must be detected with an explicit lit(true) marker,
    // NOT key-column nullity: the join is null-SAFE (<=>), so a null
    // key matches across sides and is a legitimate joined row — testing
    // the key columns would make such a row satisfy neither branch and
    // silently drop it from the fold.
    val changed = attrCols.map(c => !(col(s"h.`$c`") <=> col(s"s.`$c`"))).reduce(_ || _)
    val j = open.withColumn("_h_present", lit(true)).alias("h")
      .join(snapshot.withColumn("_s_present", lit(true)).alias("s"), joinCond, "full_outer")
    val hPresent = col("h._h_present").isNotNull
    val sPresent = col("s._s_present").isNotNull

    def outRow(tag: String, from: Column, to: Column) = struct(
      (keyCols.map(k => col(s"$tag.`$k`").as(k)) ++
        attrCols.map(c => col(s"$tag.`$c`").as(c)) :+
        from.as("valid_from") :+ to.as("valid_to")): _*)
    val nullTs = lit(null).cast("timestamp")
    // Each joined row yields 0–2 output rows via ONE conditional-array
    // explode — a filter-per-status union would re-plan (and
    // re-shuffle) the full-outer join once per branch. Surviving open
    // rows: unchanged matches carry forward, missing keys carry
    // forward unless closeMissing. Closing rows: changed matches and
    // (optionally) missing keys. Opening rows: changed matches' new
    // versions and brand-new keys.
    val carried = when(hPresent && ((sPresent && !changed) ||
      (!sPresent && !lit(closeMissing))),
      outRow("h", col("h.valid_from"), nullTs))
    val closedNow = when(hPresent && ((sPresent && changed) ||
      (!sPresent && lit(closeMissing))),
      outRow("h", col("h.valid_from"), ts))
    val opened = when(sPresent && (!hPresent || changed),
      outRow("s", ts, nullTs))
    val folded = j
      .select(explode(array(carried, closedNow, opened)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.*"))
    closed.unionByName(folded)
  }

  /** Point-in-time lookup over a history table: the version of each
    * key valid AT `asOf` (valid_from ≤ asOf < valid_to, open rows
    * unbounded). Map-side filter — the reason the history exists. */
  def asOf(history: DataFrame, asOfTs: Column): DataFrame = {
    val ts = asOfTs.cast("timestamp")
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
  }
}
