package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins: match point rows to [lo, hi) interval rows
  * WITHOUT an equality key — the lookup shape behind IP-to-geo tables,
  * price/score banding, and time-interval enrichment. North-star scope
  * beyond the reference surface (the reference joins nothing;
  * reference: sparvi/profiler/profile_engine.py profiles one table at
  * a time).
  *
  * Spark's built-in answer to a pure inequality join is a nested-loop
  * join — broadcast (BNLJ) when one side is small, CARTESIAN when
  * neither is. The two entry points below are the two plans that
  * survive 100 TB:
  *
  *  - [[broadcastRangeJoin]]: the interval table is small (bands,
  *    configs, calendars — almost always the case). Broadcast it and
  *    let BNLJ scan each point row against the in-memory interval
  *    list. Cost: one pass over the points, zero shuffles.
  *  - [[binnedRangeJoin]]: BOTH sides are large. Discretize the domain
  *    into fixed-width bins, explode each interval to the bins it
  *    overlaps, bin each point, equi-join on the bin, and re-check the
  *    exact predicate. This turns the cartesian product into a hash
  *    shuffle join whose fan-out is (interval width / bin width) per
  *    interval row — pick `binWidth` near the median interval width so
  *    the explosion stays O(1) per interval. A point falls in EXACTLY
  *    one bin, so no post-join dedup is needed.
  *
  * Interval semantics are half-open [lo, hi): adjacent bands share a
  * boundary without double-matching it.
  */
object RangeJoin {

  private def pointInRange(point: Column, lo: Column, hi: Column): Column =
    point >= lo && point < hi

  /** Inner range join with the interval side broadcast. The plan is
    * BroadcastNestedLoopJoin — the RIGHT plan when intervals fit in a
    * broadcast (each executor core streams points through the interval
    * list with zero shuffles), and the plan Spark would silently
    * degrade to a cartesian shuffle for if the broadcast hint were
    * missing. */
  def broadcastRangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.join(broadcast(ranges),
      pointInRange(col(pointCol), col(loCol), col(hiCol)))

  /** Interval-OVERLAP join for two LARGE interval sets: pairs where
    * [aLo, aHi) ∩ [bLo, bHi) ≠ ∅ (strict overlap: `aLo < bHi && bLo <
    * aHi`) — meeting-conflict detection, session co-occurrence,
    * time-range enrichment, neither side a point. Same binning move as
    * [[binnedRangeJoin]], plus the co-occurrence DEDUP every
    * interval×interval binning needs: two overlapping intervals share
    * EVERY bin their intersection covers, so the pair is counted only
    * in the intersection's FIRST bin (`floor(max(aLo, bLo) / w)` — a
    * pure function of the pair, present in both sides' bin ranges by
    * construction). No post-join `distinct` shuffle, no duplicate
    * pairs, one hash equi-join on the bin. */
  def intervalOverlapJoin(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      binWidth: Double, maxBinsPerRange: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(Set(leftLo, leftHi).intersect(Set(rightLo, rightHi)).isEmpty,
      "left and right lo/hi column names must differ (alias one side)")
    val internal = Seq("__bin", "__lo_bin", "__hi_bin")
    (left.columns ++ right.columns).foreach { c =>
      require(!internal.contains(c), s"input already has reserved column '$c'")
    }
    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loBin = floor(col(lo) / binWidth).cast("long")
      val hiBin = floor(col(hi) / binWidth).cast("long")
      val span = hiBin - loBin + lit(1L)
      val guardedHi = when(span <= lit(maxBinsPerRange.toLong), greatest(loBin, hiBin))
        .otherwise(raise_error(concat(
          lit("intervalOverlapJoin: an interval spans "), span.cast("string"),
          lit(s" bins > maxBinsPerRange=$maxBinsPerRange — widen binWidth " +
            "or raise the cap deliberately"))).cast("long"))
      df.withColumn("__bin", explode(sequence(loBin, guardedHi)))
    }
    explodeBins(left, leftLo, leftHi)
      .join(explodeBins(right, rightLo, rightHi), "__bin")
      .filter(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi))
      // Keep the pair only in its intersection's first bin: both sides
      // cover that bin (it is ≥ each side's lo-bin and ≤ each side's
      // hi-bin whenever the intervals overlap), so exactly one of the
      // joined candidate rows survives.
      .filter(col("__bin") ===
        floor(greatest(col(leftLo), col(rightLo)) / binWidth).cast("long"))
      .drop("__bin")
  }

  /** Inner range join for two LARGE sides via domain binning: explode
    * each interval row to every bin index in
    * [floor(lo/w), floor((hi - ulp)/w)], bin each point to
    * floor(p/w), hash-join on the bin, then apply the exact [lo, hi)
    * predicate. Columns are numeric (cast timestamps to epoch seconds
    * upstream).
    *
    * `maxBinsPerRange` bounds the per-row explosion — a single
    * corpus-spanning interval would otherwise fan out into millions of
    * rows and recreate the skew this formulation exists to avoid. Wide
    * intervals FAIL the require rather than silently exploding; raise
    * the cap or widen `binWidth` deliberately. (The audit-don't-drop
    * contract of the dedup caps, applied to join fan-out.) */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerRange: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val internal = Seq("__bin", "__lo_bin", "__hi_bin")
    (points.columns ++ ranges.columns).foreach { c =>
      require(!internal.contains(c), s"input already has reserved column '$c'")
    }
    // The bin range is [floor(lo/w), floor(hi/w)] INCLUSIVE of hi's
    // bin even though hi itself is exclusive: IEEE division is
    // monotone, so p < hi ⟹ floor(p/w) ≤ floor(hi/w) — every
    // qualifying point provably meets its interval in the equi-join.
    // (Trimming hi's bin when hi lands exactly on an edge looks free
    // but risks a missed pair when a point just below hi rounds its
    // quotient UP to the edge; one extra candidate row per interval is
    // the safe price, and the exact recheck discards it.)
    val binned = ranges
      .withColumn("__lo_bin", floor(col(loCol) / binWidth).cast("long"))
      .withColumn("__hi_bin", floor(col(hiCol) / binWidth).cast("long"))
    // The cap is enforced INSIDE the explode expression (raise_error on
    // the offending row) — lazy and distributed, no extra guard job
    // scanning the interval table, and the error names the row's span.
    val span = col("__hi_bin") - col("__lo_bin") + lit(1L)
    val guardedHi = when(span <= lit(maxBinsPerRange.toLong),
        greatest(col("__lo_bin"), col("__hi_bin")))
      .otherwise(raise_error(concat(
        lit("binnedRangeJoin: an interval spans "), span.cast("string"),
        lit(s" bins > maxBinsPerRange=$maxBinsPerRange — widen binWidth " +
          "or raise the cap deliberately"))).cast("long"))
    val exploded = binned
      .withColumn("__bin", explode(sequence(col("__lo_bin"), guardedHi)))
      .drop("__lo_bin", "__hi_bin")
    val binnedPoints = points
      .withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(exploded, "__bin")
      .filter(pointInRange(col(pointCol), col(loCol), col(hiCol)))
      .drop("__bin")
  }
}
