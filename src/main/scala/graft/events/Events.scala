package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics: gap-based sessionization and ordered
  * funnel counts over an (entity, timestamp) event log.
  *
  * North-star scope beyond the reference surface (the reference
  * profiles static tables only, reference:
  * sparvi/profiler/profile_engine.py); these are the batch
  * counterparts of the windowed streaming profilers in
  * [[graft.streaming.StreamProfiler]].
  *
  * Scale design: every window below is partitioned by the ENTITY key
  * (user id) — high-cardinality by construction — never by a constant,
  * so both operators cost ONE hash shuffle of the event log keyed by
  * entity plus a per-partition sort, the same shape as the groupBy
  * that follows. No corpus-wide window, no driver-side state; skew is
  * bounded by the busiest single entity (a per-entity event cap
  * upstream is the standard mitigation at 100 TB).
  */
object Events {

  /** Gap-based sessionization: events of one entity belong to the same
    * session while consecutive gaps are ≤ `maxGapSeconds`; a larger
    * gap opens a new session. Output: one row per session —
    * (entity, session_idx, session_start, session_end, n_events,
    * sum_value) where `session_idx` numbers an entity's sessions from
    * 0 in time order.
    *
    * Two stacked windows over ONE (entity, ts, tiebreak) sort: lag to
    * flag gap breaks, then a running sum of break flags to assign
    * session indexes — Spark plans both in a single Window exec over a
    * single exchange, and the final groupBy reuses that partitioning.
    * Break decisions depend only on the sorted timestamp sequence, so
    * equal-timestamp ties cannot perturb the output (a zero gap never
    * breaks); `tiebreakCol` pins a total order anyway so the plan is
    * deterministic row-for-row. */
  def sessionize(df: DataFrame, entityCol: String, tsCol: String,
      maxGapSeconds: Long, valueCol: String,
      tiebreakCol: String): DataFrame = {
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tiebreakCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Microsecond-exact gap: integer micros on both engines (the
    // session timezone is UTC, so an ntz→instant cast is identity and
    // `unix_micros` applies to either timestamp flavor).
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val gap = micros - lag(micros, 1).over(order)
    df.withColumn("brk", when(gap > maxGapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("brk")).over(running))
      .groupBy(col(entityCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }

  /** Gap sessionization as ONE declarative plan shared by batch and
    * streaming inputs, via Spark's native `session_window`: on a
    * stream it runs incrementally with watermark-bounded state (a
    * session closes — and is emitted in append mode — once the
    * watermark passes its end); on a batch frame it is an ordinary
    * merging-window aggregate, which is how the correctness gate
    * verifies it (the batch result is the streaming fixpoint, the
    * [[graft.streaming.StreamProfiler.windowedCompleteness]]
    * convention).
    *
    * Gap semantics match [[sessionize]] (adjacent per-event windows
    * MERGE, so only a gap STRICTLY greater than `gapDuration` breaks);
    * `session_end` differs — it is last-event-time + gap (the close
    * time), not max event time. No session index —
    * streams cannot number sessions whose order isn't final; sessions
    * are keyed by (entity, session_start) instead.
    *
    * Output: (entity, session_start, session_end, n_events,
    * sum_value). State at scale: one open session row per entity,
    * bounded by the watermark — O(active entities), never O(events). */
  def sessionWindows(df: DataFrame, entityCol: String, tsCol: String,
      gapDuration: String, valueCol: String,
      watermarkDelay: Option[String] = None): DataFrame = {
    val withWm = watermarkDelay match {
      case Some(d) => df.withWatermark(tsCol, d)
      case None => df
    }
    withWm
      .groupBy(session_window(col(tsCol), gapDuration).as("sess"), col(entityCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(entityCol), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"), col("sum_value"))
  }

  /** Ordered funnel: how many entities reached each stage IN ORDER —
    * stage k counts an entity iff an event of `stages(k)` occurred
    * STRICTLY AFTER (in the (ts, tiebreak) total order) some event
    * already counted for stage k-1. Output: (stage_idx, stage,
    * n_entities), one row per stage.
    *
    * One pass, no per-stage self-joins (the naive formulation re-scans
    * and re-shuffles the log once per stage): a chain of running-min
    * windows over ONE (entity, ts, tiebreak) sort — `reached(k)` for a
    * row is the earliest prior row whose `reached(k-1)` was set and
    * whose type matched stage k — then a single per-entity aggregate
    * and one tiny stage-count fold. All windows share the partition
    * key and sort, so Spark plans them in one Window exec over one
    * exchange regardless of stage count. */
  def funnel(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      tiebreakCol: String): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tiebreakCol))
    val strictlyBefore = order.rowsBetween(Window.unboundedPreceding, -1)
    // reached_k: for stage 0, this row's ts when it IS a stage-0 event;
    // for stage k>0, this row's ts when it is a stage-k event AND some
    // strictly-earlier row carries reached_{k-1}.
    val withStages = stages.zipWithIndex.foldLeft(df) { case (acc, (stage, k)) =>
      val hit =
        if (k == 0) when(col(typeCol) === stage, col(tsCol))
        else when(col(typeCol) === stage &&
          min(col(s"reached_${k - 1}")).over(strictlyBefore).isNotNull, col(tsCol))
      acc.withColumn(s"reached_$k", hit)
    }
    val hits = stages.indices.map(k =>
      max(col(s"reached_$k").isNotNull).as(s"hit_$k"))
    val perEntity = withStages.groupBy(col(entityCol)).agg(hits.head, hits.tail: _*)
    val stageCounts = stages.indices.map(k =>
      sum(when(col(s"hit_$k"), 1L).otherwise(0L)).as(s"n_$k"))
    val counts = perEntity.agg(stageCounts.head, stageCounts.tail: _*)
    counts.select(explode(array(stages.zipWithIndex.map { case (stage, k) =>
      struct(lit(k.toLong).as("stage_idx"), lit(stage).as("stage"), col(s"n_$k").as("n_entities"))
    }: _*)).as("f")).select(col("f.stage_idx"), col("f.stage"), col("f.n_entities"))
  }
}
