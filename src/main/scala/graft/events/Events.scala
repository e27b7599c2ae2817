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

  /** As-of join: for each left row, attach the NEAREST right row of
    * the same entity in the join direction — `backward` (default): the
    * latest right with ts ≤ left ts; `forward`: the earliest right
    * with ts ≥ left ts (next-event attribution) — optionally within
    * `toleranceSeconds`. Ties on the right timestamp resolve to the
    * greatest tiebreak backward / smallest forward — a pinned total
    * order, so the match is deterministic row-for-row on any cluster.
    * Right columns come back prefixed (`asof_` by default), null when
    * no right row qualifies.
    *
    * NOT a join in the physical plan: the classic union-stack
    * formulation. Both sides are stacked with a side tag (right = 0 so
    * an equal-timestamp right row sorts BEFORE the left row it should
    * match), one window partitioned by entity and ordered by
    * (ts, side, tiebreak) carries the last non-null right payload
    * forward, and left rows are peeled back off. Cost: ONE hash
    * shuffle of left+right keyed by entity plus a per-partition sort —
    * the same shape at 100 TB as at test scale. The naive
    * join-then-rank alternative shuffles BOTH sides, materializes
    * every (left, earlier-right) pair — quadratic in events-per-entity
    * — and then windows over that blowup to keep one row; the stack
    * never materializes a pair at all.
    *
    * Time-ordered state attachment is the event-log counterpart of the
    * reference's static profile compares (reference:
    * sparvi/profiler/profile_engine.py — no temporal join surface). */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTsCol: String, rightTsCol: String,
      rightValueCols: Seq[String], rightTiebreakCol: String,
      toleranceSeconds: Option[Long] = None,
      prefix: String = "asof_",
      direction: String = "backward"): DataFrame = {
    require(rightValueCols.nonEmpty, "asOfJoin needs at least one right value column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward: $direction")
    val backward = direction == "backward"
    val payloadCols = (rightValueCols :+ rightTiebreakCol).distinct
    val internal = Seq("__k", "__t", "__side", "__tb", "__r", "__l")
    internal.foreach { c =>
      require(!left.columns.contains(c),
        s"left input already has reserved column '$c'")
    }
    // Side tags order equal-timestamp rows so the boundary is
    // inclusive in BOTH directions: backward (right ≤ left) wants the
    // right row BEFORE the left row it matches; forward (right ≥
    // left) wants it after.
    val (rightSide, leftSide) = if (backward) (0, 1) else (1, 0)
    val rightStacked = right.select(
      col(rightKeyCol).as("__k"),
      col(rightTsCol).as("__t"),
      lit(rightSide).as("__side"),
      col(rightTiebreakCol).as("__tb"),
      struct((col(rightTsCol).as("__rt") +: payloadCols.map(col)): _*).as("__r"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("__l"))
    val leftStacked = left.select(
      col(leftKeyCol).as("__k"),
      col(leftTsCol).as("__t"),
      lit(leftSide).as("__side"),
      lit(null).cast(right.schema(rightTiebreakCol).dataType).as("__tb"),
      lit(null).cast(rightStacked.schema("__r").dataType).as("__r"),
      struct(left.columns.map(col): _*).as("__l"))
    // Backward: carry the LAST right payload from the past (ties → the
    // greatest tiebreak, which sorts last). Forward: take the FIRST
    // right payload in the future (ties → the smallest tiebreak).
    val order = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
    val (w, carryExpr) =
      if (backward) (
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow),
        (c: Column) => last(c, ignoreNulls = true))
      else (
        order.rowsBetween(Window.currentRow, Window.unboundedFollowing),
        (c: Column) => first(c, ignoreNulls = true))
    val carried = rightStacked.unionByName(leftStacked)
      .withColumn("__m", carryExpr(col("__r")).over(w))
      .filter(col("__side") === lit(leftSide))
    // Tolerance: the carried match is the nearest-ever in the join
    // direction; null it out when it falls outside the window. (A
    // nearer in-window match cannot hide behind it — last()/first()
    // keep the nearest — so the null is exact, not approximate.)
    val gapMicros =
      if (backward) unix_micros(col("__t").cast("timestamp")) -
        unix_micros(col("__m.__rt").cast("timestamp"))
      else unix_micros(col("__m.__rt").cast("timestamp")) -
        unix_micros(col("__t").cast("timestamp"))
    val matched = toleranceSeconds match {
      case Some(tol) => when(
        col("__m").isNotNull && gapMicros <= tol * 1000000L,
        col("__m"))
      case None => col("__m")
    }
    val outLeft = left.columns.map(c => col(s"__l.$c").as(c))
    val outRight = rightValueCols.map(c => matched.getField(c).as(s"$prefix$c"))
    carried.select((outLeft ++ outRight): _*)
  }

  /** Per-entity rolling statistics over the trailing `windowRows`
    * events (ROWS frame, current row inclusive) in (ts, tiebreak)
    * order: count, sum, min, max, mean of `valueCol`. The standard
    * smoothing/feature primitive over an event log.
    *
    * One window partitioned by the entity key — one hash shuffle of
    * the log plus a per-partition sort, never a global window. A
    * ROWS-based sliding frame is O(windowRows) per row in Spark's
    * window exec with no extra state; skew bounds are the busiest
    * single entity, as with [[sessionize]]. */
  def rollingStats(df: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, windowRows: Int, tiebreakCol: String,
      prefix: String = "roll_"): DataFrame = {
    require(windowRows >= 1, s"windowRows must be >= 1: $windowRows")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(-(windowRows - 1).toLong, Window.currentRow)
    df.withColumn(s"${prefix}n", count(col(valueCol)).over(w))
      .withColumn(s"${prefix}sum", sum(col(valueCol)).over(w))
      .withColumn(s"${prefix}min", min(col(valueCol)).over(w))
      .withColumn(s"${prefix}max", max(col(valueCol)).over(w))
      .withColumn(s"${prefix}mean", avg(col(valueCol)).over(w))
  }

  /** The per-entity event cap this object's scaladoc names as the
    * standard skew mitigation at 100 TB: keep at most `cap` events per
    * entity, the kept subset chosen by DETERMINISTIC hash order
    * (uniform hash of `idCol` under (`seed`, `hashMode`), ties broken
    * by `idCol`) — an unbiased fixed sample of the entity's events
    * that is stable under retries, repartitioning, and corpus growth,
    * where a timestamp-ordered keep would bias toward an entity's
    * early history. Same recall-tradeoff contract as
    * [[graft.dedup.Dedup.candidatePairs]]'s occupancy cap: never
    * silent — run [[cappedEntities]] alongside; rows there name every
    * entity the cap truncated.
    *
    * Plan shape: a rank-filtered entity-keyed window, which Spark's
    * InferWindowGroupLimit rewrites into a PARTIAL WindowGroupLimit
    * BEFORE the exchange — each map task keeps at most `cap` rows per
    * entity it sees, so a 10⁹-event hot entity ships ≤ cap × n_mappers
    * rows through the shuffle instead of flooding one reducer
    * (PlanSpec pins the partial group limit). The rewrite applies while
    * `cap` ≤ spark.sql.optimizer.windowGroupLimitThreshold (default
    * 1000); raise that conf in lockstep for larger caps.
    * `hashMode`: "xxhash64" (default, codegen'd scale mode) or "md5"
    * (engine-reproducible gate mode). */
  def capPerEntity(df: DataFrame, entityCol: String, cap: Int, idCol: String,
      seed: Long = 42L, hashMode: String = "xxhash64"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    Seq("__u", "__rk").foreach { c =>
      require(!df.columns.contains(c), s"input already has reserved column '$c'")
    }
    val w = Window.partitionBy(col(entityCol)).orderBy(col("__u"), col(idCol))
    df.withColumn("__u", graft.sampling.Sampling.uniformHash(col(idCol), seed, hashMode))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__u", "__rk")
  }

  /** The audit for [[capPerEntity]] — "no silent caps": every entity
    * holding more than `cap` events, with its true count. Empty output
    * means the cap dropped nothing. One partial-aggregated groupBy —
    * skew-proof at any entity size. */
  def cappedEntities(df: DataFrame, entityCol: String, cap: Int): DataFrame =
    df.groupBy(col(entityCol).as("entity"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") > cap)

  /** Per-entity inter-arrival statistics: the distribution of gaps
    * between an entity's consecutive events — (entity, n_gaps,
    * mean/min/max gap seconds, and the coefficient of variation
    * stddev/mean). Ultra-regular gaps (cv → 0) are the classic bot
    * signature; human traffic is bursty (cv ≥ 1). Entities with fewer
    * than two events have no gaps and are absent.
    *
    * One entity-keyed window (lag) over the same single shuffle shape
    * as [[sessionize]], then a per-entity aggregate that reuses the
    * partitioning. Microsecond-exact integer gaps. */
  def interArrivalStats(df: DataFrame, entityCol: String, tsCol: String,
      tiebreakCol: String): DataFrame = {
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tiebreakCol))
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val gap = (micros - lag(micros, 1).over(order)) / lit(1000000.0)
    df.withColumn("__gap", gap)
      .filter(col("__gap").isNotNull)
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_gaps"),
        avg(col("__gap")).as("mean_gap_s"),
        min(col("__gap")).as("min_gap_s"),
        max(col("__gap")).as("max_gap_s"),
        when(avg(col("__gap")) > 0,
          coalesce(stddev_samp(col("__gap")), lit(0.0)) / avg(col("__gap")))
          .otherwise(lit(0.0)).as("cv"))
  }

  /** Retention cohorts: entities grouped by their FIRST-activity
    * period, tracked across subsequent periods — the product-analytics
    * staple ("of the users who arrived in week 0, how many were still
    * active in week k"). Output: (cohort_period, period_offset,
    * n_entities) where offset 0 is the cohort's own size.
    *
    * No window over the corpus: the first-activity period is a
    * per-entity MIN aggregate, joined back entity-keyed (both sides
    * already reduced to one row per entity/activity-period), then one
    * small (cohort, offset) count. `periodExpr` maps a timestamp to
    * its period ordinal (e.g. epoch-week); keep it a pure map-side
    * function of the timestamp. */
  def retentionCohorts(df: DataFrame, entityCol: String, tsCol: String,
      periodExpr: Column => Column): DataFrame = {
    val period = periodExpr(col(tsCol))
    val active = df.filter(col(tsCol).isNotNull)
      .select(col(entityCol).as("entity"), period.cast("long").as("period"))
      .distinct()
    val cohorts = active.groupBy("entity")
      .agg(min(col("period")).as("cohort_period"))
    active.join(cohorts, "entity")
      .groupBy(col("cohort_period"), (col("period") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col("entity")).as("n_entities"))
  }

  /** Ordered funnel: how many entities reached each stage IN ORDER —
    * stage k counts an entity iff an event of `stages(k)` occurred
    * STRICTLY AFTER (in the (ts, tiebreak) total order) some event
    * already counted for stage k-1. Output: (stage_idx, stage,
    * n_entities), one row per stage.
    *
    * One pass, no per-stage self-joins (the naive formulation re-scans
    * and re-shuffles the log once per stage): a chain of running-max
    * windows over ONE (entity, ts, tiebreak) sort — `reached(k)` is
    * set on a stage-k row when some strictly-earlier row carries
    * `reached(k-1)` (the running max is non-null ⟺ one exists) — then
    * a single per-entity aggregate and one tiny stage-count fold. All
    * windows share the partition key and sort, so Spark plans them in
    * one Window exec over one exchange regardless of stage count.
    *
    * `maxStepSeconds` adds the real-world conversion window: stage k
    * counts only when it follows a stage-(k−1) reach by at most that
    * many seconds. The latest prior reach is the tightest bound, so
    * the same running max decides both existence and recency. */
  def funnel(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      tiebreakCol: String,
      maxStepSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxStepSeconds.forall(_ > 0), s"maxStepSeconds must be positive: $maxStepSeconds")
    val order = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tiebreakCol))
    val strictlyBefore = order.rowsBetween(Window.unboundedPreceding, -1)
    // reached_k: for stage 0, this row's ts when it IS a stage-0 event;
    // for stage k>0, this row's ts when it is a stage-k event AND some
    // strictly-earlier row carries reached_{k-1} — under a conversion
    // window (`maxStepSeconds`), one no older than that. The LATEST
    // prior reach (a running max — same one-Window-exec plan) decides
    // both: non-null ⟺ exists, and its recency is the tightest bound,
    // so a window that admits ANY prior reach admits the max.
    val withStages = stages.zipWithIndex.foldLeft(df) { case (acc, (stage, k)) =>
      val hit =
        if (k == 0) when(col(typeCol) === stage, col(tsCol))
        else {
          val latestPrior = max(col(s"reached_${k - 1}")).over(strictlyBefore)
          val inWindow = maxStepSeconds match {
            case Some(sec) =>
              unix_micros(col(tsCol).cast("timestamp")) -
                unix_micros(latestPrior.cast("timestamp")) <= sec * 1000000L
            case None => lit(true)
          }
          when(col(typeCol) === stage && latestPrior.isNotNull && inWindow, col(tsCol))
        }
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
