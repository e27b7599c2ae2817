package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

/** Streaming data-quality profiles over Structured Streaming —
  * north-star scope (SURVEY §7.5; the reference is batch-only).
  *
  * The aggregation is ONE declarative plan shared by batch and
  * streaming inputs: completeness/null-rate metrics per (tumbling
  * event-time window, key). On a stream the same plan runs
  * incrementally with watermark-bounded state; on a batch frame it is
  * an ordinary grouped aggregate — which is exactly how the
  * correctness gate verifies it (the batch result is the fixpoint of
  * the streaming computation).
  *
  * Scale notes: state per (window, key) is a fixed-width row of
  * counters; the watermark bounds how many windows stay open, so state
  * size is O(open windows × keys) regardless of input volume. No
  * per-event state, no sort.
  */
object StreamProfiler {

  /** Windowed completeness metrics: for each (window, key): event
    * count plus per-column null counts and null rates. Works on batch
    * and streaming DataFrames alike. */
  def windowedCompleteness(
      df: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermarkDelay: Option[String] = None,
      valueCols: Seq[String] = Nil): DataFrame = {
    val withWm = watermarkDelay match {
      case Some(d) => df.withWatermark(tsCol, d)
      case None => df
    }
    val nullAggs: Seq[Column] = valueCols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"${c}_nulls"),
        round(count(when(col(c).isNull, lit(1))) * lit(100.0) / count(lit(1)), 4)
          .as(s"${c}_null_rate"))
    }
    val aggs = count(lit(1)).as("n_events") +: nullAggs
    withWm
      .groupBy(window(col(tsCol), windowDuration).as("win"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("win.start").as("window_start") +:
        col(keyCol) +: (Seq(col("n_events")) ++
          valueCols.flatMap(c => Seq(col(s"${c}_nulls"), col(s"${c}_null_rate")))): _*)
  }

  /** Windowed numeric drift metrics per (window, key): avg/stddev/min/
    * max of a value column — the inputs anomaly detection compares
    * across windows. Batch- and stream-compatible. */
  def windowedNumericProfile(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowDuration: String, watermarkDelay: Option[String] = None): DataFrame = {
    val withWm = watermarkDelay match {
      case Some(d) => df.withWatermark(tsCol, d)
      case None => df
    }
    withWm
      .groupBy(window(col(tsCol), windowDuration).as("win"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        avg(col(valueCol)).as("avg_value"),
        stddev_samp(col(valueCol)).as("stdev_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(col("win.start").as("window_start"), col(keyCol),
        col("n_events"), col("avg_value"), col("stdev_value"),
        col("min_value"), col("max_value"))
  }

  /** Windowed quantiles per (tumbling window, key): exact p25/p50/p75
    * (or approx in scale mode) of a value column — the latency-style
    * percentile dashboard over an event stream. Same shared
    * batch/stream plan contract as [[windowedNumericProfile]]: the
    * quantile state is a TypedImperativeAggregate, which Structured
    * Streaming runs per window like any other aggregate (state = one
    * sketch/value-map per open window — the watermark bounds how many
    * stay open; `exact = false` bounds the per-window state too, the
    * 100 TB-stream setting). */
  def windowedQuantiles(
      df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      windowDuration: String, watermarkDelay: Option[String] = None,
      exact: Boolean = true): DataFrame = {
    val withWm = watermarkDelay match {
      case Some(d) => df.withWatermark(tsCol, d)
      case None => df
    }
    val fn = if (exact) "percentile" else "percentile_approx"
    val extra = if (exact) "" else ", 10000"
    withWm
      .groupBy(window(col(tsCol), windowDuration).as("win"), col(keyCol))
      .agg(count(col(valueCol)).as("n_values"),
        expr(s"$fn(`$valueCol`, array(0.25D, 0.5D, 0.75D)$extra)").as("qs"))
      .select(col("win.start").as("window_start"), col(keyCol),
        col("n_values"),
        element_at(col("qs"), 1).cast("double").as("q1"),
        element_at(col("qs"), 2).cast("double").as("median"),
        element_at(col("qs"), 3).cast("double").as("q3"))
  }

  /** Windowed PSI drift against a FIXED reference histogram — live
    * distribution monitoring: each time window's value histogram is
    * scored against reference shares computed once from a trusted
    * snapshot ([[graft.compare.Drift.referenceHistogram]] supplies
    * (lo, width, refShares)). PSI > 0.1 is the usual "investigate",
    * > 0.25 "shifted".
    *
    * Streaming-append-safe by construction: the per-bin counts are
    * numBins conditional counts inside ONE windowed aggregation, and
    * the PSI fold is stateless arithmetic over that row — no chained
    * stateful operators, so the plan runs verbatim in batch and in a
    * watermarked append-mode stream (the shared-plan contract of the
    * other windowed profiles). Null values are excluded like the
    * batch pass; current-side values outside the reference range
    * clamp into the edge bins. Output: (window_start, n_events, psi).
    */
  def windowedPsiDrift(
      df: DataFrame, tsCol: String, valueCol: String,
      windowDuration: String, lo: Double, width: Double,
      refShares: Seq[Double],
      watermarkDelay: Option[String] = None): DataFrame = {
    require(refShares.nonEmpty, "refShares must not be empty")
    val numBins = refShares.length
    val withWm = watermarkDelay match {
      case Some(d) => df.withWatermark(tsCol, d)
      case None => df
    }
    val binCol =
      if (width == 0.0) lit(0)
      else least(lit(numBins - 1), greatest(lit(0),
        floor((col(valueCol).cast("double") - lit(lo)) / lit(width)).cast("int")))
    val binCounts = (0 until numBins).map(i =>
      count(when(binCol === i, lit(1))).cast("double").as(s"__c$i"))
    val aggs = count(lit(1)).as("n_events") +: binCounts
    val agged = withWm.filter(col(valueCol).isNotNull)
      .groupBy(window(col(tsCol), windowDuration).as("win"))
      .agg(aggs.head, aggs.tail: _*)
    val psi = (0 until numBins).map { i =>
      val p = greatest(lit(refShares(i)), lit(1e-6))
      val q = greatest(col(s"__c$i") / col("n_events"), lit(1e-6))
      (p - q) * log(p / q)
    }.reduce(_ + _)
    agged.select(col("win.start").as("window_start"),
      col("n_events"), psi.as("psi"))
  }

  /** Open a file-based event stream with the schema inferred from a
    * batch read of the same path — the standard pattern for replaying
    * a directory of parquet as a stream. */
  def readParquetStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /** Convenience: run a streaming profile to an in-memory table and
    * block until all currently-available input is processed (Trigger
    * .AvailableNow). Returns the collected rows. Used by tests and
    * ad-hoc inspection; production sinks attach their own writer. */
  def runToMemory(profiled: DataFrame, queryName: String): Seq[Row] = {
    val q = profiled.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    profiled.sparkSession.table(queryName).collect().toSeq
  }

  /** Attach a console/parquet/etc. writer in append mode with a
    * required watermark — the production shape (closed windows only). */
  def appendWriter(profiled: DataFrame): DataStreamWriter[Row] =
    profiled.writeStream.outputMode("append")

  /** Per-key running moments carried across micro-batches (Welford). */
  final case class KeyMoments(count: Long, mean: Double, m2: Double) {
    def stdev: Double = if (count > 1) math.sqrt(m2 / (count - 1)) else 0.0
    def add(values: Seq[Double]): KeyMoments =
      values.foldLeft(this) { case (KeyMoments(n, mu, m2v), x) =>
        val n1 = n + 1
        val d = x - mu
        val mu1 = mu + d / n1
        KeyMoments(n1, mu1, m2v + d * (x - mu1))
      }
    /** Chan's parallel-variance merge: combining two moment summaries
      * equals folding the underlying values one by one (exact
      * arithmetic). */
    def merge(o: KeyMoments): KeyMoments =
      if (count == 0) o
      else if (o.count == 0) this
      else {
        val n = count + o.count
        val d = o.mean - mean
        KeyMoments(n, mean + d * o.count / n,
          m2 + o.m2 + d * d * count.toDouble * o.count / n)
      }
  }

  /** One micro-batch's pre-aggregated moments for a key: the upstream
    * stage computes (count, mean, M2) per (key, batch) with an
    * ordinary grouped aggregate, so only O(keys) fixed-width rows —
    * not raw events — flow into the stateful operator. */
  final case class BatchMoments(key: String, n: Long, mean: Double, m2: Double)

  /** A micro-batch whose mean deviates from the key's history. */
  final case class DriftEvent(
      key: String, batchCount: Long, batchMean: Double,
      runningMean: Double, runningStdev: Double, zScore: Double)

  /** Stateful per-key drift detection over a (key, value) stream:
    * `flatMapGroupsWithState` keeps Welford moments per key; a
    * micro-batch whose mean sits more than `threshold` historical
    * standard deviations from the running mean emits a [[DriftEvent]]
    * (after `minHistory` observations). This is the streaming analogue
    * of the profiler's numeric-mean anomaly
    * (ProfileCompare.detectAnomalies) — state is two doubles and a
    * long per key, so memory is O(keys) regardless of stream volume. */
  def meanDrift(
      pairs: Dataset[(String, Double)],
      threshold: Double = 3.0,
      minHistory: Long = 10): Dataset[DriftEvent] = {
    implicit val stateEnc: Encoder[KeyMoments] = Encoders.product[KeyMoments]
    implicit val outEnc: Encoder[DriftEvent] = Encoders.product[DriftEvent]
    pairs.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[KeyMoments, DriftEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[KeyMoments]) =>
          val values = rows.map(_._2).toSeq
          if (values.isEmpty) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(KeyMoments(0, 0.0, 0.0))
            val batchMean = values.sum / values.size
            val out =
              if (prior.count >= minHistory && prior.stdev > 0) {
                val z = math.abs(batchMean - prior.mean) / prior.stdev
                if (z > threshold)
                  Iterator.single(DriftEvent(key, values.size.toLong, batchMean,
                    prior.mean, prior.stdev, z))
                else Iterator.empty
              } else Iterator.empty
            state.update(prior.add(values))
            out
          }
      }
  }

  /** One event's rolling stats at its arrival — the streaming output
    * row of [[rollingStatsStream]]. `ts`/`tiebreak` echo the event's
    * identity so the row joins back to its source. */
  final case class RollingStat(
      key: String, tsMicros: Long, tiebreak: Long,
      rollN: Long, rollSum: Double, rollMin: Double, rollMax: Double,
      rollMean: Double)

  /** Streaming per-entity rolling stats over the trailing `windowRows`
    * events — the real-time feature-computation counterpart of
    * [[graft.events.Events.rollingStats]]: each arriving event emits
    * one row with count/sum/min/max/mean over itself and the previous
    * windowRows − 1 events of its key.
    *
    * State per key is the last windowRows − 1 values — fixed width,
    * O(keys · windowRows) total regardless of stream volume, the same
    * bounded-state contract as [[meanDrift]]. Rows WITHIN a
    * micro-batch are sorted by (ts, tiebreak) before folding, so
    * in-batch arrival order never perturbs the result; ACROSS batches
    * the fold assumes each key's events arrive in nondecreasing ts
    * order (the property a watermark + sorted replay provides — a
    * genuinely late event would compute its frame against newer
    * neighbors, which is the standard processing-order caveat of
    * per-event streaming features). Under that ordering the stream
    * output is row-for-row the batch [[graft.events.Events
    * .rollingStats]] fixpoint, which is how the gate verifies it. */
  def rollingStatsStream(
      events: Dataset[(String, Long, Long, Double)],
      windowRows: Int,
      idleTimeoutMs: Option[Long] = None): Dataset[RollingStat] = {
    require(windowRows >= 1, s"windowRows must be >= 1: $windowRows")
    require(idleTimeoutMs.forall(_ > 0), s"idleTimeoutMs must be positive: $idleTimeoutMs")
    implicit val stateEnc: Encoder[Tuple1[Seq[Double]]] = Encoders.product[Tuple1[Seq[Double]]]
    implicit val outEnc: Encoder[RollingStat] = Encoders.product[RollingStat]
    // idleTimeoutMs bounds state to the ACTIVE key set: a key idle
    // past the timeout has its frame evicted (and restarts cold on
    // return) — without it, one-shot keys (abandoned sessions, churned
    // devices) accumulate state forever. NoTimeout remains the default
    // for bounded key universes where frames must survive any gap.
    // Caveat: ProcessingTimeTimeout fires through no-data micro-batches,
    // so pair it with a real trigger interval (the production shape) —
    // under the default 0 ms trigger those timer checks busy-loop.
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[Tuple1[Seq[Double]], RollingStat](
        OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[(String, Long, Long, Double)],
         state: GroupState[Tuple1[Seq[Double]]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(r => (r._2, r._3))
            if (batch.isEmpty) Iterator.empty
            else {
              var recent = state.getOption.map(_._1).getOrElse(Seq.empty).toVector
              val out = batch.map { case (_, ts, tb, v) =>
                val frame = (recent :+ v).takeRight(windowRows)
                recent = (recent :+ v).takeRight(math.max(windowRows - 1, 0))
                RollingStat(key, ts, tb, frame.size.toLong, frame.sum,
                  frame.min, frame.max, frame.sum / frame.size)
              }
              state.update(Tuple1(recent))
              idleTimeoutMs.foreach(state.setTimeoutDuration)
              out.iterator
            }
          }
      }
  }

  /** [[meanDrift]] over PRE-AGGREGATED micro-batch moments instead of
    * raw (key, value) pairs — the shape that scales: a grouped
    * aggregate upstream reduces each micro-batch to one fixed-width
    * row per key map-side, so the stateful shuffle moves O(keys) rows
    * no matter how many events the batch carries. State math is
    * Chan's merge, algebraically identical to folding the raw values;
    * emission semantics (threshold on the batch mean's z-score against
    * the PRIOR running moments, after `minHistory` observations) match
    * [[meanDrift]] exactly. */
  def meanDriftFromMoments(
      batches: Dataset[BatchMoments],
      threshold: Double = 3.0,
      minHistory: Long = 10): Dataset[DriftEvent] = {
    implicit val stateEnc: Encoder[KeyMoments] = Encoders.product[KeyMoments]
    implicit val outEnc: Encoder[DriftEvent] = Encoders.product[DriftEvent]
    batches.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[KeyMoments, DriftEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[BatchMoments], state: GroupState[KeyMoments]) =>
          val batch = rows.map(m => KeyMoments(m.n, m.mean, m.m2))
            .foldLeft(KeyMoments(0, 0.0, 0.0))(_.merge(_))
          if (batch.count == 0) Iterator.empty
          else {
            val prior = state.getOption.getOrElse(KeyMoments(0, 0.0, 0.0))
            val out =
              if (prior.count >= minHistory && prior.stdev > 0) {
                val z = math.abs(batch.mean - prior.mean) / prior.stdev
                if (z > threshold)
                  Iterator.single(DriftEvent(key, batch.count, batch.mean,
                    prior.mean, prior.stdev, z))
                else Iterator.empty
              } else Iterator.empty
            state.update(prior.merge(batch))
            out
          }
      }
  }
}
