package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.StreamProfiler

/** Structured-Streaming profile tests: the streaming plan's
  * AvailableNow fixpoint must equal the batch plan's result on the
  * same input — the core correctness claim for stream profiling.
  */
class StreamingSpec extends AnyFunSuite with Matchers with SparkTestBase {

  /** Re-materialize the events fixture into a temp dir the parquet
    * file source can watch, normalizing `ts` to a native timestamp.
    * The fixture has shipped both as TIMESTAMP(NANOS) — which Spark
    * reads only as a raw long — and as TIMESTAMP(MICROS), which it
    * reads as a timestamp directly; handle both like
    * SparkEntry.eventsWithTs does. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    dir.toFile.deleteOnExit()
    // Watermarks require TimestampType (not NTZ); session TZ is UTC.
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val withTs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    withTs.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  test("streaming windowed completeness reaches the batch fixpoint") {
    val batchDf = spark.read.parquet(eventsDir)
    val expected = StreamProfiler.windowedCompleteness(
      batchDf, "ts", "event_type", "1 day", None, Seq("value"))
      .collect().map(_.toSeq).toSet

    val streamDf = StreamProfiler.readParquetStream(spark, eventsDir)
    streamDf.isStreaming shouldBe true
    val profiled = StreamProfiler.windowedCompleteness(
      streamDf, "ts", "event_type", "1 day", Some("1 hour"), Seq("value"))
    val got = StreamProfiler.runToMemory(profiled, "win_completeness")
      .map(_.toSeq).toSet

    got shouldBe expected
    got should not be empty
  }

  test("streaming numeric profile matches batch on avg/min/max") {
    val batchDf = spark.read.parquet(eventsDir)
    val expected = StreamProfiler.windowedNumericProfile(
      batchDf, "ts", "event_type", "value", "1 day")
      .collect().map(_.toSeq).toSet

    val profiled = StreamProfiler.windowedNumericProfile(
      StreamProfiler.readParquetStream(spark, eventsDir),
      "ts", "event_type", "value", "1 day", Some("1 hour"))
    val got = StreamProfiler.runToMemory(profiled, "win_numeric").map(_.toSeq).toSet
    got shouldBe expected
  }

  test("streaming windowed quantiles reach the batch fixpoint") {
    val batchDf = spark.read.parquet(eventsDir)
    val expected = StreamProfiler.windowedQuantiles(
      batchDf, "ts", "event_type", "value", "1 day")
      .collect().map(_.toSeq).toSet
    val profiled = StreamProfiler.windowedQuantiles(
      StreamProfiler.readParquetStream(spark, eventsDir),
      "ts", "event_type", "value", "1 day", Some("1 hour"))
    val got = StreamProfiler.runToMemory(profiled, "win_quantiles").map(_.toSeq).toSet
    got shouldBe expected
    got should not be empty
  }

  test("streaming windowed PSI drift matches batch, zero on the reference itself") {
    val batchDf = spark.read.parquet(eventsDir)
    val (lo, width, shares) =
      graft.compare.Drift.referenceHistogram(batchDf, "value", numBins = 10)
    val expected = StreamProfiler.windowedPsiDrift(
      batchDf, "ts", "value", "1 day", lo, width, shares)
      .collect().map(_.toSeq).toSet
    expected should not be empty
    val profiled = StreamProfiler.windowedPsiDrift(
      StreamProfiler.readParquetStream(spark, eventsDir),
      "ts", "value", "1 day", lo, width, shares, Some("1 hour"))
    val got = StreamProfiler.runToMemory(profiled, "win_psi").map(_.toSeq).toSet
    got shouldBe expected
    // Scoring the whole reference against itself in ONE window → PSI 0.
    val whole = StreamProfiler.windowedPsiDrift(
      batchDf, "ts", "value", "100 days", lo, width, shares).collect()
    whole.map(_.getAs[Double]("psi")).foreach(_ shouldBe 0.0 +- 1e-9)
  }

  test("meanDrift: stateful detector fires only after history, only on deviation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Double)]
    val drift = StreamProfiler.meanDrift(input.toDS(), threshold = 3.0, minHistory = 10)
    val q = drift.writeStream.format("memory").queryName("drift_events")
      .outputMode("append").start()
    try {
      // Batch 1: build history for key "a" around mean 10, sd ~1.
      input.addData((1 to 20).map(i => ("a", 10.0 + (i % 3) - 1)): _*)
      q.processAllAvailable()
      spark.table("drift_events").count() shouldBe 0 // no prior history yet

      // Batch 2: "a" jumps to 50 (way past 3σ); "b" has no history.
      input.addData(("a", 50.0), ("a", 51.0), ("b", 1.0))
      q.processAllAvailable()
      val events = spark.table("drift_events").as[StreamProfiler.DriftEvent].collect()
      events.map(_.key).toSeq shouldBe Seq("a")
      events.head.zScore should be > 3.0
      events.head.runningMean shouldBe 10.0 +- 1.0

      // Batch 3: back to normal-ish values → no new event (the drifted
      // batch widened the state's stdev).
      input.addData(("a", 10.0))
      q.processAllAvailable()
      spark.table("drift_events").count() shouldBe 1
    } finally q.stop()
  }

  test("meanDriftFromMoments: pre-aggregated feed emits the same events as raw meanDrift") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // Deterministic multi-key batch sequence with one engineered jump
    // per key and uneven batch sizes (including a singleton batch,
    // whose M2 is 0 — the var_samp null edge upstream).
    val rng = new scala.util.Random(7)
    val batches: Seq[Seq[(String, Double)]] = (0 until 8).map { b =>
      val a = (0 until 12).map(_ => ("a", 5.0 + rng.nextGaussian() + (if (b == 6) 40.0 else 0.0)))
      val c = (0 until (if (b == 3) 1 else 9)).map(_ => ("c", -2.0 + rng.nextGaussian() * 0.5 + (if (b == 7) -25.0 else 0.0)))
      a ++ c
    }

    val rawIn = MemoryStream[(String, Double)]
    val rawQ = StreamProfiler.meanDrift(rawIn.toDS(), threshold = 3.0, minHistory = 10)
      .writeStream.format("memory").queryName("drift_raw").outputMode("append").start()
    val momIn = MemoryStream[StreamProfiler.BatchMoments]
    val momQ = StreamProfiler.meanDriftFromMoments(momIn.toDS(), threshold = 3.0, minHistory = 10)
      .writeStream.format("memory").queryName("drift_mom").outputMode("append").start()
    try {
      batches.foreach { batch =>
        rawIn.addData(batch)
        // The moment rows a distributed groupBy would produce — split
        // each key's values in two to exercise the within-batch merge.
        val moments = batch.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
          rows.map(_._2).grouped(math.max(1, rows.size / 2 + 1)).map { vs =>
            val n = vs.size.toLong
            val mean = vs.sum / n
            val m2 = vs.map(v => (v - mean) * (v - mean)).sum
            StreamProfiler.BatchMoments(k, n, mean, m2)
          }
        }
        momIn.addData(moments)
        rawQ.processAllAvailable()
        momQ.processAllAvailable()
      }
      val raw = spark.table("drift_raw").as[StreamProfiler.DriftEvent].collect()
        .sortBy(e => (e.key, e.batchCount))
      val mom = spark.table("drift_mom").as[StreamProfiler.DriftEvent].collect()
        .sortBy(e => (e.key, e.batchCount))
      raw.length should be > 0
      mom.length shouldBe raw.length
      raw.zip(mom).foreach { case (r, m) =>
        m.key shouldBe r.key
        m.batchCount shouldBe r.batchCount
        m.batchMean shouldBe r.batchMean +- 1e-9
        m.runningMean shouldBe r.runningMean +- 1e-9
        m.runningStdev shouldBe r.runningStdev +- 1e-9
        m.zScore shouldBe r.zScore +- 1e-9
      }
    } finally { rawQ.stop(); momQ.stop() }
  }

  test("streaming exact dedup: first arrival wins across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val deduped = graft.streaming.StreamDedup.dropExactDuplicates(
      input.toDS().toDF("text", "batch"), "text")
    val q = deduped.select(col("fingerprint"), col("batch"))
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      input.addData(("alpha doc", 1L), ("beta doc", 1L))
      q.processAllAvailable()
      // Batch 2: "  ALPHA   DOC " normalizes to batch 1's "alpha doc"
      // → suppressed by cross-batch state; "gamma doc" is new.
      input.addData(("  ALPHA   DOC ", 2L), ("gamma doc", 2L))
      q.processAllAvailable()
      val got = spark.table("stream_dedup").as[(String, Long)].collect().toSet
      got.map(_._2) shouldBe Set(1L, 2L)
      got should have size 3
      // The surviving batch-2 row is gamma, not the mangled alpha.
      val batchOf = got.toMap
      import graft.text.TextAnalysis
      val fp = Seq("alpha doc", "beta doc", "gamma doc")
        .toDF("t").select(TextAnalysis.fingerprint(col("t"))).as[String].collect()
      batchOf(fp(0)) shouldBe 1L
      batchOf(fp(1)) shouldBe 1L
      batchOf(fp(2)) shouldBe 2L
    } finally q.stop()
  }

  test("streaming exact dedup: batch mode is the stream's fixpoint") {
    val s = spark
    import s.implicits._
    val df = Seq("a doc", "A   DOC", "b doc", " b  doc ", "c doc")
      .toDF("text")
    val out = graft.streaming.StreamDedup.dropExactDuplicates(df, "text")
      .select("fingerprint").as[String].collect()
    out.length shouldBe 3
    out.distinct.length shouldBe 3
  }

  test("streaming exact dedup: watermarked state suppresses within the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = graft.streaming.StreamDedup.dropExactDuplicates(
      input.toDS().toDF("text", "ts"), "text",
      tsCol = Some("ts"), watermarkDelay = Some("1 hour"))
    val q = deduped.select("fingerprint")
      .writeStream.format("memory").queryName("stream_dedup_wm")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      input.addData(("doc one", t0))
      q.processAllAvailable()
      // Ten minutes later — well inside the 1-hour horizon → dropped.
      input.addData(("DOC   ONE", t1), ("doc two", t1))
      q.processAllAvailable()
      spark.table("stream_dedup_wm").count() shouldBe 2
    } finally q.stop()
  }

  test("streaming near-dup dedup: bucket claims drop near-dups in-horizon, lapse re-emits, disjoint docs pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val a = "the quick brown fox jumps over the lazy dog"
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.StreamDedup.dropNearDuplicates(
      input.toDS().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts", "1 hour")
    // The static checker cannot see that verdicts keep their input
    // rows' event time (see dropNearDuplicates' scaladoc).
    s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val q = out.writeStream.format("memory").queryName("stream_near_dup")
      .outputMode("append").start()
    try {
      // 10:00 — doc 1 claims A's buckets (lapse 11:00); doc 2 is a
      // whitespace mangle of A (identical normalized signature) in the SAME batch
      // → the (ts, id) order makes 1 the claimant; 3 is disjoint.
      input.addData((1L, ts("10:00"), a), (2L, ts("10:00"), s"  ${a.replace(" ", "   ")} "),
        (3L, ts("10:00"), "u3a u3b u3c"))
      q.processAllAvailable()
      // 10:30 — inside the claim horizon → dropped.
      input.addData((4L, ts("10:30"), a))
      q.processAllAvailable()
      // 12:00 — disjoint doc; advances the watermark to 11:00.
      input.addData((7L, ts("12:00"), "u7a u7b u7c"))
      q.processAllAvailable()
      // 12:30 — watermark (11:00) has reached the claim's lapse time
      // (11:00): the stale claim is replaced in-flight → 5 RETAINED.
      input.addData((5L, ts("12:30"), a))
      q.processAllAvailable()
      // 13:00 — inside doc 5's fresh claim (lapse 13:30) → dropped.
      input.addData((6L, ts("13:00"), a))
      q.processAllAvailable()
      // 16:00 — disjoint doc; emits immediately like every retained
      // row (the one-stage plan has no pending append state to flush).
      input.addData((9L, ts("16:00"), "u9a u9b u9c"))
      q.processAllAvailable()
      val got = spark.table("stream_near_dup").select("id").as[Long].collect().sorted
      got shouldBe Array(1L, 3L, 5L, 7L, 9L)
    } finally {
      q.stop()
      s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    }
  }

  test("streaming near-dup dedup: cross-batch re-delivery of a retained doc is not re-emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val a = "the quick brown fox jumps over the lazy dog"
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.StreamDedup.dropNearDuplicates(
      input.toDS().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts", "1 hour")
    s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val q = out.writeStream.format("memory").queryName("redelivery_near_dup")
      .outputMode("append").start()
    try {
      // 10:00 — doc 1 claims; doc 3 disjoint. Both retained.
      input.addData((1L, ts("10:00"), a), (3L, ts("10:00"), "u3a u3b u3c"))
      q.processAllAvailable()
      // A source hiccup re-delivers BOTH retained rows (same id, same
      // event time) in a later batch, still inside the watermark
      // horizon. The decided-bit in the OR stage suppresses them:
      // exactly-once output per (id, ts), not at-least-once.
      input.addData((1L, ts("10:00"), a), (3L, ts("10:00"), "u3a u3b u3c"))
      q.processAllAvailable()
      // New near-dup of doc 1 still judged against the live claim.
      input.addData((4L, ts("10:30"), a))
      q.processAllAvailable()
      val got = spark.table("redelivery_near_dup").select("id").as[Long].collect().sorted
      got shouldBe Array(1L, 3L)
    } finally {
      q.stop()
      s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    }
  }

  test("RocksDB state store: near-dup dedup and exact dedup emit identical output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StateStores
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // Same scenario as the claim/lapse test, under the off-heap
    // provider a 100 TB stream runs: identical verdicts prove the
    // operators are provider-agnostic (state layout, timeouts, and
    // watermark interplay all pass through RocksDB).
    val a = "the quick brown fox jumps over the lazy dog"
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    an[IllegalArgumentException] should be thrownBy StateStores.configure(s, "bogus")
    val previous = StateStores.configure(s, "rocksdb")
    s.conf.get(StateStores.ProviderConfKey) shouldBe StateStores.RocksDBProvider
    s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    try {
      val input = MemoryStream[(Long, java.sql.Timestamp, String)]
      val out = graft.streaming.StreamDedup.dropNearDuplicates(
        input.toDS().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts", "1 hour")
      val q = out.writeStream.format("memory").queryName("rocksdb_near_dup")
        .outputMode("append").start()
      try {
        input.addData((1L, ts("10:00"), a),
          (2L, ts("10:00"), s"  ${a.replace(" ", "   ")} "),
          (3L, ts("10:00"), "u3a u3b u3c"))
        q.processAllAvailable()
        input.addData((4L, ts("10:30"), a))
        q.processAllAvailable()
        input.addData((7L, ts("12:00"), "u7a u7b u7c"))
        q.processAllAvailable()
        input.addData((5L, ts("12:30"), a))
        q.processAllAvailable()
        input.addData((9L, ts("16:00"), "u9a u9b u9c"))
        q.processAllAvailable()
        spark.table("rocksdb_near_dup").select("id").as[Long].collect().sorted shouldBe
          Array(1L, 3L, 5L, 7L, 9L)
      } finally q.stop()

      // Exact dedup (dropDuplicates state) under the same provider.
      val exactIn = MemoryStream[(String, Long)]
      val deduped = graft.streaming.StreamDedup.dropExactDuplicates(
        exactIn.toDS().toDF("text", "batch"), "text")
      val q2 = deduped.select(col("fingerprint"), col("batch"))
        .writeStream.format("memory").queryName("rocksdb_exact")
        .outputMode("append").start()
      try {
        exactIn.addData(("alpha doc", 1L), ("beta doc", 1L))
        q2.processAllAvailable()
        exactIn.addData(("  ALPHA   DOC ", 2L), ("gamma doc", 2L))
        q2.processAllAvailable()
        spark.table("rocksdb_exact").count() shouldBe 3L
      } finally q2.stop()

      // fromConfig: the layered-config path reaches the same conf.
      StateStores.fromConfig(s, Map("streaming" -> Map("state_store" -> "rocksdb")))
      s.conf.get(StateStores.ProviderConfKey) shouldBe StateStores.RocksDBProvider
    } finally {
      s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
      previous match {
        case Some(p) => s.conf.set(StateStores.ProviderConfKey, p)
        case None => s.conf.unset(StateStores.ProviderConfKey)
      }
    }
  }

  test("streaming near-dup dedup: a late row after an event-time burst cannot kill the query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = graft.streaming.StreamDedup.dropNearDuplicates(
      input.toDS().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts", "1 hour")
    s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val q = out.writeStream.format("memory").queryName("stream_near_dup_burst")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("10:00"), "u1a u1b u1c"))
      q.processAllAvailable()
      // 10-hour jump: the EVICTION watermark races ahead of the
      // late-events watermark (they differ by one batch).
      input.addData((2L, ts("20:00"), "u2a u2b u2c"))
      q.processAllAvailable()
      // 09:30 is admitted by the LAGGING late-events watermark but its
      // claim lapse (10:30) sits far below the eviction watermark —
      // an unclamped setTimeoutTimestamp would throw and kill the
      // query here, and again identically on restart.
      input.addData((3L, ts("09:30"), "u3a u3b u3c"))
      q.processAllAvailable()
      input.addData((9L, ts("23:00"), "u9a u9b u9c")) // flush
      q.processAllAvailable()
      val got = spark.table("stream_near_dup_burst").select("id").as[Long].collect().sorted
      got should contain allOf (1L, 2L)
    } finally {
      q.stop()
      s.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
    }
  }

  test("streaming near-dup dedup: batch mode is single-batch greedy (claims never lapse)") {
    val s = spark
    import s.implicits._
    val a = "the quick brown fox jumps over the lazy dog"
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val df = Seq(
      (1L, ts("10:00"), a), (2L, ts("10:00"), s"  ${a.replace(" ", "   ")} "),
      (3L, ts("10:00"), "u3a u3b u3c"),
      (4L, ts("10:30"), a), (5L, ts("12:30"), a),
      (9L, ts("16:00"), "u9a u9b u9c"))
      .toDF("doc_id", "ts", "text")
    val got = graft.streaming.StreamDedup.dropNearDuplicates(
      df, "doc_id", "text", "ts", "1 hour")
      .select("id").as[Long].collect().sorted
    // No watermark in batch: doc 1's claim never lapses, so every A
    // copy after it drops regardless of event-time gaps.
    got shouldBe Array(1L, 3L, 9L)
  }

  test("windowed completeness: null rates are per-window percentages") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("2024-01-01 10:05:00", "a", Some(1.0)),
      ("2024-01-01 10:20:00", "a", None),
      ("2024-01-01 11:05:00", "a", Some(2.0)),
      ("2024-01-01 10:10:00", "b", None))
      .toDF("ts_s", "k", "v")
      .select(to_timestamp($"ts_s").as("ts"), $"k", $"v")
    val out = StreamProfiler.windowedCompleteness(df, "ts", "k", "1 hour", None, Seq("v"))
      .collect().map(r => (
        r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[String]("k"),
        r.getAs[Long]("n_events"),
        r.getAs[Long]("v_nulls"),
        r.getAs[Double]("v_null_rate"))).toSet
    out shouldBe Set(
      ("2024-01-01 10:00:00.0", "a", 2L, 1L, 50.0),
      ("2024-01-01 11:00:00.0", "a", 1L, 0L, 0.0),
      ("2024-01-01 10:00:00.0", "b", 1L, 1L, 100.0))
  }

  test("streaming session windows reach the batch fixpoint") {
    import graft.events.Events
    val batchDf = spark.read.parquet(eventsDir)
    val expected = Events.sessionWindows(batchDf, "user_id", "ts",
      "30 minutes", "value").collect().map(_.toSeq).toSet
    val profiled = Events.sessionWindows(
      StreamProfiler.readParquetStream(spark, eventsDir),
      "user_id", "ts", "30 minutes", "value", watermarkDelay = Some("1 hour"))
    val got = StreamProfiler.runToMemory(profiled, "session_windows")
      .map(_.toSeq).toSet
    got shouldBe expected
    got should not be empty
  }

  test("rollingStatsStream: per-event frames carry across batches from bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    val q = StreamProfiler.rollingStatsStream(input.toDS(), windowRows = 3)
      .writeStream.format("memory").queryName("rolling_out")
      .outputMode("append").start()
    try {
      // Batch 1 arrives OUT of ts order within the batch — the
      // in-batch sort must fix it. Key a: values 10 (ts1), 20 (ts2).
      input.addData(("a", 2L, 102L, 20.0), ("a", 1L, 101L, 10.0))
      q.processAllAvailable()
      // Batch 2: key a gets ts3/ts4 — ts3's frame spans the batch
      // boundary (10, 20, 30); ts4's frame evicts 10. Key b starts fresh.
      input.addData(("a", 3L, 103L, 30.0), ("a", 4L, 104L, 40.0), ("b", 1L, 201L, 5.0))
      q.processAllAvailable()
      val got = spark.table("rolling_out").as[StreamProfiler.RollingStat]
        .collect().map(r => (r.key, r.tsMicros, r.rollN, r.rollSum, r.rollMin, r.rollMax))
        .sortBy(t => (t._1, t._2))
      got shouldBe Array(
        ("a", 1L, 1L, 10.0, 10.0, 10.0),
        ("a", 2L, 2L, 30.0, 10.0, 20.0),
        ("a", 3L, 3L, 60.0, 10.0, 30.0), // frame crossed the batch boundary
        ("a", 4L, 3L, 90.0, 20.0, 40.0), // oldest value evicted
        ("b", 1L, 1L, 5.0, 5.0, 5.0))
    } finally q.stop()
  }

  test("rollingStatsStream idle-timeout path computes identical frames while keys stay live") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // ProcessingTimeTimeout + the default 0 ms trigger + no-data
    // micro-batches = a busy loop of empty timer-check batches; a
    // production query uses a real trigger interval, the test simply
    // disables no-data batches on a child session.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    // A generous timeout: state must still carry across back-to-back
    // batches (the TTL only evicts IDLE keys).
    val q = StreamProfiler.rollingStatsStream(input.toDS(), windowRows = 2,
        idleTimeoutMs = Some(3600_000L))
      .writeStream.format("memory").queryName("rolling_ttl")
      .outputMode("append").start()
    try {
      input.addData(("a", 1L, 1L, 10.0))
      q.processAllAvailable()
      input.addData(("a", 2L, 2L, 20.0))
      q.processAllAvailable()
      val got = s2.table("rolling_ttl").as[StreamProfiler.RollingStat]
        .collect().sortBy(_.tsMicros).map(r => (r.tsMicros, r.rollN, r.rollSum))
      got shouldBe Array((1L, 1L, 10.0), (2L, 2L, 30.0)) // frame crossed batches
    } finally q.stop()
  }

  test("capPerEntityStream admits each key's first N events across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.StreamGuards.capPerEntityStream(input.toDS(), cap = 4)
      .writeStream.format("memory").queryName("cap_stream")
      .outputMode("append").start()
    try {
      // Batch 1: a×3 (out of order — in-batch sort must fix it), b×1.
      input.addData(("a", 30L, 3L), ("a", 10L, 1L), ("a", 20L, 2L), ("b", 10L, 9L))
      q.processAllAvailable()
      // Batch 2: a×3 — only ONE fits the remaining budget (seq 4).
      input.addData(("a", 40L, 4L), ("a", 50L, 5L), ("a", 60L, 6L))
      q.processAllAvailable()
      // Batch 3: a exhausted, b still has room.
      input.addData(("a", 70L, 7L), ("b", 20L, 8L))
      q.processAllAvailable()
      val got = s2.table("cap_stream")
        .as[graft.streaming.StreamGuards.AdmittedEvent]
        .collect().sortBy(r => (r.key, r.seq))
        .map(r => (r.key, r.tsMicros, r.seq))
      got shouldBe Array(
        ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L), ("a", 40L, 4L),
        ("b", 10L, 1L), ("b", 20L, 2L))
    } finally q.stop()
  }

  test("qualityFilter is stream-safe: streaming append output equals batch") {
    // The filter is pure map-side (PlanSpec pins no keyed exchange /
    // window / aggregate), so it must run UNCHANGED on a stream in
    // append mode with no watermark and no state — the shape a live
    // ingestion filter needs.
    val dir = Files.createTempDirectory("docs_stream")
    dir.toFile.deleteOnExit()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val expected = graft.text.TextAnalysis
      .qualityFilter(spark.read.parquet(dir.toString), "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val streamed = graft.text.TextAnalysis.qualityFilter(
      StreamProfiler.readParquetStream(spark, dir.toString), "text", "doc_id")
    streamed.isStreaming shouldBe true
    val q = streamed.writeStream.format("memory").queryName("qf_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("qf_stream").collect().map(_.toSeq).toSet
    got shouldBe expected
    got should not be empty
  }
}
