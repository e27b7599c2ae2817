package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.text.TextAnalysis

/** Streaming exact deduplication over Structured Streaming —
  * north-star scope like [[StreamProfiler]] (the reference is
  * batch-only; a 100 TB training-data pipeline ingests continuously,
  * and exact dedup is its first filter).
  *
  * Semantics: FIRST ARRIVAL WINS. Each row's content fingerprint
  * (md5 of whitespace-normalized lowercased text — the same digest as
  * the batch operators [[graft.dedup.Dedup.exactDupGroups]] /
  * `TextAnalysis.fingerprint`, so batch and stream agree on what "the
  * same document" means) is matched against watermark-scoped state;
  * rows whose fingerprint was already seen drop, everything else
  * passes through with the fingerprint attached.
  *
  * Scale notes: state is one entry per DISTINCT fingerprint — 16
  * bytes of key plus store overhead, no document text — partitioned
  * by the state-store hash on the fingerprint, so it shards evenly
  * across executors regardless of document skew. With an event-time
  * column and a watermark delay the state is EVICTED once the
  * watermark passes (dedup-within-horizon — the standard bound for an
  * unbounded stream); without one the state grows with the distinct
  * count, which is the exact-fixpoint mode the correctness gate
  * replays. The same call works on a batch DataFrame (dropDuplicates
  * degenerates to a hash aggregate), which is how batch≡stream parity
  * is asserted.
  */
object StreamDedup {

  /** Drop rows whose normalized content was already seen, keeping the
    * first arrival. Output = input columns + `fingerprintCol`.
    *
    * @param tsCol event-time column; with `watermarkDelay` switches to
    *   watermark-scoped state (`dropDuplicatesWithinWatermark`):
    *   duplicates are only suppressed while their first arrival is
    *   within the watermark horizon, and state older than the horizon
    *   is evicted — the bounded-state mode for unbounded streams. */
  def dropExactDuplicates(
      df: DataFrame, textCol: String,
      tsCol: Option[String] = None,
      watermarkDelay: Option[String] = None,
      fingerprintCol: String = "fingerprint"): DataFrame = {
    // Half-specifying the watermark would silently fall through to
    // unbounded state — the OOM surfaces days later, far from the
    // mistake. Fail at plan time instead.
    require(tsCol.isDefined == watermarkDelay.isDefined,
      s"tsCol and watermarkDelay must be given together (got tsCol=$tsCol, " +
        s"watermarkDelay=$watermarkDelay)")
    // withColumn would silently REPLACE a caller's same-named column
    // and dedup on a different digest than the column they see.
    require(!df.columns.contains(fingerprintCol),
      s"input already has a '$fingerprintCol' column — pass fingerprintCol to use another name")
    val digested = df.withColumn(fingerprintCol, TextAnalysis.fingerprint(col(textCol)))
    (tsCol, watermarkDelay) match {
      case (Some(t), Some(d)) =>
        digested.withWatermark(t, d).dropDuplicatesWithinWatermark(fingerprintCol)
      case _ =>
        digested.dropDuplicates(fingerprintCol)
    }
  }

  /** One exploded LSH band-bucket row of a document in flight. */
  private[streaming] final case class NearDupKeyed(
      band: Int, bucket: Long, id: Long, ts: java.sql.Timestamp, sig: Array[Long])

  /** Per-bucket state: the first document to CLAIM this (band, bucket),
    * its signature, and when the claim lapses (claim event time +
    * watermark delay — the `dropDuplicatesWithinWatermark` horizon). */
  private[streaming] final case class BucketClaim(
      id: Long, expiresAtMs: Long, sig: Array[Long])

  /** A document's verdict from ONE of its buckets; the per-document OR
    * of these is the drop decision. */
  private[streaming] final case class NearDupVerdict(
      id: Long, ts: java.sql.Timestamp, dropped: Boolean)

  /** A retained document — the final output row. */
  private[streaming] final case class NearDupRetained(id: Long, ts: java.sql.Timestamp)

  /** The per-document OR over its buckets' verdicts, as a ZERO-STATE
    * flatMapGroupsWithState: every verdict row for a document is
    * produced in the micro-batch its input row arrived in (the claim
    * stage neither holds nor re-emits rows), so the group sees the
    * complete verdict set at once and can emit the retention decision
    * in the SAME batch — no state is ever read or written, no
    * watermark hold, no extra flush micro-batches. This replaced a
    * watermarked groupBy/max aggregation that finalized each document
    * one watermark advance later and made the gate's replay latency
    * two stateful commits + trailing no-data batches per fed batch. */
  /** Per-document OR over band verdicts, with a one-bit "already
    * decided" state per (id, ts) so a cross-batch RE-DELIVERY of a
    * retained document does not re-emit its row — exactly-once output
    * per document within the watermark horizon (the suppression the
    * pre-r18 watermarked max-aggregation provided, at one boolean per
    * in-horizon document instead of a second watermark stage). The
    * state carries no payload: the first batch's verdict is final
    * (all of a document's band verdicts arrive in its arrival batch),
    * so a re-delivered group only needs to know the key was seen.
    * Event-time timeout evicts the bit once the claim horizon passes;
    * the timeout is clamped above the current watermark exactly as in
    * [[claimAndJudge]]. */
  private def orVerdicts(delayMs: Long)(
      key: (Long, java.sql.Timestamp), rows: Iterator[NearDupVerdict],
      state: GroupState[Boolean]): Iterator[NearDupRetained] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    if (state.exists) return Iterator.empty
    val wmMs = scala.util.Try(state.getCurrentWatermarkMs()).toOption
    // Mark decided only under a real watermark (streaming): in the
    // batch degeneration every group is seen exactly once, so the
    // state (which could never time out there) is pure overhead.
    wmMs.filter(_ >= 0).foreach { wm =>
      state.update(true)
      state.setTimeoutTimestamp(math.max(key._2.getTime + delayMs, wm + 1))
    }
    if (rows.exists(_.dropped)) Iterator.empty
    else Iterator.single(NearDupRetained(key._1, key._2))
  }

  /** Millis of a Spark interval string ("1 day", "30 minutes", …);
    * calendar months have no fixed millis and are rejected. */
  private def delayMillis(delay: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, s"watermarkDelay must not use calendar months: $delay")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** The per-(band, bucket) group function: the first arrival claims
    * the bucket; every later arrival while the claim is live is judged
    * against the claimant's signature (fraction of agreeing minhash
    * positions — the unbiased Jaccard estimate LSH is built on). A
    * claim lapses `delayMs` after its event time: in-flight stale
    * claims are replaced by the batch's first row (re-emit after the
    * horizon, like dropDuplicatesWithinWatermark), and quiet ones are
    * evicted by the event-time timeout. In BATCH execution there is no
    * watermark (getCurrentWatermarkMs throws): claims never lapse and
    * timeouts never fire — single-batch greedy semantics. */
  private def claimAndJudge(threshold: Double, delayMs: Long)(
      key: (Int, Long), rows: Iterator[NearDupKeyed],
      state: GroupState[BucketClaim]): Iterator[NearDupVerdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wmMs = scala.util.Try(state.getCurrentWatermarkMs()).toOption
    var claim = state.getOption.filter(c => wmMs.forall(_ < c.expiresAtMs))
    // Arrival order within the micro-batch is (event time, id) — the
    // deterministic tiebreak that makes "first arrival" well-defined
    // when a whole cluster lands in one batch.
    val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.id)).map { r =>
      claim match {
        case Some(c) if c.id != r.id =>
          val k = r.sig.length
          var eq = 0; var i = 0
          while (i < k) { if (c.sig(i) == r.sig(i)) eq += 1; i += 1 }
          NearDupVerdict(r.id, r.ts, eq.toDouble / k >= threshold)
        case Some(_) => // re-delivery of the claimant itself: not a dup
          NearDupVerdict(r.id, r.ts, dropped = false)
        case None =>
          val c = BucketClaim(r.id, r.ts.getTime + delayMs, r.sig)
          claim = Some(c)
          state.update(c)
          // Registered once per claim; data-carrying groups replace
          // stale claims inline above, so the timeout only has to
          // clean up buckets the stream went quiet on. Clamped above
          // the CURRENT watermark: the late-row filter admits rows
          // against the PREVIOUS batch's watermark, so an event-time
          // burst larger than the delay can legally produce a claim
          // whose lapse is already behind the current watermark —
          // setTimeoutTimestamp would then throw and kill the query
          // (and its identical replay on restart).
          wmMs.foreach(wm => state.setTimeoutTimestamp(math.max(c.expiresAtMs, wm + 1)))
          NearDupVerdict(r.id, r.ts, dropped = false)
      }
    }
    out.iterator
  }

  /** Streaming NEAR-duplicate removal — the watermark-scoped extension
    * of the batch [[graft.dedup.Dedup.nearDupPairs]] family: drop a
    * document when it is near-identical to an earlier retained-claim
    * document within the watermark horizon.
    *
    * Mechanics: each document's MinHash signature (the same map-side
    * [[graft.functions.MinHashSignature]] the batch operators use) is
    * banded exactly as in [[graft.dedup.Dedup.bandBuckets]]; each
    * (band, bucket) is a [[flatMapGroupsWithState]] group whose state
    * is ONE claim — the first document to arrive in that bucket, its
    * signature, and its lapse time. A later document sharing any
    * bucket with a live claimant whose signature agrees on ≥
    * `threshold` of the minhash positions (the unbiased Jaccard
    * estimate) is dropped; the per-document OR over its bands
    * ([[orVerdicts]], one decided-bit of state per in-horizon
    * document) emits the retention decision in the same micro-batch
    * the document arrived in — a document's verdicts never span
    * batches, so nothing needs to wait for a watermark advance.
    *
    * Scale design: state is one signature per DISTINCT occupied
    * bucket — `bands` × 8·numHashes bytes per retained-claim document,
    * watermark-evicted; the hot path is the same map-side signature
    * scan as batch, one shuffle to the bucket groups, one to the
    * per-document OR. A cluster of n identical documents costs O(n)
    * state lookups (all n land on the claimant's buckets), never an
    * O(n²) join — the streaming analogue of the batch occupancy-cap
    * story. Chain [[dropExactDuplicates]] FIRST (the cookbook order)
    * so exact floods collapse before signatures are even computed.
    *
    * The id column must be losslessly castable to long (state and
    * verdicts carry fixed-width keys). Output: (id, ts) of RETAINED
    * documents, emitted in the arrival micro-batch, exactly once per
    * (id, ts) within the watermark horizon: the OR step keeps a
    * one-bit "decided" state per document so a cross-batch re-delivery
    * of a retained claimant is suppressed, not re-emitted. On a batch
    * frame the same call degenerates to greedy single-batch semantics
    * (no watermark → claims never lapse, and the decided-bit is
    * skipped — every group is seen exactly once anyway).
    *
    * Streaming callers must set
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`:
    * the static checker flags EVERY fMGWS-after-fMGWS chain because it
    * cannot see through the lambdas, but the claim stage's verdicts
    * carry their input rows' event time UNCHANGED within the same
    * micro-batch and the OR stage holds no state at all — exactly the
    * false-positive case the escape hatch exists for. */
  def dropNearDuplicates(
      df: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, threshold: Double = 0.8,
      shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide into bands ($bands)")
    val idType = df.schema(idCol).dataType
    require(idType == org.apache.spark.sql.types.LongType ||
        org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(
          idType, org.apache.spark.sql.types.LongType),
      s"id column $idCol ($idType) must cast losslessly to long")
    val delayMs = delayMillis(watermarkDelay)
    val session = df.sparkSession
    import session.implicits._
    val norm = regexp_replace(trim(col(textCol)), "\\s+", " ")
    val sig = graft.functions.VectorFunctions.minhashSignature(
      graft.functions.VectorFunctions.shingleHashes(norm, shingleSize), numHashes)
    val keyed = df
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("id"), col("ts"), col("sig"),
        explode(graft.dedup.Dedup.lshBandKeys(col("sig"), bands, numHashes / bands)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"),
        col("id"), col("ts"), col("sig"))
      .as[NearDupKeyed]
    val verdicts = keyed
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        claimAndJudge(threshold, delayMs) _)
    // The watermark re-annotation is required for the OR stage's
    // event-time timeout (the claim fMGWS consumes the upstream
    // annotation); it does NOT reintroduce the pre-r18 emission
    // latency — Append-mode fMGWS emits its returned rows in the same
    // micro-batch, the watermark only drives state eviction and the
    // late-row filter (which the claim stage already applied at the
    // same delay, so no row admitted there is late here).
    verdicts
      .withWatermark("ts", watermarkDelay)
      .groupByKey(v => (v.id, v.ts))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        orVerdicts(delayMs) _)
      .toDF()
  }
}
