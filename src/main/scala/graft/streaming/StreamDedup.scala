package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
