package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ingestion guards — admission control applied BEFORE a
  * live pipeline pays for profiling/dedup/featurization. North-star
  * scope like [[StreamDedup]] (the reference is batch-only).
  *
  * First guard: the per-entity event cap. The batch counterpart
  * ([[graft.events.Events.capPerEntity]]) keeps a deterministic
  * hash-ordered sample because it can see the whole corpus; a stream
  * cannot reorder the future, so the honest online semantics is
  * FIRST-N-PER-ENTITY — admit an entity's first `cap` events and drop
  * the rest. That asymmetry is real and documented, not hidden: a
  * replayed stream and the batch cap keep DIFFERENT (equally sized)
  * subsets unless the batch caller orders by the same arrival key.
  */
object StreamGuards {

  /** One admitted event: the key, its event identity (`tsMicros`,
    * `tiebreak` echo the input so the row joins back to its source),
    * and `seq` — this event's 1-based admission index within its key
    * (seq == cap ⇒ the key's budget is now exhausted). */
  final case class AdmittedEvent(
      key: String, tsMicros: Long, tiebreak: Long, seq: Long)

  /** Admit each key's first `cap` events, drop everything after.
    * Input rows are (key, tsMicros, tiebreak). Rows WITHIN a
    * micro-batch are sorted by (tsMicros, tiebreak) before admission,
    * so in-batch arrival order never perturbs the result; ACROSS
    * batches admission follows batch order (the property a sorted
    * replay provides — the standard processing-order caveat shared
    * with [[StreamProfiler.rollingStatsStream]]).
    *
    * State per key is ONE long (the admitted count) — O(keys) × 8 B
    * regardless of stream volume, sharded by the state-store hash on
    * the key, so a hot entity costs no more state than a cold one and
    * its excess events drop at the first stateful operator instead of
    * flooding everything downstream (the streaming face of the skew
    * mitigation the batch event operators assume upstream).
    * `idleTimeoutMs` evicts idle keys' counters (a returning key
    * restarts its budget — the rate-limiter-like mode for unbounded
    * key universes); the default NoTimeout keeps budgets forever,
    * which is the exact-fixpoint mode the correctness gate replays.
    * The same call works on a batch Dataset, where
    * flatMapGroupsWithState degenerates to one group pass. */
  def capPerEntityStream(
      events: Dataset[(String, Long, Long)],
      cap: Int,
      idleTimeoutMs: Option[Long] = None): Dataset[AdmittedEvent] = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    require(idleTimeoutMs.forall(_ > 0), s"idleTimeoutMs must be positive: $idleTimeoutMs")
    implicit val stateEnc: Encoder[Tuple1[Long]] = Encoders.product[Tuple1[Long]]
    implicit val outEnc: Encoder[AdmittedEvent] = Encoders.product[AdmittedEvent]
    // ProcessingTimeTimeout fires through no-data micro-batches — pair
    // it with a real trigger interval (the rollingStatsStream caveat).
    val timeoutConf = if (idleTimeoutMs.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[Tuple1[Long], AdmittedEvent](
        OutputMode.Append(), timeoutConf) {
        (key: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Tuple1[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(r => (r._2, r._3))
            if (batch.isEmpty) Iterator.empty
            else {
              val admittedSoFar = state.getOption.map(_._1).getOrElse(0L)
              val room = math.max(0L, cap.toLong - admittedSoFar)
              val admitted = batch.take(math.min(room, Int.MaxValue).toInt)
              state.update(Tuple1(admittedSoFar + admitted.size))
              idleTimeoutMs.foreach(state.setTimeoutDuration)
              admitted.iterator.zipWithIndex.map { case (r, i) =>
                AdmittedEvent(key, r._2, r._3, admittedSoFar + i + 1)
              }
            }
          }
      }
  }
}
