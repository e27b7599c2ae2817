package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-joins for skewed keys: the standard mitigation when one
  * join key holds a disproportionate share of the big side (a null-ish
  * sentinel id, a celebrity user, a boilerplate document cluster) and
  * a single reducer would receive that key's entire partition.
  *
  * The move: the SKEWED side gets a deterministic salt in
  * [0, saltFactor) appended to its key; the OTHER side is replicated
  * once per salt value (an explode of a `saltFactor`-element array —
  * cheap when that side is the smaller of the two, which is the only
  * time salting beats simply broadcasting it). The join key becomes
  * (key, salt), spreading the hot key over `saltFactor` reducers.
  * Results are identical to the unsalted join — the salt is an
  * internal column, dropped on the way out.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * solves the same problem adaptively by splitting oversized
  * post-shuffle partitions, and is the FIRST tool to reach for; this
  * explicit form exists for the cases AQE cannot touch — aggregations
  * keyed on the hot key downstream, deterministic plan shape under
  * test, engines/configs with AQE off — and as the documented pattern
  * the dedup operators' occupancy caps complement (cap what would
  * quadratically explode, salt what merely skews).
  *
  * The salt is keyed on `saltOnCol` (a high-cardinality id of the
  * skewed side) via xxhash64 — deterministic under retries, no
  * rand() re-shuffle hazard. North-star scope; the reference joins
  * nothing (reference: sparvi/profiler/profile_engine.py).
  */
object SkewJoin {

  /** Inner equi-join of a skewed big side against a smaller side,
    * salted `saltFactor` ways. `skewed` and `other` must share
    * `keyCols`; `saltOnCol` is a column of the skewed side whose hash
    * spreads its rows (its own id, never the join key). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keyCols: Seq[String],
      saltOnCol: String, saltFactor: Int): DataFrame = {
    require(saltFactor >= 2, s"saltFactor must be >= 2: $saltFactor")
    require(keyCols.nonEmpty, "saltedJoin needs at least one key column")
    val saltCol = "__salt"
    (skewed.columns ++ other.columns).foreach { c =>
      require(c != saltCol, s"input already has reserved column '$saltCol'")
    }
    val saltedBig = skewed.withColumn(saltCol,
      pmod(xxhash64(col(saltOnCol)), lit(saltFactor.toLong)))
    val replicated = other.withColumn(saltCol,
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig.join(replicated, keyCols :+ saltCol).drop(saltCol)
  }

  /** The MEASURE step before the mitigation: the top-k hottest join
    * keys with their row counts and corpus share. Run it on the join
    * key before a big join — a top key holding >1/partitions of the
    * rows is the one that stalls a reducer, and its share tells you
    * the `saltFactor` ([[saltedJoin]]) or the AQE skew threshold to
    * set. Nulls count as a key (they're the classic hot key).
    *
    * One hash aggregate keyed by the join key, a second tiny
    * aggregate over the GROUPED rows for the total, and a TakeOrdered
    * top-k — nothing corpus-sized reaches the driver except the ≤topK
    * report rows themselves. The grouped counts persist (spillable,
    * key-cardinality-sized) so the total and the top-k consume ONE
    * corpus scan — without the cache, Spark re-plans the whole
    * scan+aggregate for each consumer — and the report is materialized
    * EAGERLY so the cache can be unpersisted before returning:
    * a lazily-returned plan would pin key-cardinality-sized blocks in
    * executor storage for the session's lifetime on every call. The
    * returned frame is a ≤topK-row local relation. Ties break by key
    * for a deterministic report. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    // persist + deterministic unpersist, NOT localCheckpoint: this
    // frame is read exactly twice and is key-cardinality-sized, and
    // the release-before-return contract (pinned by SkewJoinSpec)
    // matters more in a long-lived session than the narrow-frame
    // checkpoint read win measured elsewhere this round — checkpoint
    // blocks free only when the context cleaner GCs the RDD.
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = counts.agg(sum("n").as("total"))
      val report = counts.crossJoin(broadcast(total))
        .select(col("key"), col("n"), (col("n") / col("total")).as("share"))
        .orderBy(col("n").desc, col("key"))
        .limit(topK)
      val rows = report.collect()
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), report.schema)
    } finally counts.unpersist(false)
  }
}
