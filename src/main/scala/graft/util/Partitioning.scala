package graft.util

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for CPU-heavy map-side operators.
  *
  * The dedup/similarity/text operators do real per-row compute
  * (hashing every k-gram, folding marker counters, sliding-window
  * minima). Their cost model assumes the input is spread across the
  * cluster — but a small parquet file (or a single large row group)
  * arrives as ONE input split, serializing the whole corpus onto one
  * core while the rest idle. At 100 TB inputs come in thousands of
  * splits and this is a no-op; it exists so the same operator saturates
  * whatever parallelism the session has when the input doesn't.
  */
object Partitioning {

  /** Round-robin repartition `df` up to the session's default
    * parallelism — only when the current partition count is below it.
    * Row order changes (round-robin), so use only ahead of
    * order-insensitive work (aggregates, joins, per-row projections).
    * The repartition shuffles raw input rows once; for the operators
    * here that is far cheaper than leaving cores idle, and it never
    * triggers when the source is already well-split.
    *
    * Caveat: do NOT spread a plan whose task binary embeds a huge
    * literal expression tree (e.g. unrolled k-means centroid argmax —
    * megabytes of serialized literals): every task deserializes the
    * whole binary, so multiplying tasks multiplies that fixed cost,
    * which dominates jobs whose actual data is small. */
  def spread(df: DataFrame): DataFrame = {
    // Streaming plans expose no RDD to inspect (and micro-batch
    // partitioning is the source's business) — pass them through.
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
